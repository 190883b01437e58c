"""Device-resident decode layout: degree-grouped contiguous edge ordering.

The reference's OpenCL decoders walk per-node inbox pointers inside each work
item (kernels_template.cl). The TPU layout instead *pre-sorts* edges so that:

- all edges of same-degree check nodes are contiguous -> each degree group is
  a static ``[num_nodes, degree, batch]`` reshape (no gather) under ``jit``;
- moving messages between the CN view and the VN view is exactly one global
  gather with a precomputed permutation per direction (the analog of the
  reference's ``target_memorycells_*`` indirection, computed once on host).

All index arrays are built in numpy from :class:`TannerGraph` and uploaded
once; decoding itself touches only static slices, one gather per direction,
and the channel/node gathers.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..codes.graph import TannerGraph


@dataclasses.dataclass(frozen=True)
class GroupSpec:
    """A contiguous block of the decode edge layout for one node degree."""

    degree: int
    offset: int  # starting edge index of this group's block
    num_nodes: int
    node_ids: jnp.ndarray  # [num_nodes] int32 original node indices


@dataclasses.dataclass(frozen=True)
class DecodeLayout:
    n_vars: int
    n_checks: int
    n_edges: int
    d_c_max: int
    d_v_max: int
    data_len: int
    code_rate: float

    cn_groups: tuple[GroupSpec, ...]
    vn_groups: tuple[GroupSpec, ...]

    # Permutations between the two decode layouts (pure gathers):
    #   vn_view = cn_view[cn_pos_of_vn_edge]; cn_view = vn_view[vn_pos_of_cn_edge]
    cn_pos_of_vn_edge: jnp.ndarray  # [n_edges] int32
    vn_pos_of_cn_edge: jnp.ndarray  # [n_edges] int32

    # Channel-value gather: variable node of each CN-layout edge (used to
    # seed check-node inboxes with channel values, kernels_template.cl:13-30).
    cn_edge_var: jnp.ndarray  # [n_edges] int32
    # Variable node of each VN-layout edge.
    vn_edge_var: jnp.ndarray  # [n_edges] int32
    # Inverse node permutation to assemble outputs in natural variable order.
    vn_node_unperm: jnp.ndarray  # [n_vars] int32

    @classmethod
    def from_graph(cls, g: TannerGraph) -> "DecodeLayout":
        # Decode CN layout: concatenate the degree groups' edge slots.
        cn_slots = np.concatenate([grp.edge_slots.ravel() for grp in g.cn_groups])
        vn_slots = np.concatenate([grp.edge_slots.ravel() for grp in g.vn_groups])
        # Position of each original-order edge in the decode layouts.
        cn_pos = np.empty(g.n_edges, dtype=np.int64)
        cn_pos[cn_slots] = np.arange(g.n_edges)
        vn_pos = np.empty(g.n_edges, dtype=np.int64)
        vn_pos[vn_slots] = np.arange(g.n_edges)

        # vn_view[i] holds the message of original VN-order edge vn_slots[i];
        # the same physical edge sits in the CN view at
        # cn_pos[cn_slot_of_vn_edge[vn_slots[i]]].
        cn_pos_of_vn_edge = cn_pos[g.cn_slot_of_vn_edge[vn_slots]].astype(np.int32)
        vn_pos_of_cn_edge = vn_pos[g.vn_slot_of_cn_edge[cn_slots]].astype(np.int32)

        def specs(groups) -> tuple[GroupSpec, ...]:
            out, off = [], 0
            for grp in groups:
                out.append(
                    GroupSpec(
                        degree=grp.degree,
                        offset=off,
                        num_nodes=int(grp.node_ids.size),
                        node_ids=jnp.asarray(grp.node_ids),
                    )
                )
                off += grp.node_ids.size * grp.degree
            return tuple(out)

        # vn_node_unperm[v] = position of variable v in the concatenated
        # group-order node results, so out = concat[vn_node_unperm] restores
        # natural variable order.
        node_order = np.concatenate([grp.node_ids for grp in g.vn_groups])
        vn_node_unperm = np.empty(g.n_vars, dtype=np.int32)
        vn_node_unperm[node_order] = np.arange(g.n_vars, dtype=np.int32)

        return cls(
            n_vars=g.n_vars,
            n_checks=g.n_checks,
            n_edges=g.n_edges,
            d_c_max=g.d_c_max,
            d_v_max=g.d_v_max,
            data_len=g.data_len,
            code_rate=g.code_rate,
            cn_groups=specs(g.cn_groups),
            vn_groups=specs(g.vn_groups),
            cn_pos_of_vn_edge=jnp.asarray(cn_pos_of_vn_edge),
            vn_pos_of_cn_edge=jnp.asarray(vn_pos_of_cn_edge),
            cn_edge_var=jnp.asarray(g.cn_edge_var[cn_slots].astype(np.int32)),
            vn_edge_var=jnp.asarray(g.vn_edge_var[vn_slots].astype(np.int32)),
            vn_node_unperm=jnp.asarray(vn_node_unperm),
        )
