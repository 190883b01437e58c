"""Device-resident decode layout: degree-grouped, slot-major edge ordering.

The reference's OpenCL decoders walk per-node inbox pointers inside each work
item (kernels_template.cl). The TPU layout instead pre-sorts edges so that

- all edges of same-degree nodes are contiguous, organized **slot-major**:
  a degree-d group's block holds d planes of ``num_nodes`` rows; plane j is
  "message j of every node" -> each node-update step is elementwise across
  whole planes (static slices, no gather);
- moving messages between the CN view and the VN view is one global
  permutation. For structured codes (quasi-cyclic 802.11n, q-group DVB-S2
  IRA) the slot-major ordering makes that permutation a concatenation of a
  few hundred long contiguous **runs**, executed as static slice copies at
  HBM bandwidth; unstructured codes fall back to a row gather.

All index arrays are built in numpy from :class:`TannerGraph` once.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..codes.graph import TannerGraph


@dataclasses.dataclass(frozen=True)
class GroupSpec:
    """A contiguous block of the decode edge layout for one node degree.

    Block rows [offset, offset + degree*num_nodes) hold plane j at
    [offset + j*num_nodes, offset + (j+1)*num_nodes): the j-th message slot
    of every node in the group.
    """

    degree: int
    offset: int
    num_nodes: int
    node_ids: jnp.ndarray  # [num_nodes] int32 original node indices


@dataclasses.dataclass(frozen=True)
class PermutationPlan:
    """dst[i] = src[perm[i]] decomposed into maximal contiguous runs."""

    perm: jnp.ndarray  # [n] int32 (fallback row gather)
    run_dst: np.ndarray  # [k] int64 start in dst
    run_src: np.ndarray  # [k] int64 start in src
    run_len: np.ndarray  # [k] int64
    use_runs: bool

    @classmethod
    def from_permutation(cls, perm: np.ndarray, max_runs_fraction: float = 0.25):
        perm = np.asarray(perm, dtype=np.int64)
        n = perm.size
        breaks = np.nonzero(np.diff(perm) != 1)[0]
        starts = np.concatenate([[0], breaks + 1])
        lengths = np.diff(np.concatenate([starts, [n]]))
        use_runs = starts.size <= max(128, int(max_runs_fraction * n))
        return cls(
            perm=jnp.asarray(perm.astype(np.int32)),
            run_dst=starts,
            run_src=perm[starts],
            run_len=lengths,
            use_runs=bool(use_runs),
        )

    @property
    def num_runs(self) -> int:
        return int(self.run_dst.size)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """Return x[perm] along axis 0."""
        if not self.use_runs:
            return jnp.take(x, self.perm, axis=0)
        pieces = [
            x[int(s) : int(s + l)] for s, l in zip(self.run_src, self.run_len)
        ]
        return jnp.concatenate(pieces, axis=0)


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

    # Layout moves (gather-free when run-structured):
    #   vn_view = to_vn.apply(cn_view); cn_view = to_cn.apply(vn_view)
    to_vn: PermutationPlan
    to_cn: PermutationPlan

    # Channel-value gather: variable node of each CN-layout edge (seeds the
    # check-node inboxes with channel values, kernels_template.cl:13-30).
    cn_edge_var: jnp.ndarray  # [n_edges] int32
    # Inverse node permutation to assemble outputs in natural variable order.
    vn_node_unperm: jnp.ndarray  # [n_vars] int32

    # Run-decomposed row-move plans (row gathers lower to slow scalar loops
    # on TPU; for structured codes these are a few hundred slice copies):
    #   seed_plan:       ch[n_vars] -> cn_view[n_edges] channel seeding
    #   vn_gather_plan:  ch[n_vars] -> per-VN-group node values (group order)
    #   vn_unperm_plan:  group-order node outputs -> natural variable order
    seed_plan: PermutationPlan
    vn_gather_plan: PermutationPlan
    vn_unperm_plan: PermutationPlan

    @classmethod
    def from_graph(
        cls,
        g: TannerGraph,
        cn_node_key: np.ndarray | None = None,
        vn_node_key: np.ndarray | None = None,
    ) -> "DecodeLayout":
        """Build the decode layout.

        ``cn_node_key`` / ``vn_node_key`` optionally reorder nodes *within*
        each degree group (ascending key). Structured codes supply keys that
        make the CN<->VN permutation decompose into long runs (e.g. the
        class-major ordering of codes/dvbs2.dvbs2_layout_node_keys); outputs
        are always returned in natural variable order regardless.
        """
        # Decode layouts: per degree group, slot-major planes, nodes ordered
        # by the optional key.
        def reorder(groups, key):
            if key is None:
                return groups
            key = np.asarray(key)
            out = []
            for grp in groups:
                order = np.argsort(key[grp.node_ids], kind="stable")
                out.append(
                    dataclasses.replace(
                        grp,
                        node_ids=grp.node_ids[order],
                        edge_slots=grp.edge_slots[order],
                    )
                )
            return tuple(out)

        cn_groups_g = reorder(g.cn_groups, cn_node_key)
        vn_groups_g = reorder(g.vn_groups, vn_node_key)

        def slots_slot_major(groups):
            return np.concatenate(
                [grp.edge_slots.T.ravel() for grp in groups]  # [d, n] planes
            )

        cn_slots = slots_slot_major(cn_groups_g)
        vn_slots = slots_slot_major(vn_groups_g)
        cn_pos = np.empty(g.n_edges, dtype=np.int64)
        cn_pos[cn_slots] = np.arange(g.n_edges)
        vn_pos = np.empty(g.n_edges, dtype=np.int64)
        vn_pos[vn_slots] = np.arange(g.n_edges)

        # vn_view[i] = cn_view[cn_pos_of_vn_edge[i]] and vice versa.
        cn_pos_of_vn_edge = cn_pos[g.cn_slot_of_vn_edge[vn_slots]]
        vn_pos_of_cn_edge = vn_pos[g.vn_slot_of_cn_edge[cn_slots]]

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

        node_order = np.concatenate([np.asarray(grp.node_ids) for grp in vn_groups_g])
        vn_node_unperm = np.empty(g.n_vars, dtype=np.int32)
        vn_node_unperm[node_order] = np.arange(g.n_vars, dtype=np.int32)
        cn_edge_var = g.cn_edge_var[cn_slots].astype(np.int64)

        return cls(
            n_vars=g.n_vars,
            n_checks=g.n_checks,
            n_edges=g.n_edges,
            d_c_max=g.d_c_max,
            d_v_max=g.d_v_max,
            data_len=g.data_len,
            code_rate=g.code_rate,
            cn_groups=specs(cn_groups_g),
            vn_groups=specs(vn_groups_g),
            to_vn=PermutationPlan.from_permutation(cn_pos_of_vn_edge),
            to_cn=PermutationPlan.from_permutation(vn_pos_of_cn_edge),
            cn_edge_var=jnp.asarray(cn_edge_var.astype(np.int32)),
            vn_node_unperm=jnp.asarray(vn_node_unperm),
            seed_plan=PermutationPlan.from_permutation(cn_edge_var),
            vn_gather_plan=PermutationPlan.from_permutation(node_order),
            vn_unperm_plan=PermutationPlan.from_permutation(
                vn_node_unperm.astype(np.int64)
            ),
        )
