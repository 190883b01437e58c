"""Fused all-VMEM Pallas kernel for the float (min-sum / BP) decoders.

The XLA float path (decode/float_common.py) materializes every permutation
apply and leave-one-out fold as separate fused computations; for VMEM-scale
codes both [n_edges, batch] float views round-trip HBM every iteration, and
the round-4 bench matrix put wlan_minsum at 0.10 and wlan_bp at 0.24 of
their CN-op bounds. This kernel reuses the all-resident chassis of
:mod:`.ib_lut_fused` — both message views live in VMEM for the entire
decode, routing is unrolled static run copies, node groups stream through
VMEM-bounded chunks — with float32 planes and the continuous node rules:

- CN update: prefix/suffix leave-one-out of min-sum / box-plus over the
  check's inbox (reference kernels_min_and_BP.cl:32-71, :126-167);
- VN update: channel + sum of other messages, clamped to +/-LLR_MAX
  (kernels_min_and_BP.cl:76-123);
- decision: channel + ALL incoming messages, unclamped
  (``calc_varnode_output``, kernels_min_and_BP.cl:170-204).

Loop shape and numerics mirror decode/float_common.py exactly (reference:
Continous_LDPC_Decoding/min_sum_decoder_irreg.py:221-287,
bp_decoder_irreg.py:221-286): the seeded CN view feeds the first CN update
(no peeled iteration), at most ``imax - 1`` bodies run with syndrome early
exit, iterations count bodies executed. With ``early_exit=False`` the fused
and XLA paths are bit-exact (same fold bracketing, same clamp); with early
exit on, exit is at batch-tile granularity like the other fused kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..decode.common import DecodeResult
from ..decode.graph_arrays import DecodeLayout
from ..ops.float_ops import LLR_MAX
from ..ops.float_ops import boxplus as _boxplus
from ..ops.float_ops import minsum_leave_one_out_planes
from .float_hbm import _fold_bytes_per_node_float, _leave_one_out
from .ib_lut_fused import (
    MAX_TOTAL_RUNS,
    VMEM_SCRATCH_BUDGET,
    _chunk_bounds,
    _runs,
    _scatter_runs,
)

# Per-group VMEM working-set budget for the float fold (plane stacks +
# prefix/suffix arrays); groups larger than this stream through node chunks.
FLOAT_FUSED_GROUP_BUDGET = 10 * 1024 * 1024


def _group_chunk_counts_float(groups, bt: int, extra_op: int = 0):
    counts = []
    for g in groups:
        per_node = _fold_bytes_per_node_float(int(g.degree), bt, extra_op)
        max_nodes = max(FLOAT_FUSED_GROUP_BUDGET // per_node, 8)
        counts.append(-(-int(g.num_nodes) // max_nodes))
    return tuple(counts)


def float_vmem_estimate(layout: DecodeLayout, batch_tile: int) -> int:
    """Conservative VMEM footprint of one grid program (bytes): resident
    A/B views + CHG/OUTS + I/O blocks + peak per-chunk fold working set."""
    plane = max(batch_tile, 128) * 4
    scratch = (2 * layout.n_edges + 2 * layout.n_vars) * plane
    io = 2 * layout.n_vars * plane
    group_peak = 0
    for grps, extra_op in ((layout.cn_groups, 0), (layout.vn_groups, 1)):
        for g in grps:
            per_node = _fold_bytes_per_node_float(int(g.degree), batch_tile, extra_op)
            max_nodes = max(FLOAT_FUSED_GROUP_BUDGET // per_node, 8)
            group_peak = max(
                group_peak, per_node * min(int(g.num_nodes), max_nodes)
            )
    return scratch + io + group_peak


def float_fused_supported(layout: DecodeLayout, batch_tile: int = 128) -> bool:
    """Whether the layout fits the all-resident fused float kernel."""
    plans = (
        layout.to_vn,
        layout.to_cn,
        layout.seed_plan,
        layout.vn_gather_plan,
        layout.vn_unperm_plan,
    )
    return (
        all(p.use_runs and p.all_unit_stride for p in plans)
        and sum(p.num_runs for p in plans) <= MAX_TOTAL_RUNS
        and float_vmem_estimate(layout, batch_tile) <= VMEM_SCRATCH_BUDGET
    )


def pick_float_batch_tile(layout: DecodeLayout, max_tile: int = 128) -> int | None:
    for bt in (128, 64, 32, 16, 8):
        if bt <= max_tile and float_fused_supported(layout, bt):
            return bt
    return None


class FusedFloatDecoder:
    """All-VMEM fused float decoder: LLRs [n_vars, batch] -> DecodeResult.

    ``rule`` is 'minsum' or 'bp' (boxplus CN op). Same tiling contract as
    :class:`.ib_lut_fused.FusedIBDecoder`; outputs are posterior LLRs.
    """

    def __init__(
        self,
        layout: DecodeLayout,
        rule: str = "minsum",
        max_iters: int = 50,
        early_exit: bool = True,
        batch_tile: int = 128,
        interpret: bool | None = None,
    ):
        if rule not in ("minsum", "bp"):
            raise ValueError(rule)
        if not float_fused_supported(layout, batch_tile):
            raise ValueError(
                "layout does not fit the fused float kernel (routing does "
                "not run-decompose, or message views exceed VMEM); use the "
                "XLA or HBM path"
            )
        self.layout = layout
        self.rule = rule
        self.imax = int(max_iters)
        self.early_exit = early_exit
        self.batch_tile = batch_tile
        self.interpret = (
            interpret if interpret is not None else jax.default_backend() != "tpu"
        )
        self._kernel = _build_float_fused_kernel(
            layout, rule, self.imax, early_exit, batch_tile, self.interpret
        )

    def __call__(self, channel_llrs: jnp.ndarray) -> DecodeResult:
        return self._kernel(channel_llrs)


def _build_float_fused_kernel(
    layout: DecodeLayout,
    rule: str,
    imax: int,
    early_exit: bool,
    batch_tile: int,
    interpret: bool,
):
    Bt = batch_tile
    n_vars, n_edges = layout.n_vars, layout.n_edges
    # min-sum: min1/min2 + sign-product leave-one-out — bitwise-equal to
    # the pairwise fold at ~1/3 the VPU ops (ops/float_ops); BP keeps the
    # pairwise boxplus prefix/suffix.
    if rule == "minsum":
        cn_fold = minsum_leave_one_out_planes
    else:
        cn_fold = lambda ps: _leave_one_out(_boxplus, ps)  # noqa: E731

    seed_runs = _runs(layout.seed_plan)
    gather_runs = _runs(layout.vn_gather_plan)
    unperm_runs = _runs(layout.vn_unperm_plan)
    cn_chunks = _group_chunk_counts_float(layout.cn_groups, Bt)
    vn_chunks = _group_chunk_counts_float(layout.vn_groups, Bt, extra_op=1)
    cn_scatter = _scatter_runs(layout.to_vn, layout.cn_groups, cn_chunks)
    vn_scatter = _scatter_runs(layout.to_cn, layout.vn_groups, vn_chunks)

    cn_groups = tuple((g.offset, g.num_nodes, g.degree) for g in layout.cn_groups)
    vn_groups = tuple((g.offset, g.num_nodes, g.degree) for g in layout.vn_groups)
    vn_node_offsets = []
    off = 0
    for _, n, _ in vn_groups:
        vn_node_offsets.append(off)
        off += n
    vn_node_offsets = tuple(vn_node_offsets)

    def copy_runs(dst_ref, src_ref, runs):
        for d, s, l in runs:
            dst_ref[d : d + l] = src_ref[s : s + l]

    def read_planes(ref, off_, n, d, c0=0, cl=None):
        cl = n if cl is None else cl
        return [
            ref[off_ + j * n + c0 : off_ + j * n + c0 + cl] for j in range(d)
        ]

    def write_planes_routed(ref, plane_runs, planes):
        for runs, p in zip(plane_runs, planes):
            for d, s, l in runs:
                ref[d : d + l] = p[s : s + l]

    def kernel(ch_ref, out_ref, unsat_ref, iters_ref, A, B, CHG, OUTS):
        # --- Seed: CN view gets each edge's channel LLR
        # (send_channel_values_to_checknode_inbox, kernels_min_and_BP.cl:12);
        # CHG caches group-ordered per-node channel LLRs for the VN folds.
        copy_runs(A, ch_ref, seed_runs)
        copy_runs(CHG, ch_ref, gather_runs)

        def cn_pass():
            for chunks, (off_, n, d) in zip(cn_scatter, cn_groups):
                for c0, cl, runs in chunks:
                    planes = read_planes(A, off_, n, d, c0, cl)
                    write_planes_routed(B, runs, cn_fold(planes))

        def vn_pass():
            for chunks, goff, (off_, n, d) in zip(
                vn_scatter, vn_node_offsets, vn_groups
            ):
                for c0, cl, runs in chunks:
                    chv = CHG[goff + c0 : goff + c0 + cl]
                    planes = read_planes(B, off_, n, d, c0, cl)
                    if d == 1:
                        # Degree-1 passthrough (vn_sum_leave_one_out d==1).
                        outp = [jnp.clip(chv, -LLR_MAX, LLR_MAX)]
                    else:
                        # Same bracketing as vn_sum_leave_one_out:
                        # ch + sequential sum, then subtract-one-out.
                        s = planes[0]
                        for p in planes[1:]:
                            s = s + p
                        total = chv + s
                        outp = [
                            jnp.clip(total - p, -LLR_MAX, LLR_MAX)
                            for p in planes
                        ]
                    write_planes_routed(A, runs, outp)

        def syndrome():
            unsat = jnp.zeros((Bt,), jnp.int32)
            for off_, n, d in cn_groups:
                parity = (A[off_ : off_ + n] < 0.0).astype(jnp.int32)
                for j in range(1, d):
                    parity = parity ^ (
                        A[off_ + j * n : off_ + (j + 1) * n] < 0.0
                    ).astype(jnp.int32)
                unsat = unsat + jnp.sum(parity, axis=0, dtype=jnp.int32)
            return unsat

        def loop_body(_i, want_syndrome: bool):
            cn_pass()
            vn_pass()
            if want_syndrome:
                return syndrome()
            return jnp.ones((Bt,), jnp.int32)

        unsat0 = jnp.ones((Bt,), jnp.int32)
        if imax - 1 <= 0:
            iters = jnp.int32(0)
            # Loop never ran: the XLA path still reports the true syndrome
            # of the seeded view (float_common.py unsat_final) and reads a
            # zero VN view for the decision sums.
            unsat = syndrome()
            for c0 in range(0, n_edges, 4096):
                cl = min(4096, n_edges - c0)
                B[c0 : c0 + cl] = jnp.zeros((cl, Bt), jnp.float32)
        elif early_exit:

            def cond(c):
                i, unsat = c
                return jnp.logical_and(
                    i < imax - 1, jnp.sum((unsat > 0).astype(jnp.int32)) > 0
                )

            def step(c):
                i, _ = c
                return i + 1, loop_body(i, want_syndrome=True)

            iters, unsat = jax.lax.while_loop(cond, step, (jnp.int32(0), unsat0))
        else:
            jax.lax.fori_loop(
                0,
                imax - 2,
                lambda i, c: (loop_body(i, want_syndrome=False), c)[1],
                0,
            )
            unsat = loop_body(imax - 2, want_syndrome=True)
            iters = jnp.int32(imax - 1)

        # --- Decision: channel + sum of ALL incoming messages, no clamp
        # (calc_varnode_output, kernels_min_and_BP.cl:170-204).
        for chunks, goff, (off_, n, d) in zip(
            vn_scatter, vn_node_offsets, vn_groups
        ):
            for c0, cl, _ in chunks:
                chv = CHG[goff + c0 : goff + c0 + cl]
                planes = read_planes(B, off_, n, d, c0, cl)
                s = planes[0]
                for p in planes[1:]:
                    s = s + p
                OUTS[goff + c0 : goff + c0 + cl] = chv + s
        copy_runs(out_ref, OUTS, unperm_runs)
        unsat_ref[0, :] = unsat
        iters_ref[0, :] = jnp.full((Bt,), iters, jnp.int32)

    scratch = [
        pltpu.VMEM((n_edges, Bt), jnp.float32),  # A: CN view
        pltpu.VMEM((n_edges, Bt), jnp.float32),  # B: VN view
        pltpu.VMEM((n_vars, Bt), jnp.float32),  # CHG
        pltpu.VMEM((n_vars, Bt), jnp.float32),  # OUTS
    ]
    params = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)

    def call_tiles(ch):
        """Grid over batch tiles; sub-128 tiles run as lax.map like the IB
        fused kernel (Mosaic lane-dim block constraint)."""
        padded = ch.shape[-1]
        if Bt % 128 == 0 or interpret:
            return pl.pallas_call(
                kernel,
                grid=(padded // Bt,),
                out_shape=(
                    jax.ShapeDtypeStruct((n_vars, padded), jnp.float32),
                    jax.ShapeDtypeStruct((1, padded), jnp.int32),
                    jax.ShapeDtypeStruct((1, padded), jnp.int32),
                ),
                in_specs=[
                    pl.BlockSpec(
                        (n_vars, Bt), lambda b: (0, b), memory_space=pltpu.VMEM
                    )
                ],
                out_specs=(
                    pl.BlockSpec(
                        (n_vars, Bt), lambda b: (0, b), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec((1, Bt), lambda b: (0, b), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, Bt), lambda b: (0, b), memory_space=pltpu.VMEM),
                ),
                scratch_shapes=scratch,
                compiler_params=params,
                interpret=interpret,
            )(ch)

        single = pl.pallas_call(
            kernel,
            grid=(1,),
            out_shape=(
                jax.ShapeDtypeStruct((n_vars, Bt), jnp.float32),
                jax.ShapeDtypeStruct((1, Bt), jnp.int32),
                jax.ShapeDtypeStruct((1, Bt), jnp.int32),
            ),
            in_specs=[
                pl.BlockSpec((n_vars, Bt), lambda b: (0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=(
                pl.BlockSpec((n_vars, Bt), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )
        chunks = ch.reshape(n_vars, padded // Bt, Bt).transpose(1, 0, 2)
        out_c, unsat_c, it_c = jax.lax.map(single, chunks)
        out = out_c.transpose(1, 0, 2).reshape(n_vars, padded)
        unsat = unsat_c.transpose(1, 0, 2).reshape(1, padded)
        iters = it_c.transpose(1, 0, 2).reshape(1, padded)
        return out, unsat, iters

    def run(channel_llrs):
        batch = channel_llrs.shape[-1]
        pad = (-batch) % Bt
        ch = channel_llrs.astype(jnp.float32)
        if pad:
            ch = jnp.pad(ch, ((0, 0), (0, pad)))
        out, unsat, iters = call_tiles(ch)
        out = out[:, :batch]
        unsat = unsat[0, :batch]
        # Per-tile exit iterations -> batch mean (see DecodeResult notes).
        iters = jnp.mean(iters[0, :batch].astype(jnp.float32))
        return DecodeResult(outputs=out, iterations=iters, unsatisfied=unsat)

    return jax.jit(run)
