"""Fused Pallas TPU kernel for the discrete IB lookup-table decoder.

The XLA path (decode/ib_lut.py) launches the per-iteration node updates and
message routing as separate fused computations; both [n_edges, batch] message
views round-trip HBM every iteration (~300 MB/iter for the WLAN code at
batch 2048). This kernel instead keeps *both* message views resident in VMEM
for the entire decode: the grid walks batch tiles, and each program seeds the
check-node view from its channel-cluster tile, then runs the full
message-passing loop (VN fold -> route -> syndrome -> CN fold -> route) with
only VPU work — no HBM traffic until the decision outputs are written.

Reference semantics reproduced (same contract as decode/ib_lut.py, which
mirrors Discrete_LDPC_decoding/discrete_LDPC_decoder.py:202-295 and
kernels_template{,_irreg}.cl): iteration-0 CN tables, the in-loop
``iteration+1`` CN matching offset, batch-lockstep early exit — here at
batch-*tile* granularity (each grid program exits independently; the XLA
path's whole-batch lockstep is a special case with one tile). With
``early_exit=False`` the fused and XLA paths are bit-exact.

Design notes:
- All pairwise trellis LUTs are pre-packed on the host into int32 words
  (8 four-bit fields per word for |T|<=16) — in-kernel lookups are VPU
  compare-select + shift/mask, never gathers (ops/lut_fold.py docstring).
- Message routing uses the layout's run-decomposed permutations as unrolled
  static VMEM slice copies (structured codes: a few hundred runs). Codes
  whose permutations don't run-decompose fall back to the XLA path.
- Early exit is a ``lax.while_loop`` whose body mutates the two VMEM scratch
  views in place; the carry holds only (iteration, unsatisfied-per-codeword).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..construct.trellis import TrellisTables
from ..decode.common import DecodeResult
from ..decode.graph_arrays import DecodeLayout, PermutationPlan
from ..ops.lut_fold import (
    PackedLut,
    _field_bits,
    cn_lut_leave_one_out,
    pack_lut_batch,
    vector_lookup_words,
    vn_lut_full_fold,
    vn_lut_leave_one_out,
    words_per_column,
)

# An unrolled VMEM copy per run: keep the op count (and Mosaic compile time)
# bounded. Codes above this fall back to the XLA path.
MAX_TOTAL_RUNS = 4096


def _runs(plan: PermutationPlan) -> tuple[tuple[int, int, int], ...]:
    """(dst, src, len) triples of a permutation plan, as static ints."""
    return tuple(
        (int(d), int(s), int(l))
        for d, s, l in zip(plan.run_dst, plan.run_src, plan.run_len)
    )


def _scatter_runs(plan: PermutationPlan, groups, chunks_per_group=None):
    """Per-(group, chunk, plane) routed-write decomposition of
    ``dst = src[perm]``.

    Returns, for each group, a tuple of node-chunks; each chunk carries
    ``(start, size)`` plus per-plane static ``(dst_start, src_start_in_chunk,
    len)`` runs such that writing ``dst[d:d+l] = chunk_plane[s:s+l]`` routes
    the chunk's slice of the plane through the permutation. Node updates
    write their outputs straight into the opposite view (route-on-write), and
    chunking bounds the per-group VMEM working set (the N=8000 code's node
    planes otherwise spill hundreds of MB of vector registers).
    """
    perm = np.asarray(plan.perm, dtype=np.int64)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    out = []
    for gi, g in enumerate(groups):
        n = int(g.num_nodes)
        n_chunks = 1 if chunks_per_group is None else int(chunks_per_group[gi])
        bounds = _chunk_bounds(n, n_chunks)
        chunks = []
        for c0, cl in bounds:
            planes = []
            for j in range(int(g.degree)):
                r0 = int(g.offset) + j * n + c0
                seg = inv[r0 : r0 + cl]
                breaks = np.nonzero(np.diff(seg) != 1)[0]
                starts = np.concatenate([[0], breaks + 1]).astype(np.int64)
                lens = np.diff(np.concatenate([starts, [cl]]))
                planes.append(
                    tuple(
                        (int(seg[s]), int(s), int(l))
                        for s, l in zip(starts, lens)
                    )
                )
            chunks.append((c0, cl, tuple(planes)))
        out.append(tuple(chunks))
    return tuple(out)


def _chunk_bounds(n: int, n_chunks: int) -> list[tuple[int, int]]:
    """Split n rows into n_chunks pieces, all but the last a multiple of 8."""
    if n_chunks <= 1:
        return [(0, n)]
    base = -(-n // n_chunks)
    base = -(-base // 8) * 8
    bounds = []
    c0 = 0
    while c0 < n:
        cl = min(base, n - c0)
        bounds.append((c0, cl))
        c0 += cl
    return bounds


# Per-group VMEM working-set budget for the fold (column caches + chain
# states); groups larger than this stream through node chunks. Mosaic's
# real stack allocation runs ~1.6x the model, so keep this modest.
GROUP_VMEM_BUDGET = 10 * 1024 * 1024


def _fold_bytes_per_node(degree: int, w: int, bt: int, extra_op: int = 0) -> int:
    d = degree + extra_op
    lanes = max(bt, 128)  # lane dim pads to 128 regardless of tile width
    return (2 * d * w + 2 * d + 4) * lanes * 4


def _group_chunk_counts(groups, w: int, bt: int, extra_op: int = 0):
    counts = []
    for g in groups:
        per_node = _fold_bytes_per_node(int(g.degree), w, bt, extra_op)
        max_nodes = max(GROUP_VMEM_BUDGET // per_node, 8)
        counts.append(-(-int(g.num_nodes) // max_nodes))
    return tuple(counts)


@dataclasses.dataclass(frozen=True)
class _PackedTables:
    """All trellis tables pre-packed into int32 words (see pack_lut_batch)."""

    fb: int
    t_channel: int
    t_decoder: int
    i_max: int
    cn_i0_first: jnp.ndarray  # [Wch, Tch]
    cn_i0_rest: jnp.ndarray | None  # [d_c_max-3, W, Tch]
    cn_rest: jnp.ndarray  # [i_max-1, d_c_max-2, W, T]
    vn_first: jnp.ndarray  # [i_max, Wch, T]
    vn_rest: jnp.ndarray | None  # [i_max, d_v_max-1, W, T]
    match_cn: jnp.ndarray | None  # [i_max, d_c_max, W]
    match_vn: jnp.ndarray | None  # [i_max, d_v_max, W]

    @classmethod
    def from_tables(cls, t: TrellisTables, use_matching: bool = True):
        T = t.cardinality_t_decoder
        pk = lambda a: jnp.asarray(pack_lut_batch(np.asarray(a), T))

        def pk_rows(a):  # [..., T] rows -> [..., W] words
            a = np.asarray(a)
            return jnp.asarray(pack_lut_batch(a[..., None], T)[..., 0])

        has_match = use_matching and t.has_matching
        return cls(
            fb=_field_bits(T),
            t_channel=t.cardinality_t_channel,
            t_decoder=T,
            i_max=t.i_max,
            cn_i0_first=pk(t.cn_iter0_first),
            cn_i0_rest=pk(t.cn_iter0_rest) if t.cn_iter0_rest.size else None,
            cn_rest=pk(t.cn_rest),
            vn_first=pk(t.vn_first),
            vn_rest=pk(t.vn_rest) if t.vn_rest.size else None,
            match_cn=pk_rows(t.matching_cn) if has_match else None,
            match_vn=pk_rows(t.matching_vn) if has_match else None,
        )


# Budget for the vmem_estimate model against the 128 MB v5e VMEM (the
# pallas_call requests a 100 MB scoped limit; the model already counts the
# fold working set, so the budget matches that limit).
VMEM_SCRATCH_BUDGET = 100 * 1024 * 1024


def vmem_estimate(layout: DecodeLayout, batch_tile: int, t_decoder: int = 16) -> int:
    """Conservative VMEM footprint model of one grid program (bytes).

    Counts the resident message views + staging scratch (lane dim padded to
    128 — sub-128 tiles do NOT shrink physical VMEM), the I/O blocks, and the
    peak per-group fold working set. Groups stream through node chunks
    bounded by GROUP_VMEM_BUDGET, so the fold term is capped; the views set
    the floor."""
    W = words_per_column(t_decoder, _field_bits(t_decoder))
    plane = max(batch_tile, 128) * 4
    scratch = (2 * (layout.n_edges + layout.n_vars) + 2 * layout.n_vars) * plane
    io = 2 * layout.n_vars * plane
    group_peak = 0
    for grps, extra_op in ((layout.cn_groups, 0), (layout.vn_groups, 1)):
        for g in grps:
            per_node = _fold_bytes_per_node(
                int(g.degree), W, batch_tile, extra_op
            )
            max_nodes = max(GROUP_VMEM_BUDGET // per_node, 8)
            chunk_nodes = min(int(g.num_nodes), max_nodes)
            group_peak = max(group_peak, per_node * chunk_nodes)
    return scratch + io + group_peak


def fused_supported(
    layout: DecodeLayout, batch_tile: int = 128, t_decoder: int = 16
) -> bool:
    """Whether the layout fits the all-resident fused kernel: routing must
    run-decompose tightly enough to unroll, and both message views (plus the
    per-node staging buffers and fold working set) must fit VMEM."""
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
        and vmem_estimate(layout, batch_tile, t_decoder) <= VMEM_SCRATCH_BUDGET
    )


def pick_batch_tile(
    layout: DecodeLayout, t_decoder: int = 16, max_tile: int = 128
) -> int | None:
    """Largest supported batch tile (lane-friendly sizes), or None."""
    for bt in (128, 64, 32, 16, 8):
        if bt <= max_tile and fused_supported(layout, bt, t_decoder):
            return bt
    return None


class FusedIBDecoder:
    """Compiled fused-kernel decoder: clusters [n_vars, batch] -> DecodeResult.

    ``batch_tile`` is the per-grid-program batch width (lane-dim multiple of
    128); batch is padded up to a multiple of it. ``interpret`` defaults to
    True off-TPU (tests run the same kernel through the Pallas interpreter).
    """

    def __init__(
        self,
        layout: DecodeLayout,
        tables: TrellisTables,
        max_iters: int | None = None,
        early_exit: bool = True,
        use_matching: bool = True,
        batch_tile: int = 128,
        interpret: bool | None = None,
    ):
        if not fused_supported(layout, batch_tile, tables.cardinality_t_decoder):
            raise ValueError(
                "layout does not fit the fused kernel (routing does not "
                "run-decompose, or message views exceed VMEM); use the XLA path"
            )
        self.layout = layout
        self.packed = _PackedTables.from_tables(tables, use_matching=use_matching)
        self.imax = max_iters if max_iters is not None else tables.i_max
        if self.imax > tables.i_max:
            raise ValueError("max_iters exceeds constructed i_max")
        self.early_exit = early_exit
        self.batch_tile = batch_tile
        self.interpret = (
            interpret
            if interpret is not None
            else jax.default_backend() != "tpu"
        )
        self._kernel = _build_kernel(
            layout, self.packed, self.imax, early_exit, batch_tile, self.interpret
        )

    def __call__(self, channel_clusters: jnp.ndarray) -> DecodeResult:
        return self._kernel(channel_clusters)


def make_fused_ib_decoder(layout, tables, **kw) -> FusedIBDecoder:
    return FusedIBDecoder(layout, tables, **kw)


def _build_kernel(
    layout: DecodeLayout,
    pt: _PackedTables,
    imax: int,
    early_exit: bool,
    batch_tile: int,
    interpret: bool,
):
    Bt = batch_tile
    T = pt.t_decoder
    fb = pt.fb
    thresh = T // 2
    n_vars, n_edges = layout.n_vars, layout.n_edges

    seed_runs = _runs(layout.seed_plan)
    gather_runs = _runs(layout.vn_gather_plan)
    unperm_runs = _runs(layout.vn_unperm_plan)
    # Route-on-write: CN outputs scatter straight into the VN view and vice
    # versa (per-plane runs of to_vn/to_cn), replacing full-view copies.
    # Node-dimension chunking bounds the per-group fold working set.
    W_words = words_per_column(pt.t_decoder, pt.fb)
    cn_chunks = _group_chunk_counts(layout.cn_groups, W_words, Bt, extra_op=0)
    vn_chunks = _group_chunk_counts(layout.vn_groups, W_words, Bt, extra_op=1)
    cn_scatter = _scatter_runs(layout.to_vn, layout.cn_groups, cn_chunks)
    vn_scatter = _scatter_runs(layout.to_cn, layout.vn_groups, vn_chunks)

    cn_groups = tuple(
        (g.offset, g.num_nodes, g.degree) for g in layout.cn_groups
    )
    vn_groups = tuple(
        (g.offset, g.num_nodes, g.degree) for g in layout.vn_groups
    )
    # Node offsets of each VN group inside the group-ordered node arrays.
    vn_node_offsets = []
    off = 0
    for _, n, _ in vn_groups:
        vn_node_offsets.append(off)
        off += n
    vn_node_offsets = tuple(vn_node_offsets)

    has_match = pt.match_cn is not None
    has_cn_i0_rest = pt.cn_i0_rest is not None
    has_vn_rest = pt.vn_rest is not None

    def plut(words_val, t1):
        return PackedLut(words=words_val, t1=t1, fb=fb)

    def copy_runs(dst_ref, src_ref, runs):
        for d, s, l in runs:
            dst_ref[d : d + l] = src_ref[s : s + l]

    def read_planes(ref, off, n, d, c0=0, cl=None):
        cl = n if cl is None else cl
        return [
            ref[off + j * n + c0 : off + j * n + c0 + cl] for j in range(d)
        ]

    def write_planes_routed(ref, plane_runs, planes):
        for runs, p in zip(plane_runs, planes):
            for d, s, l in runs:
                ref[d : d + l] = p[s : s + l]

    def kernel(*refs):
        it = iter(refs)
        ch_ref = next(it)
        cn_i0_first_ref = next(it)
        cn_i0_rest_ref = next(it) if has_cn_i0_rest else None
        cn_rest_ref = next(it)
        vn_first_ref = next(it)
        vn_rest_ref = next(it) if has_vn_rest else None
        match_cn_ref = next(it) if has_match else None
        match_vn_ref = next(it) if has_match else None
        out_ref, unsat_ref, iters_ref = next(it), next(it), next(it)
        A, B, CHG, OUTS = next(it), next(it), next(it), next(it)

        # --- Seed: CN view gets the channel cluster of each edge's variable
        # (send_channel_values_to_checknode_inbox, kernels_template.cl:13-30);
        # CHG caches group-ordered per-node channel values for the VN folds.
        copy_runs(A, ch_ref, seed_runs)
        copy_runs(CHG, ch_ref, gather_runs)

        # --- Iteration-0 CN update (iteration-0 trellis tables), routed
        # straight into the VN view.
        i0_first = cn_i0_first_ref[:]
        for chunks, (off_, n, d) in zip(cn_scatter, cn_groups):
            luts = [plut(i0_first, pt.t_channel)] + [
                plut(cn_i0_rest_ref[l], pt.t_channel) for l in range(d - 3)
            ]
            for c0, cl, runs in chunks:
                planes = read_planes(A, off_, n, d, c0, cl)
                outp = cn_lut_leave_one_out(planes, luts, vmax=T)
                if has_match:
                    row = match_cn_ref[0, d - 1]
                    outp = [vector_lookup_words(row, p, fb) for p in outp]
                write_planes_routed(B, runs, outp)

        def loop_body(i, want_syndrome: bool):
            # VN update with iteration-i tables, routed into the CN view.
            vn_first_i = vn_first_ref[i]
            vn_rest_i = vn_rest_ref[i] if has_vn_rest else None
            match_vn_i = match_vn_ref[i] if has_match else None
            for chunks, goff, (off_, n, d) in zip(
                vn_scatter, vn_node_offsets, vn_groups
            ):
                for c0, cl, runs in chunks:
                    chv = CHG[goff + c0 : goff + c0 + cl]
                    planes = read_planes(B, off_, n, d, c0, cl)
                    outp = vn_lut_leave_one_out(
                        chv,
                        planes,
                        plut(vn_first_i, T),
                        [plut(vn_rest_i[l], T) for l in range(max(d - 2, 0))],
                        vmax=T,
                    )
                    if has_match and d > 1:
                        row = match_vn_i[d - 1]
                        outp = [vector_lookup_words(row, p, fb) for p in outp]
                    write_planes_routed(A, runs, outp)

            # Syndrome on the routed VN->CN messages (kernels_template.cl:292).
            if want_syndrome:
                unsat = jnp.zeros((Bt,), jnp.int32)
                for off_, n, d in cn_groups:
                    parity = (A[off_ : off_ + n] < thresh).astype(jnp.int32)
                    for j in range(1, d):
                        parity = parity ^ (
                            A[off_ + j * n : off_ + (j + 1) * n] < thresh
                        ).astype(jnp.int32)
                    unsat = unsat + jnp.sum(parity, axis=0, dtype=jnp.int32)
            else:
                unsat = jnp.ones((Bt,), jnp.int32)

            # CN update at DE iteration i+1 (the kernel's iteration+1 offset,
            # kernels_template.cl:199-200), routed into the VN view.
            cn_rest_i = cn_rest_ref[i]
            match_cn_i = match_cn_ref[i + 1] if has_match else None
            for chunks, (off_, n, d) in zip(cn_scatter, cn_groups):
                for c0, cl, runs in chunks:
                    planes = read_planes(A, off_, n, d, c0, cl)
                    outp = cn_lut_leave_one_out(
                        planes,
                        [plut(cn_rest_i[l], T) for l in range(d - 2)],
                        vmax=T,
                    )
                    if has_match:
                        row = match_cn_i[d - 1]
                        outp = [vector_lookup_words(row, p, fb) for p in outp]
                    write_planes_routed(B, runs, outp)
            return unsat

        unsat0 = jnp.ones((Bt,), jnp.int32)
        if imax - 1 <= 0:
            iters, unsat = jnp.int32(0), unsat0
        elif early_exit:

            def cond(c):
                i, unsat = c
                return jnp.logical_and(
                    i < imax - 1, jnp.sum((unsat > 0).astype(jnp.int32)) > 0
                )

            def step(c):
                i, unsat = c
                return i + 1, loop_body(i, want_syndrome=True)

            iters, unsat = jax.lax.while_loop(
                cond, step, (jnp.int32(0), unsat0)
            )
        else:
            # Fixed iterations: the syndrome is only observable after the
            # last in-loop iteration — skip it in all earlier ones.
            jax.lax.fori_loop(
                0,
                imax - 2,
                lambda i, c: (loop_body(i, want_syndrome=False), c)[1],
                0,
            )
            unsat = loop_body(imax - 2, want_syndrome=True)
            iters = jnp.int32(imax - 1)

        # --- Decision mapping with iteration-``iters`` VN tables
        # (calc_varnode_output call, discrete_LDPC_decoder.py:279-288).
        dec_first = vn_first_ref[iters]
        dec_rest = vn_rest_ref[iters] if has_vn_rest else None
        for chunks, goff, (off_, n, d) in zip(
            vn_scatter, vn_node_offsets, vn_groups
        ):
            for c0, cl, _ in chunks:
                chv = CHG[goff + c0 : goff + c0 + cl]
                planes = read_planes(B, off_, n, d, c0, cl)
                OUTS[goff + c0 : goff + c0 + cl] = vn_lut_full_fold(
                    chv,
                    planes,
                    plut(dec_first, T),
                    [plut(dec_rest[l], T) for l in range(max(d - 1, 0))],
                    vmax=T,
                )
        copy_runs(out_ref, OUTS, unperm_runs)
        unsat_ref[0, :] = unsat
        iters_ref[0, :] = jnp.full((Bt,), iters, jnp.int32)

    # ---- pallas_call plumbing -------------------------------------------
    table_arrays = [pt.cn_i0_first]
    if has_cn_i0_rest:
        table_arrays.append(pt.cn_i0_rest)
    table_arrays.append(pt.cn_rest)
    table_arrays.append(pt.vn_first)
    if has_vn_rest:
        table_arrays.append(pt.vn_rest)
    if has_match:
        table_arrays.extend([pt.match_cn, pt.match_vn])

    full = lambda a: pl.BlockSpec(
        a.shape, lambda b: (0,) * a.ndim, memory_space=pltpu.VMEM
    )

    scratch = [
        pltpu.VMEM((n_edges, Bt), jnp.int32),  # A: CN view
        pltpu.VMEM((n_edges, Bt), jnp.int32),  # B: VN view
        pltpu.VMEM((n_vars, Bt), jnp.int32),  # CHG
        pltpu.VMEM((n_vars, Bt), jnp.int32),  # OUTS
    ]
    params = pltpu.CompilerParams(
        # v5e has 128 MB VMEM; the default 16 MB scoped limit is too
        # small for the resident message views plus fold temporaries.
        vmem_limit_bytes=120 * 1024 * 1024,
    )

    def call_tiles(ch):
        """Grid over batch tiles. Mosaic requires lane-dim blocks divisible
        by 128 (or equal to the array width), so Bt < 128 runs as a lax.map
        over Bt-wide chunks (block == array) instead of a Pallas grid."""
        padded = ch.shape[-1]
        out_shape = (
            jax.ShapeDtypeStruct((n_vars, Bt), jnp.int32),
            jax.ShapeDtypeStruct((1, Bt), jnp.int32),
            jax.ShapeDtypeStruct((1, Bt), jnp.int32),
        )
        if Bt % 128 == 0 or interpret:
            grid = (padded // Bt,)
            return pl.pallas_call(
                kernel,
                grid=grid,
                out_shape=(
                    jax.ShapeDtypeStruct((n_vars, padded), jnp.int32),
                    jax.ShapeDtypeStruct((1, padded), jnp.int32),
                    jax.ShapeDtypeStruct((1, padded), jnp.int32),
                ),
                in_specs=[
                    pl.BlockSpec(
                        (n_vars, Bt), lambda b: (0, b), memory_space=pltpu.VMEM
                    )
                ]
                + [full(a) for a in table_arrays],
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
            )(ch, *table_arrays)

        single = pl.pallas_call(
            kernel,
            grid=(1,),
            out_shape=out_shape,
            in_specs=[
                pl.BlockSpec((n_vars, Bt), lambda b: (0, 0), memory_space=pltpu.VMEM)
            ]
            + [full(a) for a in table_arrays],
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
        out_c, unsat_c, it_c = jax.lax.map(
            lambda c: single(c, *table_arrays), chunks
        )
        out = out_c.transpose(1, 0, 2).reshape(n_vars, padded)
        unsat = unsat_c.transpose(1, 0, 2).reshape(1, padded)
        iters = it_c.transpose(1, 0, 2).reshape(1, padded)
        return out, unsat, iters

    def run(channel_clusters):
        batch = channel_clusters.shape[-1]
        pad = (-batch) % Bt
        ch = channel_clusters.astype(jnp.int32)
        if pad:
            ch = jnp.pad(ch, ((0, 0), (0, pad)))
        out, unsat, iters = call_tiles(ch)
        out = out[:, :batch]
        unsat = unsat[0, :batch]
        # Per-codeword iteration counts (each tile stamps its exit iteration
        # on its columns): report the batch mean so the engine's
        # ``mean_iterations`` is a true per-codeword average, not a max over
        # tiles.
        iters = jnp.mean(iters[0, :batch].astype(jnp.float32))
        return DecodeResult(outputs=out, iterations=iters, unsatisfied=unsat)

    return jax.jit(run)
