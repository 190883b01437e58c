"""HBM-resident fused Pallas kernel for the discrete IB LUT decoder.

For codes whose two [n_edges, batch_tile] message views exceed VMEM — the
DVB-S2 N=64800 code's 226,799-edge views are ~116 MB each at a 128-lane tile
— the all-VMEM kernel (:mod:`.ib_lut_fused`) cannot apply. This kernel keeps
both views in HBM and streams node-group chunks through VMEM with explicit
DMAs:

- each (group, chunk) stages its ``d`` contiguous message planes HBM->VMEM,
  runs the same packed-LUT leave-one-out fold as the all-VMEM kernel, and
  scatters its outputs back into the *opposite* HBM view (route-on-write);
- the syndrome is folded into the CN pass (it reads exactly the planes the
  CN update stages), so one iteration costs the HBM-traffic minimum of
  read+write of each view once per half-iteration;
- channel values and decision outputs also live in HBM: the caller (XLA)
  pre-applies ``seed_plan``/``vn_gather_plan`` and post-applies
  ``vn_unperm_plan``, so the kernel only ever touches contiguous slices.

The DMA program is TABLE-DRIVEN, not unrolled (round-3 verdict #1: the
fully-unrolled ~1,864-DMA-per-iteration program put Mosaic's compile time
at ~1 hour for DVB-S2). Every loop in the kernel is a ``lax.fori_loop``
whose DMA descriptors come from int32 tables in SMEM:

- the chunk loop is dynamic: all chunks of a group share one static length
  (``stride``), the last chunk reads/folds garbage past the group end
  (inputs and views carry ``stride`` rows of padding; the syndrome masks the
  tail; scatter tables never reference padded rows);
- routed writes are decomposed into power-of-two-length *pieces* so DMA
  sizes are static (Mosaic requires static slice sizes): a run of length
  ``l`` with ``p = 2^floor(log2 l)`` becomes the piece at ``[0, p)`` plus —
  when ``l > p`` — an overlapping piece at ``[l-p, l)``. The two pieces copy
  identical bytes where they overlap (same src/dst alignment), so the
  overlap is benign and every run costs at most TWO descriptors; per group
  only the piece lengths that actually occur are compiled in, so the whole
  scatter program is O(groups x distinct-lengths) instead of O(runs).

Reference semantics are identical to decode/ib_lut.py (which mirrors
Discrete_LDPC_decoding/discrete_LDPC_decoder.py:202-295 and
kernels_template{,_irreg}.cl): iteration-0 CN tables, the in-loop
``iteration+1`` CN matching offset, batch-lockstep early exit at batch-tile
granularity. With ``early_exit=False`` it is bit-exact vs the XLA path.

Requirements: the CN<->VN routing must run-decompose into unit-stride runs
(quasi-cyclic / q-group structured codes; DVB-S2 routes in ~735 runs of mean
length ~308). Unlike the all-VMEM kernel, the seed/gather/unperm plans may
contain strided runs or block transposes — XLA applies them outside.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..construct.trellis import TrellisTables
from ..decode.common import DecodeResult
from ..decode.graph_arrays import DecodeLayout
from ..ops.lut_fold import (
    PackedLut,
    cn_lut_leave_one_out,
    vector_lookup_words,
    vn_lut_full_fold,
    vn_lut_leave_one_out,
    words_per_column,
)
from .ib_lut_fused import (
    _PackedTables,
    _chunk_bounds,
    _fold_bytes_per_node,
    _scatter_runs,
)

# Per-(group, chunk) VMEM working-set budget for the fold. With the views in
# HBM most of VMEM is available; bigger chunks mean fewer, longer DMAs.
# 32 MB (down from round-4's 48) leaves room for the VMEM-resident channel
# plane (~33 MB at DVB-S2 scale) under the 120 MB scoped limit; the replay
# probe showed chunk-loop overhead is negligible at these chunk counts.
HBM_GROUP_VMEM_BUDGET = 32 * 1024 * 1024

# Performance isolation knob (scripts/hbm_isolate.py): comma list in
# $HBM_DISABLE of {'scatter', 'fold', 'decision', 'i0'} builds a
# semantically WRONG kernel with that stage stubbed out, to attribute
# per-call time on hardware. Measure with SCALAR readback only
# (scripts/hbm_scalar_timing.py): fetching the full [n_vars, batch] outputs
# through the tunneled chip costs ~0.8 s of fluctuating transfer time that
# round 4 misread as kernel cost ("21 ms/iter"); the true round-5 numbers
# are ~28 ms fixed + ~3.4 ms/iter (DVB-S2, batch 128).
import os as _os
import sys as _sys

_DISABLE = frozenset(
    filter(None, _os.environ.get("HBM_DISABLE", "").split(","))
)


def _check_disable_ack():
    """A stray $HBM_DISABLE must never silently corrupt library decodes:
    refuse to build the stubbed kernel unless the debug run also sets
    $HBM_DISABLE_ACK=1, and even then warn loudly (round-4 advisor)."""
    if not _DISABLE:
        return
    if _os.environ.get("HBM_DISABLE_ACK") != "1":
        raise RuntimeError(
            f"HBM_DISABLE={','.join(sorted(_DISABLE))} is set: this builds a "
            "semantically WRONG decode kernel (performance isolation only). "
            "Set HBM_DISABLE_ACK=1 to confirm, or unset HBM_DISABLE."
        )
    print(
        f"WARNING: HBM_DISABLE={','.join(sorted(_DISABLE))} — building a "
        "stubbed (WRONG) HBM decode kernel for performance isolation.",
        file=_sys.stderr,
        flush=True,
    )


def _group_chunk_counts(groups, w: int, bt: int, extra_op: int = 0):
    counts = []
    for g in groups:
        per_node = _fold_bytes_per_node(int(g.degree), w, bt, extra_op)
        max_nodes = max(HBM_GROUP_VMEM_BUDGET // per_node, 8)
        counts.append(-(-int(g.num_nodes) // max_nodes))
    return tuple(counts)


def hbm_supported(layout: DecodeLayout) -> bool:
    """Whether the HBM-resident kernel applies: CN<->VN routing must be
    unit-stride runs (the seed/gather/unperm plans are applied by XLA and
    may be anything)."""
    return all(
        p.use_runs and p.all_unit_stride for p in (layout.to_vn, layout.to_cn)
    )


def _pieces(l: int):
    """Overlap-pair power-of-two decomposition of a run length: at most two
    same-length pieces whose overlap bytes are identical on src and dst."""
    p = 1 << (l.bit_length() - 1)
    if p == l:
        return ((0, p),)
    return ((0, p), (l - p, p))


def _piece_tables(scatter, strides):
    """Flatten the per-(group, chunk, plane) scatter runs into loopable
    tables. For each group returns ``(lens, seg, src, dst)``:

    - ``lens``: the static tuple of piece lengths that occur (descending);
    - ``src`` / ``dst``: int32 entry arrays — S_out row / view row of each
      piece, ordered by (chunk, bucket);
    - ``seg``: int32 cumulative offsets, entry range of (chunk c, bucket b)
      is ``[seg[c*len(lens)+b], seg[c*len(lens)+b+1])``.
    """
    out = []
    for chunks, stride in zip(scatter, strides):
        per_chunk = []
        used = set()
        for _, _, planes in chunks:
            buckets: dict[int, list[tuple[int, int]]] = {}
            for j, runs in enumerate(planes):
                for d0, s, l in runs:
                    for off, p in _pieces(int(l)):
                        buckets.setdefault(p, []).append(
                            (j * stride + s + off, d0 + off)
                        )
                        used.add(p)
            per_chunk.append(buckets)
        lens = tuple(sorted(used, reverse=True))
        seg, src, dst = [0], [], []
        for buckets in per_chunk:
            for p in lens:
                for s_, d_ in buckets.get(p, ()):
                    src.append(s_)
                    dst.append(d_)
                seg.append(len(src))
        out.append(
            (
                lens,
                np.asarray(seg, np.int32),
                np.asarray(src, np.int32),
                np.asarray(dst, np.int32),
            )
        )
    return tuple(out)


def chunk_geom(groups, counts):
    """Uniform chunk geometry: (stage_rows, strides, n_chunks_per_group).
    Every chunk of a group covers ``stride`` rows; the true last-chunk
    length only matters for syndrome masks and scatter tables."""
    strides, n_chunk_list = [], []
    best = 0
    for g, c in zip(groups, counts):
        bounds = _chunk_bounds(int(g.num_nodes), c)
        stride = max(cl for _, cl in bounds)
        strides.append(stride)
        n_chunk_list.append(len(bounds))
        best = max(best, stride * int(g.degree))
    return best, tuple(strides), tuple(n_chunk_list)


class HBMFusedIBDecoder:
    """DMA-staged decoder: clusters [n_vars, batch] -> DecodeResult.

    ``batch_tile`` is the per-call batch width (one 128-lane tile by
    default); the batch is padded up to a multiple and tiles run under
    ``lax.map``. ``interpret`` defaults to True off-TPU.
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
        if not hbm_supported(layout):
            raise ValueError(
                "layout CN<->VN routing does not run-decompose into "
                "unit-stride runs; use the XLA path"
            )
        _check_disable_ack()
        self.layout = layout
        self.packed = _PackedTables.from_tables(tables, use_matching=use_matching)
        self.imax = max_iters if max_iters is not None else tables.i_max
        if self.imax > tables.i_max:
            raise ValueError("max_iters exceeds constructed i_max")
        self.early_exit = early_exit
        self.batch_tile = batch_tile
        self.interpret = (
            interpret if interpret is not None else jax.default_backend() != "tpu"
        )
        self._kernel = _build_hbm_kernel(
            layout, self.packed, self.imax, early_exit, batch_tile, self.interpret
        )

    def __call__(self, channel_clusters: jnp.ndarray) -> DecodeResult:
        return self._kernel(channel_clusters)


def _build_hbm_kernel(
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

    W_words = words_per_column(T, fb)
    cn_chunks = _group_chunk_counts(layout.cn_groups, W_words, Bt, extra_op=0)
    vn_chunks = _group_chunk_counts(layout.vn_groups, W_words, Bt, extra_op=1)
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

    cn_stage_rows, cn_strides, cn_nchunks = chunk_geom(layout.cn_groups, cn_chunks)
    vn_stage_rows, vn_strides, vn_nchunks = chunk_geom(layout.vn_groups, vn_chunks)
    # Rounded to sublane multiples so ``buf * stage_rows`` offsets keep the
    # pl.multiple_of alignment hint truthful for the double-buffered halves.
    stage_rows = -(-max(cn_stage_rows, vn_stage_rows) // 8) * 8
    # Stage reads run at full stride: the last chunk of the last plane may
    # read up to stride-1 rows past its group (and past the array end) —
    # inputs and views carry this much row padding.
    pad_e = max(cn_strides + vn_strides)
    pad_v = max(vn_strides)
    # VMEM-resident channel plane (round-4 re-staged it from HBM every
    # iteration, ~33 MB/iter of traffic at DVB-S2 scale).
    chv_all_rows = -(-(n_vars + pad_v) // 8) * 8

    cn_tables = _piece_tables(cn_scatter, cn_strides)
    vn_tables = _piece_tables(vn_scatter, vn_strides)

    has_match = pt.match_cn is not None
    has_cn_i0_rest = pt.cn_i0_rest is not None
    has_vn_rest = pt.vn_rest is not None

    def plut(words_val, t1):
        return PackedLut(words=words_val, t1=t1, fb=fb)

    def kernel(*refs):
        it = iter(refs)
        # SMEM scatter tables first (one (seg, src, dst) triple per group).
        cn_tab_refs = [(next(it), next(it), next(it)) for _ in cn_groups]
        vn_tab_refs = [(next(it), next(it), next(it)) for _ in vn_groups]
        seeded_ref = next(it)  # [n_edges+pad_e, Bt] ANY: initial CN view
        chg_ref = next(it)  # [n_vars+pad_v, Bt] ANY: group-ordered channel
        # (copied ONCE into the VMEM-resident CHV plane below; round-4
        # re-staged it from HBM every iteration, ~33 MB/iter of traffic)
        cn_i0_first_ref = next(it)
        cn_i0_rest_ref = next(it) if has_cn_i0_rest else None
        cn_rest_ref = next(it)
        vn_first_ref = next(it)
        vn_rest_ref = next(it) if has_vn_rest else None
        match_cn_ref = next(it) if has_match else None
        match_vn_ref = next(it) if has_match else None
        out_ref = next(it)  # [n_vars+pad_v, Bt] ANY: group-ordered decisions
        unsat_ref, iters_ref = next(it), next(it)
        A, B = next(it), next(it)  # [n_edges+pad_e, Bt] ANY views
        S_in, S_out, CHV_ALL = next(it), next(it), next(it)
        sem_st, sem_sc = next(it), next(it)

        # --- Channel plane: copy group-ordered channel values into VMEM
        # once; every VN fold and the decision pass read it locally.
        chv_fill = pltpu.make_async_copy(
            chg_ref.at[pl.ds(0, n_vars + pad_v)],
            CHV_ALL.at[pl.ds(0, n_vars + pad_v)],
            sem_st.at[0],
        )
        chv_fill.start()
        chv_fill.wait()

        # --- Software-pipelined chunk machinery (double-buffered) --------
        # Chunk c uses buffer half ``buf = c & 1`` of S_in / S_out.
        # Per body(c): start stage(c+1) -> wait stage(c) -> wait
        # scatter(c-2) (frees S_out[buf]) -> fold -> start scatter(c).
        # Stage waves are tracked on sem_st[buf], scatter waves on
        # sem_sc[buf]; same-slot waves never interleave (stage(c+2) starts
        # only after stage(c) was waited in the previous body), so the
        # byte-counting waits are exact.

        def hinted(offset, stride):
            return pl.multiple_of(offset, 8) if stride % 8 == 0 else offset

        def stage_dmas(view, off_, n, d, stride, c, buf, chv_off=None):
            c0 = c * stride
            dmas = [
                pltpu.make_async_copy(
                    view.at[pl.ds(off_ + j * n + c0, stride)],
                    S_in.at[
                        pl.ds(hinted(buf * stage_rows + j * stride, stride), stride)
                    ],
                    sem_st.at[buf],
                )
                for j in range(d)
            ]
            return dmas

        def read_planes(d, stride, buf):
            return [
                S_in[
                    pl.ds(hinted(buf * stage_rows + j * stride, stride), stride)
                ]
                for j in range(d)
            ]

        def scatter_piece(view, tabs, k, L, buf):
            _, _, src_ref, dst_ref = tabs
            return pltpu.make_async_copy(
                S_out.at[pl.ds(src_ref[k] + buf * stage_rows, L)],
                view.at[pl.ds(dst_ref[k], L)],
                sem_sc.at[buf],
            )

        def scatter_walk(view, tabs, c, buf, action):
            if "scatter" in _DISABLE:
                return
            lens, seg_ref, _, _ = tabs
            nb = len(lens)
            base = c * nb
            for bi, L in enumerate(lens):

                def body(k, _, L=L):
                    m = scatter_piece(view, tabs, k, L, buf)
                    (m.start if action == "start" else m.wait)()
                    return 0

                jax.lax.fori_loop(
                    seg_ref[base + bi], seg_ref[base + bi + 1], body, 0
                )

        def pipelined_group(
            view_in, view_out, tabs, off_, n, d, stride, n_chunks,
            fold_chunk, carry0, chv_off=None,
        ):
            """Run fold_chunk(planes, chv, c, acc) over all chunks with
            stage/scatter DMAs double-buffered around it."""

            def start_stage(c, buf):
                for m in stage_dmas(view_in, off_, n, d, stride, c, buf, chv_off):
                    m.start()

            def wait_stage(c, buf):
                for m in stage_dmas(view_in, off_, n, d, stride, c, buf, chv_off):
                    m.wait()

            start_stage(0, 0)

            def body(c, acc):
                buf = c & 1
                if n_chunks > 1:

                    @pl.when(c + 1 < n_chunks)
                    def _():
                        start_stage(c + 1, buf ^ 1)

                wait_stage(c, buf)
                if n_chunks > 2:

                    @pl.when(c >= 2)
                    def _():
                        scatter_walk(view_out, tabs, c - 2, buf, "wait")

                planes = read_planes(d, stride, buf)
                chv = (
                    CHV_ALL[pl.ds(chv_off + c * stride, stride)]
                    if chv_off is not None
                    else None
                )
                outp, acc = fold_chunk(planes, chv, c, acc)
                for j, p in enumerate(outp):
                    S_out[
                        pl.ds(
                            hinted(buf * stage_rows + j * stride, stride),
                            stride,
                        )
                    ] = p
                scatter_walk(view_out, tabs, c, buf, "start")
                return acc

            acc = jax.lax.fori_loop(0, n_chunks, body, carry0)
            for c in (n_chunks - 2, n_chunks - 1):
                if c >= 0:
                    scatter_walk(view_out, tabs, c, c & 1, "wait")
            return acc

        def cn_pass(src_view, luts_for, match_row_for, want_syndrome):
            unsat = jnp.zeros((Bt,), jnp.int32) if want_syndrome else None
            for gi, (off_, n, d) in enumerate(cn_groups):
                stride = cn_strides[gi]
                n_chunks = cn_nchunks[gi]
                tabs = (cn_tables[gi][0],) + cn_tab_refs[gi]
                luts = luts_for(d)
                row = match_row_for(d) if has_match else None

                def fold_chunk(planes, _chv, c, acc):
                    if want_syndrome:
                        parity = (planes[0] < thresh).astype(jnp.int32)
                        for j in range(1, d):
                            parity = parity ^ (planes[j] < thresh).astype(
                                jnp.int32
                            )
                        valid = (
                            jax.lax.broadcasted_iota(
                                jnp.int32, (stride, Bt), 0
                            )
                            < n - c * stride
                        )
                        acc = acc + jnp.sum(
                            jnp.where(valid, parity, 0), axis=0,
                            dtype=jnp.int32,
                        )
                    if "fold" in _DISABLE:
                        return list(planes), acc
                    outp = cn_lut_leave_one_out(planes, luts, vmax=T)
                    if has_match:
                        outp = [
                            vector_lookup_words(row, p, fb) for p in outp
                        ]
                    return outp, acc

                carry0 = unsat if want_syndrome else jnp.int32(0)
                carry = pipelined_group(
                    src_view, B, tabs, off_, n, d, stride, n_chunks,
                    fold_chunk, carry0,
                )
                if want_syndrome:
                    unsat = carry
            return unsat

        # --- Iteration-0 CN update from the seeded view.
        if "i0" not in _DISABLE:
            i0_first = cn_i0_first_ref[:]
            cn_pass(
                seeded_ref,
                lambda d: [plut(i0_first, pt.t_channel)]
                + [plut(cn_i0_rest_ref[l], pt.t_channel) for l in range(d - 3)],
                (lambda d: match_cn_ref[0, d - 1]) if has_match else None,
                want_syndrome=False,
            )

        def vn_pass(vn_first_i, vn_rest_i, match_vn_i):
            for gi, (off_, n, d) in enumerate(vn_groups):
                stride = vn_strides[gi]
                n_chunks = vn_nchunks[gi]
                goff = vn_node_offsets[gi]
                tabs = (vn_tables[gi][0],) + vn_tab_refs[gi]
                first = plut(vn_first_i, T)
                rests = [
                    plut(vn_rest_i[l], T) for l in range(max(d - 2, 0))
                ]
                row = (
                    match_vn_i[d - 1] if (has_match and d > 1) else None
                )

                def fold_chunk(planes, chv, c, acc):
                    if "fold" in _DISABLE:
                        return list(planes), acc
                    outp = vn_lut_leave_one_out(
                        chv, planes, first, rests, vmax=T
                    )
                    if row is not None:
                        outp = [
                            vector_lookup_words(row, p, fb) for p in outp
                        ]
                    return outp, acc

                pipelined_group(
                    B, A, tabs, off_, n, d, stride, n_chunks,
                    fold_chunk, jnp.int32(0), chv_off=goff,
                )

        def loop_body(i, want_syndrome: bool):
            # VN update with iteration-i tables, routed into the CN view A.
            vn_pass(
                vn_first_ref[i],
                vn_rest_ref[i] if has_vn_rest else None,
                match_vn_ref[i] if has_match else None,
            )
            # CN update at DE iteration i+1 (kernel's iteration+1 offset,
            # kernels_template.cl:199-200); syndrome folded into the same
            # staged reads (computed on the routed VN->CN messages, matching
            # kernels_template.cl:292 / decode/ib_lut.py's in-body order).
            cn_rest_i = cn_rest_ref[i]
            unsat = cn_pass(
                A,
                lambda d: [plut(cn_rest_i[l], T) for l in range(d - 2)],
                (lambda d: match_cn_ref[i + 1, d - 1]) if has_match else None,
                want_syndrome=want_syndrome,
            )
            return unsat if want_syndrome else jnp.ones((Bt,), jnp.int32)

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

        # --- Decision mapping with iteration-``iters`` VN tables. Decision
        # writes run at full stride, so a group's last chunk may spill up to
        # stride-1 rows into the next group's range: groups run in layout
        # order and every write is waited before the next starts, so later
        # (correct) rows overwrite earlier spill; out_ref is padded past the
        # final group.
        dec_first = vn_first_ref[iters]
        dec_rest = vn_rest_ref[iters] if has_vn_rest else None
        for gi, (off_, n, d) in enumerate(vn_groups):
            stride = vn_strides[gi]
            n_chunks = vn_nchunks[gi]
            goff = vn_node_offsets[gi]
            first = plut(dec_first, T)
            rests = [plut(dec_rest[l], T) for l in range(max(d - 1, 0))]

            def dec_body(c, _):
                for m in stage_dmas(B, off_, n, d, stride, c, 0, chv_off=goff):
                    m.start()
                for m in stage_dmas(B, off_, n, d, stride, c, 0, chv_off=goff):
                    m.wait()
                planes = read_planes(d, stride, 0)
                if "decision" in _DISABLE:
                    dec = planes[0]
                else:
                    dec = vn_lut_full_fold(
                        CHV_ALL[pl.ds(goff + c * stride, stride)],
                        planes, first, rests, vmax=T,
                    )
                S_out[0 : dec.shape[0]] = dec
                # Full-stride write; a group's last chunk may spill into the
                # next group's rows, overwritten by that (later) group —
                # waited immediately so the overlapping writes are ordered.
                out_dma = pltpu.make_async_copy(
                    S_out.at[pl.ds(0, stride)],
                    out_ref.at[pl.ds(c * stride + goff, stride)],
                    sem_sc.at[0],
                )
                out_dma.start()
                out_dma.wait()
                return 0

            jax.lax.fori_loop(0, n_chunks, dec_body, 0)
        unsat_ref[0, :] = unsat
        iters_ref[0, :] = jnp.full((Bt,), iters, jnp.int32)

    # ---- pallas_call plumbing ------------------------------------------
    smem_arrays = []
    for _, seg, src, dst in cn_tables + vn_tables:
        smem_arrays.extend(
            [jnp.asarray(seg), jnp.asarray(src), jnp.asarray(dst)]
        )

    table_arrays = [pt.cn_i0_first]
    if has_cn_i0_rest:
        table_arrays.append(pt.cn_i0_rest)
    table_arrays.append(pt.cn_rest)
    table_arrays.append(pt.vn_first)
    if has_vn_rest:
        table_arrays.append(pt.vn_rest)
    if has_match:
        table_arrays.extend([pt.match_cn, pt.match_vn])

    ANY = pl.ANY
    VMEM = pltpu.MemorySpace.VMEM
    SMEM = pltpu.MemorySpace.SMEM

    single = pl.pallas_call(
        kernel,
        grid=(),
        out_shape=(
            jax.ShapeDtypeStruct((n_vars + pad_v, Bt), jnp.int32),  # out
            jax.ShapeDtypeStruct((1, Bt), jnp.int32),  # unsat
            jax.ShapeDtypeStruct((1, Bt), jnp.int32),  # iters
            jax.ShapeDtypeStruct((n_edges + pad_e, Bt), jnp.int32),  # A view
            jax.ShapeDtypeStruct((n_edges + pad_e, Bt), jnp.int32),  # B view
        ),
        in_specs=[pl.BlockSpec(memory_space=SMEM)] * len(smem_arrays)
        + [pl.BlockSpec(memory_space=ANY)] * 2
        + [pl.BlockSpec(memory_space=VMEM)] * len(table_arrays),
        out_specs=(
            pl.BlockSpec(memory_space=ANY),
            pl.BlockSpec(memory_space=VMEM),
            pl.BlockSpec(memory_space=VMEM),
            pl.BlockSpec(memory_space=ANY),
            pl.BlockSpec(memory_space=ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * stage_rows, Bt), jnp.int32),  # S_in (2 halves)
            pltpu.VMEM((2 * stage_rows, Bt), jnp.int32),  # S_out (2 halves)
            pltpu.VMEM((chv_all_rows, Bt), jnp.int32),  # CHV_ALL (resident)
            pltpu.SemaphoreType.DMA((2,)),  # stage waves, per buffer half
            pltpu.SemaphoreType.DMA((2,)),  # scatter waves, per buffer half
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    def one_tile(ch_tile):
        seeded = jnp.pad(layout.seed_plan.apply(ch_tile), ((0, pad_e), (0, 0)))
        chg = jnp.pad(layout.vn_gather_plan.apply(ch_tile), ((0, pad_v), (0, 0)))
        out_nodes, unsat, iters, _, _ = single(
            *smem_arrays, seeded, chg, *table_arrays
        )
        outputs = layout.vn_unperm_plan.apply(out_nodes[:n_vars])
        return outputs, unsat, iters

    def run(channel_clusters):
        batch = channel_clusters.shape[-1]
        pad = (-batch) % Bt
        ch = channel_clusters.astype(jnp.int32)
        if pad:
            ch = jnp.pad(ch, ((0, 0), (0, pad)))
        padded = ch.shape[-1]
        n_tiles = padded // Bt
        if n_tiles == 1:
            out, unsat, iters = one_tile(ch)
        else:
            tiles = ch.reshape(n_vars, n_tiles, Bt).transpose(1, 0, 2)
            out_t, unsat_t, iters_t = jax.lax.map(one_tile, tiles)
            out = out_t.transpose(1, 0, 2).reshape(n_vars, padded)
            unsat = unsat_t.transpose(1, 0, 2).reshape(1, padded)
            iters = iters_t.transpose(1, 0, 2).reshape(1, padded)
        out = out[:, :batch]
        unsat = unsat[0, :batch]
        # Per-tile exit iterations -> batch mean (see DecodeResult notes).
        iters = jnp.mean(iters[0, :batch].astype(jnp.float32))
        return DecodeResult(outputs=out, iterations=iters, unsatisfied=unsat)

    return jax.jit(run)
