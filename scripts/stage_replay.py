"""Replay the HBM kernel's EXACT stage program standalone and bisect it.

hbm_isolate.py (round 4) showed the DVB-S2 decode iteration costs ~21 ms
with fold AND scatter disabled — the stage skeleton itself — while every
synthetic stage_probe.py variant (double-buffer, pl.when, dynamic offsets,
unaligned bases) runs the same staged volume at >700 GB/s. This script
rebuilds the stage program from the REAL DecodeLayout geometry (same
groups, strides, chunk counts, plane bases, chv staging, buffer halves,
semaphores) with the fold/scatter removed, and times one variant per run:

  REPLAY=exact      the kernel's stage skeleton verbatim
  REPLAY=nochv      without the VN chv staging DMA
  REPLAY=cn_only    only the CN deg-7 group's pass
  REPLAY=vn_only    only the VN groups' passes
  REPLAY=nosmall    skip the 1-node groups (stride-1 DMAs)
  REPLAY=nowrite    skip the S_out vector copies (pure stage DMAs)
  REPLAY=outviews   stage from a pallas OUTPUT (ANY) buffer aliased to the
                    input, like the real kernel's A/B views
  REPLAY=depth4     same plane addresses, but (chunk, plane) units stream
                    through a depth-4 slot rotation (the BW-probe pattern)
                    instead of whole-chunk start/wait pairs — measures how
                    much of the 717 GB/s the real address pattern can reach

Prints ms per simulated iteration by differencing two in-kernel repeat
counts (dispatch and readback cancel).

CAUTION (round-5 postmortem): the original runs used r1=8 repeats (~20-50 ms
per call), far below the tunnel's dispatch jitter — the "113 GB/s stage
read" and the depth4 "109 GB/s" were noise. scripts/read_bw_probe2.py
(adaptive trip counts, >=0.3 s per measurement) shows the kernel's exact
nested stage pattern reads at ~755 GB/s; the engine-level numbers put the
float HBM kernel at ~420 GB/s effective and the IB HBM kernel fold-bound.
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from informationbottleneckdecodingldpc_tpu.kernels import ib_lut_hbm as KH
from informationbottleneckdecodingldpc_tpu.kernels.ib_lut_fused import (
    _fold_bytes_per_node,
)
from informationbottleneckdecodingldpc_tpu.models import get_model

Bt = 128
W_WORDS = 2  # |T|=16 packed


def build(variant: str, iters: int):
    spec = get_model("dvbs2-64800")
    layout = spec.make_layout()
    cn_chunks = KH._group_chunk_counts(layout.cn_groups, W_WORDS, Bt, extra_op=0)
    vn_chunks = KH._group_chunk_counts(layout.vn_groups, W_WORDS, Bt, extra_op=1)
    cn_groups = tuple((g.offset, g.num_nodes, g.degree) for g in layout.cn_groups)
    vn_groups = tuple((g.offset, g.num_nodes, g.degree) for g in layout.vn_groups)
    vn_node_offsets = []
    off = 0
    for _, n, _ in vn_groups:
        vn_node_offsets.append(off)
        off += n
    vn_node_offsets = tuple(vn_node_offsets)
    cn_stage_rows, cn_strides, cn_nchunks = KH.chunk_geom(layout.cn_groups, cn_chunks)
    vn_stage_rows, vn_strides, vn_nchunks = KH.chunk_geom(layout.vn_groups, vn_chunks)
    stage_rows = -(-max(cn_stage_rows, vn_stage_rows) // 8) * 8
    chv_rows = -(-max(vn_strides) // 8) * 8
    pad_e = max(cn_strides + vn_strides)
    pad_v = max(vn_strides)
    n_vars, n_edges = layout.n_vars, layout.n_edges

    if variant == "nosmall":
        cn_sel = [i for i, (_, n, _) in enumerate(cn_groups) if n > 8]
        vn_sel = [i for i, (_, n, _) in enumerate(vn_groups) if n > 8]
    elif variant == "cn_only":
        cn_sel, vn_sel = list(range(len(cn_groups))), []
    elif variant == "vn_only":
        cn_sel, vn_sel = [], list(range(len(vn_groups)))
    else:
        cn_sel = list(range(len(cn_groups)))
        vn_sel = list(range(len(vn_groups)))
    use_chv = variant != "nochv"
    do_write = variant != "nowrite"

    out_views = variant == "outviews"

    def kernel(*refs):
        if out_views:
            A_in, chg_ref, o_ref, A_out, S_in, S_out, CHV, sem_st = refs
            A_ref = A_out  # aliased to A_in; stage from the output buffer
        else:
            A_ref, chg_ref, o_ref, S_in, S_out, CHV, sem_st = refs
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
            if chv_off is not None:
                dmas.append(
                    pltpu.make_async_copy(
                        chg_ref.at[pl.ds(chv_off + c0, stride)],
                        CHV.at[pl.ds(hinted(buf * chv_rows, stride), stride)],
                        sem_st.at[buf],
                    )
                )
            return dmas

        def pipelined_group(view_in, off_, n, d, stride, n_chunks, chv_off=None):
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
                if do_write:
                    for j in range(d):
                        S_out[
                            pl.ds(
                                hinted(buf * stage_rows + j * stride, stride),
                                stride,
                            )
                        ] = S_in[
                            pl.ds(
                                hinted(buf * stage_rows + j * stride, stride),
                                stride,
                            )
                        ]
                return acc

            return jax.lax.fori_loop(0, n_chunks, body, jnp.int32(0))

        SLOT = 4096  # slot pitch for the depth4 variant

        def stream_group_depth4(off_, n, d, stride, n_chunks):
            """(chunk, plane) units through a 4-slot rotation: 1 wait + 1
            start per unit, 4 transfers always in flight."""
            U = n_chunks * d

            def mk(u, s):
                c = u // d
                j = u - c * d
                return pltpu.make_async_copy(
                    A_ref.at[pl.ds(off_ + j * n + c * stride, stride)],
                    S_in.at[pl.ds(s * SLOT, stride)],
                    sem_st.at[s],
                )

            for k in range(min(4, U)):
                mk(jnp.int32(k), k).start()

            def body(u, acc):
                mk(u, u & 3).wait()

                @pl.when(u + 4 < U)
                def _():
                    mk(u + 4, (u + 4) & 3).start()

                return acc

            jax.lax.fori_loop(0, U, body, jnp.int32(0))

        def one_iteration(_i, acc):
            if variant == "depth4":
                for gi in vn_sel:
                    off_, n, d = vn_groups[gi]
                    stream_group_depth4(
                        off_, n, d, vn_strides[gi], vn_nchunks[gi]
                    )
                for gi in cn_sel:
                    off_, n, d = cn_groups[gi]
                    stream_group_depth4(
                        off_, n, d, cn_strides[gi], cn_nchunks[gi]
                    )
                return acc
            for gi in vn_sel:
                off_, n, d = vn_groups[gi]
                pipelined_group(
                    A_ref, off_, n, d, vn_strides[gi], vn_nchunks[gi],
                    chv_off=vn_node_offsets[gi] if use_chv else None,
                )
            for gi in cn_sel:
                off_, n, d = cn_groups[gi]
                pipelined_group(
                    A_ref, off_, n, d, cn_strides[gi], cn_nchunks[gi]
                )
            return acc

        jax.lax.fori_loop(0, iters, one_iteration, jnp.int32(0))
        o_ref[0:8] = S_in[0:8]

    out_shape = jax.ShapeDtypeStruct((8, 128), jnp.int32)
    out_specs = pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM)
    alias = {}
    if out_views:
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((n_edges + pad_e, Bt), jnp.int32),
        )
        out_specs = (out_specs, pl.BlockSpec(memory_space=pl.ANY))
        alias = {0: 1}  # A input aliases the ANY output view
    fn = pl.pallas_call(
        kernel,
        grid=(),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        input_output_aliases=alias,
        scratch_shapes=[
            pltpu.VMEM((max(2 * stage_rows, 4 * 4096), Bt), jnp.int32),
            pltpu.VMEM((2 * stage_rows, Bt), jnp.int32),
            pltpu.VMEM((2 * chv_rows, Bt), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )
    if out_views:
        def call():
            A = jnp.zeros((n_edges + pad_e, Bt), jnp.int32)
            chg = jnp.zeros((n_vars + pad_v, Bt), jnp.int32)
            return fn(A, chg)[0]

        jit_fn = jax.jit(call)
    else:
        A = jnp.zeros((n_edges + pad_e, Bt), jnp.int32)
        chg = jnp.zeros((n_vars + pad_v, Bt), jnp.int32)
        jit_fn = jax.jit(lambda: fn(A, chg))
    staged_bytes = 0
    for gi in cn_sel:
        _, n, d = cn_groups[gi]
        staged_bytes += cn_strides[gi] * cn_nchunks[gi] * d * Bt * 4
    for gi in vn_sel:
        _, n, d = vn_groups[gi]
        staged_bytes += vn_strides[gi] * vn_nchunks[gi] * (d + use_chv) * Bt * 4
    return jit_fn, staged_bytes


def timed(fn, reps=3):
    t0 = time.time()
    np.asarray(fn())[0, 0]
    print(f"    compile+first: {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn())[0, 0]
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    variants = os.environ.get("REPLAY", "exact").split(",")
    for variant in variants:
        r1 = 8
        fn1, staged = build(variant, r1)
        fn2, _ = build(variant, 2 * r1)
        t1, t2 = timed(fn1), timed(fn2)
        dt = max(t2 - t1, 1e-9)
        per_iter = dt / r1
        print(
            f"{variant:9s}: {per_iter*1e3:8.2f} ms/iter, staged "
            f"{staged/1e6:.0f} MB/iter -> {staged/per_iter/1e9:6.1f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
