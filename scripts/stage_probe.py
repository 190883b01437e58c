"""Bisect the HBM kernel's per-chunk skeleton cost on hardware.

hbm_isolate.py showed the full DVB-S2 decode iteration (~21 ms) is neither
fold nor scatter: the stage/loop/semaphore skeleton itself dominates
(~0.5 ms per chunk). This probe replays JUST that skeleton — a fori over
chunks, each staging d=7 planes HBM->VMEM with in-loop start+wait — and
adds back one suspect at a time:

  base    static semaphore, dynamic chunk offsets (like the probe that
          measured 0.28 us/DMA, but now d starts + d waits per chunk)
  dynsem  semaphore indexed sem.at[c & 1] (the pipelined kernel's pattern)
  when    a pl.when(c + 1 < n_chunks) region starting next-chunk DMAs
  vwrite  a vector copy of the staged planes to S_out between stage & next

Prints ms per simulated iteration (40 chunks) for each variant.
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

D = 7
STRIDE = 2048
N_CHUNKS = 40
PLANE = N_CHUNKS * STRIDE  # rows per "plane" in the fake HBM view
HBM_ROWS = D * PLANE + STRIDE + 16384  # slack for the 'unalign' offsets


def build(variant, iters):
    def kernel(x_ref, o_ref, S_in, S_out, sem2):
        def chunk(c, buf):
            c0 = c * STRIDE
            s = sem2.at[0] if variant == "base" else sem2.at[buf]
            half = buf * (D * STRIDE) if variant in ("dynoff", "dynread") else 0
            # 'unalign': plane bases off the sublane grid, like the decode
            # kernel's off + j*n with odd n (DVB-S2: n=32399).
            mis = (lambda j: j * 1237 + 3) if variant == "unalign" else (lambda j: 0)

            def dmas():
                return [
                    pltpu.make_async_copy(
                        x_ref.at[pl.ds(j * PLANE + c0 + mis(j), STRIDE)],
                        S_in.at[pl.ds(half + j * STRIDE, STRIDE)],
                        s,
                    )
                    for j in range(D)
                ]

            for m in dmas():
                m.start()
            for m in dmas():
                m.wait()
            if variant == "vwrite":
                for j in range(D):
                    S_out[j * STRIDE : (j + 1) * STRIDE] = (
                        S_in[j * STRIDE : (j + 1) * STRIDE] + 1
                    )
            elif variant == "dynread":
                # Dynamic-offset vector LOADS, static stores.
                for j in range(D):
                    S_out[j * STRIDE : (j + 1) * STRIDE] = (
                        S_in[pl.ds(half + j * STRIDE, STRIDE)] + 1
                    )
            elif variant == "dynoff":
                # Dynamic-offset vector loads AND stores (the pipelined
                # kernel's buffer-half pattern).
                for j in range(D):
                    S_out[pl.ds(half + j * STRIDE, STRIDE)] = (
                        S_in[pl.ds(half + j * STRIDE, STRIDE)] + 1
                    )

        def stage_start(c, buf):
            c0 = c * STRIDE
            for j in range(D):
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(j * PLANE + c0, STRIDE)],
                    S_in.at[pl.ds(buf * (D * STRIDE) + j * STRIDE, STRIDE)],
                    sem2.at[buf],
                ).start()

        def stage_wait(c, buf):
            c0 = c * STRIDE
            for j in range(D):
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(j * PLANE + c0, STRIDE)],
                    S_in.at[pl.ds(buf * (D * STRIDE) + j * STRIDE, STRIDE)],
                    sem2.at[buf],
                ).wait()

        def body(c, acc):
            buf = c & 1
            if variant == "pipeline":
                # The decode kernel's exact double-buffered skeleton:
                # conditional next-chunk starts, then wait current, then
                # dynamic-offset vector copies.

                @pl.when(c + 1 < N_CHUNKS)
                def _():
                    stage_start(c + 1, buf ^ 1)

                stage_wait(c, buf)
                half = buf * (D * STRIDE)
                for j in range(D):
                    S_out[pl.ds(half + j * STRIDE, STRIDE)] = (
                        S_in[pl.ds(half + j * STRIDE, STRIDE)] + 1
                    )
                return acc
            if variant in ("when", "vwrite"):

                @pl.when(c + 1 < N_CHUNKS)
                def _():
                    pass  # empty conditional region, the suspect is the region itself

            chunk(c, buf)
            return acc

        def iteration(r, acc):
            if variant == "pipeline":
                stage_start(0, 0)
            return jax.lax.fori_loop(0, N_CHUNKS, body, acc)

        jax.lax.fori_loop(0, iters, iteration, jnp.int32(0))
        o_ref[0:8] = S_in[0:8]

    fn = pl.pallas_call(
        kernel,
        grid=(),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * D * STRIDE, 128), jnp.int32),
            pltpu.VMEM((2 * D * STRIDE, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )
    x = jnp.zeros((HBM_ROWS, 128), jnp.int32)
    return jax.jit(lambda: fn(x))


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
    variants = os.environ.get(
        "STAGE_VARIANTS", "base,dynsem,when,vwrite,dynread,dynoff"
    ).split(",")
    for variant in variants:
        r1 = 16
        t1 = timed(build(variant, r1))
        t2 = timed(build(variant, 2 * r1))
        dt = max(t2 - t1, 1e-9)
        per_iter = dt / r1
        per_chunk = per_iter / N_CHUNKS
        bw = D * STRIDE * 128 * 4 * N_CHUNKS / per_iter
        print(
            f"{variant:7s}: {per_iter*1e3:8.2f} ms/iter(40 chunks), "
            f"{per_chunk*1e6:7.1f} us/chunk, stage-read {bw/1e9:6.1f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
