"""Measure per-descriptor DMA cost on the real chip.

The table-driven HBM kernel (kernels/ib_lut_hbm.py) issues ~2,900 dynamic
VMEM<->HBM DMAs per decode iteration; its first on-chip timing (26.3 ms/iter
vs a ~2.6 ms compute bound) suggests the per-descriptor cost, not bytes,
dominates. This probe times waves of dynamic-offset copies at several piece
lengths, differencing two wave counts to cancel dispatch and readback:

  - scatter direction: VMEM scratch -> HBM output, offsets from SMEM
  - stage direction:   HBM input -> VMEM scratch

Prints per-descriptor microseconds and the effective bandwidth per length.
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

WAVE = 512  # descriptors per start/wait wave
HBM_ROWS = 1 << 20  # 512 MB int32 x 128 lanes
VMEM_ROWS = 4096


def build(L, waves, direction):
    """Kernel: ``waves`` waves of WAVE dynamic L-row copies."""
    rng = np.random.default_rng(0)
    # Spaced destinations so concurrent writes never overlap.
    slots = HBM_ROWS // max(L, 8)
    dst = (rng.permutation(slots)[: WAVE] * max(L, 8)).astype(np.int32)
    src = ((np.arange(WAVE) % (VMEM_ROWS // max(L, 8))) * max(L, 8)).astype(
        np.int32
    )
    dst_t, src_t = jnp.asarray(dst), jnp.asarray(src)

    def kernel(dst_ref, src_ref, x_ref, big_ref, o_ref, S, sem):
        if direction == "scatter":
            S[0:8] = jnp.ones((8, 128), jnp.int32)

        def wave(r, _):
            def mk(k):
                if direction == "scatter":
                    return pltpu.make_async_copy(
                        S.at[pl.ds(src_ref[k], L)],
                        big_ref.at[pl.ds(dst_ref[k], L)],
                        sem,
                    )
                return pltpu.make_async_copy(
                    x_ref.at[pl.ds(dst_ref[k], L)],
                    S.at[pl.ds(src_ref[k], L)],
                    sem,
                )

            def start(k, _):
                mk(k).start()
                return 0

            def wait(k, _):
                mk(k).wait()
                return 0

            jax.lax.fori_loop(0, WAVE, start, 0)
            jax.lax.fori_loop(0, WAVE, wait, 0)
            return 0

        jax.lax.fori_loop(0, waves, wave, 0)
        o_ref[0:8] = S[0:8]

    # The big scatter target is an ANY output that is NEVER read back (the
    # tunnel readback of a 512 MB buffer would dominate all timing); the
    # tiny VMEM output is the only fetched value.
    fn = pl.pallas_call(
        kernel,
        grid=(),
        out_shape=(
            jax.ShapeDtypeStruct((HBM_ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((VMEM_ROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    x = jnp.zeros((HBM_ROWS, 128), jnp.int32)
    jit = jax.jit(lambda: fn(dst_t, src_t, x)[1])
    return jit


def timed(fn, reps=3):
    np.asarray(fn())[0, 0]
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn())[0, 0]
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def build_tiny_loops(L, waves, entries_per_loop):
    """Same WAVE descriptors per wave, but issued from WAVE/entries_per_loop
    separate fori loops (start loop + wait loop each) — measures the
    per-loop setup cost that dominates when scatter buckets hold only a few
    entries (the HBM decode kernel's observed regime)."""
    rng = np.random.default_rng(0)
    slots = HBM_ROWS // max(L, 8)
    dst = (rng.permutation(slots)[:WAVE] * max(L, 8)).astype(np.int32)
    src = ((np.arange(WAVE) % (VMEM_ROWS // max(L, 8))) * max(L, 8)).astype(
        np.int32
    )
    dst_t, src_t = jnp.asarray(dst), jnp.asarray(src)
    n_loops = WAVE // entries_per_loop

    def kernel(dst_ref, src_ref, x_ref, big_ref, o_ref, S, sem):
        S[0:8] = jnp.ones((8, 128), jnp.int32)

        def mk(k):
            return pltpu.make_async_copy(
                S.at[pl.ds(src_ref[k], L)],
                big_ref.at[pl.ds(dst_ref[k], L)],
                sem,
            )

        def wave(r, _):
            for lo in range(0, WAVE, entries_per_loop):

                def start(k, _):
                    mk(k).start()
                    return 0

                jax.lax.fori_loop(lo, lo + entries_per_loop, start, 0)
            for lo in range(0, WAVE, entries_per_loop):

                def wait(k, _):
                    mk(k).wait()
                    return 0

                jax.lax.fori_loop(lo, lo + entries_per_loop, wait, 0)
            return 0

        jax.lax.fori_loop(0, waves, wave, 0)
        o_ref[0:8] = S[0:8]

    fn = pl.pallas_call(
        kernel,
        grid=(),
        out_shape=(
            jax.ShapeDtypeStruct((HBM_ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((VMEM_ROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    x = jnp.zeros((HBM_ROWS, 128), jnp.int32)
    return jax.jit(lambda: fn(dst_t, src_t, x)[1]), n_loops


def main():
    mode = os.environ.get("PROBE_MODE", "loops")
    if mode == "flat":
        for direction in ("scatter", "stage"):
            for L in (1, 32, 256):
                w1 = 8
                t1 = timed(build(L, w1, direction))
                t2 = timed(build(L, 2 * w1, direction))
                n = WAVE * w1
                dt = max(t2 - t1, 1e-9)
                per = dt / n
                bw = L * 128 * 4 * n / dt
                print(
                    f"{direction:8s} L={L:4d}: {per*1e6:7.2f} us/DMA, "
                    f"{bw/1e9:7.2f} GB/s effective",
                    flush=True,
                )
        return
    L = 32
    for entries in (512, 8, 2):
        w1 = 4
        fn1, n_loops = build_tiny_loops(L, w1, entries)
        fn2, _ = build_tiny_loops(L, 2 * w1, entries)
        t1, t2 = timed(fn1), timed(fn2)
        n = WAVE * w1
        dt = max(t2 - t1, 1e-9)
        per_dma = dt / n
        per_loop = dt / (2 * n_loops * w1)
        print(
            f"L={L} entries/loop={entries:4d}: {per_dma*1e6:7.2f} us/DMA, "
            f"{per_loop*1e6:7.2f} us/loop-pair-half",
            flush=True,
        )


if __name__ == "__main__":
    main()
