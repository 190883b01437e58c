"""Read BW probe, hardened: adaptive trip counts, no scalar div/mod.

Variants (all depth-4, read-only, [L,128] int32 units):
  seq      one sequential stream, src = u*L
  smem     7 interleaved streams, unit src offsets from an SMEM table
  nested   7 streams, chunk-outer fori + static plane unroll (the real
           kernel's exact address generation: off + j*n + c*stride)
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

ROWS = 1 << 19  # 256 MB source
D = 7
PLANE = ROWS // 8  # stream pitch (16.6 MB apart like DVB-S2 CN planes)


def build(variant, L, loops):
    n_ch = PLANE // L
    U = n_ch * D if variant != "seq" else ROWS // L

    if variant == "smem":
        src_np = np.empty(U, np.int32)
        for c in range(n_ch):
            for j in range(D):
                src_np[c * D + j] = j * PLANE + c * L
        src_tab = jnp.asarray(src_np)
    else:
        src_tab = jnp.zeros(1, jnp.int32)

    def kernel(src_ref, x_ref, o_ref, S, sem):
        if variant == "nested":
            # The real kernel's shape: fori over chunks, static planes,
            # double-buffered halves (2 slots of D planes each).
            def stage(c, buf):
                return [
                    pltpu.make_async_copy(
                        x_ref.at[pl.ds(j * PLANE + c * L, L)],
                        S.at[pl.ds((buf * D + j) * L, L)],
                        sem.at[buf],
                    )
                    for j in range(D)
                ]

            def one_pass(_p, acc):
                for m in stage(jnp.int32(0), 0):
                    m.start()

                def body(c, acc):
                    buf = c & 1

                    @pl.when(c + 1 < n_ch)
                    def _():
                        for m in stage(c + 1, buf ^ 1):
                            m.start()

                    for m in stage(c, buf):
                        m.wait()
                    return acc

                return jax.lax.fori_loop(0, n_ch, body, acc)

        else:

            def mk(u, s):
                src = src_ref[u] if variant == "smem" else u * L
                return pltpu.make_async_copy(
                    x_ref.at[pl.ds(src, L)],
                    S.at[pl.ds(s * L, L)],
                    sem.at[s],
                )

            def one_pass(_p, acc):
                for k in range(4):
                    mk(jnp.int32(k), k).start()

                def body(u, acc):
                    mk(u, u & 3).wait()

                    @pl.when(u + 4 < U)
                    def _():
                        mk(u + 4, (u + 4) & 3).start()

                    return acc

                return jax.lax.fori_loop(0, U, body, acc)

        jax.lax.fori_loop(0, loops, one_pass, jnp.int32(0))
        o_ref[0:8] = S[0:8]

    slots = 2 * D if variant == "nested" else 4
    fn = pl.pallas_call(
        kernel,
        grid=(),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slots * L, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )
    x = jnp.zeros((ROWS, 128), jnp.int32)
    vol = (U * L if variant != "seq" else ROWS) * 128 * 4
    return jax.jit(lambda: fn(src_tab, x)), vol


def timed_fn(fn, reps=3):
    np.asarray(fn())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn())
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def rate(variant, L):
    loops = 4
    while True:
        f1, vol = build(variant, L, loops)
        t1 = timed_fn(f1, 1)
        if t1 >= 0.3 or loops >= 4096:
            break
        loops *= max(2, min(int(0.5 / max(t1, 1e-3)), 32))
    f1, vol = build(variant, L, loops)
    f2, _ = build(variant, L, 2 * loops)
    t1, t2 = timed_fn(f1), timed_fn(f2)
    return vol * loops / max(t2 - t1, 1e-9)


def main():
    for variant in ("seq", "smem", "nested"):
        for L in (1024, 2048):
            bw = rate(variant, L)
            print(
                f"{variant:7s} L={L:5d} rows ({L//2} KB): {bw/1e9:6.1f} GB/s read",
                flush=True,
            )


if __name__ == "__main__":
    main()
