"""HBM->VMEM read bandwidth vs chunk size and stream interleaving.

stage_replay depth4 showed the decode kernels' staged reads run at
~110 GB/s while the 2 MB-chunk HBM->VMEM->HBM pipeline measures 717 GB/s
aggregate. Isolate the knobs: read-only, depth-4 slot rotation, chunk size
L in rows (512 B each), and either one sequential stream or 7 streams
interleaved 16.6 MB apart (the DVB-S2 CN plane pattern).
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
PLANE = ROWS // 8  # stream pitch for the interleaved variant


def build(L, streams, loops):
    n_ch = (PLANE if streams > 1 else ROWS) // L
    U = n_ch * streams

    def kernel(x_ref, o_ref, S, sem):
        def mk(u, s):
            if streams > 1:
                c = u // streams
                j = u - c * streams
                src = j * PLANE + c * L
            else:
                src = u * L
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

    fn = pl.pallas_call(
        kernel,
        grid=(),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4 * L, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    x = jnp.zeros((ROWS, 128), jnp.int32)
    return jax.jit(lambda: fn(x)), U * L * 128 * 4


def timed(fn, reps=3):
    np.asarray(fn())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn())
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    for streams in (1, 7):
        for L in (256, 1024, 4096):
            l0 = 2
            f1, vol = build(L, streams, l0)
            f2, _ = build(L, streams, 2 * l0)
            t1, t2 = timed(f1), timed(f2)
            dt = max(t2 - t1, 1e-9)
            bw = vol * l0 / dt
            print(
                f"streams={streams} L={L:5d} rows ({L*512//1024:5d} KB): "
                f"{bw/1e9:6.1f} GB/s read",
                flush=True,
            )


if __name__ == "__main__":
    main()
