"""Can the MXU build packed-LUT columns faster than VPU compare-select?

The IB decode kernels spend ~72% of their primitive-bound time in column
builds (_select_columns: |T1| compares + |T1|*W selects per element;
round-5 peaks: col_2_16 108 G/s vs ext_2_4 872 G/s). A column build is a
one-hot matmul: cols = onehot(b) @ packed_columns. int32 words cannot ride
the MXU exactly, but their 4 bytes can (one-hot times bytes is exact in
f32), at 4x the word count: [E, T1] onehot x [T1, 4W] bytes -> [E, 4W],
recomposed into W int32 planes with shifts/ors.

Measures, per element, on [R*8, 128] planes (the kernel's working shape):
  vpu    : _select_columns as today
  mxu    : one-hot f32 matmul + byte recompose
for T=16 (W=2) and T=32 split packing (W=5).
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

from informationbottleneckdecodingldpc_tpu.ops.lut_fold import (
    _extract,
    _select_columns,
)

ROWS = 512  # rows per operand plane (x 128 lanes)
REPS = 3


def _rate(build_fn, work_per_loop, l0=64):
    def timed(loops, reps_):
        fn = build_fn(loops)
        np.asarray(fn())
        ts = []
        for _ in range(reps_):
            t0 = time.time()
            np.asarray(fn())
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    loops = l0
    t1 = timed(loops, 1)
    while t1 < 0.25 and loops < (1 << 20):
        loops *= max(2, min(int(0.4 / max(t1, 1e-3)), 64))
        t1 = timed(loops, 1)
    t1 = timed(loops, REPS)
    t2 = timed(2 * loops, REPS)
    return work_per_loop * loops / max(t2 - t1, 1e-9)


def vpu_variant(t1, fb, w):
    packed = jnp.asarray(
        np.random.default_rng(2).integers(0, 2**31, (w, t1)), jnp.int32
    )
    b0 = jnp.asarray(
        np.random.default_rng(3).integers(0, t1, (ROWS, 128)), jnp.int32
    )

    def build(loops):
        def kernel(packed_ref, b_ref, o_ref):
            pk = packed_ref[:]

            def body(_, carry):
                b, acc = carry
                cols = _select_columns(pk, b)
                # Consume the columns: one extract keeps them live and
                # mirrors the fold's use; feed b from the result.
                e = _extract(cols, b & (t1 - 1), fb)
                return (e + b) & (t1 - 1), acc + cols[0]

            b, acc = jax.lax.fori_loop(
                0, loops, body, (b_ref[:], jnp.zeros((ROWS, 128), jnp.int32))
            )
            o_ref[:] = acc + b

        fn = jax.jit(
            pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024
                ),
            )
        )
        return lambda: fn(packed, b0)

    return build


def mxu_variant(t1, fb, w):
    """One-hot f32 matmul against the byte-decomposed packed table."""
    rng = np.random.default_rng(2)
    packed = rng.integers(0, 2**31, (w, t1)).astype(np.int64)
    # [T1, 4W] byte planes of the packed words (column-major over b).
    bytes_mat = np.zeros((t1, 4 * w), np.float32)
    for k in range(w):
        for by in range(4):
            bytes_mat[:, 4 * k + by] = (packed[k] >> (8 * by)) & 0xFF
    bytes_mat = jnp.asarray(bytes_mat)
    b0 = jnp.asarray(rng.integers(0, t1, (ROWS, 128)), jnp.int32)

    def build(loops):
        def kernel(bytes_ref, b_ref, o_ref):
            bm = bytes_ref[:]

            def body(_, carry):
                b, acc = carry
                # One-hot [ROWS*128, T1] in f32; matmul on the MXU.
                flat = b.reshape(ROWS * 128)
                oh = (
                    flat[:, None]
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (ROWS * 128, t1), 1
                    )
                ).astype(jnp.float32)
                prod = jnp.dot(
                    oh, bm, preferred_element_type=jnp.float32
                )  # [E, 4W] exact (one-hot x bytes)
                by = prod.astype(jnp.int32).reshape(ROWS, 128, 4 * w)
                cols = [
                    by[:, :, 4 * k]
                    | (by[:, :, 4 * k + 1] << 8)
                    | (by[:, :, 4 * k + 2] << 16)
                    | (by[:, :, 4 * k + 3] << 24)
                    for k in range(w)
                ]
                e = _extract(cols, b & (t1 - 1), fb)
                return (e + b) & (t1 - 1), acc + cols[0]

            b, acc = jax.lax.fori_loop(
                0, loops, body, (b_ref[:], jnp.zeros((ROWS, 128), jnp.int32))
            )
            o_ref[:] = acc + b

        fn = jax.jit(
            pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024
                ),
            )
        )
        return lambda: fn(bytes_mat, b0)

    return build


def main():
    for t1, fb, w in ((16, 4, 2), (32, 5, 5)):
        for name, variant in (("vpu", vpu_variant), ("mxu", mxu_variant)):
            rate = _rate(variant(t1, fb, w), ROWS * 128)
            print(
                f"T1={t1} W={w} {name}: {rate/1e9:7.2f} G col-builds/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
