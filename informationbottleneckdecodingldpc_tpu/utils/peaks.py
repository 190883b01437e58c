"""Measured per-primitive peak rates for the roofline (Pallas microkernels).

The decode kernels are built from a small set of primitives; a defensible
speed-of-light is their measured peak rate in isolation, at full ILP, with
all operands VMEM-resident — the same code generators (ops/lut_fold) through
the same compiler, minus all memory movement, routing and loop control. A
kernel composed of these primitives cannot beat the per-primitive peaks, so
``achieved/SOL <= 1`` holds structurally (round-2 verdict #5; the previous
roofline counted jnp-level ops against a synthetic-chain op rate, which both
under- and over-estimated what the compiler actually fuses).

Chain states are REGISTER-RESIDENT — one (8, 128) vreg per chain, many
independent chains. A first cut used [1024, 128] per-chain arrays; those
live in VMEM, so every application paid a VMEM round-trip and the measured
"peak" was VMEM-traffic-bound, ~25% below what the fused kernels achieve
with their longer in-register expression chains (round-4 bench_matrix:
fraction_of_sol 1.24). With one-vreg states the microkernel runs at the
VPU's ALU issue ceiling, which a composite kernel cannot beat — so
``achieved/SOL <= 1`` holds structurally again.

Primitives measured (16 independent one-vreg dependency chains, wrapped in
an in-kernel fori_loop so one dispatch carries >= 0.25 s of compute — the
tunneled-chip dispatch latency is cancelled by trip-count differencing):

- ``("col", W, T1)``: packed-column build — |T1|-way compare-select of W
  int32 words (ops/lut_fold._select_columns).
- ``("ext", W, fb)``: packed-field extract — W-way word select + variable
  shift + mask (ops/lut_fold._extract; fb=5 is the split 4+1-bit layout,
  whose extract output is already a valid next-state index, so the chains
  need no extra masking that would bias the measured rate).
- ``"minsum_op"`` / ``"boxplus"``: one application of the float CN fold op
  (ops/float_ops).
- ``"float_mix"``: generic VN-side float work (add + clip).

Rates are elements/second (extracts, builds, op applications). Measured once
per process and cached.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.float_ops import boxplus, min_sum_op
from ..ops.lut_fold import _extract, _select_columns

R = 8  # one (8, 128) vreg per chain state
U = 64  # unrolled steps per fori iteration
CHAINS = 16  # independent chains: ILP far above the ALU pipeline depth

# Float pair chains (x' = op(x, y); y' = op(y, x')): same one-vreg states.
# boxplus expands to exp/log1p temporaries, still register-resident at this
# size (the round-3 on-chip OOM came from [4096, 128]-scale chain states
# under the AOT helper's 16 MB scoped-VMEM limit).
FR = 8
FCHAINS = 16

_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _rate(build_fn, work_per_loop: float, l0: int = 4096, reps: int = 3):
    """work/second by DIFFERENCING two fori trip counts.

    Two honesty rules learned on the tunneled chip (round-3 postmortem):
    value READBACK, not block_until_ready — the axon platform's
    block_until_ready can return before execution finishes (see
    utils/benchmarks.py), which made every round-3 "peak" a dispatch-latency
    measurement; and rate = work_diff / time_diff between trip counts L and
    2L, which cancels the constant dispatch + 512 KB readback cost that
    would otherwise be attributed to compute. L adapts until the L-dispatch
    itself takes >= 0.25 s, so the differenced interval is well above timer
    and tunnel jitter.
    """

    def timed(loops, reps_):
        fn = build_fn(loops)
        np.asarray(fn())  # compile
        np.asarray(fn())  # warm
        ts = []
        for _ in range(reps_):
            t0 = time.time()
            np.asarray(fn())
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    loops = l0
    t1 = timed(loops, 1)
    while t1 < 0.25 and loops < (1 << 22):
        loops *= max(2, min(int(0.4 / max(t1, 1e-3)), 64))
        t1 = timed(loops, 1)
    t1 = timed(loops, reps)
    t2 = timed(2 * loops, reps)
    dt = max(t2 - t1, 1e-9)
    return work_per_loop * loops / dt


def measure_extract_peak(w: int, fb: int, reps: int = 3) -> float:
    """Extracts/second for a W-word, fb-field packed column."""
    # Valid next-state domain: extract output is a field value, which is a
    # valid state index for these layouts (fb=4: [0,16) with t0=16; fb=5:
    # [0,32) with t0=32), so chains are pure extract chains.
    t0 = 16 if fb == 4 else 32

    words = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**31, (w, 1)), jnp.int32
    )
    s = jnp.asarray(
        np.random.default_rng(1).integers(0, t0, (R, 128)), jnp.int32
    )

    def build(loops):
        def kernel(words_ref, s_ref, o_ref):
            cols = [
                words_ref[k, 0] + jnp.zeros((R, 128), jnp.int32)
                for k in range(w)
            ]

            def body(_, states):
                for _ in range(U):
                    states = tuple(_extract(cols, s_, fb) for s_ in states)
                return states

            init = tuple((s_ref[:] + c) & (t0 - 1) for c in range(CHAINS))
            states = jax.lax.fori_loop(0, loops, body, init)
            acc = states[0]
            for s_ in states[1:]:
                acc = acc + s_
            o_ref[:] = acc

        fn = jax.jit(
            pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
                compiler_params=_PARAMS,
            )
        )
        return lambda: fn(words, s)

    return _rate(build, CHAINS * R * 128 * U, reps=reps)


def measure_column_peak(w: int, t1: int, reps: int = 3) -> float:
    """Column builds/second for a [W, T1] packed LUT."""

    packed = jnp.asarray(
        np.random.default_rng(2).integers(0, 2**31, (w, t1)), jnp.int32
    )
    b = jnp.asarray(
        np.random.default_rng(3).integers(0, t1, (R, 128)), jnp.int32
    )

    def build(loops):
        def kernel(packed_ref, b_ref, o_ref):
            pk = packed_ref[:]

            def body(_, carry):
                bs, acc = carry
                for _ in range(U // 8):
                    new = []
                    for bb in bs:
                        cols = _select_columns(pk, bb)
                        acc = acc + cols[0]
                        new.append((cols[0] ^ cols[-1]) & (t1 - 1))
                    bs = tuple(new)
                return bs, acc

            init_b = tuple((b_ref[:] + c) & (t1 - 1) for c in range(CHAINS))
            bs, acc = jax.lax.fori_loop(
                0, loops, body, (init_b, jnp.zeros((R, 128), jnp.int32))
            )
            o_ref[:] = acc + bs[0]

        fn = jax.jit(
            pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
                compiler_params=_PARAMS,
            )
        )
        return lambda: fn(packed, b)

    return _rate(build, CHAINS * R * 128 * (U // 8), reps=reps)


def _measure_float_binop(op, reps: int = 3) -> float:
    """Applications/second of a binary float op.

    Chain shape matters: ``(op(x, y), op(y, x))`` is a trap for symmetric
    ops (min_sum_op, boxplus) — XLA CSEs the two applications, the pair
    collapses to ``(a, a)``, and ``op(a, a)`` then algebraically simplifies,
    inflating the measured "peak" ~30x (seen on-chip: boxplus "faster" than
    min-sum). Here each step is ``x' = op(x, y); y' = op(y, x')`` — distinct
    operands (no CSE), y feeds the next x (no dead code), two genuine
    applications per step. Each application still covers [FR, 128] f32 = 32
    vector strips, so the VPU pipeline stays full despite the serial pair."""

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(FR, 128)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(FR, 128)), jnp.float32)

    def build(loops):
        def kernel(x_ref, y_ref, o_ref):
            def body(_, pairs):
                def step(px, py):
                    nx = op(px, py)
                    return nx, op(py, nx)

                for _ in range(U // 2):
                    pairs = tuple(step(px, py) for px, py in pairs)
                return pairs

            init = tuple(
                (x_ref[:] * (1.0 + 0.25 * c), y_ref[:] * (1.0 - 0.125 * c))
                for c in range(FCHAINS)
            )
            pairs = jax.lax.fori_loop(0, loops, body, init)
            acc = pairs[0][0]
            for px, _ in pairs[1:]:
                acc = acc + px
            o_ref[:] = acc

        fn = jax.jit(
            pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((FR, 128), jnp.float32),
                compiler_params=_PARAMS,
            )
        )
        return lambda: fn(x, y)

    return _rate(build, FCHAINS * FR * 128 * U, reps=reps)


def measure_minsum_op_peak(reps: int = 3) -> float:
    return _measure_float_binop(min_sum_op, reps)


def measure_boxplus_peak(reps: int = 3) -> float:
    return _measure_float_binop(boxplus, reps)


def measure_float_mix_peak(reps: int = 3) -> float:
    """(add + clip)/second — the VN-side op mix."""
    return _measure_float_binop(
        lambda a, b: jnp.clip(a + b, -150.0, 150.0), reps
    )


_CACHE: dict = {}


def primitive_peak(kind, *params) -> float:
    """Cached peak lookup: ('col', W, T1) | ('ext', W, fb) | 'minsum_op' |
    'boxplus' | 'float_mix'."""
    key = (kind, *params)
    if key not in _CACHE:
        if kind == "col":
            _CACHE[key] = measure_column_peak(*params)
        elif kind == "ext":
            _CACHE[key] = measure_extract_peak(*params)
        elif kind == "minsum_op":
            _CACHE[key] = measure_minsum_op_peak()
        elif kind == "min_op":
            _CACHE[key] = measure_min_op_peak()
        elif kind == "boxplus":
            _CACHE[key] = measure_boxplus_peak()
        elif kind == "float_mix":
            _CACHE[key] = measure_float_mix_peak()
        else:
            raise ValueError(kind)
    return _CACHE[key]


def measure_min_op_peak(reps: int = 3) -> float:
    """Single jnp.minimum applications/second at full ILP — the VPU ALU
    issue ceiling in the same methodology as the other float peaks (the
    asymmetric x'=op(x,y); y'=op(y,x') chain defeats CSE). Used as the rate
    ceiling for the min-sum irreducible-op-floor bound: the O(d) min1/min2
    fold the kernels apply needs >= 4 single-cycle VPU ops per edge (abs,
    one min-tracking step, the min1-vs-min2 output select, the sign apply),
    so throughput <= alu_rate / (4 x edges) — a chained microkernel of the
    full fold under-measures instead (4-way ILP, spilled plane tuples) and
    round-5's first attempt produced a 2x-violated "bound"."""
    return _measure_float_binop(jnp.minimum, reps)
