"""All-VMEM fused float (min-sum / BP) Pallas kernel vs. the XLA path.

Same golden-dual strategy as test_fused_kernel.py: the Pallas interpreter
runs the exact kernel on CPU, the XLA float decoders are the reference;
fixed iterations and identical fold bracketing => bit-exact.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from informationbottleneckdecodingldpc_tpu.codes import TannerGraph
from informationbottleneckdecodingldpc_tpu.codes.random_codes import (
    regular_parity_check,
    regular_qc_parity_check,
)
from informationbottleneckdecodingldpc_tpu.decode import (
    DecodeLayout,
    belief_propagation_decode,
    min_sum_decode,
)
from informationbottleneckdecodingldpc_tpu.kernels.float_fused import (
    FusedFloatDecoder,
    float_fused_supported,
)


@pytest.fixture(scope="module")
def qc_layout():
    H = regular_qc_parity_check(96, 3, 6, seed=7)
    return DecodeLayout.from_graph(TannerGraph.from_check_matrix(H))


def _llrs(rng, n, batch):
    return jnp.asarray(rng.normal(1.0, 1.6, (n, batch)), jnp.float32)


def test_float_fused_supported_structured_vs_random(qc_layout):
    assert float_fused_supported(qc_layout)
    H = regular_parity_check(96, 3, 6, seed=7)
    rand_layout = DecodeLayout.from_graph(TannerGraph.from_check_matrix(H))
    assert not float_fused_supported(rand_layout)


@pytest.mark.parametrize("rule,ref_fn", [
    ("minsum", min_sum_decode),
    ("bp", belief_propagation_decode),
])
def test_float_fused_bit_exact_fixed_iters(qc_layout, rng, rule, ref_fn):
    layout = qc_layout
    ch = _llrs(rng, layout.n_vars, 24)
    ref = ref_fn(layout, ch, max_iters=6, early_exit=False)
    got = FusedFloatDecoder(
        layout, rule, max_iters=6, early_exit=False, batch_tile=8
    )(ch)  # 3 tiles; fixed iters -> bit-exact incl. tile padding
    assert np.array_equal(np.asarray(ref.outputs), np.asarray(got.outputs))
    assert np.array_equal(
        np.asarray(ref.unsatisfied), np.asarray(got.unsatisfied)
    )
    assert int(ref.iterations) == int(got.iterations)


def test_float_fused_bit_exact_early_exit_single_tile(qc_layout, rng):
    # One tile == whole-batch lockstep: early exit matches the XLA path.
    layout = qc_layout
    ch = _llrs(rng, layout.n_vars, 16) * 3.0  # low noise: converges early
    ref = min_sum_decode(layout, ch, max_iters=12, early_exit=True)
    got = FusedFloatDecoder(
        layout, "minsum", max_iters=12, early_exit=True, batch_tile=16
    )(ch)
    assert np.array_equal(np.asarray(ref.outputs), np.asarray(got.outputs))
    assert int(ref.iterations) == int(got.iterations)


def test_float_fused_degenerate_one_iter(qc_layout, rng):
    # imax=1: loop never runs; unsat must be the TRUE syndrome of the
    # seeded view and outputs the channel posteriors (zero VN view) —
    # the XLA path's float_common semantics.
    layout = qc_layout
    ch = _llrs(rng, layout.n_vars, 8)
    ref = min_sum_decode(layout, ch, max_iters=1, early_exit=True)
    got = FusedFloatDecoder(
        layout, "minsum", max_iters=1, early_exit=True, batch_tile=8
    )(ch)
    assert np.array_equal(np.asarray(ref.outputs), np.asarray(got.outputs))
    assert np.array_equal(
        np.asarray(ref.unsatisfied), np.asarray(got.unsatisfied)
    )
    assert int(ref.iterations) == int(got.iterations) == 0


def test_engine_float_fused_backend_matches_xla(qc_layout):
    # Engine-level: backend='fused' (minsum) counts exactly like 'xla'.
    from informationbottleneckdecodingldpc_tpu.sim import BERSimulator

    mk = lambda backend: BERSimulator(
        qc_layout, "minsum", max_iters=6, chain="allzero",
        count_all_bits=True, batch_per_device=16, n_devices=1, seed=3,
        backend=backend, early_exit=False,
    )
    sim_fused = mk("fused")
    assert sim_fused._fused_decoder is not None
    r_fused = sim_fused.run_point(2.0, min_errors=1, max_blocks=32)
    r_xla = mk("xla").run_point(2.0, min_errors=1, max_blocks=32)
    assert r_fused.errors == r_xla.errors
    assert r_fused.frame_errors == r_xla.frame_errors


def test_minsum_min1min2_matches_pairwise_on_edge_cases(rng):
    # Ties on the minimum magnitude and exact zeros: the min1/min2 +
    # sign-product fold must match the pairwise min_sum_op prefix/suffix
    # fold (values identical; zero sign may differ, compare with ==).
    import itertools
    from informationbottleneckdecodingldpc_tpu.ops.float_ops import (
        associative_leave_one_out,
        min_sum_op,
        minsum_leave_one_out_planes,
    )

    cases = [
        [1.5, -1.5, 2.0, 1.5, -3.0],     # triple tie at the min
        [0.0, 2.0, -1.0, 4.0],           # one zero
        [0.0, -0.0, 3.0],                # two zeros
        [-2.0, -2.0, -2.0, -2.0],        # all equal, all negative
        [5.0, -1.0],                     # degree 2
    ]
    for vals in cases:
        planes = [jnp.full((4, 8), v, jnp.float32) for v in vals]
        got = minsum_leave_one_out_planes(planes)
        ref = associative_leave_one_out(
            min_sum_op, jnp.stack(planes, axis=0)
        )
        for j in range(len(vals)):
            assert np.all(np.asarray(got[j]) == np.asarray(ref[j])), (
                vals, j, np.asarray(got[j])[0, 0], np.asarray(ref[j])[0, 0]
            )
