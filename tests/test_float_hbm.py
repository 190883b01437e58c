"""HBM-resident float (min-sum / BP) Pallas kernel vs. the XLA path.

Same golden-dual strategy as test_hbm_kernel.py: the Pallas interpreter runs
the exact kernel on CPU, the XLA float decoder is the reference; fixed
iterations and identical fold bracketing => bit-exact.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from informationbottleneckdecodingldpc_tpu.codes import (
    TannerGraph,
    dvbs2_layout_edge_keys,
    dvbs2_layout_node_keys,
    dvbs2_like_parity_check,
)
from informationbottleneckdecodingldpc_tpu.codes.random_codes import (
    regular_qc_parity_check,
)
from informationbottleneckdecodingldpc_tpu.decode import (
    DecodeLayout,
    belief_propagation_decode,
    min_sum_decode,
)
from informationbottleneckdecodingldpc_tpu.kernels.float_hbm import (
    HBMFloatDecoder,
)


@pytest.fixture(scope="module")
def ira_layout():
    H = dvbs2_like_parity_check(1920, 960, seed=9)
    g = TannerGraph.from_check_matrix(H)
    ck, vk = dvbs2_layout_node_keys(1920, 960)
    ek_csr, ek_csc = dvbs2_layout_edge_keys(H, 960)
    return DecodeLayout.from_graph(
        g, cn_node_key=ck, vn_node_key=vk, cn_edge_key=ek_csr, vn_edge_key=ek_csc
    )


def _llrs(rng, n, batch):
    return jnp.asarray(rng.normal(1.0, 1.6, (n, batch)), jnp.float32)


def test_float_hbm_minsum_bit_exact_fixed_iters(ira_layout, rng):
    layout = ira_layout
    ch = _llrs(rng, layout.n_vars, 8)
    ref = min_sum_decode(layout, ch, max_iters=6, early_exit=False)
    got = HBMFloatDecoder(
        layout, "minsum", max_iters=6, early_exit=False, batch_tile=8
    )(ch)
    assert np.array_equal(np.asarray(ref.outputs), np.asarray(got.outputs))
    assert np.array_equal(
        np.asarray(ref.unsatisfied), np.asarray(got.unsatisfied)
    )
    assert int(ref.iterations) == int(got.iterations)


def test_float_hbm_bp_bit_exact_fixed_iters(ira_layout, rng):
    layout = ira_layout
    ch = _llrs(rng, layout.n_vars, 8)
    ref = belief_propagation_decode(layout, ch, max_iters=5, early_exit=False)
    got = HBMFloatDecoder(
        layout, "bp", max_iters=5, early_exit=False, batch_tile=8
    )(ch)
    assert np.allclose(
        np.asarray(ref.outputs), np.asarray(got.outputs), rtol=0, atol=0
    )
    assert np.array_equal(
        np.asarray(ref.unsatisfied), np.asarray(got.unsatisfied)
    )


def test_float_hbm_minsum_early_exit_single_tile(ira_layout, rng):
    # Delayed-by-one early exit (the syndrome folds into the CN pass's
    # staged reads): the kernel runs exactly ONE body more than the XLA
    # whole-batch test, and its result equals the XLA fixed-iteration
    # decode truncated at that body count (final syndrome exact).
    layout = ira_layout
    # High SNR (~0.6% raw sign-error rate): converges well before imax.
    ch = jnp.asarray(
        rng.normal(2.5, 1.0, (layout.n_vars, 8)), jnp.float32
    )
    ref_ee = min_sum_decode(layout, ch, max_iters=30, early_exit=True)
    got = HBMFloatDecoder(
        layout, "minsum", max_iters=30, early_exit=True, batch_tile=8
    )(ch)
    k = int(got.iterations)
    assert int(ref_ee.iterations) < 29  # the early exit actually fired
    assert k == int(ref_ee.iterations) + 1
    # XLA max_iters=m runs m-1 bodies: m = k+1 reproduces the kernel run.
    ref_fix = min_sum_decode(layout, ch, max_iters=k + 1, early_exit=False)
    assert np.array_equal(np.asarray(ref_fix.outputs), np.asarray(got.outputs))
    assert np.array_equal(
        np.asarray(ref_fix.unsatisfied), np.asarray(got.unsatisfied)
    )


def test_float_hbm_multi_tile_regular(rng):
    H = regular_qc_parity_check(96, 3, 6, seed=7)
    layout = DecodeLayout.from_graph(TannerGraph.from_check_matrix(H))
    ch = _llrs(rng, layout.n_vars, 20)
    ref = min_sum_decode(layout, ch, max_iters=5, early_exit=False)
    got = HBMFloatDecoder(
        layout, "minsum", max_iters=5, early_exit=False, batch_tile=8
    )(ch)  # 3 tiles, last padded
    assert np.array_equal(np.asarray(ref.outputs), np.asarray(got.outputs))
    assert np.array_equal(
        np.asarray(ref.unsatisfied), np.asarray(got.unsatisfied)
    )


def test_float_hbm_degenerate_one_iter(rng):
    # imax=1: loop never runs; unsat must be the TRUE syndrome of the
    # seeded view (float_common's unsat_final semantics), not a sentinel.
    H = regular_qc_parity_check(96, 3, 6, seed=7)
    layout = DecodeLayout.from_graph(TannerGraph.from_check_matrix(H))
    ch = _llrs(rng, layout.n_vars, 8)
    ref = min_sum_decode(layout, ch, max_iters=1, early_exit=True)
    got = HBMFloatDecoder(
        layout, "minsum", max_iters=1, early_exit=True, batch_tile=8
    )(ch)
    assert np.array_equal(np.asarray(ref.outputs), np.asarray(got.outputs))
    assert np.array_equal(
        np.asarray(ref.unsatisfied), np.asarray(got.unsatisfied)
    )
    assert int(ref.iterations) == int(got.iterations) == 0
