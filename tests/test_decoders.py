import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from informationbottleneckdecodingldpc_tpu.codes import (
    TannerGraph,
    regular_parity_check,
    wlan_80211n_parity_check,
)
from informationbottleneckdecodingldpc_tpu.construct.trellis import TrellisTables
from informationbottleneckdecodingldpc_tpu.decode import (
    DecodeLayout,
    belief_propagation_decode,
    ib_lut_decode,
    min_sum_decode,
)
from informationbottleneckdecodingldpc_tpu.decode.ib_lut import DeviceTrellis

from reference_impls import brute_float_decode, brute_lut_decode


def small_irregular_H(rng, n_c=12, n_v=24):
    """Random irregular H with degrees >= 2 everywhere."""
    while True:
        H = (rng.random((n_c, n_v)) < 0.18).astype(np.int8)
        # ensure min degrees
        for v in range(n_v):
            while H[:, v].sum() < 2:
                H[rng.integers(n_c), v] = 1
        for c in range(n_c):
            while H[c].sum() < 3:
                H[c, rng.integers(n_v)] = 1
        if H.sum(0).max() <= 8 and H.sum(1).max() <= 10:
            return H


def random_trellis_tables(rng, t_ch, t_dec, i_max, d_c_max, d_v_max, matching=False):
    """Random (but valid-shaped) LUTs — enough to test decoder plumbing."""
    mk = lambda *shape: rng.integers(0, t_dec, size=shape).astype(np.int64)
    return TrellisTables(
        cardinality_t_channel=t_ch,
        cardinality_t_decoder=t_dec,
        i_max=i_max,
        d_c_max=d_c_max,
        d_v_max=d_v_max,
        cn_iter0_first=mk(t_ch, t_ch),
        cn_iter0_rest=mk(max(d_c_max - 3, 0), t_dec, t_ch),
        cn_rest=mk(i_max - 1, d_c_max - 2, t_dec, t_dec),
        vn_first=mk(i_max, t_ch, t_dec),
        vn_rest=mk(i_max, d_v_max - 1, t_dec, t_dec),
        matching_cn=mk(i_max, d_c_max, t_dec) if matching else None,
        matching_vn=mk(i_max, d_v_max, t_dec) if matching else None,
    )


@pytest.mark.parametrize("rule", ["minsum", "bp"])
def test_float_decoder_matches_bruteforce(rng, rule):
    H = small_irregular_H(rng)
    layout = DecodeLayout.from_graph(TannerGraph.from_check_matrix(sp.csr_matrix(H)))
    batch = 3
    llrs = rng.normal(0.7, 2.0, size=(H.shape[1], batch)).astype(np.float32)

    fn = min_sum_decode if rule == "minsum" else belief_propagation_decode
    res = fn(layout, jnp.asarray(llrs), max_iters=5, early_exit=False)
    out = np.asarray(res.outputs)

    for b in range(batch):
        brute, _, _ = brute_float_decode(
            H, llrs[:, b].astype(np.float64), max_iters=5, rule=rule, early_exit=False
        )
        # float32 device path vs float64 brute force: small drift per iteration
        np.testing.assert_allclose(out[:, b], brute, rtol=3e-3, atol=3e-3)


def test_float_decoder_early_exit_iterations(rng):
    # All-zero codeword with strong LLRs decodes immediately.
    H = regular_parity_check(48, 3, 6, seed=1)
    layout = DecodeLayout.from_graph(TannerGraph.from_check_matrix(H))
    llrs = jnp.full((48, 2), 7.0, dtype=jnp.float32)
    res = min_sum_decode(layout, llrs, max_iters=30, early_exit=True)
    assert int(res.iterations) == 1
    assert np.all(np.asarray(res.unsatisfied) == 0)
    assert np.all(np.asarray(res.outputs) > 0)


@pytest.mark.parametrize("matching", [False, True])
def test_lut_decoder_matches_bruteforce(rng, matching):
    H = small_irregular_H(rng)
    g = TannerGraph.from_check_matrix(sp.csr_matrix(H))
    layout = DecodeLayout.from_graph(g)
    t_ch = t_dec = 8
    i_max = 4
    tables = random_trellis_tables(
        rng, t_ch, t_dec, i_max, g.d_c_max, g.d_v_max, matching=matching
    )
    trellis = DeviceTrellis.from_tables(tables)
    batch = 3
    channel = rng.integers(0, t_ch, size=(H.shape[1], batch))

    res = ib_lut_decode(
        layout, trellis, jnp.asarray(channel), max_iters=i_max, early_exit=False
    )
    out = np.asarray(res.outputs)
    for b in range(batch):
        brute, _, _ = brute_lut_decode(
            H, tables, channel[:, b], max_iters=i_max,
            use_matching=matching, early_exit=False,
        )
        np.testing.assert_array_equal(out[:, b], brute)


def test_lut_decoder_bruteforce_with_early_exit(rng):
    """Early-exit path agreement: identity-ish tables drive convergence."""
    H = regular_parity_check(24, 3, 6, seed=3)
    g = TannerGraph.from_check_matrix(H)
    layout = DecodeLayout.from_graph(g)
    t = 8
    i_max = 6
    rng2 = np.random.default_rng(5)
    tables = random_trellis_tables(rng2, t, t, i_max, g.d_c_max, g.d_v_max)
    trellis = DeviceTrellis.from_tables(tables)
    channel = rng2.integers(0, t, size=(24, 2))
    res = ib_lut_decode(
        layout, trellis, jnp.asarray(channel), max_iters=i_max, early_exit=True
    )
    out = np.asarray(res.outputs)
    iters = int(res.iterations)
    # Brute-force runs per codeword; the framework's early exit is
    # batch-global, so rerun brute force with the framework's iteration count.
    for b in range(2):
        brute, _, _ = brute_lut_decode(
            H.toarray(), tables, channel[:, b], max_iters=iters + 1, early_exit=False
        )
        np.testing.assert_array_equal(out[:, b], brute)


def test_wlan_layout_builds():
    g = TannerGraph.from_check_matrix(wlan_80211n_parity_check())
    layout = DecodeLayout.from_graph(g)
    assert layout.n_edges == g.n_edges
    assert layout.data_len == 648
    degrees = sorted(grp.degree for grp in layout.vn_groups)
    assert degrees == [2, 3, 4, 11]


def test_pairwise_lookup_select_matches_take(rng):
    """The TPU compare-select lowering is bit-exact vs the gather lowering."""
    from informationbottleneckdecodingldpc_tpu.ops import lut_fold

    for t0, t1 in [(16, 16), (32, 16), (16, 32), (5, 7)]:
        lut = jnp.asarray(rng.integers(0, 31, size=(t0, t1)), jnp.int32)
        a = jnp.asarray(rng.integers(0, t0, size=(33, 17)), jnp.int32)
        b = jnp.asarray(rng.integers(0, t1, size=(33, 17)), jnp.int32)
        want = np.asarray(lut)[np.asarray(a), np.asarray(b)]
        vmax = int(np.asarray(lut).max()) + 1
        try:
            for mode in ("select", "take", "packed"):
                lut_fold.set_lookup_mode(mode)
                got = lut_fold.pairwise_lookup(lut, a, b, vmax=vmax)
                np.testing.assert_array_equal(np.asarray(got), want, err_msg=mode)
                row = lut[0]
                got_row = lut_fold.vector_lookup(row, b, vmax=vmax)
                np.testing.assert_array_equal(
                    np.asarray(got_row), np.asarray(row)[np.asarray(b)], err_msg=mode
                )
        finally:
            lut_fold.set_lookup_mode(None)


def test_lut_decoder_select_mode_matches_take_mode(rng):
    """Full decode is bit-exact under either lookup lowering."""
    from informationbottleneckdecodingldpc_tpu.ops import lut_fold

    H = small_irregular_H(rng)
    g = TannerGraph.from_check_matrix(H)
    layout = DecodeLayout.from_graph(g)
    tables = random_trellis_tables(
        rng, 16, 16, 4, g.d_c_max, g.d_v_max, matching=True
    )
    trellis = DeviceTrellis.from_tables(tables)
    ch = jnp.asarray(rng.integers(0, 16, size=(g.n_vars, 3)), jnp.int32)
    outs = {}
    try:
        for mode in ("select", "take", "packed"):
            lut_fold.set_lookup_mode(mode)
            outs[mode] = np.asarray(
                ib_lut_decode(layout, trellis, ch, early_exit=False).outputs
            )
    finally:
        lut_fold.set_lookup_mode(None)
    np.testing.assert_array_equal(outs["select"], outs["take"])
    np.testing.assert_array_equal(outs["packed"], outs["take"])
