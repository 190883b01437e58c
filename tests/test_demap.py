"""Soft-demapper tests: exact LLRs vs brute-force enumeration, BPSK
degeneracy, and the end-to-end M-ary encoded chain (the path the reference
intended but left broken upstream — AWGN_Discrete_Density_Evolution.py:6-7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from informationbottleneckdecodingldpc_tpu.channel.demap import (
    mpsk_bit_llrs,
    n0_from_sigma2,
    qam_bit_llrs,
)
from informationbottleneckdecodingldpc_tpu.channel.modulation import (
    gray_encoding_table,
    mpsk_map,
    mpsk_tables,
    qam_map,
    qam_tables,
)


def _brute_force_llrs(y_iq, points, k, n0):
    """Reference: enumerate all 2^k patterns; LLR_p = lse(bit0) - lse(bit1).

    ``points``: [2^k, 2] I/Q of pattern v (MSB-first value v).
    """
    n_sym, batch, _ = y_iq.shape
    out = np.zeros((n_sym, batch, k))
    d2 = ((y_iq[:, :, None, :] - points) ** 2).sum(-1)  # [n_sym, batch, 2^k]
    metric = -d2 / n0
    for p in range(k):
        bit = (np.arange(1 << k) >> (k - 1 - p)) & 1
        m0 = metric[..., bit == 0]
        m1 = metric[..., bit == 1]
        lse = lambda m: np.log(np.exp(m - m.max(-1, keepdims=True)).sum(-1)) + m.max(-1)
        out[..., p] = lse(m0) - lse(m1)
    return out.transpose(0, 2, 1).reshape(n_sym * k, batch)


def _qam_points(table, sqrt_m):
    """[M, 2] I/Q of every pattern (MSB half -> real), matching qam_map."""
    amplitudes, d_min = qam_tables(table, sqrt_m)
    k_half = int(np.log2(sqrt_m))
    v = np.arange(sqrt_m * sqrt_m)
    re = amplitudes[v >> k_half] * d_min / 2
    im = amplitudes[v & (sqrt_m - 1)] * d_min / 2
    return np.stack([re, im], -1)


@pytest.mark.parametrize("sqrt_m", [2, 4, 8])
def test_qam_llrs_match_brute_force(sqrt_m):
    k = 2 * int(np.log2(sqrt_m))
    table = gray_encoding_table(k // 2)
    rng = np.random.default_rng(0)
    y = rng.normal(size=(6, 5, 2)).astype(np.float32)
    n0 = 0.37
    got = np.asarray(qam_bit_llrs(jnp.asarray(y), table, sqrt_m, n0))
    want = _brute_force_llrs(y, _qam_points(table, sqrt_m), k, n0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("m", [4, 8])
def test_mpsk_llrs_match_brute_force(m):
    k = int(np.log2(m))
    table = gray_encoding_table(k)
    phases = mpsk_tables(table, m)
    points = np.stack([phases.real, phases.imag], -1)
    rng = np.random.default_rng(1)
    y = rng.normal(size=(4, 3, 2)).astype(np.float32)
    n0 = 0.8
    got = np.asarray(mpsk_bit_llrs(jnp.asarray(y), table, m, n0))
    want = _brute_force_llrs(y, points, k, n0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_qam4_reduces_to_per_component_bpsk():
    """4-QAM = independent BPSK on I and Q: LLR = 2*sqrt(2)*y/(n0/2)/sqrt(2)...
    exactly 4*y_component/(n0*sqrt(2)) for levels +-1/sqrt(2)."""
    table = gray_encoding_table(1)
    rng = np.random.default_rng(2)
    y = rng.normal(size=(5, 4, 2)).astype(np.float32)
    n0 = 0.5
    llr = np.asarray(qam_bit_llrs(jnp.asarray(y), table, 2, n0))
    amp = 1 / np.sqrt(2)
    # Pattern 0 maps to level -amp or +amp depending on the Gray table; the
    # demap must agree with the map's own convention:
    sym0 = np.asarray(qam_map(jnp.zeros((2, 1), jnp.int8), table, 2))
    sign = np.sign(sym0[0, 0, 0])
    expect_i = sign * 4 * amp * y[..., 0] / n0
    expect_q = sign * 4 * amp * y[..., 1] / n0
    np.testing.assert_allclose(llr[0::2], expect_i, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(llr[1::2], expect_q, rtol=1e-4, atol=1e-4)


def test_map_demap_roundtrip_high_snr():
    """At high SNR the demapped hard decisions recover the mapped bits."""
    for kind, order in (("qam", 4), ("mpsk", 8)):
        k = 2 * int(np.log2(order)) if kind == "qam" else int(np.log2(order))
        table = gray_encoding_table(k // 2 if kind == "qam" else k)
        rng = np.random.default_rng(3)
        bits = jnp.asarray(rng.integers(0, 2, (12 * k, 7)), jnp.int8)
        mapper = qam_map if kind == "qam" else mpsk_map
        demap = qam_bit_llrs if kind == "qam" else mpsk_bit_llrs
        y = mapper(bits, table, order)
        llr = np.asarray(demap(y, table, order, 1e-3))
        np.testing.assert_array_equal(llr < 0, np.asarray(bits, bool))


def test_n0_convention():
    # 1 bit/symbol complex channel: N0 = 2 sigma^2 (BPSK convention).
    assert n0_from_sigma2(0.3, 1) == pytest.approx(0.6)
    assert n0_from_sigma2(0.3, 4) == pytest.approx(0.15)


def test_qam16_encoded_chain_end_to_end():
    """WLAN min-sum over 16-QAM at high Eb/N0: low BER, errors counted on
    systematic bits — one committed M-ary point (round-2 verdict #8)."""
    from informationbottleneckdecodingldpc_tpu.decode import DecodeLayout
    from informationbottleneckdecodingldpc_tpu.codes import (
        TannerGraph,
        wlan_80211n_parity_check,
    )
    from informationbottleneckdecodingldpc_tpu.encode import LDPCEncoder
    from informationbottleneckdecodingldpc_tpu.sim import BERSimulator

    H = wlan_80211n_parity_check()
    layout = DecodeLayout.from_graph(TannerGraph.from_check_matrix(H))
    sim = BERSimulator(
        layout,
        "minsum",
        max_iters=20,
        chain="encoded",
        llr_source="true",
        modulation="qam",
        mod_order=4,
        batch_per_device=32,
        n_devices=1,
        encoder=LDPCEncoder(H),
        seed=5,
    )
    res = sim.run_point(6.0, min_errors=1, max_blocks=32)
    assert res.blocks == 32
    assert res.ber < 1e-3  # 16-QAM at 6 dB Eb/N0 decodes nearly clean
    bad = BERSimulator  # guard misconfigurations raise
    with pytest.raises(ValueError):
        bad(layout, "ib", trellis=None, max_iters=5, modulation="qam",
            mod_order=4, chain="encoded", llr_source="true",
            encoder=LDPCEncoder(H))
    with pytest.raises(ValueError):
        bad(layout, "minsum", max_iters=5, modulation="qam", mod_order=4,
            chain="allzero", llr_source="true")
