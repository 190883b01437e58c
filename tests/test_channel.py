import numpy as np
import pytest

import jax
import jax.numpy as jnp

from informationbottleneckdecodingldpc_tpu.channel import (
    AWGNChannelQuantizer,
    awgn_transmit,
    bpsk_map,
    ebn0_db_from_sigma2,
    sigma2_from_ebn0_db,
)


def test_bpsk_mapping():
    bits = jnp.array([0, 1, 1, 0])
    np.testing.assert_array_equal(np.asarray(bpsk_map(bits)), [1, -1, -1, 1])


def test_sigma2_roundtrip():
    s2 = sigma2_from_ebn0_db(1.25, 0.5)
    assert ebn0_db_from_sigma2(s2, 0.5) == pytest.approx(1.25)


def test_awgn_statistics():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2000, 8))
    y = awgn_transmit(key, x, 0.49)
    assert float(jnp.mean(y)) == pytest.approx(0.0, abs=0.02)
    assert float(jnp.var(y)) == pytest.approx(0.49, rel=0.05)


def test_quantizer_tables_structure():
    q = AWGNChannelQuantizer(0.5, 3.0, 16, 1000)
    t = q.tables
    # Borders ascend; middle border is exactly 0 (AWGN_Quantizer_BPSK.py:123).
    assert np.all(np.diff(t.limits) > 0)
    assert t.limits[8] == 0.0
    # cdf of p(t|x=0) is a valid monotone cdf.
    assert np.all(np.diff(t.cdf_t_given_x0) >= 0)
    assert t.cdf_t_given_x0[0] == 0.0
    assert t.cdf_t_given_x0[-1] == pytest.approx(1.0, abs=1e-9)
    # LLRs ascend with cluster index and are antisymmetric.
    assert np.all(np.diff(t.output_llrs) > 0)
    np.testing.assert_allclose(t.output_llrs, -t.output_llrs[::-1], atol=1e-9)
    # Quantizer preserves most of the channel information.
    assert t.mi_xt > 0.95 * t.mi_xy


def test_quantize_thresholds():
    q = AWGNChannelQuantizer(0.5, 3.0, 16, 1000)
    y = jnp.array([[-10.0, -0.001, 0.001, 10.0]]).T
    clusters = np.asarray(q.quantize(y))[:, 0]
    assert clusters[0] == 0
    assert clusters[1] == 7  # just below 0 -> last bit-1 cluster
    assert clusters[2] == 8  # just above 0 -> first bit-0 cluster
    assert clusters[3] == 15


def test_direct_sampling_distribution():
    q = AWGNChannelQuantizer(0.8, 3.0, 8, 1000)
    key = jax.random.PRNGKey(42)
    n = 200_000
    bits = jnp.zeros((n,), dtype=jnp.int32)
    t = np.asarray(q.sample_clusters(key, bits))
    emp = np.bincount(t, minlength=8) / n
    expect = np.diff(q.tables.cdf_t_given_x0)
    np.testing.assert_allclose(emp, expect, atol=5e-3)
    # Mirroring: bit 1 distribution is the reverse.
    t1 = np.asarray(q.sample_clusters(key, jnp.ones((n,), dtype=jnp.int32)))
    emp1 = np.bincount(t1, minlength=8) / n
    np.testing.assert_allclose(emp1, expect[::-1], atol=5e-3)


def test_quantized_channel_end_to_end_consistency():
    """quantize(awgn(bpsk(bits))) distribution matches p(t|x) of the tables."""
    q = AWGNChannelQuantizer(0.6, 3.0, 16, 2000)
    key = jax.random.PRNGKey(7)
    n = 100_000
    x = jnp.ones((n,))  # bit 0 -> +1
    y = awgn_transmit(key, x, 0.6)
    t = np.asarray(q.quantize(y))
    emp = np.bincount(t, minlength=16) / n
    expect = q.tables.p_x_and_t[:, 0] / 0.5
    np.testing.assert_allclose(emp, expect, atol=6e-3)


class TestModulation:
    def test_bpsk_convention(self):
        import jax.numpy as jnp
        from informationbottleneckdecodingldpc_tpu.channel import bpsk_map

        bits = jnp.array([[0, 1], [1, 0]], jnp.int8)
        np.testing.assert_array_equal(
            np.asarray(bpsk_map(bits)), [[1.0, -1.0], [-1.0, 1.0]]
        )

    def test_gray_table_adjacent_rows_differ_by_one_bit(self):
        from informationbottleneckdecodingldpc_tpu.channel import gray_encoding_table

        t = gray_encoding_table(3)
        assert t.shape == (8, 3)
        diffs = (t[1:] != t[:-1]).sum(axis=1)
        np.testing.assert_array_equal(diffs, np.ones(7))

    def test_qam16_unit_average_energy_and_constellation(self):
        import itertools
        import jax.numpy as jnp
        from informationbottleneckdecodingldpc_tpu.channel import (
            gray_encoding_table,
            qam_map,
        )

        table = gray_encoding_table(2)
        # all 16 four-bit patterns, one symbol each
        bits = np.array(list(itertools.product([0, 1], repeat=4))).T  # [4, 16]
        from informationbottleneckdecodingldpc_tpu.channel import iq_to_complex

        sym = qam_map(jnp.asarray(bits), table, 4)
        assert sym.shape == (1, 16, 2)
        pts = iq_to_complex(sym).ravel()
        # 16 distinct points on the {-3,-1,1,3}^2 grid * d_min/2
        d = np.sqrt(6.0 / 15.0) / 2
        np.testing.assert_allclose(
            sorted(np.unique(np.round(pts.real / d))), [-3, -1, 1, 3]
        )
        assert len(np.unique(np.round(pts / d, 3))) == 16
        np.testing.assert_allclose(np.mean(np.abs(pts) ** 2), 1.0, rtol=1e-6)

    def test_qam_gray_neighbors_one_bit(self):
        """Adjacent PAM levels differ in exactly one bit of their half-label."""
        import itertools
        import jax.numpy as jnp
        from informationbottleneckdecodingldpc_tpu.channel import (
            gray_encoding_table,
            qam_map,
        )
        from informationbottleneckdecodingldpc_tpu.channel.modulation import (
            qam_tables,
        )

        table = gray_encoding_table(2)
        amps, _ = qam_tables(table, 4)
        order = np.argsort(amps)  # natural values in increasing-level order
        labels = [f"{v:02b}" for v in order]
        for a, b in zip(labels[:-1], labels[1:]):
            assert sum(x != y for x, y in zip(a, b)) == 1

    def test_mpsk_unit_energy_and_phases(self):
        import itertools
        import jax.numpy as jnp
        from informationbottleneckdecodingldpc_tpu.channel import (
            gray_encoding_table,
            mpsk_map,
        )

        table = gray_encoding_table(3)
        bits = np.array(list(itertools.product([0, 1], repeat=3))).T  # [3, 8]
        from informationbottleneckdecodingldpc_tpu.channel import iq_to_complex

        sym = iq_to_complex(mpsk_map(jnp.asarray(bits), table, 8)).ravel()
        np.testing.assert_allclose(np.abs(sym), 1.0, rtol=1e-6)
        angles = np.sort(np.mod(np.angle(sym), 2 * np.pi))
        np.testing.assert_allclose(angles, 2 * np.pi / 8 * np.arange(8), atol=1e-6)

    def test_uncoded_transmitter_shapes(self):
        import jax
        from informationbottleneckdecodingldpc_tpu.channel import Transmitter

        tx = Transmitter(sequence_len=16, modulation="qam", order=4)
        sym, bits = tx.transmit(jax.random.PRNGKey(0), 5)
        assert bits.shape == (16, 5)
        assert sym.shape == (4, 5, 2)

    def test_ldpc_transmitter_valid_codewords(self):
        import jax
        from informationbottleneckdecodingldpc_tpu.channel import LDPCTransmitter
        from informationbottleneckdecodingldpc_tpu.codes import regular_parity_check
        from informationbottleneckdecodingldpc_tpu.encode import LDPCEncoder

        H = regular_parity_check(48, 3, 6, seed=0)
        enc = LDPCEncoder(H)
        tx = LDPCTransmitter(enc, modulation="bpsk")
        sym, info, cw = tx.transmit(jax.random.PRNGKey(1), 4)
        assert sym.shape == (48, 4)
        syndrome = enc.check(np.asarray(cw))
        assert not syndrome.any()
        np.testing.assert_array_equal(np.asarray(cw)[: enc.k], np.asarray(info))
