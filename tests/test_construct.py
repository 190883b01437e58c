import numpy as np
import pytest

import jax
import jax.numpy as jnp

from informationbottleneckdecodingldpc_tpu.channel import AWGNChannelQuantizer
from informationbottleneckdecodingldpc_tpu.codes import TannerGraph, regular_parity_check
from informationbottleneckdecodingldpc_tpu.construct import (
    DecoderConfig,
    build_decoder_config,
    information_matching,
)
from informationbottleneckdecodingldpc_tpu.construct.trellis import TrellisTables
from informationbottleneckdecodingldpc_tpu.decode import (
    DecodeLayout,
    DeviceTrellis,
    make_ib_lut_decoder,
)


@pytest.fixture(scope="module")
def regular_config():
    # Small, fast construction: (3,6) code, |T|=16, i_max=6, design 2.0 dB.
    return build_decoder_config(
        design_ebn0_db=2.0,
        cardinality_y_channel=600,
        cardinality_t_channel=16,
        cardinality_t_decoder=16,
        i_max=10,
        d_v=3,
        d_c=6,
    )


def test_information_matching_identity():
    p = np.array([[0.4, 0.1], [0.1, 0.4]])
    m = information_matching(2, p, p)
    np.testing.assert_array_equal(m.lut, [0, 1])
    np.testing.assert_allclose(m.p_x_and_z, p)


def test_information_matching_argmin_kl(rng):
    # Each t must map to the z whose conditional is closest in KL.
    p_t = rng.random((8, 2)) + 0.05
    p_t /= p_t.sum()
    p_z = rng.random((8, 2)) + 0.05
    p_z /= p_z.sum()
    m = information_matching(8, p_t, p_z)
    from informationbottleneckdecodingldpc_tpu.ib import kl_divergence

    ct = p_t / p_t.sum(1, keepdims=True)
    cz = p_z / p_z.sum(1, keepdims=True)
    for t in range(8):
        assert m.lut[t] == np.argmin(kl_divergence(ct[t], cz))


def test_regular_de_mi_trajectory(regular_config):
    mi = regular_config.mi_trajectory
    # Above threshold, decision-mapping MI must grow towards 1 bit.
    assert mi[-1] > mi[0]
    assert mi[-1] > 0.99
    assert np.all(mi > 0)


def test_trellis_tables_symmetry(regular_config):
    t = regular_config.tables
    T = t.cardinality_t_decoder
    Tch = t.cardinality_t_channel
    # Check node computes an XOR: flipping both inputs leaves the output
    # invariant; flipping one input flips the output cluster.
    lut = t.cn_iter0_first
    np.testing.assert_array_equal(lut, lut[::-1, ::-1])
    np.testing.assert_array_equal(lut, (T - 1) - lut[::-1, :])
    # Variable node combines observations of the same bit: flipping both
    # inputs flips the output.
    for i in range(t.i_max):
        np.testing.assert_array_equal(
            t.vn_first[i], (T - 1) - t.vn_first[i][::-1, ::-1]
        )


def test_flat_roundtrip(regular_config):
    t = regular_config.tables
    cn, vn = t.to_flat()
    t2 = TrellisTables.from_flat(
        cn, vn, t.cardinality_t_channel, t.cardinality_t_decoder,
        t.i_max, t.d_c_max, t.d_v_max,
    )
    np.testing.assert_array_equal(t.cn_iter0_first, t2.cn_iter0_first)
    np.testing.assert_array_equal(t.cn_iter0_rest, t2.cn_iter0_rest)
    np.testing.assert_array_equal(t.cn_rest, t2.cn_rest)
    np.testing.assert_array_equal(t.vn_first, t2.vn_first)
    np.testing.assert_array_equal(t.vn_rest, t2.vn_rest)


def test_config_save_load_roundtrip(regular_config, tmp_path):
    path = str(tmp_path / "config.npz")
    regular_config.save(path)
    loaded = DecoderConfig.load(path)
    assert loaded.design_ebn0_db == regular_config.design_ebn0_db
    np.testing.assert_array_equal(
        loaded.tables.cn_rest, regular_config.tables.cn_rest
    )
    assert not loaded.is_irregular


def test_constructed_decoder_corrects_noise(regular_config):
    """End-to-end: all-zeros codeword through direct-sampled quantizer at the
    design SNR decodes with low BER (SURVEY.md §3.2 fast path)."""
    cfg = regular_config
    H = regular_parity_check(504, 3, 6, seed=11)
    layout = DecodeLayout.from_graph(TannerGraph.from_check_matrix(H))
    trellis = DeviceTrellis.from_tables(cfg.tables)
    q = AWGNChannelQuantizer(
        cfg.sigma2, cfg.ad_max_abs, cfg.tables.cardinality_t_channel,
        cfg.cardinality_y_channel,
    )
    key = jax.random.PRNGKey(0)
    batch = 40
    bits = jnp.zeros((504, batch), dtype=jnp.int32)
    clusters = q.sample_clusters(key, bits)
    decode = make_ib_lut_decoder(layout, trellis, early_exit=True)
    res = decode(clusters)
    hard_bits = np.asarray(res.outputs) < cfg.tables.cardinality_t_decoder // 2
    ber = hard_bits.mean()
    # Raw channel error rate at 2 dB is ~7%; ten decode iterations on this
    # short (3,6) code land around 1-2% with a noticeable converged fraction
    # (full waterfall behavior needs the production i_max, exercised in
    # bench.py on real hardware).
    assert ber < 4e-2
    assert (np.asarray(res.unsatisfied) == 0).mean() > 0.1
