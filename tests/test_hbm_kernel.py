"""HBM-resident (DMA-staged) Pallas IB-LUT kernel vs. the XLA path.

The DVB-S2-scale kernel keeps both message views in HBM and streams node
chunks through VMEM (kernels/ib_lut_hbm.py). Same golden-dual strategy as
test_fused_kernel.py: the Pallas interpreter runs the exact kernel on CPU,
the XLA decoder is the reference; fixed iterations => bit-exact.
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
    regular_parity_check,
    regular_qc_parity_check,
)
from informationbottleneckdecodingldpc_tpu.construct import build_decoder_config
from informationbottleneckdecodingldpc_tpu.decode import (
    DecodeLayout,
    DeviceTrellis,
    ib_lut_decode,
)
from informationbottleneckdecodingldpc_tpu.kernels import (
    HBMFusedIBDecoder,
    hbm_supported,
)


@pytest.fixture(scope="module")
def ira_setup():
    """Structured DVB-S2-like IRA code + irregular decoder config (with
    message alignment) — the configuration the HBM kernel exists for."""
    H = dvbs2_like_parity_check(1920, 960, seed=9)
    g = TannerGraph.from_check_matrix(H)
    ck, vk = dvbs2_layout_node_keys(1920, 960)
    ek_csr, ek_csc = dvbs2_layout_edge_keys(H, 960)
    layout = DecodeLayout.from_graph(
        g, cn_node_key=ck, vn_node_key=vk, cn_edge_key=ek_csr, vn_edge_key=ek_csc
    )
    cfg = build_decoder_config(
        design_ebn0_db=1.5,
        cardinality_y_channel=400,
        cardinality_t_channel=16,
        cardinality_t_decoder=16,
        i_max=5,
        H=H,
    )
    return layout, cfg


def test_hbm_supported(ira_setup):
    layout, _ = ira_setup
    assert hbm_supported(layout)
    H = regular_parity_check(96, 3, 6, seed=7)
    rand_layout = DecodeLayout.from_graph(TannerGraph.from_check_matrix(H))
    assert not hbm_supported(rand_layout)


def test_hbm_bit_exact_fixed_iters_irregular(ira_setup, rng):
    layout, cfg = ira_setup
    trellis = DeviceTrellis.from_tables(cfg.tables)
    ch = jnp.asarray(rng.integers(0, 16, (layout.n_vars, 8)), jnp.int32)
    ref = ib_lut_decode(layout, trellis, ch, early_exit=False)
    hbm = HBMFusedIBDecoder(layout, cfg.tables, early_exit=False, batch_tile=8)
    got = hbm(ch)
    assert np.array_equal(np.asarray(ref.outputs), np.asarray(got.outputs))
    assert np.array_equal(
        np.asarray(ref.unsatisfied), np.asarray(got.unsatisfied)
    )
    assert int(ref.iterations) == int(got.iterations)


def test_hbm_bit_exact_early_exit_single_tile(ira_setup, rng):
    # One tile == whole-batch lockstep: early exit matches the XLA path.
    layout, cfg = ira_setup
    trellis = DeviceTrellis.from_tables(cfg.tables)
    ch = jnp.asarray(rng.integers(0, 16, (layout.n_vars, 8)), jnp.int32)
    ref = ib_lut_decode(layout, trellis, ch, early_exit=True)
    hbm = HBMFusedIBDecoder(layout, cfg.tables, early_exit=True, batch_tile=8)
    got = hbm(ch)
    assert np.array_equal(np.asarray(ref.outputs), np.asarray(got.outputs))
    assert int(ref.iterations) == int(got.iterations)


def test_hbm_multi_tile_regular(rng):
    """Multiple lax.map tiles (padding included) on a regular QC code."""
    H = regular_qc_parity_check(96, 3, 6, seed=7)
    layout = DecodeLayout.from_graph(TannerGraph.from_check_matrix(H))
    cfg = build_decoder_config(
        design_ebn0_db=2.0, cardinality_y_channel=400, cardinality_t_channel=16,
        cardinality_t_decoder=16, i_max=4, d_v=3, d_c=6,
    )
    trellis = DeviceTrellis.from_tables(cfg.tables)
    ch = jnp.asarray(rng.integers(0, 16, (layout.n_vars, 20)), jnp.int32)
    ref = ib_lut_decode(layout, trellis, ch, early_exit=False)
    hbm = HBMFusedIBDecoder(layout, cfg.tables, early_exit=False, batch_tile=8)
    got = hbm(ch)  # 3 tiles, last padded
    assert np.array_equal(np.asarray(ref.outputs), np.asarray(got.outputs))
    assert np.array_equal(
        np.asarray(ref.unsatisfied), np.asarray(got.unsatisfied)
    )
