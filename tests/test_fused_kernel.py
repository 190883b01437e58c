"""Fused Pallas IB-LUT kernel vs. the XLA reference path (bit-exact).

Runs the same kernel the TPU executes through the Pallas interpreter on CPU
(SURVEY.md §4: golden-model duals — here the XLA decoder is the golden twin).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from informationbottleneckdecodingldpc_tpu.codes import TannerGraph
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
    FusedIBDecoder,
    fused_supported,
)


@pytest.fixture(scope="module")
def qc_setup():
    H = regular_qc_parity_check(96, 3, 6, seed=7)
    layout = DecodeLayout.from_graph(TannerGraph.from_check_matrix(H))
    cfg = build_decoder_config(
        design_ebn0_db=2.0,
        cardinality_y_channel=400,
        cardinality_t_channel=16,
        cardinality_t_decoder=16,
        i_max=6,
        d_v=3,
        d_c=6,
    )
    return layout, cfg


def test_fused_supported_structured_vs_random(qc_setup):
    layout, _ = qc_setup
    assert fused_supported(layout)
    H = regular_parity_check(96, 3, 6, seed=7)
    rand_layout = DecodeLayout.from_graph(TannerGraph.from_check_matrix(H))
    assert not fused_supported(rand_layout)


def test_fused_bit_exact_fixed_iters(qc_setup, rng):
    layout, cfg = qc_setup
    trellis = DeviceTrellis.from_tables(cfg.tables)
    ch = jnp.asarray(rng.integers(0, 16, (layout.n_vars, 24)), jnp.int32)
    ref = ib_lut_decode(layout, trellis, ch, early_exit=False)
    fused = FusedIBDecoder(layout, cfg.tables, early_exit=False, batch_tile=8)
    got = fused(ch)  # 3 tiles; fixed iters -> bit-exact incl. tile padding
    assert np.array_equal(np.asarray(ref.outputs), np.asarray(got.outputs))
    assert np.array_equal(
        np.asarray(ref.unsatisfied), np.asarray(got.unsatisfied)
    )
    assert int(ref.iterations) == int(got.iterations)


def test_fused_bit_exact_early_exit_single_tile(qc_setup, rng):
    # One tile == whole-batch lockstep: early exit matches the XLA path too.
    layout, cfg = qc_setup
    trellis = DeviceTrellis.from_tables(cfg.tables)
    ch = jnp.asarray(rng.integers(0, 16, (layout.n_vars, 16)), jnp.int32)
    ref = ib_lut_decode(layout, trellis, ch, early_exit=True)
    fused = FusedIBDecoder(layout, cfg.tables, early_exit=True, batch_tile=16)
    got = fused(ch)
    assert np.array_equal(np.asarray(ref.outputs), np.asarray(got.outputs))
    assert int(ref.iterations) == int(got.iterations)


def test_fused_decodes_noisy_channel(qc_setup):
    # Statistical check: low-noise clusters decode with per-tile early exit.
    layout, cfg = qc_setup
    import jax

    from informationbottleneckdecodingldpc_tpu.channel import (
        AWGNChannelQuantizer,
        sigma2_from_ebn0_db,
    )
    from informationbottleneckdecodingldpc_tpu.channel.quantizer import (
        sample_clusters_with,
    )

    q = AWGNChannelQuantizer(
        float(sigma2_from_ebn0_db(6.0, 0.5)), 3.0, 16, 400
    )
    bits = jnp.zeros((layout.n_vars, 16), jnp.int32)
    clusters = sample_clusters_with(q.device.cdf, jax.random.PRNGKey(3), bits)
    fused = FusedIBDecoder(layout, cfg.tables, early_exit=True, batch_tile=8)
    got = fused(clusters)
    errors = int(np.sum(np.asarray(got.outputs) < 8))
    assert errors == 0
    assert int(np.max(np.asarray(got.unsatisfied))) == 0
    assert int(got.iterations) < 6  # converged well before i_max


def test_engine_fused_backend_matches_xla(qc_setup):
    layout, cfg = qc_setup
    from informationbottleneckdecodingldpc_tpu.sim import BERSimulator

    trellis = DeviceTrellis.from_tables(cfg.tables)
    common = dict(
        layout=layout,
        decoder="ib",
        trellis=trellis,
        chain="allzero",
        count_all_bits=True,
        batch_per_device=16,
        n_devices=1,
        seed=5,
        early_exit=False,  # fixed iters -> identical counters
        cardinality_y_channel=400,
    )
    sim_x = BERSimulator(backend="xla", **common)
    sim_f = BERSimulator(backend="fused", **common)
    rx = sim_x.run_point(2.0, min_errors=1, max_blocks=16)
    rf = sim_f.run_point(2.0, min_errors=1, max_blocks=16)
    assert rx.errors == rf.errors
    assert rx.frame_errors == rf.frame_errors


def test_fused_bit_exact_t32_split_packing(rng):
    """|T|=32 tables take the split 4+1-bit packing (lut_fold._field_bits):
    fused kernel stays bit-exact vs the XLA path."""
    H = regular_qc_parity_check(96, 3, 6, seed=11)
    layout = DecodeLayout.from_graph(TannerGraph.from_check_matrix(H))
    cfg = build_decoder_config(
        design_ebn0_db=2.0,
        cardinality_y_channel=400,
        cardinality_t_channel=32,
        cardinality_t_decoder=32,
        i_max=4,
        d_v=3,
        d_c=6,
    )
    trellis = DeviceTrellis.from_tables(cfg.tables)
    ch = jnp.asarray(rng.integers(0, 32, (layout.n_vars, 8)), jnp.int32)
    ref = ib_lut_decode(layout, trellis, ch, early_exit=False)
    fused = FusedIBDecoder(layout, cfg.tables, early_exit=False, batch_tile=8)
    got = fused(ch)
    assert np.array_equal(np.asarray(ref.outputs), np.asarray(got.outputs))
    assert np.array_equal(
        np.asarray(ref.unsatisfied), np.asarray(got.unsatisfied)
    )
