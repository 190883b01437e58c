"""Shared throughput measurement used by bench.py and scripts/bench_matrix.py.

Both headline surfaces must report the SAME number for the same scenario
(round-2 verdict: bench.py's tuning-grid max disagreed with the matrix's
fixed-batch entry), so the scenario definition and the timing policy live
here: a BERSimulator step at a fixed (batch, steps_per_dispatch), median of
``dispatches`` timed runs after compile + one warm-up dispatch (first
post-compile dispatches through the tunnel are routinely 2x slower). Timings
use a value readback per dispatch — on the tunneled backend
``block_until_ready`` can return before execution finishes, so only
transfers give honest timings.
"""

from __future__ import annotations

import time


# The headline scenario (BASELINE.md north star: decoded Mbit/s per chip at
# i_max=50): WLAN 802.11n N=1296 R=1/2 irregular IB decoder with message
# alignment, |T|=16, fused Pallas backend, all-zeros direct-sampling chain at
# the 0.8 dB design point (low enough that decoding runs essentially all 49
# in-loop iterations). One fixed configuration — no tuning grid.
HEADLINE = dict(
    model="wlan-1296",
    config="wlan_T16_0.8",
    decoder="ib",
    backend="fused",
    chain="allzero",
    # batch 4096 x 8 scanned steps per dispatch: amortizes the tunneled
    # chip's per-dispatch latency that held the round-1..4 headline at
    # 77-78 Mbit/s (round-5: 2048x4 = 78.6, 4096x4 = 82.4, 4096x8 = 90.3).
    batch=4096,
    steps_per_dispatch=8,
    ebn0_db=0.8,
)


def measure_sim_throughput(sim, ebn0_db: float, dispatches: int = 6) -> float:
    """Steady-state coded bits/s of a BERSimulator at one SNR point."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..channel.awgn import sigma2_from_ebn0_db

    qt = sim.quantizer_for(ebn0_db)
    sigma2 = jnp.float32(sigma2_from_ebn0_db(ebn0_db, sim.layout.code_rate))
    root = jax.random.PRNGKey(7)
    run = lambda i: np.asarray(
        sim._step(root, jnp.uint32(i * sim.steps_per_dispatch), qt, sigma2)[0]
    )
    run(1000)  # compile
    run(1001)  # warm
    times = []
    for i in range(dispatches):
        t0 = time.time()
        run(i)
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    bits = sim.layout.n_vars * sim.batch_total * sim.steps_per_dispatch
    return bits / med


def build_headline_sim():
    """The headline BERSimulator, exactly as bench_matrix's wlan_ib_fused."""
    from ..construct import DecoderConfig
    from ..decode import DeviceTrellis
    from ..models import get_model
    from ..models.artifacts import get_or_build_config
    from ..sim import BERSimulator

    import os

    spec = get_model(HEADLINE["model"])
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    cfg = None
    for cand in (
        os.path.join(root, "artifacts", "configs", f"{HEADLINE['config']}.npz"),
        os.path.join(root, "results", "configs", f"{HEADLINE['config']}.npz"),
    ):
        if os.path.exists(cand):
            cfg = DecoderConfig.load(cand)
            break
    if cfg is None:
        cfg = get_or_build_config(spec, ebn0=HEADLINE["ebn0_db"], i_max=50)
    layout = spec.make_layout()
    return BERSimulator(
        layout,
        "ib",
        trellis=DeviceTrellis.from_tables(cfg.tables),
        cardinality_t_channel=cfg.tables.cardinality_t_channel,
        chain=HEADLINE["chain"],
        count_all_bits=False,
        batch_per_device=HEADLINE["batch"],
        n_devices=1,
        seed=0,
        steps_per_dispatch=HEADLINE["steps_per_dispatch"],
        backend=HEADLINE["backend"],
    )
