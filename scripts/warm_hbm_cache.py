"""One-time compile of the DVB-S2 HBM-kernel simulation step.

The HBM-resident Pallas kernel for N=64800 (kernels/ib_lut_hbm.py) is a
~1,864-DMA / 40-chunk-fold program per decode iteration; Mosaic's compile
time scales super-linearly with program size, so the first compile takes on
the order of an hour on the tunneled chip (a 1,920-var IRA instance of the
same kernel compiles in ~49 s and is bit-exact on hardware — the cost is
compile-time scaling, not a correctness issue). This script compiles and
persistently caches (.jax_cache) the EXACT jitted Monte-Carlo step used by
both scripts/bench_matrix.py's ``dvbs2_ib_hbm_encoded`` scenario and
scripts/queue.py's DVB-S2 sweeps — batch_per_device=128, steps_per_dispatch=1,
encoded chain, early_exit=True — so every later run loads it in seconds.

Run it as the last TPU job of a session (it holds the chip while compiling):
  nohup python scripts/warm_hbm_cache.py > artifacts/logs/warm_hbm.log 2>&1 &
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from informationbottleneckdecodingldpc_tpu.channel.awgn import (
        sigma2_from_ebn0_db,
    )
    from informationbottleneckdecodingldpc_tpu.construct import DecoderConfig
    from informationbottleneckdecodingldpc_tpu.decode import DeviceTrellis
    from informationbottleneckdecodingldpc_tpu.encode import LDPCEncoder
    from informationbottleneckdecodingldpc_tpu.models import get_model
    from informationbottleneckdecodingldpc_tpu.sim import BERSimulator

    cfg_path = None
    for d in ("artifacts/configs", "results/configs"):
        p = f"{d}/dvbs2_T16_0.6.npz"
        if os.path.exists(p):
            cfg_path = p
            break
    spec = get_model("dvbs2-64800")
    H = spec.make_h()
    layout = spec.make_layout(H)
    cfg = DecoderConfig.load(cfg_path)
    sim = BERSimulator(
        layout,
        "ib",
        trellis=DeviceTrellis.from_tables(cfg.tables),
        cardinality_t_channel=cfg.tables.cardinality_t_channel,
        chain="encoded",
        encoder=LDPCEncoder(H),
        batch_per_device=128,
        n_devices=1,
        seed=0,
        steps_per_dispatch=1,
        backend="hbm",
    )
    qt = sim.quantizer_for(1.0)
    sigma2 = jnp.float32(sigma2_from_ebn0_db(1.0, layout.code_rate))
    root = jax.random.PRNGKey(7)
    print(f"compiling sim step (started {time.strftime('%H:%M:%S')})...",
          flush=True)
    t0 = time.time()
    e, f, it = sim._step(root, jnp.uint32(0), qt, sigma2)
    e = float(np.asarray(e))
    dt = time.time() - t0
    print(f"compiled+ran in {dt:.0f}s; errors={e:.0f}", flush=True)
    t0 = time.time()
    sim._step(root, jnp.uint32(1), qt, sigma2)[0].block_until_ready()
    print(f"steady-state step: {time.time()-t0:.2f}s "
          f"({layout.n_vars*128/(time.time()-t0)/1e6:.1f} Mbit/s coded)",
          flush=True)


if __name__ == "__main__":
    main()
