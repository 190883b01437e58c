"""Split the real HBM IB kernel's call time into fixed vs per-iteration.

stage_replay.py showed the exact stage skeleton runs at 2.3 ms/iter
standalone, yet the full kernel (even with fold+scatter disabled) measures
~21 ms/iter = median_call/49. That division assumed the call cost is all
loop iterations — this script checks it: time the REAL HBMFusedIBDecoder at
max_iters = 1 and 11 (early_exit off). marginal = (t11 - t1)/10 is the true
in-loop per-iteration cost; t1 is the fixed cost (XLA seed/gather/unperm +
i0 CN pass + decision pass + dispatch).
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from informationbottleneckdecodingldpc_tpu.construct import DecoderConfig
from informationbottleneckdecodingldpc_tpu.kernels import HBMFusedIBDecoder
from informationbottleneckdecodingldpc_tpu.models import get_model


def timed(fn, reps=4):
    t0 = time.time()
    np.asarray(fn().outputs)
    print(f"    compile+first: {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn().outputs)
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    spec = get_model("dvbs2-64800")
    layout = spec.make_layout()
    cfg = DecoderConfig.load("results/configs/dvbs2_T16_0.6.npz")
    rng = np.random.default_rng(0)
    ch = jnp.asarray(rng.integers(0, 16, (layout.n_vars, 128)), jnp.int32)
    times = {}
    for imax in (1, 11):
        dec = HBMFusedIBDecoder(
            layout, cfg.tables, max_iters=imax, early_exit=False
        )
        times[imax] = timed(lambda: dec(ch))
        print(f"imax={imax}: {times[imax]*1e3:.1f} ms/call", flush=True)
    marginal = (times[11] - times[1]) / 10
    print(
        f"fixed (seed/gather + i0 + decision + dispatch): {times[1]*1e3:.1f} ms; "
        f"marginal per-iteration: {marginal*1e3:.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
