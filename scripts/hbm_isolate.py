"""Attribute the HBM DVB-S2 kernel's per-iteration time on hardware.

Runs the fixed-50-iteration decode under HBM_DISABLE={'', 'scatter', 'fold',
'scatter,fold'} in subprocesses (the knob is read at import) and prints the
ms/iter of each variant. The disabled variants are semantically WRONG — they
exist only to attribute time between the fold compute, the routed-write
scatter program, and the staging/loop skeleton.

CAUTION (round-5 postmortem): this script's np.asarray(outputs) fetches the
full 33 MB result through the tunneled chip per call (~0.8 s, fluctuating),
which dominates and invalidates the per-iteration division — exactly why
every variant here measured "~21 ms/iter". Use scripts/hbm_scalar_timing.py
(scalar readback + trip-count differencing) for honest numbers.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(%r, ".jax_cache"))
sys.path.insert(0, %r)
import numpy as np, jax.numpy as jnp
from informationbottleneckdecodingldpc_tpu.construct import DecoderConfig
from informationbottleneckdecodingldpc_tpu.kernels import HBMFusedIBDecoder
from informationbottleneckdecodingldpc_tpu.models import get_model

spec = get_model("dvbs2-64800")
layout = spec.make_layout()
cfg = DecoderConfig.load("results/configs/dvbs2_T16_0.6.npz")
rng = np.random.default_rng(0)
ch = jnp.asarray(rng.integers(0, 16, (layout.n_vars, 128)), jnp.int32)
t0 = time.time()
dec = HBMFusedIBDecoder(layout, cfg.tables, max_iters=50, early_exit=False)
np.asarray(dec(ch).outputs)
print(f"  compile+first: {time.time()-t0:.1f}s", flush=True)
ts = []
for _ in range(4):
    t0 = time.time()
    np.asarray(dec(ch).outputs)
    ts.append(time.time() - t0)
med = sorted(ts)[len(ts) // 2]
print(f"  median {med*1e3:.1f} ms = {med/49*1e3:.2f} ms/iter", flush=True)
""" % (ROOT, ROOT)


def main():
    for disable in ("", "scatter", "fold", "scatter,fold"):
        print(f"HBM_DISABLE='{disable}':", flush=True)
        env = dict(os.environ, HBM_DISABLE=disable)
        subprocess.run(
            [sys.executable, "-c", CHILD], env=env, cwd=ROOT, check=False
        )


if __name__ == "__main__":
    main()
