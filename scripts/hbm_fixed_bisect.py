"""Bisect the ~976 ms fixed per-call cost of the HBM IB kernel (imax=1).

Variants via HBM_DISABLE (subprocesses; knob read at import):
  ''                    full imax=1 call (baseline: 976 ms)
  'decision'            decision fold stubbed (stage+copy only)
  'i0'                  iteration-0 CN pass skipped
  'i0,decision'         both
  'i0,decision,scatter,fold'  everything: bare decision-stage loop
"""
import os, subprocess, sys

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
dec = HBMFusedIBDecoder(layout, cfg.tables, max_iters=1, early_exit=False)
np.asarray(dec(ch).outputs)
print(f"  compile+first: {time.time()-t0:.1f}s", flush=True)
ts = []
for _ in range(4):
    t0 = time.time()
    np.asarray(dec(ch).outputs)
    ts.append(time.time() - t0)
print(f"  median {sorted(ts)[len(ts)//2]*1e3:.1f} ms/call", flush=True)
""" % (ROOT, ROOT)


def main():
    for disable in ("", "decision", "i0", "i0,decision",
                    "i0,decision,scatter,fold"):
        print(f"HBM_DISABLE='{disable}':", flush=True)
        env = dict(os.environ, HBM_DISABLE=disable, HBM_DISABLE_ACK="1")
        subprocess.run([sys.executable, "-c", CHILD], env=env, cwd=ROOT,
                       check=False)


if __name__ == "__main__":
    main()
