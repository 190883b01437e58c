"""HBM IB kernel timing with SCALAR readback (the round-5 correction).

Every prior raw-call timing of this kernel (try_hbm_r4b, hbm_isolate,
hbm_bisect) fetched the full [64800, 128] outputs = 33 MB through the
tunneled chip per call -- ~0.8 s of fluctuating tunnel time that was
misattributed as kernel cost ("21 ms/iter fixed"). Here each call is
reduced to ONE scalar on device before readback, like the sim engine's
dispatch loop; differencing imax=1 vs imax=31 gives the true marginal
per-iteration cost.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from informationbottleneckdecodingldpc_tpu.construct import DecoderConfig
from informationbottleneckdecodingldpc_tpu.kernels import HBMFusedIBDecoder
from informationbottleneckdecodingldpc_tpu.models import get_model

spec = get_model("dvbs2-64800")
layout = spec.make_layout()
cfg = DecoderConfig.load("results/configs/dvbs2_T16_0.6.npz")
rng = np.random.default_rng(0)
ch = jnp.asarray(rng.integers(0, 16, (layout.n_vars, 128)), jnp.int32)

def timed(fn, reps=5):
    t0 = time.time(); float(np.asarray(fn()))
    print(f"    compile+first: {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.time(); float(np.asarray(fn())); ts.append(time.time() - t0)
    return sorted(ts)[len(ts)//2]

times = {}
for imax in (1, 31):
    dec = HBMFusedIBDecoder(layout, cfg.tables, max_iters=imax, early_exit=False)
    scalar = jax.jit(lambda c: jnp.sum(dec(c).outputs, dtype=jnp.int32))
    times[imax] = timed(lambda: scalar(ch))
    print(f"imax={imax}: {times[imax]*1e3:.1f} ms/call (scalar readback)", flush=True)
marg = (times[31] - times[1]) / 30
coded = layout.n_vars * 128
print(f"fixed: {times[1]*1e3:.1f} ms; marginal: {marg*1e3:.2f} ms/iter; "
      f"implied 50-iter coded throughput "
      f"{coded/(times[1] + 49*marg)/1e6:.1f} Mbit/s", flush=True)
