"""Attribute the HBM kernel's ~1 s FIXED per-call cost (hbm_bisect.py).

Times each XLA-side component of one_tile (ib_lut_hbm.py) in isolation:
seed_plan.apply, vn_gather_plan.apply, vn_unperm_plan.apply, the pads.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from informationbottleneckdecodingldpc_tpu.models import get_model

spec = get_model("dvbs2-64800")
layout = spec.make_layout()
rng = np.random.default_rng(0)
ch = jnp.asarray(rng.integers(0, 16, (layout.n_vars, 128)), jnp.int32)
edge = jnp.asarray(rng.integers(0, 16, (layout.n_edges, 128)), jnp.int32)
nodes = jnp.asarray(rng.integers(0, 16, (layout.n_vars, 128)), jnp.int32)

def timed(fn, *a, reps=3):
    np.asarray(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.time(); np.asarray(fn(*a)); ts.append(time.time() - t0)
    return sorted(ts)[len(ts)//2]

for name, fn, arg in [
    ("seed_plan", jax.jit(lambda c: layout.seed_plan.apply(c)[0, :8]), ch),
    ("vn_gather", jax.jit(lambda c: layout.vn_gather_plan.apply(c)[0, :8]), ch),
    ("vn_unperm", jax.jit(lambda c: layout.vn_unperm_plan.apply(c)[0, :8]), nodes),
    ("seed+pad", jax.jit(lambda c: jnp.pad(layout.seed_plan.apply(c), ((0, 4056), (0, 0)))[0, :8]), ch),
]:
    t = timed(fn, arg)
    print(f"{name}: {t*1e3:.1f} ms", flush=True)

plans = {"seed": layout.seed_plan, "gather": layout.vn_gather_plan, "unperm": layout.vn_unperm_plan}
for n, p in plans.items():
    print(f"{n}: use_runs={p.use_runs} runs={len(p.run_len)} tr_ops={p.tr_ops.shape[0]}", flush=True)
