"""Compare per-block dispatch vs scan-of-blocks single dispatch on the tunnel."""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from informationbottleneckdecodingldpc_tpu.channel import (
    AWGNChannelQuantizer,
    sigma2_from_ebn0_db,
)
from informationbottleneckdecodingldpc_tpu.channel.quantizer import sample_clusters_with
from informationbottleneckdecodingldpc_tpu.decode import DeviceTrellis, ib_lut_decode
from informationbottleneckdecodingldpc_tpu.models import get_model
from informationbottleneckdecodingldpc_tpu.models.artifacts import get_or_build_config

BATCH = 2048
spec = get_model("wlan-1296")
cfg = get_or_build_config(spec, ebn0=0.8, i_max=50)
layout = spec.make_layout()
trellis = DeviceTrellis.from_tables(cfg.tables)
q = AWGNChannelQuantizer(float(sigma2_from_ebn0_db(0.8, 0.5)), 3.0, 16, 2000)


def block(key):
    bits = jnp.zeros((layout.n_vars, BATCH), jnp.int32)
    clusters = sample_clusters_with(q.device.cdf, key, bits)
    res = ib_lut_decode(layout, trellis, clusters, early_exit=True)
    return jnp.sum(res.outputs < 8, dtype=jnp.int32), res.iterations

mc_block = jax.jit(block)

@jax.jit
def mc_scan(key, n=8):
    def body(c, k):
        e, it = block(k)
        return c + e, it
    keys = jax.random.split(key, n)
    tot, its = jax.lax.scan(body, jnp.int32(0), keys)
    return tot, its

key = jax.random.PRNGKey(0)
jax.block_until_ready(mc_block(key))
jax.block_until_ready(mc_scan(key))

for trial in range(3):
    t0 = time.time()
    outs = [mc_block(jax.random.fold_in(key, i)) for i in range(8)]
    jax.block_until_ready(outs)
    dt = time.time() - t0
    print(f"8x per-block dispatch: {dt*1e3:8.1f} ms  -> {layout.n_vars*BATCH*8/dt/1e6:6.1f} Mbit/s")

    t0 = time.time()
    out = mc_scan(jax.random.fold_in(key, 99))
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"scan-of-8 one dispatch: {dt*1e3:7.1f} ms  -> {layout.n_vars*BATCH*8/dt/1e6:6.1f} Mbit/s  iters={out[1]}")
