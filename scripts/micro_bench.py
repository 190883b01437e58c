"""Micro-benchmark the IB LUT decode pipeline pieces on the real chip."""

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
import numpy as np

from informationbottleneckdecodingldpc_tpu.decode import (
    DecodeLayout,
    DeviceTrellis,
    ib_lut_decode,
)
from informationbottleneckdecodingldpc_tpu.decode.common import (
    apply_per_cn_group,
    apply_per_vn_group,
    gather_node_values_per_group,
    unsatisfied_checks,
)
from informationbottleneckdecodingldpc_tpu.decode.ib_lut import _apply_matching
from informationbottleneckdecodingldpc_tpu.models import get_model
from informationbottleneckdecodingldpc_tpu.models.artifacts import get_or_build_config
from informationbottleneckdecodingldpc_tpu.ops.lut_fold import (
    cn_lut_leave_one_out,
    vn_lut_leave_one_out,
)

BATCH = int(os.environ.get("BENCH_BATCH", "2048"))


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:34s} {dt*1e3:9.3f} ms")
    return dt


def main():
    spec = get_model("wlan-1296")
    cfg = get_or_build_config(spec, ebn0=0.8, i_max=50)
    layout = spec.make_layout()
    trellis = DeviceTrellis.from_tables(cfg.tables)
    print(f"edges={layout.n_edges} batch={BATCH}")
    print(f"to_vn runs={layout.to_vn.num_runs} use_runs={layout.to_vn.use_runs}")
    print(f"to_cn runs={layout.to_cn.num_runs} use_runs={layout.to_cn.use_runs}")

    key = jax.random.PRNGKey(0)
    edge = jax.random.randint(key, (layout.n_edges, BATCH), 0, 16, jnp.int32)
    ch = jax.random.randint(key, (layout.n_vars, BATCH), 0, 16, jnp.int32)

    to_vn = jax.jit(lambda x: layout.to_vn.apply(x))
    to_cn = jax.jit(lambda x: layout.to_cn.apply(x))
    timeit("to_vn permutation", to_vn, edge)
    timeit("to_cn permutation", to_cn, edge)

    vmax = trellis.t_decoder
    cn_rest_i = trellis.cn_rest[0]

    @jax.jit
    def cn_pass(x):
        def cn_update(msgs, grp):
            out = cn_lut_leave_one_out(
                msgs, [cn_rest_i[l] for l in range(grp.degree - 2)], vmax=vmax
            )
            if trellis.matching_cn is not None:
                out = _apply_matching(trellis.matching_cn[1], grp.degree, out, vmax)
            return out
        return apply_per_cn_group(layout, x, cn_update)

    timeit("CN update (one iter)", cn_pass, edge)

    ch_groups = gather_node_values_per_group(layout, ch)
    vn_first_i = trellis.vn_first[0]
    vn_rest_i = trellis.vn_rest[0]

    @jax.jit
    def vn_pass(x):
        def vn_update(chv, msgs, grp):
            d = grp.degree
            out = vn_lut_leave_one_out(
                chv, msgs, vn_first_i,
                [vn_rest_i[l] for l in range(max(d - 2, 0))], vmax=vmax,
            )
            if trellis.matching_vn is not None and d > 1:
                out = _apply_matching(trellis.matching_vn[0], d, out, vmax)
            return out
        return apply_per_vn_group(layout, x, ch_groups, vn_update)

    timeit("VN update (one iter)", vn_pass, edge)

    syn = jax.jit(lambda x: unsatisfied_checks(layout, x < 8))
    timeit("syndrome", syn, edge)

    # Full iteration body fused as scan step (no early exit) for 50 iters
    dec_scan = jax.jit(
        lambda c: ib_lut_decode(layout, trellis, c, early_exit=False).outputs
    )
    t = timeit("full decode scan i_max=50", dec_scan, ch, reps=3)
    print(f"  -> per-iter {t/49*1e3:.3f} ms ; coded {layout.n_vars*BATCH/t/1e6:.1f} Mbit/s")

    dec_ee = jax.jit(
        lambda c: ib_lut_decode(layout, trellis, c, early_exit=True).outputs
    )
    t = timeit("full decode while i_max=50", dec_ee, ch, reps=3)
    print(f"  -> coded {layout.n_vars*BATCH/t/1e6:.1f} Mbit/s")


if __name__ == "__main__":
    main()


def sampler_bench():
    from informationbottleneckdecodingldpc_tpu.channel import (
        AWGNChannelQuantizer,
        sigma2_from_ebn0_db,
    )
    from informationbottleneckdecodingldpc_tpu.channel.quantizer import (
        sample_clusters_with,
    )
    spec = get_model("wlan-1296")
    layout = spec.make_layout()
    q = AWGNChannelQuantizer(float(sigma2_from_ebn0_db(0.8, 0.5)), 3.0, 16, 2000)
    key = jax.random.PRNGKey(0)
    bits = jnp.zeros((layout.n_vars, BATCH), jnp.int32)
    f = jax.jit(lambda k: sample_clusters_with(q.device.cdf, k, bits))
    timeit("sample_clusters", f, key)


if __name__ == "__main__":
    sampler_bench()
