"""Full benchmark matrix + roofline (BASELINE.md:31-34).

Measures steady-state decoded throughput on the real chip for every decode
mode / code family the reference benchmarks, plus a roofline for every
scenario. The roofline is a BOUND (round-2 verdict #5: fraction_of_sol must
be <= 1 by construction):

- IB LUT scenarios: exact VPU element-op count per iteration (traced through
  the packed lookup primitives, ops/lut_fold.counting_ops) against a peak op
  rate measured on an ILP-rich chain of the same op mix (independent
  accumulator chains, so dual-issue and cmp+select fusion are visible in the
  peak exactly as they are available to the kernels — the round-2 peak was a
  single dependent chain, which UNDERstated the ceiling and produced
  fractions > 1).
- float (min-sum / BP) scenarios: minimum HBM traffic per iteration (read +
  write of both [n_edges, batch] float32 message views per half-iteration)
  against measured copy bandwidth.

The effective iteration count is the MEASURED mean (early exit included), so
throughput and bound describe the same run.

Writes results/BENCH_MATRIX.json. Run after the BER parity sweeps (one chip).
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_sim(sim, ebn0, dispatches=4):
    """(coded bits/s, measured mean in-loop iterations) at one SNR point."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from informationbottleneckdecodingldpc_tpu.channel.awgn import (
        sigma2_from_ebn0_db,
    )

    qt = sim.quantizer_for(ebn0)
    sigma2 = jnp.float32(sigma2_from_ebn0_db(ebn0, sim.layout.code_rate))
    root = jax.random.PRNGKey(7)

    def run(i):
        e, f, it = sim._step(root, jnp.uint32(i * sim.steps_per_dispatch), qt, sigma2)
        return float(np.asarray(e)), float(np.mean(np.asarray(it)))

    run(1000)  # compile
    run(1001)  # warm
    times, iters = [], []
    for i in range(dispatches):
        t0 = time.time()
        _, it = run(i)
        times.append(time.time() - t0)
        iters.append(it)
    med = sorted(times)[len(times) // 2]
    bits = sim.layout.n_vars * sim.batch_total * sim.steps_per_dispatch
    return bits / med, sum(iters) / len(iters)


def ib_ops_per_iteration(layout, trellis):
    """Exact VPU element-ops of one decode iteration per codeword (batch 1),
    by differencing two abstract traces (the scan body is traced once;
    max_iters=1 skips the loop)."""
    import jax
    import jax.numpy as jnp

    from informationbottleneckdecodingldpc_tpu.decode import ib_lut_decode
    from informationbottleneckdecodingldpc_tpu.ops import lut_fold

    spec = jax.ShapeDtypeStruct((layout.n_vars, 1), jnp.int32)

    prev = lut_fold._FORCE_MODE
    lut_fold.set_lookup_mode("packed")
    try:
        def trace(max_iters):
            with lut_fold.counting_ops() as c:
                jax.eval_shape(
                    lambda ch: ib_lut_decode(
                        layout, trellis, ch, max_iters=max_iters, early_exit=False
                    ),
                    spec,
                )
            return sum(c.values())

        return trace(2) - trace(1)
    finally:
        lut_fold.set_lookup_mode(prev)


def measure_peak_int_ops(reps=6):
    """Peak elementwise int32 op rate: FOUR independent accumulator chains of
    the packed-LUT op mix (cmp feeding selects, shift, xor), so ILP /
    dual-issue and compiler cmp+select fusion are reflected in the peak. This
    makes the rate an upper bound on what any dependent kernel chain of the
    same jnp-level ops can achieve."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    shape = (1024, 1024)
    rounds = 4096  # 4 chains x 4 ops/round: ~69 G ops/call

    @jax.jit
    def chain(a, b, c, d):
        def body(carry, i):
            a, b, c, d = carry
            # Same mix as _select_columns/_extract: one compare feeding
            # selects, plus shift/xor field ops, on independent registers.
            a = jnp.where(a > i, a + 1, a)
            b = jnp.where(b > i, b ^ 3, b)
            c = jnp.where(c > i, c + 2, c)
            d = jnp.where(d > i, d ^ 1, d)
            a = (a >> 1) ^ a
            b = (b >> 2) ^ b
            c = (c >> 1) ^ c
            d = (d >> 2) ^ d
            return (a, b, c, d), ()

        (a, b, c, d), _ = jax.lax.scan(
            body, (a, b, c, d), jnp.arange(rounds, dtype=jnp.int32)
        )
        return (
            jnp.sum(a, dtype=jnp.int32)
            + jnp.sum(b, dtype=jnp.int32)
            + jnp.sum(c, dtype=jnp.int32)
            + jnp.sum(d, dtype=jnp.int32)
        )

    # jnp-level count per round: 4 chains x (cmp, select, shift, xor) = 16.
    ops_per_elem = rounds * 4 * 4
    x = [jnp.ones(shape, jnp.int32) * (i + 1) for i in range(4)]
    np.asarray(chain(*x))
    times = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(chain(*x))
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    return shape[0] * shape[1] * ops_per_elem / med


def measure_hbm_bandwidth(reps=6):
    """Measured HBM copy bandwidth (bytes/s, read+write counted): a scan of
    jnp.roll steps over a 256 MB buffer — each step is a full-array read +
    write that cannot fuse with its neighbours."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    shape = (8192, 8192)  # 256 MB int32
    rounds = 16

    @jax.jit
    def chain(x):
        def body(y, _):
            return jnp.roll(y, 1, axis=0), ()

        y, _ = jax.lax.scan(body, x, None, length=rounds)
        return jnp.sum(y[0], dtype=jnp.int32)

    x = jnp.ones(shape, jnp.int32)
    np.asarray(chain(x))
    times = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(chain(x))
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    return 2 * shape[0] * shape[1] * 4 * rounds / med


def main():
    from informationbottleneckdecodingldpc_tpu.construct import DecoderConfig
    from informationbottleneckdecodingldpc_tpu.decode import DeviceTrellis
    from informationbottleneckdecodingldpc_tpu.encode import LDPCEncoder
    from informationbottleneckdecodingldpc_tpu.models import get_model
    from informationbottleneckdecodingldpc_tpu.sim import BERSimulator
    from informationbottleneckdecodingldpc_tpu.utils.benchmarks import HEADLINE

    out = {"unit": "coded_bits_per_s", "scenarios": {}}
    info = {}  # name -> (layout, trellis|None, decoder)

    def find_config(name):
        for d in ("artifacts/configs", "results/configs"):
            p = f"{d}/{name}.npz"
            if os.path.exists(p):
                return p
        raise FileNotFoundError(f"no decoder config {name}.npz")

    def scenario(name, model, decoder, *, config=None, chain="allzero",
                 backend="auto", batch=512, steps=4, ebn0=None, max_iters=None):
        spec = get_model(model)
        H = spec.make_h()
        layout = spec.make_layout(H)
        kw = dict(
            chain=chain,
            count_all_bits=spec.count_all_bits and chain == "allzero",
            batch_per_device=batch,
            n_devices=1,
            seed=0,
            steps_per_dispatch=steps,
            backend=backend if decoder == "ib" else "auto",
        )
        if decoder == "ib":
            cfg = DecoderConfig.load(find_config(config))
            kw["trellis"] = DeviceTrellis.from_tables(cfg.tables)
            kw["cardinality_t_channel"] = cfg.tables.cardinality_t_channel
        else:
            kw["max_iters"] = max_iters or spec.decode_i_max
        if chain == "encoded":
            kw["encoder"] = LDPCEncoder(H)
        sim = BERSimulator(layout, decoder, **kw)
        point = ebn0 if ebn0 is not None else spec.design_ebn0_db
        bps, mean_iters = measure_sim(sim, point)
        out["scenarios"][name] = {
            "coded_mbps": round(bps / 1e6, 3),
            "model": model, "decoder": decoder, "chain": chain,
            "backend": backend if decoder == "ib" else "-",
            "batch": batch, "ebn0_db": point,
            "mean_iterations": round(mean_iters, 2),
        }
        info[name] = (layout, kw.get("trellis"), decoder)
        print(f"{name}: {bps/1e6:.2f} Mbit/s coded ({mean_iters:.1f} iters)",
              flush=True)

    # The reference's four WLAN decode modes + both big codes.
    scenario("wlan_ib_fused", "wlan-1296", "ib",
             config="wlan_T16_0.8", backend="fused",
             batch=HEADLINE["batch"], steps=HEADLINE["steps_per_dispatch"])
    scenario("wlan_ib_xla", "wlan-1296", "ib",
             config="wlan_T16_0.8", backend="xla", batch=2048)
    scenario("wlan_ib_fused_encoded", "wlan-1296", "ib", chain="encoded",
             config="wlan_T16_0.8", backend="fused", batch=2048)
    scenario("wlan_minsum", "wlan-1296", "minsum", batch=2048, max_iters=50,
             ebn0=2.0)
    scenario("wlan_bp_quant", "wlan-1296", "bp", batch=2048, max_iters=50,
             ebn0=2.0)
    scenario("wlan_T32_ib_fused", "wlan-1296-T32", "ib",
             config="wlan_T32_0.6", backend="fused", batch=1024)
    scenario("regular8000_ib_fused", "regular-3-6-8000", "ib",
             config="regular_T16_1.05", backend="fused", batch=512, ebn0=1.05)
    scenario("regular8000_minsum", "regular-3-6-8000", "minsum", batch=512,
             max_iters=50, ebn0=2.0)
    scenario("dvbs2_ib_hbm_encoded", "dvbs2-64800", "ib", chain="encoded",
             config="dvbs2_T16_0.6", backend="hbm", batch=128,
             steps=1, ebn0=1.0)
    scenario("dvbs2_ib_xla_encoded", "dvbs2-64800", "ib", chain="encoded",
             config="dvbs2_T16_0.6", backend="xla", batch=128,
             steps=1, ebn0=1.0)
    scenario("dvbs2_minsum", "dvbs2-64800", "minsum", batch=128, steps=1,
             max_iters=50, ebn0=1.0)

    # ---- roofline: every scenario gets a bound ----
    peak_ops = measure_peak_int_ops()
    bw = measure_hbm_bandwidth()
    roof = {
        "measured_peak_int32_ops_per_s_G": round(peak_ops / 1e9, 1),
        "measured_hbm_bandwidth_GBps": round(bw / 1e9, 1),
        "note": (
            "IB bounds: exact jnp-level op counts against an ILP-rich peak "
            "of the same op mix (upper bound on any dependent kernel chain). "
            "Float bounds: minimum message-view HBM traffic (16 B/edge/iter) "
            "against measured copy bandwidth; float decoders may be "
            "compute-bound below this. i_eff is the measured mean iteration "
            "count of the same run, so achieved and bound are consistent."
        ),
    }
    ops_cache = {}
    for name, sc in out["scenarios"].items():
        layout, trellis, decoder = info[name]
        i_eff = max(sc["mean_iterations"], 1.0)
        if decoder == "ib":
            key = (id(layout), trellis.t_decoder, trellis.i_max)
            if key not in ops_cache:
                ops_cache[key] = ib_ops_per_iteration(layout, trellis)
            ops = ops_cache[key]
            sol = peak_ops * layout.n_vars / (ops * i_eff)
            entry = {
                "bound": "vpu_ops",
                "vpu_ops_per_iteration_per_codeword": int(ops),
                "ops_per_edge_per_iteration": round(ops / layout.n_edges, 1),
            }
        else:
            bytes_per_cw_iter = 16 * layout.n_edges
            sol = bw * layout.n_vars / (bytes_per_cw_iter * i_eff)
            entry = {
                "bound": "hbm_traffic",
                "min_bytes_per_iteration_per_codeword": bytes_per_cw_iter,
            }
        ach = sc["coded_mbps"] * 1e6
        entry.update(
            speed_of_light_coded_mbps=round(sol / 1e6, 2),
            achieved_coded_mbps=round(ach / 1e6, 2),
            fraction_of_sol=round(ach / sol, 3),
            i_eff=round(i_eff, 2),
        )
        roof[name] = entry
        print(f"roofline {name}: SOL {sol/1e6:.1f} Mbit/s, achieved "
              f"{ach/1e6:.1f} ({ach/sol:.1%})", flush=True)
    out["roofline"] = roof

    os.makedirs("results", exist_ok=True)
    with open("results/BENCH_MATRIX.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["scenarios"], indent=1))


if __name__ == "__main__":
    main()
