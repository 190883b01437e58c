"""Full benchmark matrix + roofline (BASELINE.md:31-34, VERDICT round-1 #4).

Measures steady-state decoded throughput on the real chip for every decode
mode / code family the reference benchmarks, plus a roofline for the IB LUT
decode: exact VPU element-op count per iteration (traced through the packed
lookup primitives, ops/lut_fold.counting_ops) against the measured peak
elementwise int32 op rate of the chip.

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
    """Steady-state coded bits/s of a BERSimulator at one SNR point."""
    import numpy as np

    qt = sim.quantizer_for(ebn0)
    import jax
    import jax.numpy as jnp

    from informationbottleneckdecodingldpc_tpu.channel.awgn import (
        sigma2_from_ebn0_db,
    )

    sigma2 = jnp.float32(sigma2_from_ebn0_db(ebn0, sim.layout.code_rate))
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


def ib_ops_per_iteration(layout, trellis):
    """Exact VPU element-ops of one decode iteration per codeword (batch 1),
    by differencing two abstract traces (the scan body is traced once;
    max_iters=1 skips the loop)."""
    import jax
    import jax.numpy as jnp

    from informationbottleneckdecodingldpc_tpu.decode import ib_lut_decode
    from informationbottleneckdecodingldpc_tpu.ops import lut_fold

    spec = jax.ShapeDtypeStruct((layout.n_vars, 1), jnp.int32)

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


def measure_peak_int_ops(reps=6):
    """Measured peak elementwise int32 op rate (cmp/select/shift/xor chain —
    the ops the packed LUT decode consists of). Returns a SCALAR through the
    tunnel (reading back the full array would be transfer-bound) and runs a
    long dependent chain so dispatch latency amortizes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    shape = (4096, 1024)
    rounds = 16384  # 4 ops/round: ~275 G ops/call so dispatch latency is noise

    @jax.jit
    def chain(x):
        def body(y, i):
            y = jnp.where(y > i, y + 1, y)  # cmp + sel (+ add folded)
            y = (y >> 1) ^ y                # shift + xor
            return y, ()
        y, _ = jax.lax.scan(body, x, jnp.arange(rounds, dtype=jnp.int32))
        return jnp.sum(y, dtype=jnp.int32)

    ops_per_elem = rounds * 4
    x = jnp.ones(shape, jnp.int32)
    np.asarray(chain(x))
    times = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(chain(x))
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    return shape[0] * shape[1] * ops_per_elem / med


def main():
    import numpy as np

    from informationbottleneckdecodingldpc_tpu.construct import DecoderConfig
    from informationbottleneckdecodingldpc_tpu.decode import DeviceTrellis
    from informationbottleneckdecodingldpc_tpu.encode import LDPCEncoder
    from informationbottleneckdecodingldpc_tpu.models import get_model
    from informationbottleneckdecodingldpc_tpu.sim import BERSimulator

    out = {"unit": "coded_bits_per_s", "scenarios": {}}

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
            cfg = DecoderConfig.load(config)
            kw["trellis"] = DeviceTrellis.from_tables(cfg.tables)
            kw["cardinality_t_channel"] = cfg.tables.cardinality_t_channel
        else:
            kw["max_iters"] = max_iters or spec.decode_i_max
        if chain == "encoded":
            kw["encoder"] = LDPCEncoder(H)
        sim = BERSimulator(layout, decoder, **kw)
        point = ebn0 if ebn0 is not None else spec.design_ebn0_db
        bps = measure_sim(sim, point)
        out["scenarios"][name] = {
            "coded_mbps": round(bps / 1e6, 3),
            "model": model, "decoder": decoder, "chain": chain,
            "backend": backend if decoder == "ib" else "-",
            "batch": batch, "ebn0_db": point,
        }
        print(f"{name}: {bps/1e6:.2f} Mbit/s coded", flush=True)
        return layout, kw.get("trellis")

    cfg_dir = "artifacts/configs"
    # The reference's four WLAN decode modes + both big codes.
    layout_wlan, trellis_wlan = scenario(
        "wlan_ib_fused", "wlan-1296", "ib",
        config=f"{cfg_dir}/wlan_T16_0.8.npz", backend="fused", batch=2048)
    scenario("wlan_ib_xla", "wlan-1296", "ib",
             config=f"{cfg_dir}/wlan_T16_0.8.npz", backend="xla", batch=2048)
    scenario("wlan_ib_fused_encoded", "wlan-1296", "ib", chain="encoded",
             config=f"{cfg_dir}/wlan_T16_0.8.npz", backend="fused", batch=2048)
    scenario("wlan_minsum", "wlan-1296", "minsum", batch=2048, max_iters=50,
             ebn0=2.0)
    scenario("wlan_bp_quant", "wlan-1296", "bp", batch=2048, max_iters=50,
             ebn0=2.0)
    scenario("wlan_T32_ib_fused", "wlan-1296-T32", "ib",
             config=f"{cfg_dir}/wlan_T32_0.6.npz", backend="fused", batch=1024)
    layout_reg, trellis_reg = scenario(
        "regular8000_ib_fused", "regular-3-6-8000", "ib",
        config=f"{cfg_dir}/regular_T16_1.05.npz", backend="fused", batch=512,
        ebn0=1.05)
    scenario("regular8000_minsum", "regular-3-6-8000", "minsum", batch=512,
             max_iters=50, ebn0=2.0)
    layout_dvb, trellis_dvb = scenario(
        "dvbs2_ib_xla_encoded", "dvbs2-64800", "ib", chain="encoded",
        config=f"{cfg_dir}/dvbs2_T16_0.6.npz", backend="xla", batch=128,
        steps=1, ebn0=1.0)
    scenario("dvbs2_minsum", "dvbs2-64800", "minsum", batch=128, steps=1,
             max_iters=50, ebn0=1.0)

    # ---- roofline ----
    peak = measure_peak_int_ops()
    roof = {"measured_peak_int32_ops_per_s": round(peak / 1e9, 1)}
    for nm, layout, trellis, meas in (
        ("wlan_ib", layout_wlan, trellis_wlan, "wlan_ib_fused"),
        ("regular8000_ib", layout_reg, trellis_reg, "regular8000_ib_fused"),
        ("dvbs2_ib", layout_dvb, trellis_dvb, "dvbs2_ib_xla_encoded"),
    ):
        ops = ib_ops_per_iteration(layout, trellis)
        i_eff = trellis.i_max  # low-SNR operating point: all iterations run
        sol = peak * layout.n_vars / (ops * i_eff)
        ach = out["scenarios"][meas]["coded_mbps"] * 1e6
        roof[nm] = {
            "vpu_ops_per_iteration_per_codeword": int(ops),
            "ops_per_edge_per_iteration": round(ops / layout.n_edges, 1),
            "speed_of_light_coded_mbps": round(sol / 1e6, 2),
            "achieved_coded_mbps": round(ach / 1e6, 2),
            "fraction_of_sol": round(ach / sol, 3),
        }
        print(f"roofline {nm}: SOL {sol/1e6:.1f} Mbit/s, achieved "
              f"{ach/1e6:.1f} ({ach/sol:.1%})", flush=True)
    out["roofline"] = roof

    os.makedirs("results", exist_ok=True)
    with open("results/BENCH_MATRIX.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["scenarios"], indent=1))


if __name__ == "__main__":
    main()
