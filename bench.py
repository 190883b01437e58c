"""Headline benchmark: decoded throughput of the flagship IB LUT decoder.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Scenario (BASELINE.md north star: "decoded Mbit/s per chip at i_max=50"):
WLAN 802.11n N=1296 R=1/2 irregular IB decoder with message alignment,
|T|=16, i_max=50, all-zeros direct-sampling chain at the design Eb/N0
(0.8 dB — low enough that decoding runs essentially all 49 in-loop
iterations, so the number is a worst-case per-iteration throughput, matching
the reference's low-SNR sweep points).

``vs_baseline``: the reference repo publishes no numbers
(BASELINE.json.published is empty); we normalize against a nominal
10 Mbit/s coded — the order of magnitude a 2016-era GPU achieves on the
reference's OpenCL kernels at these settings.
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

BASELINE_CODED_BPS = 10e6


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from informationbottleneckdecodingldpc_tpu.codes import TannerGraph
    from informationbottleneckdecodingldpc_tpu.decode import (
        DecodeLayout,
        DeviceTrellis,
        make_ib_lut_decoder,
    )
    from informationbottleneckdecodingldpc_tpu.channel import (
        AWGNChannelQuantizer,
        sigma2_from_ebn0_db,
    )
    from informationbottleneckdecodingldpc_tpu.models import get_model
    from informationbottleneckdecodingldpc_tpu.models.artifacts import (
        get_or_build_config,
    )

    from informationbottleneckdecodingldpc_tpu.channel.quantizer import (
        sample_clusters_with,
    )
    from informationbottleneckdecodingldpc_tpu.decode import ib_lut_decode

    spec = get_model("wlan-1296")
    ebn0 = 0.8
    cfg = get_or_build_config(spec, ebn0=ebn0, i_max=50)
    layout = spec.make_layout()
    trellis = DeviceTrellis.from_tables(cfg.tables)

    q = AWGNChannelQuantizer(
        float(sigma2_from_ebn0_db(ebn0, 0.5)), 3.0, 16, 2000
    )

    from informationbottleneckdecodingldpc_tpu.kernels import (
        FusedIBDecoder,
        fused_supported,
    )

    use_fused = (
        os.environ.get("BENCH_BACKEND", "fused") != "xla"
        and fused_supported(layout)
    )
    if use_fused:
        fused = FusedIBDecoder(layout, cfg.tables, early_exit=True)
        decode = fused
    else:
        decode = lambda c: ib_lut_decode(layout, trellis, c, early_exit=True)

    def measure(batch, blocks_per_rep, n_rep):
        # One jitted Monte-Carlo block: sample channel clusters (all-zeros
        # codeword), full early-exit IB LUT decode, error count — a single
        # device dispatch per scan of blocks, exactly like the sim engine's
        # hot loop with steps_per_dispatch.
        def mc_block(key):
            bits = jnp.zeros((layout.n_vars, batch), jnp.int32)
            clusters = sample_clusters_with(q.device.cdf, key, bits)
            res = decode(clusters)
            errors = jnp.sum(
                res.outputs < trellis.t_decoder // 2, dtype=jnp.int32
            )
            return errors, res.iterations

        # Scan several blocks per dispatch so per-dispatch tunnel latency
        # amortizes; force a value readback per rep (on this backend
        # block_until_ready can return before execution finishes, so only
        # transfers give honest timings).
        @jax.jit
        def mc_rep(key):
            def body(carry, k):
                e, it = mc_block(k)
                return carry + e, it
            tot, _ = jax.lax.scan(
                body, jnp.int32(0), jax.random.split(key, blocks_per_rep)
            )
            return tot

        key = jax.random.PRNGKey(0)
        # Warm-up: compile plus two timed-region-sized executions (first
        # post-compile dispatches on the tunnel are routinely 2x slower).
        for i in range(2):
            np.asarray(mc_rep(jax.random.fold_in(key, 1000 + i)))
        times = []
        for i in range(n_rep):
            t0 = time.time()
            np.asarray(mc_rep(jax.random.fold_in(key, i)))
            times.append(time.time() - t0)
        # Median rep: robust against sporadic multi-second tunnel stalls.
        elapsed = sorted(times)[len(times) // 2]
        return layout.n_vars * batch * blocks_per_rep / elapsed

    n_rep = int(os.environ.get("BENCH_REPS", "6"))
    if os.environ.get("BENCH_BATCH") or os.environ.get("BENCH_BLOCKS"):
        grid = [(
            int(os.environ.get("BENCH_BATCH", "2048")),
            int(os.environ.get("BENCH_BLOCKS", "4")),
        )]
    else:
        # Small honest tuning grid (same metric/scenario; dispatch-latency
        # amortization differs per config on the tunneled chip).
        grid = [(2048, 4), (4096, 4), (4096, 8)]
    coded_bps = max(measure(b, k, n_rep) for b, k in grid)

    print(
        json.dumps(
            {
                "metric": "wlan_ib_lut_decode_coded_throughput",
                "value": round(coded_bps / 1e6, 4),
                "unit": "Mbit/s/chip",
                "vs_baseline": round(coded_bps / BASELINE_CODED_BPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
