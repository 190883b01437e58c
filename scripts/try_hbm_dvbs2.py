"""Bring-up check for the HBM-resident DVB-S2 kernel on the real chip:
bit-exact vs XLA at short i_max, then steady-state per-iteration timing."""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from informationbottleneckdecodingldpc_tpu.construct import DecoderConfig
from informationbottleneckdecodingldpc_tpu.decode import DeviceTrellis, ib_lut_decode
from informationbottleneckdecodingldpc_tpu.kernels import HBMFusedIBDecoder, hbm_supported
from informationbottleneckdecodingldpc_tpu.models import get_model


def main():
    imax_check = int(os.environ.get("HBM_CHECK_IMAX", "3"))
    spec = get_model("dvbs2-64800")
    layout = spec.make_layout()
    print("hbm_supported:", hbm_supported(layout), flush=True)
    cfg = DecoderConfig.load("results/configs/dvbs2_T16_0.6.npz")
    trellis = DeviceTrellis.from_tables(cfg.tables)

    rng = np.random.default_rng(0)
    ch = jnp.asarray(rng.integers(0, 16, (layout.n_vars, 128)), jnp.int32)

    # --- bit-exactness at short i_max (fixed iterations) ---
    t0 = time.time()
    hbm_s = HBMFusedIBDecoder(layout, cfg.tables, max_iters=imax_check, early_exit=False)
    got = hbm_s(ch)
    got_out = np.asarray(got.outputs)
    print(f"hbm short compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    ref = ib_lut_decode(layout, trellis, ch, max_iters=imax_check, early_exit=False)
    ref_out = np.asarray(ref.outputs)
    print(f"xla short compile+run: {time.time()-t0:.1f}s", flush=True)
    ok = np.array_equal(ref_out, got_out)
    ok_u = np.array_equal(np.asarray(ref.unsatisfied), np.asarray(got.unsatisfied))
    print(f"bit-exact outputs: {ok}  unsat: {ok_u}", flush=True)
    if not ok:
        bad = np.nonzero((ref_out != got_out).any(axis=1))[0]
        print("first bad vars:", bad[:10])
        return

    # --- timing at full i_max, early_exit off (per-iteration cost) ---
    t0 = time.time()
    hbm_f = HBMFusedIBDecoder(layout, cfg.tables, max_iters=50, early_exit=False)
    r = hbm_f(ch)
    np.asarray(r.outputs)
    print(f"full compile+run: {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(4):
        t0 = time.time()
        np.asarray(hbm_f(ch).outputs)
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    per_iter_ms = med / 49 * 1e3
    mbps = layout.n_vars * 128 / med / 1e6
    print(f"full-decode median {med*1e3:.1f} ms  ({per_iter_ms:.2f} ms/iter, "
          f"{mbps:.1f} Mbit/s coded at fixed 50 iters)", flush=True)


if __name__ == "__main__":
    main()
