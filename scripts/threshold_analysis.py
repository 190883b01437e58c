"""Near-threshold design-point analysis (round-2 verdict #2).

Question: at the reference's published operating points (regular (3,6) at
design Eb/N0 = 1.05 dB, Regular_LDPC_Decoding/BPSK/BER_simulation_OpenCL.py:35-42;
DVB-S2 at 0.6 dB, DVB-S2/decoder_config_generation.py:20) the discrete DE
stalls (MI plateaus < 1). Is the stall an artifact of the exact-DP
compression backend, or physical (the design point is below the quantized-DE
threshold — in which case the reference's randomized-sIB DE stalls too)?

Three pieces of evidence, all committed to results/THRESHOLDS.json:

1. Backend comparison: run the DE at the published design points with both
   backends — exact DP and the reference's randomized sequential sIB
   (nror=10, several seeds) — and record the full MI trajectories. If the
   randomized trajectories stall at (or below) the DP trajectory, the stall
   is not a DP artifact: per-step the DP MI dominates every sIB restart by
   construction, and the observed trajectories show no crossover.
2. DE convergence thresholds by bisection, per backend: the smallest design
   Eb/N0 where the DE reaches MI >= 0.999 within i_max. The |T|=16 threshold
   sits ABOVE the ensemble's continuous-BP threshold by data processing
   (every IB compression is a degradation of the BP message), so for the
   regular (3,6) ensemble, threshold >= 1.102 dB (sigma* = 0.8809,
   Richardson/Urbanke) — already above the 1.05 dB design point before any
   quantization loss is counted.
3. A higher-resolution |T|=32 DE threshold as a bridge toward the
   continuous-BP threshold (monotone in |T| by data processing), tying 2.'s
   literature number to this codebase's own machinery.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT_PATH = "results/THRESHOLDS.json"

from informationbottleneckdecodingldpc_tpu.channel.awgn import sigma2_from_ebn0_db
from informationbottleneckdecodingldpc_tpu.channel.quantizer import (
    build_quantizer_tables,
)
from informationbottleneckdecodingldpc_tpu.codes.ensembles import (
    code_rate_from_distributions,
    node_degree_distributions,
    node_to_edge_distribution,
)
from informationbottleneckdecodingldpc_tpu.construct.density_evolution import (
    DiscreteDensityEvolution,
)
from informationbottleneckdecodingldpc_tpu.construct.density_evolution_irreg import (
    DiscreteDensityEvolutionIrregular,
)

MI_CONVERGED = 0.999


def run_de(kind, ebn0, t_dec, i_max, backend, seed=0, nror=10, t_ch=16,
           lam=None, rho=None, rate=0.5):
    sigma2 = float(sigma2_from_ebn0_db(ebn0, rate))
    qt = build_quantizer_tables(sigma2, 3.0, t_ch, 2000)
    kw = dict(ib_backend=backend, ib_nror=nror, ib_seed=seed)
    if kind == "regular":
        de = DiscreteDensityEvolution(qt.p_x_and_t, t_dec, 3, 6, i_max, **kw)
    else:
        de = DiscreteDensityEvolutionIrregular(
            qt.p_x_and_t, t_dec, lam, rho, i_max, **kw
        )
    _, diag = de.run()
    return diag.ext_mi_varnode_in


def converged(mi, conv=MI_CONVERGED):
    return bool(mi[-1] >= conv)


def bisect_threshold(kind, t_dec, i_max, backend, lo, hi, tol=0.01,
                     conv=MI_CONVERGED, **kw):
    """Smallest design Eb/N0 (within tol dB) whose DE converges.

    ``conv``: the MI level that counts as converged. The regular runs use
    0.999 (i_max=250 reaches ~1.0 above threshold); the DVB-S2 i_max=50
    runs use 0.9 — the outcome there is bimodal (stall plateaus at
    ~0.68-0.75, convergence reaches >= 0.95 e.g. MI 0.957 for the working
    0.8 dB design), so any level in the gap identifies the same threshold.
    """
    assert not converged(run_de(kind, lo, t_dec, i_max, backend, **kw), conv)
    assert converged(run_de(kind, hi, t_dec, i_max, backend, **kw), conv)
    while hi - lo > tol:
        mid = 0.5 * (lo + hi)
        if converged(run_de(kind, mid, t_dec, i_max, backend, **kw), conv):
            hi = mid
        else:
            lo = mid
        print(f"  bisect [{lo:.4f}, {hi:.4f}]", flush=True)
    return hi


def main():
    # Incremental / resumable: reload prior results, skip finished pieces,
    # save after every completed step (sIB bisections are ~20x slower than
    # DP — a full run is hours on a 2-core host).
    out = {"mi_converged_def": MI_CONVERGED}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            out.update(json.load(f))

    def save():
        os.makedirs("results", exist_ok=True)
        tmp = OUT_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=1)
        os.replace(tmp, OUT_PATH)

    from informationbottleneckdecodingldpc_tpu.codes import dvbs2_parity_check
    from informationbottleneckdecodingldpc_tpu.codes.graph import TannerGraph

    H = dvbs2_parity_check("1/2", 64800)
    g = TannerGraph.from_check_matrix(H)
    dvd, dcd = node_degree_distributions(g.vn_degree, g.cn_degree)
    lam = node_to_edge_distribution(dvd)
    rho = node_to_edge_distribution(dcd)
    dv_rate = code_rate_from_distributions(dvd, dcd)
    irr_kw = dict(lam=lam, rho=rho, rate=dv_rate)

    # --- 1. design-point MI trajectories, both backends ------------------
    def trajectories(tag, npz_path, runner):
        key = f"{tag}_trajectories_final"
        if os.path.exists(npz_path):
            d = np.load(npz_path)
            out[key] = {k: float(d[k][-1]) for k in d.keys()}
            print(f"{tag}: trajectories loaded from {npz_path}", flush=True)
            return
        traj = {"dp": runner("dp", 0).tolist()}
        for s in (0, 1, 2):
            traj[f"sib_seed{s}"] = runner("sib", 1000 * s).tolist()
            print(f"  sib seed {s}: final MI {traj[f'sib_seed{s}'][-1]:.6f}",
                  flush=True)
        print(f"  dp: final MI {traj['dp'][-1]:.6f}", flush=True)
        out[key] = {k: v[-1] for k, v in traj.items()}
        np.savez_compressed(
            npz_path, **{k: np.asarray(v) for k, v in traj.items()}
        )
        save()

    print("== regular (3,6) @ 1.05 dB, i_max=250 ==", flush=True)
    trajectories(
        "regular_1.05_T16",
        "results/de_trajectories_regular_1.05.npz",
        lambda b, s: run_de("regular", 1.05, 16, 250, b, seed=s),
    )
    print("== dvbs2 @ 0.6 dB, i_max=50 ==", flush=True)
    trajectories(
        "dvbs2_0.6_T16",
        "results/de_trajectories_dvbs2_0.6.npz",
        lambda b, s: run_de("irr", 0.6, 16, 50, b, seed=s, **irr_kw),
    )

    # --- 2. thresholds by bisection (each saved as it completes) ---------
    # DP thresholds at 0.01 dB; sIB (20x slower per DE) at 0.05 dB — enough
    # to place them relative to the design points and the DP thresholds.
    out["regular_bp_threshold_literature_db"] = 1.102
    jobs = [
        ("regular_T16_dp_threshold_db",
         lambda: bisect_threshold("regular", 16, 250, "dp", 1.0, 1.6)),
        # |T|=32 alphabets: threshold decreases monotonically toward the
        # continuous-BP value (sigma* = 0.8809 => 1.102 dB for (3,6)).
        ("regular_T32_dp_threshold_db",
         lambda: bisect_threshold("regular", 32, 250, "dp", 1.0, 1.6, t_ch=32)),
        ("dvbs2_T16_dp_threshold_db",
         lambda: bisect_threshold("irr", 16, 50, "dp", 0.4, 1.2, conv=0.9,
                                  **irr_kw)),
        ("dvbs2_T32_dp_threshold_db",
         lambda: bisect_threshold("irr", 32, 50, "dp", 0.3, 1.2, t_ch=32,
                                  conv=0.9, **irr_kw)),
        ("regular_T16_sib_threshold_db",
         lambda: bisect_threshold("regular", 16, 250, "sib", 1.0, 1.8,
                                  tol=0.05)),
        ("dvbs2_T16_sib_threshold_db",
         lambda: bisect_threshold("irr", 16, 50, "sib", 0.4, 1.4, tol=0.05,
                                  conv=0.9, **irr_kw)),
    ]
    for key, job in jobs:
        if key in out:
            print(f"{key}: cached ({out[key]})", flush=True)
            continue
        print(f"== {key} ==", flush=True)
        out[key] = job()
        save()

    save()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
