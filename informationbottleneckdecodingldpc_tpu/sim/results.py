"""Result persistence: JSON (+ optional .npz/.mat export).

Replaces the reference's per-script np.savez / scipy.io.savemat / pgf plotting
tail (Regular_LDPC_Decoding/BPSK/BER_simulation_OpenCL.py:140-165) with a
single format that the sweep controller can reload for resume.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from .engine import PointResult


def save_results(
    path: str, results: list[PointResult], partial: dict | None = None
) -> None:
    """Atomically persist completed points plus (optionally) the in-progress
    point's counters — the (SNR, step-index/RNG position, error counters)
    tuple that makes multi-hour sweeps resumable across preemptions
    (SURVEY.md §5 'failure detection / checkpoint-resume')."""
    payload = {"points": [r.to_dict() for r in results]}
    if partial is not None:
        payload["partial"] = partial
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2)
    os.replace(tmp, path)


def load_results(path: str) -> list[PointResult]:
    with open(path) as f:
        payload = json.load(f)
    return [PointResult(**p) for p in payload["points"]]


def load_partial(path: str) -> dict | None:
    with open(path) as f:
        payload = json.load(f)
    return payload.get("partial")


def export_plot(path: str, results: list[PointResult], label: str = "") -> None:
    """BER-vs-Eb/N0 plot, the reference's matplotlib tail
    (BER_simulation_OpenCL.py:151-157); skipped if matplotlib is missing."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    fig, ax = plt.subplots()
    ax.semilogy(
        [r.ebn0_db for r in results], [max(r.ber, 1e-12) for r in results],
        marker="o", label=label or None,
    )
    ax.set_xlabel("Eb/N0 (dB)")
    ax.set_ylabel("BER")
    ax.grid(True, which="both", alpha=0.4)
    if label:
        ax.legend()
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def export_npz(path: str, results: list[PointResult]) -> None:
    """EbN0/BER vectors in the reference's np.savez layout
    (BER_simulation_OpenCL.py:158)."""
    np.savez(
        path,
        EbN0_dB_vector=np.array([r.ebn0_db for r in results]),
        BER_vector=np.array([r.ber for r in results]),
        FER_vector=np.array([r.fer for r in results]),
    )


def export_mat(path: str, results: list[PointResult], decoder_name: str = "") -> None:
    """MATLAB export mirroring the reference's savemat dict
    (BER_simulation_OpenCL.py:162-165)."""
    import scipy.io as sio

    sio.savemat(
        path,
        {
            "EbN0_dB_vector": np.array([r.ebn0_db for r in results]),
            "BER_vector": np.array([r.ber for r in results]),
            "decoder_name": decoder_name,
        },
    )
