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


def save_results(path: str, results: list[PointResult]) -> None:
    payload = {"points": [r.to_dict() for r in results]}
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2)
    os.replace(tmp, path)


def load_results(path: str) -> list[PointResult]:
    with open(path) as f:
        payload = json.load(f)
    return [PointResult(**p) for p in payload["points"]]


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
