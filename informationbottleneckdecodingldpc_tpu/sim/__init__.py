"""Monte-Carlo BER simulation engine with SNR sweeps and resumable state."""

from .engine import BERSimulator, PointResult
from .sweep import SweepController, SweepSchedule
from .results import save_results, load_results

__all__ = [
    "BERSimulator",
    "PointResult",
    "SweepController",
    "SweepSchedule",
    "save_results",
    "load_results",
]
