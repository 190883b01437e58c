"""Decoders as pure functions over (graph layout, tables, messages)."""

from .graph_arrays import DecodeLayout
from .common import DecodeResult
from .min_sum import min_sum_decode
from .bp import belief_propagation_decode
from .ib_lut import ib_lut_decode

__all__ = [
    "DecodeLayout",
    "DecodeResult",
    "min_sum_decode",
    "belief_propagation_decode",
    "ib_lut_decode",
]
