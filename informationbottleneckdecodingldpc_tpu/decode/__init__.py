"""Decoders as pure functions over (graph layout, tables, messages)."""

from .graph_arrays import DecodeLayout
from .common import DecodeResult
from .min_sum import min_sum_decode
from .bp import belief_propagation_decode
from .ib_lut import ib_lut_decode, DeviceTrellis
from .jit import make_ib_lut_decoder, make_min_sum_decoder, make_bp_decoder

__all__ = [
    "DecodeLayout",
    "DecodeResult",
    "DeviceTrellis",
    "min_sum_decode",
    "belief_propagation_decode",
    "ib_lut_decode",
    "make_ib_lut_decoder",
    "make_min_sum_decoder",
    "make_bp_decoder",
]
