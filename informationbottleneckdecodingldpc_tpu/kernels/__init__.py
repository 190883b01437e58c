"""Pallas TPU kernels (the fast path for the hot decode ops)."""

from .float_fused import FusedFloatDecoder, float_fused_supported
from .float_hbm import HBMFloatDecoder
from .ib_lut_fused import FusedIBDecoder, fused_supported, make_fused_ib_decoder
from .ib_lut_hbm import HBMFusedIBDecoder, hbm_supported

__all__ = [
    "FusedIBDecoder",
    "fused_supported",
    "make_fused_ib_decoder",
    "HBMFusedIBDecoder",
    "hbm_supported",
    "FusedFloatDecoder",
    "float_fused_supported",
    "HBMFloatDecoder",
]
