"""Utilities: native-library loading, bit packing, logging."""

from .native import load_gf2_native, native_available
from .bitpack import pack_bits, unpack_bits

__all__ = ["load_gf2_native", "native_available", "pack_bits", "unpack_bits"]
