"""Modulation mappings (BPSK primary; the reference's QAM/MPSK construction
paths are dead code — AWGN_Quantizer_Mary is absent upstream, SURVEY.md §7.4 —
so BPSK is the supported chain, with the mapper interface kept open)."""

from __future__ import annotations

import jax.numpy as jnp


def bpsk_map(bits: jnp.ndarray) -> jnp.ndarray:
    """Map bits to BPSK symbols: 0 -> +1, 1 -> -1.

    Same convention as the reference transmitter
    (AWGN_Channel_Transmission/LDPC_Transmitter.py:127-132).
    """
    return 1.0 - 2.0 * bits.astype(jnp.float32)
