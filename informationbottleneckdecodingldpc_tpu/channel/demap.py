"""Soft demappers: exact per-bit LLRs for QAM / MPSK AWGN observations.

The reference *intended* M-ary chains — its transmitters exist
(AWGN_Channel_Transmission/LDPC_Transmitter.py:134-215) — but the
construction-side ``AWGN_Quantizer_Mary`` module is absent so the paths are
dead upstream (AWGN_Discrete_Density_Evolution.py:6-7, SURVEY.md §7.4). Here
the continuous-LLR side is completed instead: exact (log-sum-exp) bit LLRs
feed the float benchmark decoders (min-sum / BP), giving working end-to-end
QAM/MPSK simulation chains with no new decoder construction.

Conventions (matching channel.modulation):

- symbols are I/Q pairs ``[n_sym, batch, 2]`` with unit average energy;
- ``n0`` is the complex-noise variance E|n|^2 (per-component variance n0/2);
- a symbol carries ``k`` bits MSB-first; square QAM splits them as
  [real k/2 | imag k/2] (LDPC_Transmitter.py:160-175);
- LLR sign: positive favors bit 0 — same as the BPSK ``2y/sigma^2``
  convention the decoders consume (bp_decoder_irreg.py:288-295).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .modulation import mpsk_tables, qam_tables


def n0_from_sigma2(sigma2, bits_per_symbol: int):
    """Complex-noise variance N0 for the engine's BPSK-convention sigma^2.

    The sweep axis is Eb/N0: sigma^2 = 1/(2 R_c EbN0) (awgn.py:30-33) defines
    N0 = 2 sigma^2 for 1-bit real BPSK; at ``bits_per_symbol`` coded bits per
    unit-energy complex symbol the same Eb/N0 gives N0 = 2 sigma^2 / k.
    """
    return 2.0 * sigma2 / bits_per_symbol


def _bit_masks(num_bits: int) -> np.ndarray:
    """[num_bits, 2**num_bits] bool: row p = (MSB-first bit p of pattern v)."""
    v = np.arange(1 << num_bits)
    return ((v[None, :] >> np.arange(num_bits - 1, -1, -1)[:, None]) & 1).astype(
        bool
    )


def _llrs_from_metrics(metrics: jnp.ndarray, masks: np.ndarray) -> jnp.ndarray:
    """metrics [..., V] (log-domain, per candidate pattern) -> [..., num_bits]
    exact LLRs log sum_{v: bit=0} e^m - log sum_{v: bit=1} e^m."""
    out = []
    for p in range(masks.shape[0]):
        one = jnp.asarray(masks[p])
        llr0 = jax.scipy.special.logsumexp(
            jnp.where(one, -jnp.inf, metrics), axis=-1
        )
        llr1 = jax.scipy.special.logsumexp(
            jnp.where(one, metrics, -jnp.inf), axis=-1
        )
        out.append(llr0 - llr1)
    return jnp.stack(out, axis=-1)  # [..., num_bits]


def _interleave_to_bits(llr_sym: jnp.ndarray) -> jnp.ndarray:
    """[n_sym, batch, k] per-symbol bit LLRs -> [n_sym*k, batch] codeword
    order (consecutive k bits per symbol, the _bit_group_values layout)."""
    n_sym, batch, k = llr_sym.shape
    return llr_sym.transpose(0, 2, 1).reshape(n_sym * k, batch)


def qam_bit_llrs(
    y_iq: jnp.ndarray,
    encoding_table: np.ndarray,
    sqrt_m: int,
    n0,
) -> jnp.ndarray:
    """Exact bit LLRs for square-QAM symbols: [n_sym, batch, 2] -> [n, batch].

    Square QAM factorizes: the real component depends only on the first
    k/2 bits, the imaginary on the last k/2 (qam_map), so each half is an
    independent sqrt_M-ary PAM demap with per-component noise variance n0/2.
    """
    k_half = int(np.log2(sqrt_m))
    amplitudes, d_min = qam_tables(encoding_table, sqrt_m)
    levels = jnp.asarray(amplitudes * (d_min / 2.0), jnp.float32)  # [sqrt_m]
    masks = _bit_masks(k_half)
    inv = 1.0 / n0  # = 1/(2 * (n0/2)): PAM metric -(y-a)^2 / (2 var)

    def pam(y):  # [n_sym, batch] -> [n_sym, batch, k_half]
        metrics = -((y[..., None] - levels) ** 2) * inv
        return _llrs_from_metrics(metrics, masks)

    llr = jnp.concatenate(
        [pam(y_iq[..., 0]), pam(y_iq[..., 1])], axis=-1
    )  # [n_sym, batch, 2*k_half]
    return _interleave_to_bits(llr)


def mpsk_bit_llrs(
    y_iq: jnp.ndarray,
    encoding_table: np.ndarray,
    m: int,
    n0,
) -> jnp.ndarray:
    """Exact bit LLRs for M-PSK symbols: [n_sym, batch, 2] -> [n, batch]."""
    k = int(np.log2(m))
    phases = mpsk_tables(encoding_table, m)  # pattern v -> unit symbol
    pts = jnp.asarray(
        np.stack([phases.real, phases.imag], axis=-1), jnp.float32
    )  # [m, 2]
    d2 = jnp.sum(
        (y_iq[..., None, :] - pts) ** 2, axis=-1
    )  # [n_sym, batch, m]
    llr = _llrs_from_metrics(-d2 / n0, _bit_masks(k))
    return _interleave_to_bits(llr)
