"""Transmission-chain components: modulation, AWGN channel, IB quantizer."""

from .modulation import (
    LDPCTransmitter,
    Transmitter,
    bpsk_map,
    gray_encoding_table,
    iq_to_complex,
    mpsk_map,
    qam_map,
)
from .awgn import awgn_transmit, sigma2_from_ebn0_db, ebn0_db_from_sigma2
from .demap import mpsk_bit_llrs, n0_from_sigma2, qam_bit_llrs
from .quantizer import AWGNChannelQuantizer, QuantizerTables

__all__ = [
    "LDPCTransmitter",
    "Transmitter",
    "bpsk_map",
    "gray_encoding_table",
    "iq_to_complex",
    "mpsk_map",
    "qam_map",
    "awgn_transmit",
    "sigma2_from_ebn0_db",
    "ebn0_db_from_sigma2",
    "qam_bit_llrs",
    "mpsk_bit_llrs",
    "n0_from_sigma2",
    "AWGNChannelQuantizer",
    "QuantizerTables",
]
