"""Transmission-chain components: modulation, AWGN channel, IB quantizer."""

from .modulation import bpsk_map
from .awgn import awgn_transmit, sigma2_from_ebn0_db, ebn0_db_from_sigma2
from .quantizer import AWGNChannelQuantizer, QuantizerTables

__all__ = [
    "bpsk_map",
    "awgn_transmit",
    "sigma2_from_ebn0_db",
    "ebn0_db_from_sigma2",
    "AWGNChannelQuantizer",
    "QuantizerTables",
]
