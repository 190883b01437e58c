"""Offline decoder construction: density evolution, trellis tables, configs."""

from .trellis import TrellisTables
from .matching import information_matching
from .density_evolution import DiscreteDensityEvolution
from .density_evolution_irreg import DiscreteDensityEvolutionIrregular
from .awgn_dde import build_decoder_config, DecoderConfig

__all__ = [
    "TrellisTables",
    "information_matching",
    "DiscreteDensityEvolution",
    "DiscreteDensityEvolutionIrregular",
    "build_decoder_config",
    "DecoderConfig",
]
