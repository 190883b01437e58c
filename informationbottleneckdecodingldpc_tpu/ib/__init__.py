"""Information-bottleneck algorithms and info-theory tools.

Replaces the reference's external ``information_bottleneck`` (ib_base)
dependency (SURVEY.md §2.4): ``lin_sym_sIB`` / ``symmetric_sIB`` equivalents
plus ``mutual_information`` and ``kl_divergence``.
"""

from .tools import mutual_information, kl_divergence, numerical_guard
from .dp_quantizer import optimal_symmetric_quantizer, partial_mi_table
from .sib import SymmetricSIB, LinSymSIB, sequential_sib

__all__ = [
    "mutual_information",
    "kl_divergence",
    "numerical_guard",
    "optimal_symmetric_quantizer",
    "partial_mi_table",
    "SymmetricSIB",
    "LinSymSIB",
    "sequential_sib",
]
