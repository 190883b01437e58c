"""Belief-propagation decoder (quantized-BP benchmark).

Equivalent of the reference's
``BeliefPropagationDecoderClassIrregular.decode_OpenCL_belief_propagation``
(Continous_LDPC_Decoding/bp_decoder_irreg.py:221-286): same loop as min-sum
with the box-plus check-node rule (kernels_min_and_BP.cl:32-71).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..ops.float_ops import cn_boxplus_leave_one_out
from .common import DecodeResult
from .float_common import float_decode
from .graph_arrays import DecodeLayout


def belief_propagation_decode(
    layout: DecodeLayout,
    channel_llrs: jnp.ndarray,
    max_iters: int,
    early_exit: bool = True,
    convergence_reduce: Callable | None = None,
) -> DecodeResult:
    """Decode [n_vars, batch] channel LLRs with sum-product (box-plus) BP."""
    return float_decode(
        layout,
        channel_llrs,
        max_iters,
        cn_update=lambda msgs, grp: cn_boxplus_leave_one_out(msgs),
        early_exit=early_exit,
        convergence_reduce=convergence_reduce,
    )
