"""Shared driver for the float (BP / min-sum) decoders.

Both reference decoders share the same loop shape
(bp_decoder_irreg.py:221-286, min_sum_decoder_irreg.py:221-287), differing
only in the check-node rule; this driver factors it once.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..ops.float_ops import sum_planes, vn_sum_leave_one_out
from .common import (
    DecodeResult,
    apply_per_cn_group,
    apply_per_vn_group,
    gather_node_values_per_group,
    node_outputs_to_natural_order,
    run_message_passing_loop,
    unsatisfied_checks,
)
from .graph_arrays import DecodeLayout


def float_decode(
    layout: DecodeLayout,
    channel_llrs: jnp.ndarray,
    max_iters: int,
    cn_update: Callable,
    early_exit: bool = True,
    convergence_reduce: Callable | None = None,
) -> DecodeResult:
    batch = channel_llrs.shape[-1]
    llrs = channel_llrs.astype(jnp.float32)
    # Seed the CN view with channel LLRs
    # (send_channel_values_to_checknode_inbox, kernels_min_and_BP.cl:12-29).
    cn_view0 = layout.seed_plan.apply(llrs)
    vn_view0 = jnp.zeros_like(cn_view0)
    llr_groups = gather_node_values_per_group(layout, llrs)

    def body(state, _i):
        cn_view, _ = state
        cn_out = apply_per_cn_group(layout, cn_view, cn_update)
        vn_view = layout.to_vn.apply(cn_out)
        vn_out = apply_per_vn_group(
            layout, vn_view, llr_groups,
            lambda ch, msgs, grp: vn_sum_leave_one_out(ch, msgs),
        )
        new_cn_view = layout.to_cn.apply(vn_out)
        unsat = unsatisfied_checks(layout, new_cn_view < 0)
        return (new_cn_view, vn_view), unsat

    (cn_view, vn_view), iters, _ = run_message_passing_loop(
        (cn_view0, vn_view0),
        body,
        max_inner_iters=max_iters - 1,
        batch=batch,
        early_exit=early_exit,
        convergence_reduce=convergence_reduce,
    )

    # Posterior output: channel + all incoming messages, no clamp
    # (calc_varnode_output, kernels_min_and_BP.cl:170-204).
    outs = []
    for grp, ch in zip(layout.vn_groups, llr_groups):
        size = grp.num_nodes * grp.degree
        msgs = vn_view[grp.offset : grp.offset + size].reshape(
            grp.degree, grp.num_nodes, batch
        )
        outs.append(ch + sum_planes(msgs))
    outputs = node_outputs_to_natural_order(layout, outs)
    unsat_final = unsatisfied_checks(layout, cn_view < 0)
    return DecodeResult(outputs=outputs, iterations=iters, unsatisfied=unsat_final)
