"""Jitted decoder factories.

The decode functions in this package are pure and trace-compatible; calling
them eagerly pays per-op dispatch on every node group and iteration. These
factories close over the static layout/tables and return compiled callables —
one compilation per (code, batch-shape) like the reference's per-config Mako
kernel builds (discrete_LDPC_decoder.py:132-200), but cached by XLA.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax

from .bp import belief_propagation_decode
from .graph_arrays import DecodeLayout
from .ib_lut import DeviceTrellis, ib_lut_decode
from .min_sum import min_sum_decode


def make_ib_lut_decoder(
    layout: DecodeLayout,
    trellis: DeviceTrellis,
    max_iters: int | None = None,
    early_exit: bool = True,
    convergence_reduce: Callable | None = None,
):
    """Compiled fn: channel clusters [n_vars, batch] -> DecodeResult."""

    @jax.jit
    def decode(channel_clusters):
        return ib_lut_decode(
            layout,
            trellis,
            channel_clusters,
            max_iters=max_iters,
            early_exit=early_exit,
            convergence_reduce=convergence_reduce,
        )

    return decode


def _make_float(decode_fn, layout, max_iters, early_exit, convergence_reduce):
    @jax.jit
    def decode(channel_llrs):
        return decode_fn(
            layout,
            channel_llrs,
            max_iters=max_iters,
            early_exit=early_exit,
            convergence_reduce=convergence_reduce,
        )

    return decode


def make_min_sum_decoder(
    layout: DecodeLayout,
    max_iters: int,
    early_exit: bool = True,
    convergence_reduce: Callable | None = None,
):
    """Compiled fn: channel LLRs [n_vars, batch] -> DecodeResult."""
    return _make_float(min_sum_decode, layout, max_iters, early_exit, convergence_reduce)


def make_bp_decoder(
    layout: DecodeLayout,
    max_iters: int,
    early_exit: bool = True,
    convergence_reduce: Callable | None = None,
):
    """Compiled fn: channel LLRs [n_vars, batch] -> DecodeResult."""
    return _make_float(
        belief_propagation_decode, layout, max_iters, early_exit, convergence_reduce
    )
