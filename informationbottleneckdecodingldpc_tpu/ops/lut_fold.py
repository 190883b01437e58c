"""Leave-one-out trellis-LUT folds (the discrete decoder's node operations).

The reference kernels walk, per work item, an O(d^2) chain of scalar lookups
(kernels_template.cl:62-89,137-169). Here each same-degree node group is
processed as one dense ``[nodes, degree, batch]`` tensor; the per-output
chains share the full-chain prefix states, cutting lookups to ~d^2/2, and
every lookup is fully vectorized over the [nodes, batch] plane.

TPU lookup strategy: XLA lowers per-element gathers into tiny LUTs to a
scalar-unit loop (~0.12 G lookups/s measured on v5e). A |T0|x|T1| table
lookup is instead evaluated as a compare-select tree on the VPU: 8x128-lane
selects run at ~2.5 G lookups/s standalone and ~9 G lookups/s when XLA fuses
the decoder's dependent chains — ~75x over the gather. CPU (tests, golden
path) keeps the gather, where it is the faster lowering.

Semantics contract (must match the reference trellis layout, SURVEY.md §3.1):
a node op folds its input sequence strictly left-to-right through per-step
pairwise LUTs; output for edge j folds the sequence with element j removed,
using steps 0..d-3 in order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_FORCE_MODE: str | None = None  # test hook: 'take' | 'select' | None (auto)


def set_lookup_mode(mode: str | None) -> None:
    """Force the lookup lowering ('take' | 'select'); None restores auto."""
    global _FORCE_MODE
    if mode not in (None, "take", "select"):
        raise ValueError(mode)
    _FORCE_MODE = mode


def _use_select() -> bool:
    if _FORCE_MODE is not None:
        return _FORCE_MODE == "select"
    return jax.default_backend() == "tpu"


def pairwise_lookup(lut: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """out = lut[a, b] for a 2-D LUT and equally-shaped index arrays."""
    if _use_select():
        return _pairwise_lookup_select(lut, a, b)
    flat = lut.reshape(-1)
    return jnp.take(flat, a * lut.shape[1] + b)


def vector_lookup(row: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out = row[idx] for a 1-D LUT ``row`` (e.g. matching/alignment remaps)."""
    if _use_select():
        out = jnp.zeros_like(idx)
        for t in range(row.shape[0]):
            out = jnp.where(idx == t, row[t], out)
        return out
    return jnp.take(row, idx)


def _pairwise_lookup_select(
    lut: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """VPU compare-select evaluation of lut[a, b] (no gather).

    out = sum_i (a == i) * row_i, row_i = sum_j (b == j) * lut[i, j]; the
    where-chains compile to lane-wide selects and the scalar lut[i, j] reads
    (O(|T|^2) per step, vs O(nodes * batch) selects) fold into broadcasts.
    """
    t0, t1 = lut.shape
    b_is = [b == j for j in range(t1)]
    out = jnp.zeros_like(a)
    for i in range(t0):
        row = jnp.zeros_like(a)
        for j in range(t1):
            row = jnp.where(b_is[j], lut[i, j], row)
        out = jnp.where(a == i, row, out)
    return out


def cn_lut_leave_one_out(
    msgs: jnp.ndarray, step_luts: list[jnp.ndarray]
) -> jnp.ndarray:
    """Check-node trellis update for one degree group.

    msgs: [d, n, batch] int (slot-major planes); step_luts: d-2 pairwise LUTs
    (step 0 combines the first two messages). Returns [d, n, batch]: output
    plane j = fold of all messages except j.
    """
    d = msgs.shape[0]
    m = [msgs[k] for k in range(d)]
    if d == 2:
        return jnp.stack([m[1], m[0]], axis=0)

    outs: list = [None] * d
    # Full-chain prefixes f[k] = fold(m_0..m_k), k = 1..d-2.
    f: list = [None, pairwise_lookup(step_luts[0], m[0], m[1])]
    for k in range(2, d - 1):
        f.append(pairwise_lookup(step_luts[k - 1], f[k - 1], m[k]))
    # Output j >= 2 continues from prefix f[j-1] with steps j-1..d-3.
    for j in range(2, d):
        s = f[j - 1]
        for idx, k in enumerate(range(j + 1, d)):
            s = pairwise_lookup(step_luts[j - 1 + idx], s, m[k])
        outs[j] = s
    # Outputs 0 and 1 need their own chains (first step differs).
    s0 = pairwise_lookup(step_luts[0], m[1], m[2])
    s1 = pairwise_lookup(step_luts[0], m[0], m[2])
    for idx, k in enumerate(range(3, d)):
        s0 = pairwise_lookup(step_luts[1 + idx], s0, m[k])
        s1 = pairwise_lookup(step_luts[1 + idx], s1, m[k])
    outs[0], outs[1] = s0, s1
    return jnp.stack(outs, axis=0)


def vn_lut_leave_one_out(
    ch: jnp.ndarray,
    msgs: jnp.ndarray,
    first_lut: jnp.ndarray,
    rest_luts: list[jnp.ndarray],
) -> jnp.ndarray:
    """Variable-node trellis update for one degree group.

    ch: [n, batch] channel clusters; msgs: [d, n, batch] incoming CN messages
    (slot-major planes). Output plane j folds (ch, all messages except j):
    first step uses ``first_lut`` (channel x message domain), later steps
    ``rest_luts`` in order (kernels_template.cl:135-166). Degree-1 nodes
    forward the channel value (kernels_template_irreg.cl:131-136).
    """
    d = msgs.shape[0]
    if d == 1:
        return ch[None, :, :]
    m = [msgs[k] for k in range(d)]
    outs: list = [None] * d
    # Full-chain prefixes over (ch, m_0..m_k).
    f = [pairwise_lookup(first_lut, ch, m[0])]
    for k in range(1, d - 1):
        f.append(pairwise_lookup(rest_luts[k - 1], f[k - 1], m[k]))
    for j in range(1, d):
        s = f[j - 1]
        for idx, k in enumerate(range(j + 1, d)):
            s = pairwise_lookup(rest_luts[j - 1 + idx], s, m[k])
        outs[j] = s
    s0 = pairwise_lookup(first_lut, ch, m[1])
    for idx, k in enumerate(range(2, d)):
        s0 = pairwise_lookup(rest_luts[idx], s0, m[k])
    outs[0] = s0
    return jnp.stack(outs, axis=0)


def vn_lut_full_fold(
    ch: jnp.ndarray,
    msgs: jnp.ndarray,
    first_lut: jnp.ndarray,
    rest_luts: list[jnp.ndarray],
) -> jnp.ndarray:
    """Decision mapping: fold channel plus *all* d messages
    (calc_varnode_output, kernels_template.cl:241-290). msgs is [d, n, batch];
    returns [n, batch]."""
    d = msgs.shape[0]
    s = pairwise_lookup(first_lut, ch, msgs[0])
    for k in range(1, d):
        s = pairwise_lookup(rest_luts[k - 1], s, msgs[k])
    return s
