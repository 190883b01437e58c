"""Leave-one-out trellis-LUT folds (the discrete decoder's node operations).

The reference kernels walk, per work item, an O(d^2) chain of scalar lookups
(kernels_template.cl:62-89,137-169). Here each same-degree node group is
processed as one dense ``[nodes, degree, batch]`` tensor; the per-output
chains share the full-chain prefix states, cutting lookups to ~d^2/2, and
every lookup is one vectorized gather into a small (<=1024-entry) LUT that XLA
keeps on-chip.

Semantics contract (must match the reference trellis layout, SURVEY.md §3.1):
a node op folds its input sequence strictly left-to-right through per-step
pairwise LUTs; output for edge j folds the sequence with element j removed,
using steps 0..d-3 in order.
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_lookup(lut: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """out = lut[a, b] for a 2-D LUT and equally-shaped index arrays."""
    flat = lut.reshape(-1)
    return jnp.take(flat, a * lut.shape[1] + b)


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
