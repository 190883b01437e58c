"""Independent brute-force decoder implementations for equivalence tests.

These follow the reference OpenCL kernels' per-work-item pseudocode directly
(sequential leave-one-out folds, separate inbox buffers per phase) without any
of the framework's vectorization tricks, so agreement is meaningful.
"""

from __future__ import annotations

import numpy as np

LLR_MAX = 150.0


def _neighbors(H: np.ndarray):
    """CSR/CSC neighbor lists and the inbox slot of each edge at its target."""
    n_c, n_v = H.shape
    cn_nbrs = [np.nonzero(H[c])[0] for c in range(n_c)]  # vars of check c
    vn_nbrs = [np.nonzero(H[:, v])[0] for v in range(n_v)]  # checks of var v
    # slot of check c in var v's list / var v in check c's list
    slot_in_vn = {
        (c, v): int(np.nonzero(vn_nbrs[v] == c)[0][0])
        for c in range(n_c)
        for v in cn_nbrs[c]
    }
    slot_in_cn = {
        (v, c): int(np.nonzero(cn_nbrs[c] == v)[0][0])
        for v in range(n_v)
        for c in vn_nbrs[v]
    }
    return cn_nbrs, vn_nbrs, slot_in_vn, slot_in_cn


def boxplus(a, b):
    val = np.log((1 + np.exp(a + b)) / (np.exp(a) + np.exp(b)))
    return np.sign(val) * min(LLR_MAX, abs(val))


def minsum_op(a, b):
    return np.sign(a * b) * min(abs(a), abs(b))


def brute_float_decode(H, llrs, max_iters, rule="minsum", early_exit=True):
    """Reference-kernel float decode, one codeword: llrs [n_vars] -> outputs,
    iterations."""
    H = np.asarray(H)
    n_c, n_v = H.shape
    cn_nbrs, vn_nbrs, slot_in_vn, slot_in_cn = _neighbors(H)
    op = boxplus if rule == "bp" else minsum_op

    cn_in = [llrs[cn_nbrs[c]].astype(np.float64).copy() for c in range(n_c)]
    vn_in = [np.zeros(len(vn_nbrs[v])) for v in range(n_v)]

    i_num = 1
    while i_num < max_iters:
        # CN update
        new_vn_in = [x.copy() for x in vn_in]
        for c in range(n_c):
            msgs = cn_in[c]
            for w, v in enumerate(cn_nbrs[c]):
                others = [msgs[k] for k in range(len(msgs)) if k != w]
                t = others[0]
                for m in others[1:]:
                    t = op(t, m)
                if rule == "bp":
                    t = np.sign(t) * min(LLR_MAX, abs(t))
                new_vn_in[v][slot_in_vn[(c, v)]] = t
        vn_in = new_vn_in
        # VN update
        new_cn_in = [x.copy() for x in cn_in]
        for v in range(n_v):
            msgs = vn_in[v]
            if len(msgs) == 1:
                t = llrs[v]
                t = np.sign(t) * min(LLR_MAX, abs(t))
                c = vn_nbrs[v][0]
                new_cn_in[c][slot_in_cn[(v, c)]] = t
                continue
            for w, c in enumerate(vn_nbrs[v]):
                t = llrs[v] + sum(msgs[k] for k in range(len(msgs)) if k != w)
                t = np.sign(t) * min(LLR_MAX, abs(t))
                new_cn_in[c][slot_in_cn[(v, c)]] = t
        cn_in = new_cn_in
        # Syndrome on the check-node inboxes
        unsat = 0
        for c in range(n_c):
            unsat += int(sum(int(m < 0) for m in cn_in[c]) % 2 != 0)
        i_num += 1
        if early_exit and unsat == 0:
            break

    outputs = np.array(
        [llrs[v] + vn_in[v].sum() for v in range(n_v)], dtype=np.float64
    )
    return outputs, i_num - 1, unsat


def brute_lut_decode(H, tables, channel, max_iters, use_matching=True, early_exit=True):
    """Reference-kernel discrete LUT decode, one codeword.

    tables: construct.trellis.TrellisTables (dense layout).
    channel: [n_vars] int cluster indices.
    """
    H = np.asarray(H)
    n_c, n_v = H.shape
    cn_nbrs, vn_nbrs, slot_in_vn, slot_in_cn = _neighbors(H)
    T = tables.cardinality_t_decoder
    match = use_matching and tables.has_matching

    def cn_op(msgs, kernel_iter):
        d = len(msgs) + 1
        if len(msgs) == 1:
            return msgs[0]  # degree-2 check: message passes through
        if kernel_iter == "iter0":
            t = tables.cn_iter0_first[msgs[0], msgs[1]]
            for l in range(d - 3):
                t = tables.cn_iter0_rest[l][t, msgs[l + 2]]
        else:
            i = kernel_iter  # uses DE iteration i+1 tables
            t = tables.cn_rest[i][0][msgs[0], msgs[1]]
            for l in range(d - 3):
                t = tables.cn_rest[i][l + 1][t, msgs[l + 2]]
        return t

    def vn_op(ch, msgs, it):
        t = tables.vn_first[it][ch, msgs[0]]
        for l, m in enumerate(msgs[1:]):
            t = tables.vn_rest[it][l][t, m]
        return t

    cn_in = [channel[cn_nbrs[c]].astype(np.int64).copy() for c in range(n_c)]
    vn_in = [np.zeros(len(vn_nbrs[v]), dtype=np.int64) for v in range(n_v)]

    # iteration-0 CN pass
    for c in range(n_c):
        msgs = cn_in[c]
        d = len(msgs)
        for w, v in enumerate(cn_nbrs[c]):
            others = [msgs[k] for k in range(d) if k != w]
            t = cn_op(others, "iter0")
            if match:
                t = tables.matching_cn[0, d - 1, t]
            vn_in[v][slot_in_vn[(c, v)]] = t

    i_num = 1
    while i_num < max_iters:
        it = i_num - 1
        new_cn_in = [x.copy() for x in cn_in]
        for v in range(n_v):
            msgs = vn_in[v]
            d = len(msgs)
            if d == 1:
                c = vn_nbrs[v][0]
                new_cn_in[c][slot_in_cn[(v, c)]] = channel[v]
                continue
            for w, c in enumerate(vn_nbrs[v]):
                others = [msgs[k] for k in range(d) if k != w]
                t = vn_op(channel[v], others, it)
                if match:
                    t = tables.matching_vn[it, d - 1, t]
                new_cn_in[c][slot_in_cn[(v, c)]] = t
        cn_in = new_cn_in

        new_vn_in = [x.copy() for x in vn_in]
        for c in range(n_c):
            msgs = cn_in[c]
            d = len(msgs)
            for w, v in enumerate(cn_nbrs[c]):
                others = [msgs[k] for k in range(d) if k != w]
                t = cn_op(others, it)
                if match:
                    t = tables.matching_cn[it + 1, d - 1, t]
                new_vn_in[v][slot_in_vn[(c, v)]] = t
        vn_in = new_vn_in

        unsat = 0
        for c in range(n_c):
            unsat += int(sum(int(m < T // 2) for m in cn_in[c]) % 2 != 0)
        i_num += 1
        if early_exit and unsat == 0:
            break

    it = i_num - 1
    outputs = np.array(
        [vn_op(channel[v], list(vn_in[v]), it) for v in range(n_v)], dtype=np.int64
    )
    return outputs, i_num - 1, unsat
