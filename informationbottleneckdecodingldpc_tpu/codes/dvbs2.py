"""DVB-S2-style IRA parity-check matrices (N=64800 family).

Two constructors:

- :func:`dvbs2_address_table_parity_check` expands an ETSI EN 302 307 Annex
  B/C address table exactly (q-group rule, 360-bit groups) plus the staircase
  (accumulator) part, producing the true standard matrix when given the
  standard's table. The reference repo loads the equivalent matrix from a
  pre-built, *not committed* ``DVB_S2_0.5.npz``
  (Irregular_LDPC_Decoding/DVB-S2/BER_simulation_OpenCL_enc.py:41), so the
  table itself ships with neither repo.
- :func:`dvbs2_like_parity_check` draws a seeded ensemble-matched stand-in
  with exactly the rate-1/2 DVB-S2 degree profile used by the reference's
  config generation (DVB-S2/decoder_config_generation.py:31-34): variable
  degrees {1:1, 2:32399, 3:19440, 8:12960}, check degrees {6:1, 7:32399}.
  Waterfall-region BER of an ensemble member is statistically equivalent,
  which is what the BER-parity acceptance tests compare.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def _staircase(n_parity: int) -> tuple[np.ndarray, np.ndarray]:
    """Accumulator part: parity column j has entries in rows j and j+1."""
    rows = [np.arange(n_parity, dtype=np.int64)]
    cols = [np.arange(n_parity, dtype=np.int64)]
    rows.append(np.arange(1, n_parity, dtype=np.int64))
    cols.append(np.arange(0, n_parity - 1, dtype=np.int64))
    return np.concatenate(rows), np.concatenate(cols)


def group_size(k_ldpc: int, n_parity: int) -> int:
    """Largest expansion-group size <= 360 dividing both K and N-K (the
    standard uses 360; smaller test codes shrink it)."""
    import math

    g = math.gcd(k_ldpc, n_parity)
    if g <= 360:
        return g
    for cand in range(360, 0, -1):
        if g % cand == 0:
            return cand
    return 1


def dvbs2_address_table_parity_check(
    addresses: list[list[int]], n_ldpc: int, k_ldpc: int, group: int | None = None
) -> sp.csr_matrix:
    """Expand a DVB-S2 parity-address table into H = [A | staircase].

    ``addresses[g]`` lists the parity addresses of the first bit of
    information-bit group ``g`` (360 bits per group); bit ``m`` of the group
    connects to ``(x + (m % 360) * q) % (n_ldpc - k_ldpc)`` for each listed
    ``x``, with ``q = (n_ldpc - k_ldpc) // 360``.
    """
    n_parity = n_ldpc - k_ldpc
    G = group or group_size(k_ldpc, n_parity)
    q = n_parity // G
    rows, cols = [], []
    m = np.arange(G, dtype=np.int64)
    for g, addr in enumerate(addresses):
        col = g * G + m
        for x in addr:
            rows.append((int(x) + m * q) % n_parity)
            cols.append(col)
    sr, sc = _staircase(n_parity)
    rows.append(sr)
    cols.append(sc + k_ldpc)
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    H = sp.coo_matrix(
        (np.ones(r.size, dtype=np.int8), (r, c)), shape=(n_parity, n_ldpc)
    ).tocsr()
    H.sum_duplicates()
    H.data[:] = 1
    return H


def dvbs2_like_address_table(
    n_ldpc: int = 64800, k_ldpc: int = 32400, seed: int = 0
) -> list[list[int]]:
    """Seeded random address table with the exact DVB-S2 rate-1/2 profile.

    Follows the standard's construction discipline exactly (360-bit groups,
    q-strided expansion): the first 36 groups carry 8 addresses (degree-8
    information columns), the remaining 54 groups 3 addresses (degree-3), and
    addresses are balanced so every residue class mod q receives exactly
    ``total/q`` addresses — which makes every parity row's A-degree exactly
    uniform, reproducing the standard's check-degree profile {6: 1, 7: rest}
    after adding the staircase.

    Because the expansion rule is the standard's, H built from the *real*
    ETSI table via :func:`dvbs2_address_table_parity_check` has identical
    structure; this seeded table is an ensemble stand-in (the true table
    ships with neither this repo nor the reference, SURVEY.md §6).
    """
    n_parity = n_ldpc - k_ldpc
    G = group_size(k_ldpc, n_parity)
    q = n_parity // G
    n_groups = k_ldpc // G
    # Degree-8 share: 2/5 of info groups at rate 1/2 (12960 of 32400).
    n_deg8 = int(round(n_groups * 12960 / 32400)) if k_ldpc != 32400 else 36
    group_sizes = [8] * n_deg8 + [3] * (n_groups - n_deg8)
    total = sum(group_sizes)
    if total % q:
        # pad the last degree-3 groups up to divisibility
        i = len(group_sizes) - 1
        while total % q:
            group_sizes[i] += 1
            total += 1
            i -= 1
    per_class = total // q

    rng = np.random.default_rng(seed)
    # Deal residue classes so each appears exactly per_class times, then
    # assign a random multiple-of-q offset per address, avoiding duplicate
    # addresses within a group.
    classes = rng.permutation(np.repeat(np.arange(q, dtype=np.int64), per_class))
    table: list[list[int]] = []
    pos = 0
    for size in group_sizes:
        addrs: set[int] = set()
        for c in classes[pos : pos + size]:
            while True:
                a = int(c) + q * int(rng.integers(0, G))
                if a not in addrs:
                    addrs.add(a)
                    break
        table.append(sorted(addrs))
        pos += size
    return table


def dvbs2_like_parity_check(
    n_ldpc: int = 64800, k_ldpc: int = 32400, seed: int = 0
) -> sp.csr_matrix:
    """Seeded structured IRA code with the DVB-S2 rate-1/2 profile
    (q-group expansion of :func:`dvbs2_like_address_table` + staircase)."""
    table = dvbs2_like_address_table(n_ldpc, k_ldpc, seed)
    return dvbs2_address_table_parity_check(table, n_ldpc, k_ldpc)


def dvbs2_layout_node_keys(n_ldpc: int, k_ldpc: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode-layout node orderings that turn the CN<->VN edge permutation
    into ~360-long contiguous runs.

    Checks and parity variables are ordered class-major: position of row r is
    ``(r % q) * 360 + r // q``. Then every (group, address) block of 360
    edges, and every staircase diagonal, is a contiguous run in both layouts.
    """
    n_parity = n_ldpc - k_ldpc
    G = group_size(k_ldpc, n_parity)
    q = n_parity // G
    r = np.arange(n_parity, dtype=np.int64)
    class_major = (r % q) * G + r // q
    cn_key = class_major
    vn_key = np.concatenate([np.arange(k_ldpc, dtype=np.int64), k_ldpc + class_major])
    return cn_key, vn_key
