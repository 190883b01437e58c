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


def dvbs2_address_table_parity_check(
    addresses: list[list[int]], n_ldpc: int, k_ldpc: int
) -> sp.csr_matrix:
    """Expand a DVB-S2 parity-address table into H = [A | staircase].

    ``addresses[g]`` lists the parity addresses of the first bit of
    information-bit group ``g`` (360 bits per group); bit ``m`` of the group
    connects to ``(x + (m % 360) * q) % (n_ldpc - k_ldpc)`` for each listed
    ``x``, with ``q = (n_ldpc - k_ldpc) // 360``.
    """
    n_parity = n_ldpc - k_ldpc
    q = n_parity // 360
    rows, cols = [], []
    m = np.arange(360, dtype=np.int64)
    for g, addr in enumerate(addresses):
        col = g * 360 + m
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


def dvbs2_like_parity_check(
    n_ldpc: int = 64800, k_ldpc: int = 32400, seed: int = 0
) -> sp.csr_matrix:
    """Seeded ensemble-matched IRA code with the DVB-S2 rate-1/2 profile.

    Information columns: the first ``3/8 K`` (12960 at rate 1/2) have degree 8
    and the rest degree 3, mirroring the standard's ordering; the A-part edges
    are spread so every parity row receives exactly the same A-degree, giving
    check degrees {q_row, q_row+1} exactly as in the standard profile.
    """
    n_parity = n_ldpc - k_ldpc
    # Degree-8 / degree-3 split chosen to make A edges divisible by rows:
    # 8*a + 3*(k-a) = r * n_parity for integer row degree r.
    a = 0
    for cand in range(k_ldpc + 1):
        total = 8 * cand + 3 * (k_ldpc - cand)
        if total % n_parity == 0 and abs(cand - int(0.4 * k_ldpc)) < abs(
            a - int(0.4 * k_ldpc)
        ):
            a = cand
    if n_ldpc == 64800 and k_ldpc == 32400:
        a = 12960  # exact reference profile
    col_deg = np.concatenate(
        [np.full(a, 8, np.int64), np.full(k_ldpc - a, 3, np.int64)]
    )
    row_deg_a = col_deg.sum() // n_parity

    rng = np.random.default_rng(seed)
    col_stubs = np.repeat(np.arange(k_ldpc, dtype=np.int64), col_deg)
    row_stubs = np.tile(np.arange(n_parity, dtype=np.int64), row_deg_a)
    extra = col_stubs.size - row_stubs.size
    if extra > 0:  # non-divisible fallback: give the first rows one more edge
        row_stubs = np.concatenate([row_stubs, np.arange(extra, dtype=np.int64)])
    rng.shuffle(row_stubs)

    # Repair duplicate (row, col) pairs with pair swaps so H stays 0/1 with
    # the exact degree sequence.
    for _ in range(100):
        key = row_stubs * np.int64(k_ldpc) + col_stubs
        order = np.argsort(key, kind="stable")
        dup_pos = order[1:][np.diff(key[order]) == 0]
        if dup_pos.size == 0:
            break
        partners = rng.integers(0, row_stubs.size, size=dup_pos.size)
        row_stubs[dup_pos], row_stubs[partners] = (
            row_stubs[partners],
            row_stubs[dup_pos].copy(),
        )
    sr, sc = _staircase(n_parity)
    rows = np.concatenate([row_stubs, sr])
    cols = np.concatenate([col_stubs, sc + k_ldpc])
    H = sp.coo_matrix(
        (np.ones(rows.size, dtype=np.int8), (rows, cols)),
        shape=(n_parity, n_ldpc),
    ).tocsr()
    H.sum_duplicates()
    H.data[:] = 1
    return H
