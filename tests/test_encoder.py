import numpy as np
import pytest
import scipy.sparse as sp

from informationbottleneckdecodingldpc_tpu.codes import (
    dvbs2_like_parity_check,
    regular_parity_check,
    wlan_80211n_parity_check,
)
from informationbottleneckdecodingldpc_tpu.encode import (
    LDPCEncoder,
    gf2_factorize_packed,
    is_full_diag_triangular,
)
from informationbottleneckdecodingldpc_tpu.utils import (
    native_available,
    pack_bits,
    unpack_bits,
)


def test_bitpack_roundtrip(rng):
    bits = (rng.random((13, 100)) < 0.5).astype(np.int8)
    packed, batch = pack_bits(bits)
    assert packed.dtype == np.uint64
    np.testing.assert_array_equal(unpack_bits(packed, batch), bits)


def test_triangularity_detection():
    L = sp.csr_matrix(np.tril(np.ones((4, 4), dtype=np.int8)))
    assert is_full_diag_triangular(L) == 1
    assert is_full_diag_triangular(sp.csr_matrix(L.T)) == -1
    X = sp.csr_matrix(np.array([[1, 1], [1, 1]], dtype=np.int8))
    assert is_full_diag_triangular(X) == 0


def test_gf2_factorization_solves(rng):
    """Contract: with L, U', row_order from the factorization, solving
    L y = s then U' p = y[row_order] gives X p = s over GF(2)."""
    m = 40
    X = (rng.random((m, m)) < 0.3).astype(np.uint8)
    np.fill_diagonal(X, 1)
    f = gf2_factorize_packed(X)
    assert f.invertible
    L = (f.l_strict.toarray() + np.eye(m, dtype=np.int8)) % 2
    U = (f.u_strict_permuted.toarray() + np.eye(m, dtype=np.int8)) % 2
    s = (rng.random(m) < 0.5).astype(np.int8)
    y = np.linalg.solve(L.astype(float), s.astype(float))  # unit lower tri
    y = np.round(y).astype(np.int64) % 2  # not GF(2)-valid; do it properly:
    # forward substitution over GF(2)
    y = s.copy().astype(np.int64)
    for col in range(m):
        if y[col]:
            rows = np.nonzero(L[:, col])[0]
            rows = rows[rows > col]
            y[rows] ^= 1
    p = y[f.row_order].copy()
    for col in range(m - 1, -1, -1):
        if p[col]:
            rows = np.nonzero(U[:, col])[0]
            rows = rows[rows < col]
            p[rows] ^= 1
    np.testing.assert_array_equal((X @ p) % 2, s)


@pytest.mark.parametrize(
    "make_H",
    [
        lambda: wlan_80211n_parity_check(),
        lambda: dvbs2_like_parity_check(6480, 3240, seed=2),
        lambda: regular_parity_check(1008, 3, 6, seed=5),
    ],
    ids=["wlan", "dvbs2-like", "regular"],
)
def test_encoder_parity(make_H, rng):
    H = make_H()
    try:
        enc = LDPCEncoder(H)
    except ValueError:
        pytest.skip("singular parity part for this seed")
    k = enc.k
    u = (rng.random((k, 70)) < 0.5).astype(np.int8)
    c = enc.encode(u)
    assert c.shape == (enc.n, 70)
    # Systematic prefix preserved.
    np.testing.assert_array_equal(c[:k], u)
    # Every codeword satisfies H c = 0 over GF(2).
    syn = enc.check(c)
    assert syn.max() == 0


def test_encoder_device_path_matches_host(rng):
    H = dvbs2_like_parity_check(6480, 3240, seed=2)
    enc = LDPCEncoder(H)
    assert enc.is_staircase
    dev = enc.device_encoder()
    assert dev is not None
    import jax.numpy as jnp

    u = (rng.random((enc.k, 64)) < 0.5).astype(np.int8)
    c_host = enc.encode(u)
    c_dev = np.asarray(dev(jnp.asarray(u)))
    np.testing.assert_array_equal(c_host, c_dev)


def test_encoder_device_dense_inverse_matches_host(rng):
    H = wlan_80211n_parity_check()
    enc = LDPCEncoder(H)
    dev = enc.device_encoder()
    assert dev is not None
    import jax.numpy as jnp

    u = (rng.random((enc.k, 8)) < 0.5).astype(np.int8)
    c_host = enc.encode(u)
    c_dev = np.asarray(dev(jnp.asarray(u)))
    np.testing.assert_array_equal(c_host, c_dev)


def test_native_kernels_available():
    # The toolchain is baked into the image; the native path must build.
    assert native_available()
