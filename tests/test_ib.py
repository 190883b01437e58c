import numpy as np
import pytest
from scipy.stats import norm

from informationbottleneckdecodingldpc_tpu.ib import (
    LinSymSIB,
    SymmetricSIB,
    kl_divergence,
    mutual_information,
    numerical_guard,
    optimal_symmetric_quantizer,
    sequential_sib,
)


def awgn_joint(sigma2: float, n_grid: int = 200, a_max: float = 3.0) -> np.ndarray:
    """p(x, y) for BPSK (bit0 -> +1) over an AWGN output grid."""
    y = np.linspace(-a_max, a_max, n_grid)
    delta = y[1] - y[0]
    p0 = norm.pdf(y, loc=1, scale=np.sqrt(sigma2)) * delta
    p1 = p0[::-1]
    p = 0.5 * np.stack([p0, p1], axis=1)
    return p / p.sum()


def test_mutual_information_known_values():
    # Independent -> 0; identity channel -> 1 bit.
    assert mutual_information(np.full((2, 2), 0.25)) == pytest.approx(0.0)
    assert mutual_information(np.array([[0.5, 0.0], [0.0, 0.5]])) == pytest.approx(1.0)
    # BSC(p): I = 1 - H2(p).
    p = 0.11
    joint = 0.5 * np.array([[1 - p, p], [p, 1 - p]])
    h2 = -p * np.log2(p) - (1 - p) * np.log2(1 - p)
    assert mutual_information(joint) == pytest.approx(1 - h2)


def test_kl_divergence_broadcasting():
    p = np.array([0.7, 0.3])
    q = np.array([[0.7, 0.3], [0.5, 0.5], [0.3, 0.7]])
    d = kl_divergence(p, q)
    assert d.shape == (3,)
    assert d[0] == pytest.approx(0.0)
    assert np.all(d[1:] > 0)
    assert d[2] > d[1]


def test_numerical_guard_clips_and_normalizes():
    pdf = np.array([[0.0, 0.7], [0.3, 0.0]])
    out = numerical_guard(pdf)
    assert out.min() > 0
    assert out.sum() == pytest.approx(1.0)
    # Clipping happens pre-normalization (as in the reference's
    # numerical_quard), so post-normalization values may exceed the cap;
    # already-normalized inputs stay capped.
    out2 = numerical_guard(np.array([[0.25, 0.25], [0.25, 0.25]]))
    assert out2.max() <= 0.5


def test_quantizer_symmetry_and_ordering():
    p = awgn_joint(0.5)
    r = optimal_symmetric_quantizer(p, 8)
    # Labels must ascend with y (y ascends with LLR for BPSK bit0 -> +1).
    assert np.all(np.diff(r.labels) >= 0)
    # Symmetric: label(y) + label(mirror y) = K - 1.
    np.testing.assert_array_equal(r.labels + r.labels[::-1], 7)
    # Output LLR log(p(x0|t)/p(x1|t)) strictly increasing in t.
    llr = np.log(r.p_x_given_t[:, 0]) - np.log(r.p_x_given_t[:, 1])
    assert np.all(np.diff(llr) > 0)
    # p_t symmetric and sums to 1.
    np.testing.assert_allclose(r.p_t, r.p_t[::-1], atol=1e-12)
    assert r.p_t.sum() == pytest.approx(1.0)


def test_quantizer_data_processing_inequality():
    p = awgn_joint(0.8)
    r16 = optimal_symmetric_quantizer(p, 16)
    r4 = optimal_symmetric_quantizer(p, 4)
    assert r16.mi_xt <= r16.mi_xy + 1e-12
    assert r4.mi_xt <= r16.mi_xt + 1e-12
    # 16 levels on a 200-point grid should capture almost all of I(X;Y).
    assert r16.mi_xt > 0.97 * r16.mi_xy


def test_dp_beats_exhaustive_small():
    # Exact check on a tiny problem: enumerate all symmetric contiguous
    # clusterings of 6 outputs into 4 clusters and compare.
    rng = np.random.default_rng(0)
    raw = rng.random((3, 2))
    p = np.vstack([raw, raw[::-1, ::-1]])
    p = p / p.sum()
    r = optimal_symmetric_quantizer(p, 4)

    # brute force over the sorted-half boundary (1 interior boundary in half=3)
    with np.errstate(divide="ignore"):
        llr = np.log(p[:, 0]) - np.log(p[:, 1])
    order = np.argsort(llr, kind="stable")
    ps = p[order]
    ps = 0.5 * (ps + ps[::-1, ::-1])
    best = -np.inf
    for b in range(1, 3):
        labels = np.array([0] * b + [1] * (3 - b))
        labels = np.concatenate([labels, 3 - labels[::-1]])
        joint = np.zeros((4, 2))
        for y, t in enumerate(labels):
            joint[t] += ps[y]
        best = max(best, mutual_information(joint))
    assert r.mi_xt == pytest.approx(best, abs=1e-12)


def test_dp_dominates_sequential_sib():
    p = awgn_joint(1.0, n_grid=64)
    dp = optimal_symmetric_quantizer(p, 8)
    seq = sequential_sib(p, 8, nror=5, seed=3)
    assert dp.mi_xt >= seq.mi_xt - 1e-12


def test_sib_class_api():
    p = awgn_joint(0.7, n_grid=128)
    for cls in (SymmetricSIB, LinSymSIB):
        inst = cls(p, 16, 5)
        inst.run_IB_algo()
        p_t_given_y, p_x_given_t, p_t = inst.get_results()
        assert p_t_given_y.shape == (128, 16)
        np.testing.assert_allclose(p_t_given_y.sum(1), 1.0)
        assert p_x_given_t.shape == (16, 2)
        assert p_t.shape == (16,)
        mi_xt, mi_xy = inst.get_mutual_inf()
        assert 0 < mi_xt <= mi_xy + 1e-12
        inst.display_MIs(short=True)
