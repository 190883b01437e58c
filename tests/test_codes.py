import numpy as np
import pytest
import scipy.sparse as sp

from informationbottleneckdecodingldpc_tpu.codes import (
    TannerGraph,
    alist_to_csr,
    csr_to_alist,
    parse_alist,
    dvbs2_like_parity_check,
    load_check_matrix,
    node_degree_distributions,
    node_to_edge_distribution,
    code_rate_from_distributions,
    regular_parity_check,
    save_check_matrix,
    wlan_80211n_parity_check,
)


def test_parse_alist_reduced_format():
    # Same doctest example as the reference's alistToNumpy
    # (discrete_LDPC_decoder.py:64-67).
    lines = [[3, 2], [2, 2], [1, 1, 2], [2, 2], [1], [2], [1, 2], [1, 2, 3, 4]]
    H = parse_alist(lines).toarray()
    np.testing.assert_array_equal(H, [[1, 0, 1], [0, 1, 1]])


def test_alist_roundtrip(tmp_path, rng):
    H = sp.csr_matrix((rng.random((7, 13)) < 0.3).astype(np.int8))
    path = str(tmp_path / "code.alist")
    csr_to_alist(H, path)
    H2 = alist_to_csr(path)
    np.testing.assert_array_equal(H.toarray(), H2.toarray())


@pytest.mark.parametrize("ext", ["npy", "npz", "alist"])
def test_check_matrix_io_roundtrip(tmp_path, rng, ext):
    H = sp.csr_matrix((rng.random((6, 12)) < 0.4).astype(np.int8))
    path = str(tmp_path / f"code.{ext}")
    save_check_matrix(H, path)
    H2 = load_check_matrix(path)
    np.testing.assert_array_equal(H.toarray(), H2.toarray())


def test_wlan_matrix_structure():
    H = wlan_80211n_parity_check()
    assert H.shape == (648, 1296)
    row_deg = np.asarray(H.sum(axis=1)).ravel()
    col_deg = np.asarray(H.sum(axis=0)).ravel()
    # Reference generator prints these invariants
    # (generate_802.11_matrix.py:35-37): row degrees {7, 8} with 108 rows of
    # degree 8; column degrees {2, 3, 4, 11, 12}.
    assert set(np.unique(row_deg)) == {7, 8}
    assert (row_deg == 8).sum() == 108
    assert set(np.unique(col_deg)) <= {1, 2, 3, 4, 11, 12}


def test_wlan_degree_distribution_matches_config():
    # WLAN config generation declares d_v_dist over degrees
    # {2: 11/24, 3: 9/24, 4: 1/24, 11: 3/24} and d_c {7: 10/12, 8: 2/12}
    # (Irregular_LDPC_Decoding/WLAN/decoder_config_generation.py:30-33).
    H = wlan_80211n_parity_check()
    g = TannerGraph.from_check_matrix(H)
    d_v_dist, d_c_dist = node_degree_distributions(g.vn_degree, g.cn_degree)
    expect_v = np.zeros(11)
    expect_v[[1, 2, 3, 10]] = [11 / 24, 9 / 24, 1 / 24, 3 / 24]
    expect_c = np.zeros(8)
    expect_c[[6, 7]] = [10 / 12, 2 / 12]
    np.testing.assert_allclose(d_v_dist, expect_v, atol=1e-12)
    np.testing.assert_allclose(d_c_dist, expect_c, atol=1e-12)
    assert abs(g.code_rate - 0.5) < 1e-12


def test_regular_code_properties():
    H = regular_parity_check(504, d_v=3, d_c=6, seed=7)
    assert H.shape == (252, 504)
    np.testing.assert_array_equal(np.asarray(H.sum(axis=0)).ravel(), 3)
    np.testing.assert_array_equal(np.asarray(H.sum(axis=1)).ravel(), 6)
    # 4-cycle count should be reduced to (near) zero.
    gram = (H @ H.T).toarray()
    np.fill_diagonal(gram, 0)
    assert (gram >= 2).sum() == 0


def test_dvbs2_profile():
    H = dvbs2_like_parity_check()
    assert H.shape == (32400, 64800)
    col_deg = np.asarray(H.sum(axis=0)).ravel()
    row_deg = np.asarray(H.sum(axis=1)).ravel()
    # Exact reference profile (DVB-S2/decoder_config_generation.py:31-34).
    assert (col_deg == 8).sum() == 12960
    assert (col_deg == 3).sum() == 19440
    assert (col_deg == 2).sum() == 32399
    assert (col_deg == 1).sum() == 1
    assert (row_deg == 7).sum() == 32399
    assert (row_deg == 6).sum() == 1


def test_edge_distribution_conversion():
    # Matches Information_Matching.convert_node_to_edge_degree semantics.
    node = np.array([0.0, 0.5, 0.5])
    edge = node_to_edge_distribution(node)
    np.testing.assert_allclose(edge, [0.0, 1.0 / 2.5, 1.5 / 2.5])
    assert abs(code_rate_from_distributions(np.array([0, 0, 1.0]), np.array([0, 0, 0, 0, 0, 1.0])) - 0.5) < 1e-12


def test_tanner_graph_permutations(rng):
    H = sp.csr_matrix((rng.random((20, 40)) < 0.2).astype(np.int8))
    g = TannerGraph.from_check_matrix(H)
    assert g.n_edges == H.nnz
    # Permutations must be inverse to each other.
    np.testing.assert_array_equal(
        g.cn_slot_of_vn_edge[g.vn_slot_of_cn_edge], np.arange(g.n_edges)
    )
    # A CN-order edge's endpoints agree with the VN-order view.
    e_cn = np.arange(g.n_edges)
    e_vn = g.vn_slot_of_cn_edge[e_cn]
    np.testing.assert_array_equal(g.cn_edge_var[e_cn], g.vn_edge_var[e_vn])
    # Degree groups cover every node exactly once.
    covered = np.concatenate([grp.node_ids for grp in g.vn_groups])
    assert np.sort(covered).tolist() == list(range(g.n_vars))
    for grp in g.cn_groups:
        assert grp.edge_slots.shape == (grp.node_ids.size, grp.degree)
        # The slots of node i are exactly the CSR segment of that row.
        for i in range(min(3, grp.node_ids.size)):
            c = grp.node_ids[i]
            np.testing.assert_array_equal(
                grp.edge_slots[i],
                np.arange(g.cn_start[c], g.cn_start[c] + grp.degree),
            )


def test_dvbs2_standard_matrix_structure():
    """ETSI EN 302 307-1 Annex B Table B.3 (rate 1/2, N=64800): structural
    invariants of the standard table and its q-group expansion."""
    from collections import Counter

    import scipy.sparse as sp

    from informationbottleneckdecodingldpc_tpu.codes import (
        DVBS2_R12_N64800_TABLE,
        dvbs2_parity_check,
    )

    sizes = [len(r) for r in DVBS2_R12_N64800_TABLE]
    assert sizes.count(8) == 36 and sizes.count(3) == 54
    flat = [a for r in DVBS2_R12_N64800_TABLE for a in r]
    assert len(flat) == 450 and 0 <= min(flat) and max(flat) < 32400
    # Every residue class mod q=90 carries exactly 5 addresses => every
    # parity check has A-degree exactly 5 (7 after the staircase).
    assert set(Counter(a % 90 for a in flat).values()) == {5}
    H = dvbs2_parity_check("1/2", 64800)
    assert H.shape == (32400, 64800)
    vd = Counter(np.asarray(H.sum(axis=0)).ravel().tolist())
    cd = Counter(np.asarray(H.sum(axis=1)).ravel().tolist())
    # The degree profile the reference designs for
    # (DVB-S2/decoder_config_generation.py:31-34).
    assert vd == {8: 12960, 3: 19440, 2: 32399, 1: 1}
    assert cd == {7: 32399, 6: 1}


def test_mat_matrix_roundtrip(tmp_path):
    """.mat save/load round-trip (the reference saves WLAN_H.mat,
    generate_802.11_matrix.py:41-43)."""
    from informationbottleneckdecodingldpc_tpu.codes import (
        wlan_80211n_parity_check,
    )
    from informationbottleneckdecodingldpc_tpu.codes.io import (
        load_check_matrix,
        save_check_matrix,
    )

    H = wlan_80211n_parity_check()
    p = str(tmp_path / "H.mat")
    save_check_matrix(H, p)
    H2 = load_check_matrix(p)
    assert (H != H2).nnz == 0
