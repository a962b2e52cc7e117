"""Optional features mirrored from the reference's dead code (chem/extras)."""

import numpy as np

from goicp_tpu.chem.extras import (covariance_matrix, density_difference_bnb,
                                   density_difference_icp,
                                   eigen_shape_features, neighbor_mismatch_v2,
                                   neighbor_mismatch_v3, property_density)


def test_property_density_simple():
    # two tight 20-point clusters far apart (>= target_max+1 points each so
    # the reference's radius-growth loop terminates at a small radius):
    # one all same property, one alternating between two properties
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 0.05, size=(20, 3))
    b = a + 50.0
    coords = np.vstack([a, b])
    props = np.concatenate([np.ones(20, int),
                            np.where(np.arange(20) % 2 == 0, 2, 3)])
    d = property_density(coords, props)
    # cluster a: every neighbor shares prop 1 -> density 1.0
    np.testing.assert_allclose(d[:20], 1.0)
    # cluster b: each point sees 19 neighbors, 9 sharing its property
    np.testing.assert_allclose(d[20:], 9.0 / 19.0, atol=1e-6)


def test_density_differences():
    src_d = np.array([0.2, 0.8], np.float32)
    tgt_d = np.array([0.1, 0.9, 0.5], np.float32)
    nn = np.array([2, 1])
    np.testing.assert_allclose(density_difference_icp(src_d, tgt_d, nn),
                               [0.3, 0.1], atol=1e-6)
    cell_points = np.array([[0, 1, -1], [2, -1, -1]])
    cell_ids = np.array([0, 1])
    got = density_difference_bnb(src_d, tgt_d, cell_points, cell_ids)
    np.testing.assert_allclose(got, [0.1, 0.3], atol=1e-6)


def test_neighbor_mismatch_v2_threshold():
    # diffs: 5 (counted), 3 (not > 3), 0 -> sum 5
    assert neighbor_mismatch_v2([10, 4, 2], [5, 7, 2]) == 5


def test_neighbor_mismatch_v3_buckets():
    # reference case table (jly_goicp.cpp:1337-1358):
    # src 1 (low) vs tgt 4 (mid)  -> 1
    # src 1 (low) vs tgt 6 (high) -> 2
    # src 3 (mid) vs tgt 7 (outside mid) -> 1
    # src 6 (high) vs tgt 0 (low) -> 2
    # src 9 (>=7) vs anything     -> 0
    assert neighbor_mismatch_v3([1, 1, 3, 6, 9], [4, 6, 7, 0, 0]) == 6


def test_eigen_shape_features_planar():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)) * np.array([5.0, 3.0, 0.01])
    cov = covariance_matrix(pts)
    np.testing.assert_allclose(cov, cov.T)
    f = eigen_shape_features(pts)
    l1, l2, l3 = f["eigenvalues"]
    assert l1 >= l2 >= l3 >= 0
    assert f["planarity"] > 0.3          # flat sheet: l2 >> l3
    assert f["scattering"] < 0.01
