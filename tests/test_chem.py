"""Chemistry: properties, compatibility, neighbor weights."""

import numpy as np

from goicp_tpu.chem.neighbors import (adaptive_neighbor_counts,
                                      neighbor_counts, neighbor_weights)
from goicp_tpu.chem.properties import (NUM_PROPS, PROP_CODES,
                                       codes_to_indices,
                                       compatibility_matrix, string_to_prop)


def test_prop_codes():
    assert string_to_prop("OG") == 8204959
    assert string_to_prop("C") == 1
    assert string_to_prop("???") == PROP_CODES["OG"]  # fallback
    idx = codes_to_indices(np.array([8204959, 1, 30894]))
    np.testing.assert_array_equal(idx, [0, 8, 1])


def test_compat_identity():
    m = compatibility_matrix()
    assert m.shape == (NUM_PROPS, NUM_PROPS)
    np.testing.assert_array_equal(m, np.eye(NUM_PROPS, dtype=bool))


def test_compat_rich():
    m = compatibility_matrix(identity_only=False)
    from goicp_tpu.chem.properties import PROP_INDEX
    assert m[PROP_INDEX["N"], PROP_INDEX["NZ"]]
    assert not m[PROP_INDEX["N"], PROP_INDEX["O"]]


def test_neighbor_counts_simple():
    # three collinear points, spacing 0.1; sqrt(0.05)~0.2236
    pts = np.array([[0, 0, 0], [0.1, 0, 0], [0.2, 0, 0]], dtype=float)
    c = neighbor_counts(pts, 0.050)
    np.testing.assert_array_equal(c, [2, 2, 2])
    c2 = neighbor_counts(pts, 0.0001)  # radius 0.01
    np.testing.assert_array_equal(c2, [0, 0, 0])


def test_adaptive_counts_and_weights():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, size=(120, 3))
    counts, min_n, r = adaptive_neighbor_counts(pts)
    assert counts.max() >= 19
    assert r >= 0.035
    w = neighbor_weights(pts)
    assert w.shape == (120,)
    assert (w >= 1.0).all()
    # sparsest points get the largest weights
    assert w[counts.argmin()] == w.max()
