"""Distance transform: exact-EDT fields vs brute force; lookup semantics."""

import numpy as np
import pytest

from goicp_tpu.grid.edt import (Grid, build_grid, grid_geometry, round_ref,
                                round_ref_np)
from goicp_tpu.grid.lookup import dt_distance, nearest_cell_id

import jax.numpy as jnp


def _random_cloud(n=60, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.8, 0.8, size=(n, 3))
    props = rng.integers(0, 9, size=n).astype(np.int32)
    return pts, props


def test_round_matches_c_semantics():
    # ROUND(x) = int(x+0.5) with C trunc-toward-zero
    xs = np.array([-1.6, -1.2, -0.7, -0.4, 0.0, 0.4, 0.5, 1.49, 2.5])
    expect = np.array([int(x + 0.5) for x in xs])  # python int() truncs too
    np.testing.assert_array_equal(round_ref_np(xs), expect)
    np.testing.assert_array_equal(np.asarray(round_ref(jnp.asarray(xs))),
                                  expect)


def test_geometry_cubeified():
    pts, _ = _random_cloud()
    geom = grid_geometry(pts, size=20, expand_factor=2.0)
    mn = pts.min(0)
    mx = pts.max(0)
    center = (mn + mx) / 2
    extent = (2.0 * 2.0 * (mx - center)).max()
    assert geom.scale == pytest.approx(20 / extent)
    assert geom.x_min == pytest.approx(center[0] - extent / 2)


def test_edt_matches_brute_force():
    pts, props = _random_cloud(50, 1)
    size = 12
    g = build_grid(pts, props, size=size, expand_factor=2.0)
    assert isinstance(g, Grid)

    # brute force: distance from each voxel center to nearest occupied voxel
    occ = np.asarray(g.cell_coords)[: g.n_cells].astype(np.float64)
    vx, vy, vz = np.meshgrid(np.arange(size), np.arange(size),
                             np.arange(size), indexing="ij")
    # field flattening is (z*S + y)*S + x -> build in matching order
    voxels = np.stack([vz.ravel(), vy.ravel(), vx.ravel()], 1)[:, ::-1]
    # voxels[:, 0]=x fastest? Construct explicitly:
    flat = np.arange(size ** 3)
    voxels = np.stack([flat % size, (flat // size) % size,
                       flat // (size * size)], axis=1).astype(np.float64)
    d = np.linalg.norm(voxels[:, None, :] - occ[None, :, :], axis=2)
    brute_dist = d.min(axis=1) / g.geom.scale
    brute_arg = d.argmin(axis=1)

    np.testing.assert_allclose(np.asarray(g.dist), brute_dist, atol=1e-4)
    # argmin ties can differ; distances of chosen cells must match
    chosen = np.asarray(g.nearest_cell)
    d_chosen = np.linalg.norm(voxels - occ[chosen], axis=1) / g.geom.scale
    np.testing.assert_allclose(d_chosen, brute_dist, atol=1e-4)


def test_seed_voxels_have_zero_distance():
    pts, props = _random_cloud(30, 2)
    g = build_grid(pts, props, size=16, expand_factor=2.0)
    occ = np.asarray(g.cell_coords)[: g.n_cells]
    flat = (occ[:, 2] * 16 + occ[:, 1]) * 16 + occ[:, 0]
    np.testing.assert_allclose(np.asarray(g.dist)[flat], 0.0, atol=1e-6)
    # nearest cell of an occupied voxel is itself
    np.testing.assert_array_equal(np.asarray(g.nearest_cell)[flat],
                                  np.arange(g.n_cells))


def test_lookup_in_bounds_matches_field():
    pts, props = _random_cloud(40, 3)
    g = build_grid(pts, props, size=14, expand_factor=2.0)
    # model points themselves: lookup distance should be ~ quantization error
    d = np.asarray(dt_distance(jnp.asarray(pts, jnp.float32), g.dist,
                               g.consts))
    assert (d <= np.sqrt(3) / 2 / g.geom.scale + 1e-5).all()


def test_lookup_out_of_bounds_extension():
    pts, props = _random_cloud(40, 4)
    size = 10
    g = build_grid(pts, props, size=size, expand_factor=2.0)
    geom = g.geom
    # a point far outside along +x
    far = np.array([[geom.x_min + (size + 5.3) / geom.scale,
                     geom.y_min + 4.0 / geom.scale,
                     geom.z_min + 4.0 / geom.scale]], dtype=np.float32)
    raw = round_ref_np((far[0] - [geom.x_min, geom.y_min, geom.z_min])
                       * geom.scale)
    a = raw[0] - size + 1
    clamped = np.clip(raw, 0, size - 1)
    flat = (clamped[2] * size + clamped[1]) * size + clamped[0]
    expect = np.sqrt(float(a) ** 2) / geom.scale + np.asarray(g.dist)[flat]
    got = float(dt_distance(jnp.asarray(far), g.dist, g.consts)[0])
    assert got == pytest.approx(expect, rel=1e-5)


def test_cell_tables():
    pts = np.array([[0.0, 0.0, 0.0], [0.001, 0.0, 0.0], [0.5, 0.5, 0.5]])
    props = np.array([2, 2, 5], dtype=np.int32)
    g = build_grid(pts, props, size=8, expand_factor=2.0)
    colors = np.asarray(g.cell_color)[: g.n_cells]
    masks = np.asarray(g.cell_mask)[: g.n_cells]
    counts = np.asarray(g.cell_count)[: g.n_cells]
    # two first points share a voxel (uniform prop 2), third alone (prop 5)
    assert sorted(counts.tolist()) == [1, 2]
    assert set(colors.tolist()) == {2, 5}
    assert set(masks.tolist()) == {1 << 2, 1 << 5}


def test_nearest_cell_lookup():
    pts, props = _random_cloud(25, 5)
    g = build_grid(pts, props, size=12, expand_factor=2.0)
    q = jnp.asarray(pts[:10], jnp.float32)
    cid = np.asarray(nearest_cell_id(q, g.nearest_cell, g.consts))
    assert (cid >= 0).all() and (cid < g.n_cells).all()
