"""Pallas MXU bound kernels vs the XLA gather path (interpret mode on CPU).

The kernels recompute the exact-EDT lookup as a min over occupied cells
(bounds/pallas_eval.py); within their support envelope they must match the
table-gather path bit-for-bit (same integer-exact arithmetic, same
tie-breaks).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from goicp_tpu.config import GoICPConfig
from goicp_tpu.bounds import evaluate as ev
from goicp_tpu.bounds.pallas_eval import (chem_incomp_kernel,
                                          geometric_bounds_kernel, supports)
from goicp_tpu.pipeline.prepare import prepare_pair


def _pair_and_cfg(n=37, m=41, pad_to=64, seed=3, **cfg_kw):
    rng = np.random.default_rng(seed)
    cfg = GoICPConfig(regularization=0.0005, ponderation=1,
                      distTransSize=12, **cfg_kw)
    src = rng.uniform(-0.7, 0.7, size=(n, 3))
    tgt = rng.uniform(-0.7, 0.7, size=(m, 3))
    sp = rng.integers(0, 9, size=n).astype(np.int32)
    tp = rng.integers(0, 9, size=m).astype(np.int32)
    pair = prepare_pair(src, tgt, sp, tp, cfg, pad_data_to=pad_to)
    return pair, cfg


def _lanes(pair, rng, L=4, B=8):
    pts = jnp.asarray(
        rng.uniform(-0.9, 0.9, size=(L, pair.n_data_padded, 3)),
        jnp.float32)
    centers = jnp.asarray(rng.uniform(-0.6, 0.6, size=(L, B, 3)), jnp.float32)
    widths = jnp.asarray(rng.uniform(0.05, 0.5, size=(L, B)), jnp.float32)
    return pts, centers, widths


@pytest.mark.parametrize("norm", [1, 2])
@pytest.mark.parametrize("with_unc", [False, True])
def test_geometric_kernel_matches_xla(norm, with_unc):
    pair, cfg = _pair_and_cfg(norm=norm)
    assert supports(pair.grid.geom.size, 64, norm)
    rng = np.random.default_rng(11)
    pts, centers, widths = _lanes(pair, rng)
    unc = ev.rot_uncertainty(jnp.asarray(rng.uniform(0.1, 1.0, size=(4,)),
                                         jnp.float32),
                             pair.norm_data) if with_unc else None
    ub_x, lb_x = ev.geometric_bounds(pair, cfg, pts, centers, widths, unc)
    ub_p, lb_p = geometric_bounds_kernel(
        pts, centers, widths, unc, pair.weights, pair.grid.cell_coords,
        pair.grid.consts, size=pair.grid.geom.size, norm=norm,
        interpret=True)
    np.testing.assert_allclose(np.asarray(ub_p), np.asarray(ub_x),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lb_p), np.asarray(lb_x),
                               rtol=0, atol=1e-5)


def test_geometric_kernel_oob_extension():
    """Centers far outside the grid exercise the out-of-bounds formula."""
    pair, cfg = _pair_and_cfg()
    rng = np.random.default_rng(5)
    pts, centers, widths = _lanes(pair, rng)
    centers = centers + 2.5   # push most voxels out of bounds
    ub_x, lb_x = ev.geometric_bounds(pair, cfg, pts, centers, widths, None)
    ub_p, lb_p = geometric_bounds_kernel(
        pts, centers, widths, None, pair.weights, pair.grid.cell_coords,
        pair.grid.consts, size=pair.grid.geom.size, norm=2, interpret=True)
    np.testing.assert_allclose(np.asarray(ub_p), np.asarray(ub_x),
                               rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lb_p), np.asarray(lb_x),
                               rtol=1e-6, atol=1e-4)


def test_geometric_kernel_chunked_cells_matches_xla():
    """c_pad > _GEOM_C_CHUNK exercises the static-unroll chunked min
    (the large-grid envelope behind the bunny demo's Pallas path; the
    ragged last chunk overlaps — idempotent under min)."""
    pair, cfg = _pair_and_cfg()
    rng = np.random.default_rng(13)
    pts, centers, widths = _lanes(pair, rng)
    ub_x, lb_x = ev.geometric_bounds(pair, cfg, pts, centers, widths, None)
    cells = np.asarray(pair.grid.cell_coords)
    cells_big = np.concatenate(
        [cells, np.full((1200 - len(cells), 3), -9, cells.dtype)])
    ub_p, lb_p = geometric_bounds_kernel(
        pts, centers, widths, None, pair.weights, jnp.asarray(cells_big),
        pair.grid.consts, size=pair.grid.geom.size, norm=2,
        interpret=True)
    np.testing.assert_allclose(np.asarray(ub_p), np.asarray(ub_x),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lb_p), np.asarray(lb_x),
                               rtol=0, atol=1e-5)


def test_chem_incomp_kernel_matches_xla():
    pair, cfg = _pair_and_cfg()
    rng = np.random.default_rng(7)
    L, Q = 3, 27
    pts = jnp.asarray(rng.uniform(-0.9, 0.9,
                                  size=(L, pair.n_data_padded, 3)),
                      jnp.float32)
    corners = jnp.asarray(rng.uniform(-0.8, 0.8, size=(L, Q, 3)), jnp.float32)
    vals = ev.chem_corner_values(pair, cfg, pts, corners)
    got = chem_incomp_kernel(pts, corners, pair.cell_compat,
                             pair.prop_onehot, pair.data_mask,
                             pair.grid.cell_coords, pair.grid.consts,
                             size=pair.grid.geom.size, interpret=True)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(vals["incomp"]))


def test_compat_rank9_factorization_exact():
    """The (Nd, C) compat table == masked prop one-hot @ cell_compat.T —
    the identity that lets the chem kernel ride the incompatibility bit
    inside its key matmul (pallas_eval._chem_kernel)."""
    pair, _ = _pair_and_cfg()
    prod = pair.prop_onehot @ pair.cell_compat.T          # (Nd, C)
    mask = np.asarray(pair.data_mask) > 0
    want = np.asarray(pair.compat_table)[mask]
    np.testing.assert_array_equal(np.asarray(prod)[mask], want.astype(
        np.float32))
    # padded rows: zero product -> inc = mask - prod = 0
    np.testing.assert_array_equal(np.asarray(prod)[~mask], 0.0)


@pytest.mark.parametrize("fused", [False, True])
def test_trimmed_kernel_matches_xla(fused):
    """In-kernel bit-bisection K-smallest selection == XLA top_k trimming."""
    pair, cfg = _pair_and_cfg(trimFraction=0.2)
    assert pair.inlier_num < pair.n_data
    rng = np.random.default_rng(17)
    pts, centers, widths = _lanes(pair, rng)
    unc = ev.rot_uncertainty(
        jnp.asarray(rng.uniform(0.1, 1.0, size=(4,)), jnp.float32),
        pair.norm_data)
    kw = dict(size=pair.grid.geom.size, norm=2, trim_k=pair.inlier_num,
              interpret=True)
    if fused:
        xla = ev.geometric_bounds_fused(pair, cfg, pts, centers, widths, unc)
        pal = geometric_bounds_kernel(
            pts, centers, widths, unc, pair.weights, pair.grid.cell_coords,
            pair.grid.consts, fused=True, **kw)
    else:
        xla = ev.geometric_bounds(pair, cfg, pts, centers, widths, unc)
        pal = geometric_bounds_kernel(
            pts, centers, widths, unc, pair.weights, pair.grid.cell_coords,
            pair.grid.consts, **kw)
    for got, want in zip(pal, xla):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("fused", [False, True])
def test_dynamic_trim_kernel_matches_static(fused):
    """Traced-k trimming (SMEM consts slot) == static trim_k compilation,
    and == the XLA sorted rank-mask path."""
    from goicp_tpu.pipeline.prepare import make_count_dynamic
    pair, cfg = _pair_and_cfg(trimFraction=0.2)
    k = pair.inlier_num
    rng = np.random.default_rng(23)
    pts, centers, widths = _lanes(pair, rng)
    unc = ev.rot_uncertainty(
        jnp.asarray(rng.uniform(0.1, 1.0, size=(4,)), jnp.float32),
        pair.norm_data)
    base = dict(size=pair.grid.geom.size, norm=2, fused=fused,
                interpret=True)
    args = (pts, centers, widths, unc, pair.weights, pair.grid.cell_coords,
            pair.grid.consts)
    static = geometric_bounds_kernel(*args, trim_k=k, **base)
    dyn = geometric_bounds_kernel(*args, trim_count=jnp.float32(k), **base)
    for got, want in zip(dyn, static):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-5)
    # XLA path in dynamic-counts mode (sorted rank mask)
    dp = make_count_dynamic(pair)
    f = ev.geometric_bounds_fused if fused else ev.geometric_bounds
    xla = f(dp, cfg, pts, centers, widths, unc)
    for got, want in zip(dyn, xla):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-4)


def test_env_routing(monkeypatch):
    """GOICP_KERNEL=pallas routes geometric_bounds through the kernel on CPU
    (interpret is only set explicitly; compiled CPU pallas also works)."""
    pair, cfg = _pair_and_cfg()
    rng = np.random.default_rng(13)
    pts, centers, widths = _lanes(pair, rng)
    monkeypatch.setenv("GOICP_KERNEL", "xla")
    ub_x, lb_x = ev.geometric_bounds(pair, cfg, pts, centers, widths, None)
    monkeypatch.setenv("GOICP_KERNEL", "pallas")
    ub_p, lb_p = ev.geometric_bounds(pair, cfg, pts, centers, widths, None)
    np.testing.assert_allclose(np.asarray(ub_p), np.asarray(ub_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lb_p), np.asarray(lb_x), atol=1e-5)


def test_geometric_kernel_chunked_cells_matches_xla():
    """Mid-size models (c_pad > 512: the in-kernel cell-chunked min path,
    outside the keyed chem envelope but inside supports_geom) still match
    the gather path."""
    from goicp_tpu.bounds.pallas_eval import supports_geom
    rng = np.random.default_rng(19)
    cfg = GoICPConfig(regularization=0.0, ponderation=0, distTransSize=28)
    m = 1400
    src = rng.uniform(-0.7, 0.7, size=(40, 3))
    tgt = rng.uniform(-0.9, 0.9, size=(m, 3))
    sp = np.zeros(40, np.int32)
    tp = np.zeros(m, np.int32)
    pair = prepare_pair(src, tgt, sp, tp, cfg, pad_data_to=64)
    c = pair.grid.cell_coords.shape[0]
    assert c > 512, c                    # actually exercises the chunk loop
    assert supports_geom(pair.grid.geom.size, c, 2)
    assert not supports(pair.grid.geom.size, c, 2)
    pts, centers, widths = _lanes(pair, rng)
    ub_x, lb_x = ev.geometric_bounds(pair, cfg, pts, centers, widths, None)
    ub_p, lb_p = geometric_bounds_kernel(
        pts, centers, widths, None, pair.weights, pair.grid.cell_coords,
        pair.grid.consts, size=pair.grid.geom.size, norm=2, interpret=True)
    np.testing.assert_allclose(np.asarray(ub_p), np.asarray(ub_x),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lb_p), np.asarray(lb_x),
                               rtol=0, atol=1e-5)


def test_lane_table_kernels_match_per_pair_kernels():
    """The packed engine's per-LANE-table kernels (every lane may belong
    to a different pair) must reproduce the per-pair kernels exactly,
    lane for lane, on a mixed-pair lane batch."""
    import jax.numpy as jnp

    from goicp_tpu.bounds.pallas_eval import (
        chem_incomp_kernel, chem_incomp_kernel_lanes, chem_tables,
        geom_table, geometric_bounds_kernel, geometric_bounds_kernel_lanes)

    cfg = GoICPConfig(regularization=0.0005, ponderation=1,
                      distTransSize=12, trimFraction=0.1)
    pairs = []
    for seed in (1, 2):
        r = np.random.default_rng(seed)
        src = r.uniform(-0.7, 0.7, size=(37, 3))
        tgt = r.uniform(-0.7, 0.7, size=(41 + seed, 3))
        pairs.append(prepare_pair(
            src, tgt, r.integers(0, 9, 37).astype(np.int32),
            r.integers(0, 9, len(tgt)).astype(np.int32), cfg,
            pad_data_to=64, pad_cells=64, pad_points=8, pad_model_to=64))
    rng = np.random.default_rng(3)
    L, B, Q = 4, 16, 54
    lane_pair = [0, 1, 0, 1]
    size = pairs[0].grid.geom.size
    nd = pairs[0].n_data_padded
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, size=(L, nd, 3)), jnp.float32)
    centers = jnp.asarray(rng.uniform(-0.5, 0.5, size=(L, B, 3)), jnp.float32)
    widths = jnp.asarray(rng.uniform(0.05, 0.5, size=(L, B)), jnp.float32)
    corners = jnp.asarray(rng.uniform(-0.6, 0.6, size=(L, Q, 3)), jnp.float32)
    unc = jnp.asarray(rng.uniform(0, 0.3, size=(L, nd)), jnp.float32)

    g6 = [geom_table(p.grid.cell_coords, size) for p in pairs]
    ct = [chem_tables(p.grid.cell_coords, p.cell_compat, p.prop_onehot,
                      p.data_mask, size) for p in pairs]
    cons = [jnp.concatenate([p.grid.consts,
                             jnp.asarray([p.inlier_f(), 0.0, 0.0])])
            for p in pairs]

    def gl(per_pair):
        return jnp.stack([per_pair[i] for i in lane_pair])

    got = geometric_bounds_kernel_lanes(
        pts, centers, widths, unc, gl([p.weights for p in pairs]),
        gl(g6), gl(cons), size=size, norm=2, trim=True, interpret=True)
    cc = chem_incomp_kernel_lanes(
        pts, corners, gl([a for a, _ in ct]), gl([p for _, p in ct]),
        gl(cons), size=size, interpret=True)

    for lane in range(L):
        p = pairs[lane_pair[lane]]
        want = geometric_bounds_kernel(
            pts[lane:lane + 1], centers[lane:lane + 1],
            widths[lane:lane + 1], unc[lane:lane + 1], p.weights,
            p.grid.cell_coords, p.grid.consts, trim_count=p.inlier_f(),
            size=size, norm=2, fused=True, interpret=True)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(np.asarray(a[lane]),
                                          np.asarray(b[0]))
        want_c = chem_incomp_kernel(
            pts[lane:lane + 1], corners[lane:lane + 1], p.cell_compat,
            p.prop_onehot, p.data_mask, p.grid.cell_coords, p.grid.consts,
            size=size, interpret=True)
        np.testing.assert_array_equal(np.asarray(cc[lane]),
                                      np.asarray(want_c[0]))
