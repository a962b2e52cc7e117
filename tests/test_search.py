"""BnB search: bound validity, synthetic global registration, pair-1 parity."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from goicp_tpu.bounds.error import initial_error, score_transform
from goicp_tpu.bounds.evaluate import geometric_bounds, rot_uncertainty
from goicp_tpu.config import GoICPConfig
from goicp_tpu.geom.rotation import rodrigues_np
from goicp_tpu.grid.lookup import dt_distance
from goicp_tpu.pipeline.prepare import prepare_pair
from goicp_tpu.search.outer import register

_FAST = dict(MSEThresh=0.001, regularization=0.0, ponderation=0,
             distTransSize=24, rot_batch=8, trans_capacity=128,
             trans_pop=8, inner_max_iters=100)


def _synth(n=60, seed=1, angle=(2.2, -1.1, 0.8), t=(0.12, -0.07, 0.09)):
    rng = np.random.default_rng(seed)
    model = rng.uniform(-0.7, 0.7, size=(n, 3))
    R = rodrigues_np(np.array(angle))
    tv = np.array(t)
    data = (model - tv) @ R
    props = rng.integers(0, 9, size=n).astype(np.int32)
    return data, model, props, R, tv


def test_bounds_are_valid():
    """For any translation inside a node's cube, the true error must lie in
    [lb, +inf) and the node-center error must equal ub (no trim, no chem)."""
    data, model, props, R, tv = _synth(40, 2)
    cfg = GoICPConfig(**_FAST)
    pair = prepare_pair(data, model, props, props, cfg)

    pts_rot = jnp.asarray(data @ R.T, jnp.float32)[None]      # (1, Nd, 3)
    node = np.array([0.05, -0.12, 0.02])
    w = 0.125
    center = jnp.asarray(node + w / 2, jnp.float32)[None, None]
    widths = jnp.full((1, 1), w, jnp.float32)
    ub, lb = geometric_bounds(pair, cfg, pts_rot, center, widths, None)
    ub, lb = float(ub[0, 0]), float(lb[0, 0])

    # ub == error at the cube center
    d = dt_distance(pts_rot[0] + center[0, 0], pair.grid.dist,
                    pair.grid.consts)
    err_center = float(jnp.sum(d * d))
    assert ub == pytest.approx(err_center, rel=1e-5)

    # lb <= error at any translation inside the cube
    rng = np.random.default_rng(0)
    for _ in range(10):
        tt = node + rng.uniform(0, w, size=3)
        d = dt_distance(pts_rot[0] + jnp.asarray(tt, jnp.float32),
                        pair.grid.dist, pair.grid.consts)
        err = float(jnp.sum(d * d))
        assert lb <= err + 1e-4


def test_rot_uncertainty_formula():
    widths = jnp.asarray([0.5], jnp.float32)
    norms = jnp.asarray([1.0, 2.0], jnp.float32)
    mrd = np.asarray(rot_uncertainty(widths, norms))
    angle = min(np.sqrt(3) * 0.5 / 2, np.pi)
    np.testing.assert_allclose(mrd[0], 2 * np.sin(angle / 2) * np.array([1, 2]),
                               rtol=1e-6)


def test_register_synthetic_global():
    """A large rotation that defeats ICP-from-identity: BnB must recover the
    exact global transform."""
    data, model, props, R, tv = _synth(60, 1)
    cfg = GoICPConfig(**_FAST)
    pair = prepare_pair(data, model, props, props, cfg)
    out = register(pair, cfg)
    assert out.error < 1e-4
    np.testing.assert_allclose(out.R, R, atol=1e-4)
    np.testing.assert_allclose(out.t, tv, atol=1e-4)
    assert out.converged


def test_initial_error_matches_manual():
    data, model, props, *_ = _synth(30, 5)
    cfg = GoICPConfig(**_FAST)
    pair = prepare_pair(data, model, props, props, cfg)
    d = dt_distance(pair.data, pair.grid.dist, pair.grid.consts)
    expect = float(jnp.sum(d * d))
    assert float(initial_error(pair, cfg)) == pytest.approx(expect, rel=1e-6)


@pytest.mark.slow
def test_pair1_parity(ref_dir):
    """BO1 pair 1 with the reference config: error within the epsilon band of
    the golden 8.45388, identical compatibility count."""
    from goicp_tpu.pipeline.pair import run_pair
    cfg = GoICPConfig.from_file(f"{ref_dir}/config.txt")
    cfg = dataclasses.replace(cfg, rot_batch=16)
    res = run_pair(f"{ref_dir}/cavities/1eq2_6_cavity6.mol2",
                   f"{ref_dir}/cavities/2x86_3_cavity6.mol2",
                   cfg, nd_downsampled=238, write_normalized=False)
    reg = res.registration
    sse_thresh = cfg.MSEThresh * 238
    assert reg.converged
    assert abs(reg.error - 8.45388) < sse_thresh
    assert reg.compatibilities == 133
    # the transform is RMSD-equivalent to the golden one
    np.testing.assert_allclose(res.t_world, [-15.8811, 52.7836, -33.7915],
                               atol=0.5)
