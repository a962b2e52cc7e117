"""L1-norm (`norm=1`) parity: bounds validity, scoring, registration.

The reference's L1 variant switches every bound/score sum from sum(d^2) to
sum(d) (jly_goicp.cpp:397-415 for the inner bounds, :128-131 for the ICP
re-scoring).  These tests close the coverage gap: every path below runs
with cfg.norm == 1.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from goicp_tpu.bounds.error import initial_error, score_transform
from goicp_tpu.bounds.evaluate import (geometric_bounds,
                                       geometric_bounds_fused,
                                       rot_uncertainty)
from goicp_tpu.config import GoICPConfig
from goicp_tpu.geom.rotation import rodrigues_np
from goicp_tpu.grid.lookup import dt_distance
from goicp_tpu.pipeline.prepare import prepare_pair
from goicp_tpu.search.outer import register

_L1 = dict(MSEThresh=0.001, regularization=0.0, ponderation=0, norm=1,
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


def test_l1_bounds_valid():
    """norm=1: ub equals the L1 error at the cube center, and lb lower-bounds
    the L1 error at every translation inside the cube."""
    data, model, props, R, tv = _synth(40, 2)
    cfg = GoICPConfig(**_L1)
    assert cfg.norm == 1
    pair = prepare_pair(data, model, props, props, cfg)

    pts_rot = jnp.asarray(data @ R.T, jnp.float32)[None]      # (1, Nd, 3)
    node = np.array([0.05, -0.12, 0.02])
    w = 0.125
    center = jnp.asarray(node + w / 2, jnp.float32)[None, None]
    widths = jnp.full((1, 1), w, jnp.float32)
    ub, lb = geometric_bounds(pair, cfg, pts_rot, center, widths, None)
    ub, lb = float(ub[0, 0]), float(lb[0, 0])

    d = dt_distance(pts_rot[0] + center[0, 0], pair.grid.dist,
                    pair.grid.consts)
    err_center = float(jnp.sum(d))                            # L1, not L2
    assert ub == pytest.approx(err_center, rel=1e-5)

    rng = np.random.default_rng(0)
    for _ in range(10):
        tt = node + rng.uniform(0, w, size=3)
        d = dt_distance(pts_rot[0] + jnp.asarray(tt, jnp.float32),
                        pair.grid.dist, pair.grid.consts)
        assert lb <= float(jnp.sum(d)) + 1e-4


def test_l1_bounds_valid_with_uncertainty_and_trim():
    """norm=1 + trimming + rotation uncertainty: the fused evaluator's lb
    must lower-bound the trimmed L1 error of every rotation inside the cube
    at every translation inside the node (the reference lb-pass semantics,
    jly_goicp.cpp:403-415 L1 branch)."""
    data, model, props, R, tv = _synth(50, 7)
    cfg = GoICPConfig(trimFraction=0.2, **_L1)
    pair = prepare_pair(data, model, props, props, cfg)
    k = pair.inlier_num
    assert k < pair.n_data

    rot_center = np.array([0.4, -0.3, 0.2])
    rw = 0.25
    pts_rot = jnp.asarray(data @ rodrigues_np(rot_center).T, jnp.float32)[None]
    mrd = rot_uncertainty(jnp.asarray([rw], jnp.float32), pair.norm_data)
    node = np.array([0.05, -0.12, 0.02])
    w = 0.125
    center = jnp.asarray(node + w / 2, jnp.float32)[None, None]
    widths = jnp.full((1, 1), w, jnp.float32)
    _, _, lbu = geometric_bounds_fused(pair, cfg, pts_rot, center, widths,
                                       mrd)
    lb = float(lbu[0, 0])

    rng = np.random.default_rng(3)
    for _ in range(10):
        # random rotation inside the cube, random translation inside the node
        rr = rot_center + rng.uniform(-rw / 2, rw / 2, size=3)
        tt = node + rng.uniform(0, w, size=3)
        pts = jnp.asarray(data @ rodrigues_np(rr).T + tt, jnp.float32)
        d = np.sort(np.asarray(dt_distance(pts, pair.grid.dist,
                                           pair.grid.consts)))[:k]
        assert lb <= float(d.sum()) + 1e-4


def test_l1_score_and_initial_error():
    data, model, props, *_ = _synth(30, 5)
    cfg = GoICPConfig(**_L1)
    pair = prepare_pair(data, model, props, props, cfg)
    d = dt_distance(pair.data, pair.grid.dist, pair.grid.consts)
    expect = float(jnp.sum(d))                                # L1 sum
    assert float(initial_error(pair, cfg)) == pytest.approx(expect, rel=1e-6)
    # score at identity (nn_idx irrelevant with chem off, but pass real NN)
    from goicp_tpu.icp.icp import icp_run
    res = icp_run(pair.data, pair.model, jnp.eye(3), jnp.zeros(3),
                  inlier_num=pair.inlier_num, max_iter=1, err_diff=1e-8)
    sc = score_transform(pair, cfg, jnp.eye(3), jnp.zeros(3), res.nn_idx)
    assert float(sc.geom) == pytest.approx(expect, rel=1e-6)


def test_l1_register_synthetic_global():
    """Full host-engine registration under L1 recovers the planted global
    transform (BnB epsilon-optimality is norm-agnostic)."""
    data, model, props, R, tv = _synth(60, 1)
    cfg = GoICPConfig(**_L1)
    pair = prepare_pair(data, model, props, props, cfg)
    out = register(pair, cfg)
    assert out.converged
    assert out.error < 1e-2                                   # L1 scale
    np.testing.assert_allclose(out.R, R, atol=1e-3)
    np.testing.assert_allclose(out.t, tv, atol=1e-3)


def test_l1_device_engine_matches_host():
    """The one-dispatch device engine agrees with the host engine under L1
    (both converge to the planted optimum)."""
    from goicp_tpu.search.device_engine import register_device
    import jax
    data, model, props, R, tv = _synth(48, 9)
    cfg = GoICPConfig(**_L1)
    pair = prepare_pair(data, model, props, props, cfg)
    host = register(pair, cfg)
    dev = jax.device_get(register_device(pair, cfg))
    assert bool(dev.converged)
    assert float(dev.error) < 1e-2
    np.testing.assert_allclose(np.asarray(dev.R), host.R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dev.t), host.t, atol=1e-3)
