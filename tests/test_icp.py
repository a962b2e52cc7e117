"""Batched ICP vs known transforms."""

import numpy as np
import jax.numpy as jnp

from goicp_tpu.geom.rotation import rodrigues_np
from goicp_tpu.icp.icp import icp_run, kabsch, nn_correspondences


def _make_pair(n=80, seed=0, angle=(0.3, -0.5, 0.2), t=(0.1, -0.05, 0.08)):
    rng = np.random.default_rng(seed)
    model = rng.uniform(-0.7, 0.7, size=(n, 3))
    R = rodrigues_np(np.array(angle))
    tv = np.array(t)
    data = (model - tv) @ R  # so that R @ data + t == model exactly
    return data, model, R, tv


def test_nn_correspondences_exact():
    data, model, R, t = _make_pair(50, 1)
    pts = data @ R.T + t
    idx, d2 = nn_correspondences(jnp.asarray(pts, jnp.float32),
                                 jnp.asarray(model, jnp.float32))
    np.testing.assert_array_equal(np.asarray(idx), np.arange(50))
    assert float(jnp.max(d2)) < 1e-5


def test_kabsch_recovers_rotation():
    rng = np.random.default_rng(2)
    q_d = rng.normal(size=(40, 3)).astype(np.float32)
    R = rodrigues_np(np.array([0.7, 0.2, -0.4])).astype(np.float32)
    q_m = q_d @ R.T
    R_est = np.asarray(kabsch(jnp.asarray(q_d), jnp.asarray(q_m)))
    np.testing.assert_allclose(R_est, R, atol=1e-5)


def test_icp_converges_from_nearby_start():
    data, model, R, t = _make_pair(80, 0)
    # perturbed start
    R0 = rodrigues_np(np.array([0.35, -0.45, 0.15]))
    t0 = t + 0.03
    res = icp_run(jnp.asarray(data, jnp.float32),
                  jnp.asarray(model, jnp.float32),
                  jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32),
                  inlier_num=80, max_iter=100, err_diff=1e-7)
    assert float(res.err) < 1e-3
    np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-2)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=1e-2)


def test_icp_trimmed_ignores_outliers():
    data, model, R, t = _make_pair(80, 3)
    data_out = data.copy()
    data_out[:8] += 5.0  # 10% gross outliers
    res = icp_run(jnp.asarray(data_out, jnp.float32),
                  jnp.asarray(model, jnp.float32),
                  jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
                  inlier_num=72, max_iter=100, err_diff=1e-9)
    # with trimming, the outliers do not corrupt the fit
    np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=1e-3)
