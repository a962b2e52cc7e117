"""Fused inner search (one pass yielding ub + lb) vs the two-pass shape.

The fused search must preserve epsilon-optimality: same converged error
(within SSEThresh) and a valid lb_safe (never above the two-pass lb, which
would mean an invalid bound was reported... actually lb_safe just needs
lb_safe <= true optimum; cross-check against the two-pass values and the
brute-force sampled minimum).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from goicp_tpu.config import GoICPConfig
from goicp_tpu.pipeline.prepare import prepare_pair
from goicp_tpu.search.inner import inner_bnb
from goicp_tpu.search.device_engine import register_device


def _synthetic_pair(cfg, n=40, seed=0):
    rng = np.random.default_rng(seed)
    tgt = rng.uniform(-0.8, 0.8, size=(n, 3))
    theta = 0.6
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1.0]])
    src = (tgt - 0.05) @ R.T
    props = rng.integers(0, 9, size=n).astype(np.int32)
    return prepare_pair(src, tgt, props, props, cfg)


def test_fused_inner_bounds_valid():
    """The fused search's outputs must be VALID against brute-force truth:
      * best_err is achievable: equals the exact error at best_node's center
        (the fused search may stop with a coarser ub than a dedicated ub
        pass — it terminates on the lb rule — but never an unachievable one);
      * lb_safe lower-bounds the lb-sense optimum (min over the translation
        space of the uncertainty-adjusted error), checked on a dense grid of
        sampled translations."""
    from goicp_tpu.bounds.evaluate import rot_uncertainty
    from goicp_tpu.grid.lookup import dt_distance
    cfg = GoICPConfig(MSEThresh=0.001, regularization=0.0, ponderation=0,
                      distTransSize=10, trans_capacity=64, trans_pop=4,
                      inner_max_iters=400)
    pair = _synthetic_pair(cfg)
    L = 8
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(L, pair.n_data_padded, 3)) * 0.4,
                      jnp.float32)
    widths = jnp.asarray(rng.uniform(0.2, 1.0, size=(L,)), jnp.float32)
    active = jnp.ones((L,), bool)
    inc = jnp.float32(1e6)

    fz = inner_bnb(pair, cfg, pts, widths, active, inc,
                   with_rot_uncertainty=False, fused=True)
    fz_e = np.asarray(fz.best_err)
    fz_lb = np.asarray(fz.lb_safe)
    node = np.asarray(fz.best_node)

    def err_at(lane, t, mrd=None):
        pos = pts[lane] + jnp.asarray(t, jnp.float32)[None, :]
        dis = pair.weights * dt_distance(pos, pair.grid.dist,
                                         pair.grid.consts)
        if mrd is not None:
            dis = jnp.maximum(dis - mrd, 0.0)
        return float(jnp.sum(dis * dis))

    mrd_all = rot_uncertainty(widths, pair.norm_data)
    ax = np.linspace(-0.45, 0.45, 7)
    grid_t = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    for lane in range(L):
        # achievability of best_err at the returned node center
        c = node[lane, :3] + node[lane, 3] / 2.0
        np.testing.assert_allclose(err_at(lane, c), fz_e[lane],
                                   rtol=1e-5, atol=1e-5)
        # lb_safe may exceed the true lb-sense optimum by at most SSEThresh
        # (the reference's own InnerBnB termination slack,
        # jly_goicp.cpp:308-320) — same epsilon semantics here
        sse = cfg.MSEThresh * pair.inlier_num
        sampled = min(err_at(lane, t, mrd_all[lane]) for t in grid_t)
        assert fz_lb[lane] <= sampled + sse + 1e-6, \
            (lane, fz_lb[lane], sampled)


def test_device_engine_fused_matches_twopass():
    base = GoICPConfig(MSEThresh=0.001, regularization=0.0005, ponderation=1,
                       distTransSize=10, rot_batch=2, trans_capacity=64,
                       trans_pop=4, inner_max_iters=200,
                       device_rot_capacity=512, max_outer_steps=3000)
    pair = _synthetic_pair(base, seed=7)
    eps = base.MSEThresh * pair.inlier_num
    res_f = jax.device_get(register_device(
        pair, dataclasses.replace(base, fused_inner=1)))
    res_2 = jax.device_get(register_device(
        pair, dataclasses.replace(base, fused_inner=0)))
    assert bool(res_f.converged) and bool(res_2.converged)
    assert abs(float(res_f.error) - float(res_2.error)) <= eps + 1e-6
    assert float(res_f.gap) <= eps + 1e-6
