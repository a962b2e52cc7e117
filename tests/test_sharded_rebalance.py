"""Per-device rotation frontiers + rebalancing collectives
(search/sharded_engine.py) on the virtual CPU mesh."""

import numpy as np
import jax

from goicp_tpu.config import GoICPConfig
from goicp_tpu.dist.mesh import make_mesh
from goicp_tpu.geom.rotation import rodrigues_np
from goicp_tpu.pipeline.prepare import prepare_pair
from goicp_tpu.search.device_engine import register_device
from goicp_tpu.search.sharded_engine import register_device_sharded


def _cfg(**kw):
    base = dict(MSEThresh=0.001, regularization=0.0, ponderation=0,
                distTransSize=20, rot_batch=2, trans_capacity=64,
                trans_pop=4, inner_max_iters=50, device_rot_capacity=512,
                max_outer_steps=800)
    base.update(kw)
    return GoICPConfig(**base)


def _pair(cfg, seed=11, n=40, m=44, noise=0.02):
    rng = np.random.default_rng(seed)
    model = rng.uniform(-0.7, 0.7, size=(m, 3))
    R = rodrigues_np(rng.uniform(-2.0, 2.0, 3))
    tv = rng.uniform(-0.1, 0.1, 3)
    data = (model[:n] - tv) @ R + rng.normal(0.0, noise, (n, 3))
    dp = rng.integers(0, 9, n).astype(np.int32)
    mp = rng.integers(0, 9, m).astype(np.int32)
    return prepare_pair(data, model, dp, mp, cfg, pad_cells=64, pad_points=8)


def _search_mesh(n=4):
    return make_mesh(n_data=1, n_search=n)


def test_sharded_matches_unsharded_optimum():
    """The rebalanced sharded engine converges to the same epsilon-optimal
    error as the single-frontier engine, with a valid gap."""
    cfg = _cfg()
    pair = _pair(cfg)
    mesh = _search_mesh(4)
    ref = jax.device_get(register_device(pair, cfg))
    out = jax.device_get(register_device_sharded(pair, cfg, mesh,
                                                 rebalance_every=1))
    eps = cfg.MSEThresh * pair.inlier_num
    assert bool(ref.converged) and bool(out.converged)
    assert abs(float(out.error) - float(ref.error)) <= eps + 1e-5
    assert float(out.gap) <= eps + 1e-5


def test_rebalance_reduces_steps_on_skew():
    """With static subtree partitioning (rebalance_every=0) devices whose
    subtrees prune early idle while one device grinds its hot region; the
    periodic rebalance spreads that frontier and converges in measurably
    fewer lockstep outer steps at the same optimum."""
    cfg = _cfg(rot_batch=1)
    pair = _pair(cfg, seed=23, noise=0.03)
    mesh = _search_mesh(4)
    static = jax.device_get(register_device_sharded(pair, cfg, mesh,
                                                    rebalance_every=0))
    rebal = jax.device_get(register_device_sharded(pair, cfg, mesh,
                                                   rebalance_every=2))
    eps = cfg.MSEThresh * pair.inlier_num
    assert bool(static.converged) and bool(rebal.converged)
    assert abs(float(static.error) - float(rebal.error)) <= eps + 1e-5
    assert int(rebal.outer_iters) < int(static.outer_iters), \
        (int(rebal.outer_iters), int(static.outer_iters))


def test_rebalance_cadences_agree():
    """Different rebalance cadences all land on the same optimum (the
    cadence is a performance knob, never a correctness one)."""
    cfg = _cfg()
    pair = _pair(cfg, seed=7)
    mesh = _search_mesh(2)
    outs = [jax.device_get(register_device_sharded(pair, cfg, mesh,
                                                   rebalance_every=k))
            for k in (1, 4)]
    eps = cfg.MSEThresh * pair.inlier_num
    for o in outs:
        assert bool(o.converged)
    assert abs(float(outs[0].error) - float(outs[1].error)) <= eps + 1e-5
