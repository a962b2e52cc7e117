"""Fully device-side registration engine vs the host engine."""

import numpy as np
import pytest
import jax

from goicp_tpu.config import GoICPConfig
from goicp_tpu.geom.rotation import rodrigues_np
from goicp_tpu.pipeline.prepare import prepare_pair
from goicp_tpu.search.device_engine import (register_device,
                                            register_device_batch)
from goicp_tpu.search.outer import register


def _cfg(**kw):
    base = dict(MSEThresh=0.001, regularization=0.0, ponderation=0,
                distTransSize=20, rot_batch=4, trans_capacity=64,
                trans_pop=4, inner_max_iters=50, device_rot_capacity=512,
                max_outer_steps=500)
    base.update(kw)
    return GoICPConfig(**base)


def _pair(cfg, seed=1, n=48, m=52, pad=False):
    rng = np.random.default_rng(seed)
    model = rng.uniform(-0.7, 0.7, size=(m, 3))
    R = rodrigues_np(rng.uniform(-2.0, 2.0, 3))
    tv = rng.uniform(-0.1, 0.1, 3)
    data = (model[:n] - tv) @ R
    dp = rng.integers(0, 9, n).astype(np.int32)
    mp = rng.integers(0, 9, m).astype(np.int32)
    kw = dict(pad_data_to=64, pad_model_to=64, pad_cells=64,
              pad_points=8) if pad else {}
    return prepare_pair(data, model, dp, mp, cfg, **kw), R, tv


def test_device_engine_exact_recovery():
    cfg = _cfg()
    pair, R, tv = _pair(cfg, seed=1)
    res = jax.device_get(register_device(pair, cfg))
    assert bool(res.converged)
    assert float(res.error) < 1e-3
    np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.t), tv, atol=1e-3)


def test_device_engine_matches_host_with_chem():
    cfg = _cfg(MSEThresh=0.01, regularization=0.0005, ponderation=1,
               distTransSize=16)
    pair, *_ = _pair(cfg, seed=3)
    res = jax.device_get(register_device(pair, cfg))
    host = register(pair, cfg)
    eps = cfg.MSEThresh * pair.inlier_num
    assert abs(float(res.error) - host.error) <= eps + 1e-5
    assert bool(res.converged) and host.converged


def test_device_engine_batch():
    cfg = _cfg(max_outer_steps=300)
    pairs = []
    for s in range(3):
        p, *_ = _pair(cfg, seed=s, pad=True)
        pairs.append(p)
    out = register_device_batch(pairs, cfg)
    assert np.asarray(out.error).shape == (3,)
    assert bool(np.all(np.asarray(out.converged)))
    # each matches its individual run
    for i, p in enumerate(pairs):
        single = jax.device_get(register_device(p, cfg))
        eps = cfg.MSEThresh * p.inlier_num
        assert abs(float(np.asarray(out.error)[i])
                   - float(single.error)) <= eps + 1e-5
