"""Checkpoint/resume of a registration search."""

import os

import numpy as np

from goicp_tpu.config import GoICPConfig
from goicp_tpu.geom.rotation import rodrigues_np
from goicp_tpu.pipeline.prepare import prepare_pair
from goicp_tpu.search.outer import (load_checkpoint, make_frontier, register,
                                    save_checkpoint)


def _pair(cfg, seed=1, n=60):
    rng = np.random.default_rng(seed)
    model = rng.uniform(-0.7, 0.7, size=(n, 3))
    R = rodrigues_np(np.array([2.2, -1.1, 0.8]))
    tv = np.array([0.12, -0.07, 0.09])
    data = (model - tv) @ R
    props = rng.integers(0, 9, size=n).astype(np.int32)
    return prepare_pair(data, model, props, props, cfg), R, tv


def test_checkpoint_roundtrip(tmp_path):
    f = make_frontier(0)
    lbs = np.array([3.0, 1.0, 2.0], np.float32)
    z = np.zeros(3, np.float32)
    f.push(lbs, z + 1, z + 2, z + 3, z + 4, np.zeros(3, np.int32), z)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, f, dict(error=np.float64(5.0), R=np.eye(3),
                                  t=np.zeros(3), comp=7, last_icp=True,
                                  steps=42))
    assert len(f) == 3  # drain re-pushes
    nodes, opt = load_checkpoint(path)
    assert sorted(nodes[0].tolist()) == [1.0, 2.0, 3.0]
    assert float(opt["error"]) == 5.0
    assert int(opt["steps"]) == 42


def test_register_resume_midway(tmp_path):
    cfg = GoICPConfig(MSEThresh=0.001, regularization=0.0, ponderation=0,
                      distTransSize=24, rot_batch=4, trans_capacity=64,
                      trans_pop=4, inner_max_iters=60)
    pair, R, tv = _pair(cfg)
    ck = str(tmp_path / "search.npz")

    # run a few steps with per-step checkpointing, capped so it stops early
    import dataclasses
    cfg_short = dataclasses.replace(cfg, max_outer_steps=2)
    partial = register(pair, cfg_short, checkpoint_path=ck,
                       checkpoint_every=1)
    assert os.path.exists(ck)

    # resume and finish
    resumed = register(pair, cfg, checkpoint_path=ck)
    assert resumed.converged
    assert resumed.error < 1e-4
    np.testing.assert_allclose(resumed.R, R, atol=1e-4)
    assert not os.path.exists(ck)  # cleaned up on completion
