"""Single-pair registration with rotation lanes sharded over a mesh
`search` axis (the multi-chip TP/SP analogue), vs the unsharded engine."""

import numpy as np
import jax
import pytest

from goicp_tpu.config import GoICPConfig
from goicp_tpu.dist.mesh import make_mesh
from goicp_tpu.pipeline.prepare import prepare_pair
from goicp_tpu.search.device_engine import register_device


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_register_device_lane_sharded():
    cfg = GoICPConfig(MSEThresh=0.001, regularization=0.0005, ponderation=1,
                      distTransSize=10, rot_batch=2, trans_capacity=64,
                      trans_pop=4, inner_max_iters=200,
                      device_rot_capacity=512, max_outer_steps=3000)
    rng = np.random.default_rng(11)
    tgt = rng.uniform(-0.8, 0.8, size=(40, 3))
    theta = 0.5
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
    src = (tgt - 0.04) @ R.T
    props = rng.integers(0, 9, size=40).astype(np.int32)
    pair = prepare_pair(src, tgt, props, props, cfg)

    mesh = make_mesh(n_data=1, n_search=4)
    res_plain = jax.device_get(register_device(pair, cfg))
    res_shard = jax.device_get(register_device(pair, cfg, mesh=mesh))
    eps = cfg.MSEThresh * pair.inlier_num
    assert bool(res_shard.converged)
    # identical lane math, just partitioned -> same converged optimum
    assert abs(float(res_shard.error) - float(res_plain.error)) <= eps + 1e-6
    assert float(res_shard.gap) <= eps + 1e-6
    assert int(res_shard.evals) == int(res_plain.evals)
