"""Batched multi-pair engine vs sequential single-pair registration."""

import numpy as np
import pytest

from goicp_tpu.config import GoICPConfig
from goicp_tpu.geom.rotation import rodrigues_np
from goicp_tpu.pipeline.batch_sweep import register_batch
from goicp_tpu.pipeline.prepare import prepare_pair
from goicp_tpu.search.outer import register


def _pair(cfg, seed, n=48, m=56):
    rng = np.random.default_rng(seed)
    model = rng.uniform(-0.7, 0.7, size=(m, 3))
    R = rodrigues_np(rng.uniform(-1.5, 1.5, 3))
    tv = rng.uniform(-0.1, 0.1, 3)
    data = (model[:n] - tv) @ R
    dp = rng.integers(0, 9, n).astype(np.int32)
    mp = rng.integers(0, 9, m).astype(np.int32)
    return prepare_pair(data, model, dp, mp, cfg, pad_data_to=64,
                        pad_model_to=64, pad_cells=64, pad_points=8)


@pytest.mark.slow
def test_register_batch_matches_sequential():
    cfg = GoICPConfig(MSEThresh=0.001, regularization=0.0005, ponderation=0,
                      distTransSize=14, rot_batch=4, trans_capacity=64,
                      trans_pop=4, inner_max_iters=60)
    pairs = [_pair(cfg, s) for s in range(3)]
    batch_res = register_batch(pairs, cfg, slots=2)
    assert len(batch_res) == 3
    for i, pair in enumerate(pairs):
        seq = register(pair, cfg)
        br = batch_res[i]
        assert br.converged and seq.converged
        # both are epsilon-optimal; errors agree within the epsilon band
        eps = cfg.MSEThresh * pair.inlier_num
        assert abs(br.error - seq.error) <= eps + 1e-5
        # exact-recovery cases should both land at ~0
        if seq.error < 1e-4:
            assert br.error < 1e-3


@pytest.mark.slow
def test_register_batch_sharded_over_mesh():
    """Multi-device pair-DP: identical results when the slot axis shards
    over the mesh `data` axis."""
    from goicp_tpu.dist.mesh import make_mesh
    cfg = GoICPConfig(MSEThresh=0.005, regularization=0.0, ponderation=0,
                      distTransSize=10, rot_batch=2, trans_capacity=32,
                      trans_pop=4, inner_max_iters=20, max_outer_steps=40)
    pairs = [_pair(cfg, s, n=24, m=28) for s in range(2)]
    mesh = make_mesh(n_data=2, n_search=4)
    res_plain = register_batch(pairs, cfg, slots=2)
    res_mesh = register_batch(pairs, cfg, slots=2, mesh=mesh)
    for a, b in zip(res_plain, res_mesh):
        eps = cfg.MSEThresh * pairs[0].inlier_num
        assert abs(a.error - b.error) <= eps + 1e-5
