"""Shape-bucket padding invariance: padded pairs must produce identical
errors, bounds, ICP results and chem counts as unpadded ones."""

import numpy as np
import pytest
import jax.numpy as jnp

from goicp_tpu.bounds.error import (bnb_incompatibility_count, initial_error,
                                    score_transform)
from goicp_tpu.bounds.evaluate import geometric_bounds
from goicp_tpu.config import GoICPConfig
from goicp_tpu.geom.rotation import rodrigues_np
from goicp_tpu.icp.icp import icp_run
from goicp_tpu.pipeline.prepare import prepare_pair
from goicp_tpu.search.outer import register


def _clouds(n=57, m=63, seed=3):
    rng = np.random.default_rng(seed)
    model = rng.uniform(-0.7, 0.7, size=(m, 3))
    R = rodrigues_np(np.array([1.9, -0.8, 0.4]))
    tv = np.array([0.1, -0.06, 0.04])
    data = (model[:n] - tv) @ R
    dp = rng.integers(0, 9, n).astype(np.int32)
    mp = rng.integers(0, 9, m).astype(np.int32)
    return data, model, dp, mp, R, tv


@pytest.mark.parametrize("trim", [0.0, 0.1])
def test_padding_invariance(trim):
    data, model, dp, mp, R, tv = _clouds()
    cfg = GoICPConfig(MSEThresh=0.001, regularization=0.0005, ponderation=1,
                      trimFraction=trim, distTransSize=16, rot_batch=4,
                      trans_capacity=64, trans_pop=4, inner_max_iters=40)
    plain = prepare_pair(data, model, dp, mp, cfg)
    padded = prepare_pair(data, model, dp, mp, cfg,
                          pad_data_to=96, pad_model_to=96,
                          pad_cells=plain.grid.cell_color.shape[0] + 16,
                          pad_points=plain.grid.cell_points.shape[1] + 4)
    assert padded.n_data_padded == 96 and padded.padded
    assert padded.inlier_num == plain.inlier_num

    # initial error identical
    np.testing.assert_allclose(float(initial_error(plain, cfg)),
                               float(initial_error(padded, cfg)), rtol=1e-6)

    # geometric bounds identical for a sample node batch
    rng = np.random.default_rng(0)
    centers = jnp.asarray(rng.uniform(-0.3, 0.3, (2, 5, 3)), jnp.float32)
    widths = jnp.full((2, 5), 0.25, jnp.float32)
    for pair in (plain, padded):
        pts = jnp.asarray(
            np.concatenate([data @ R.T,
                            np.zeros((pair.n_data_padded - len(data), 3))])
            if pair.padded else data @ R.T, jnp.float32)[None]
        pts = jnp.tile(pts, (2, 1, 1))
        if pair.padded:
            # rotate only real rows; padded rows keep sentinel positions
            sent = np.asarray(pair.data)[len(data):]
            pts = pts.at[:, len(data):, :].set(jnp.asarray(sent, jnp.float32))
        ub, lb = geometric_bounds(pair, cfg, pts, centers, widths, None)
        if pair is plain:
            ub0, lb0 = ub, lb
    np.testing.assert_allclose(np.asarray(ub), np.asarray(ub0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(lb0), rtol=1e-5)

    # ICP identical
    r_plain = icp_run(plain.data, plain.model, jnp.eye(3), jnp.zeros(3),
                      inlier_num=plain.inlier_num, max_iter=50,
                      err_diff=cfg.err_diff)
    r_pad = icp_run(padded.data, padded.model, jnp.eye(3), jnp.zeros(3),
                    inlier_num=padded.inlier_num, max_iter=50,
                    err_diff=cfg.err_diff, data_mask=padded.data_mask)
    np.testing.assert_allclose(np.asarray(r_plain.R), np.asarray(r_pad.R),
                               atol=1e-5)
    np.testing.assert_allclose(float(r_plain.err), float(r_pad.err),
                               rtol=1e-4)

    # score + chem counts identical
    s_plain = score_transform(plain, cfg, r_plain.R, r_plain.t,
                              r_plain.nn_idx)
    s_pad = score_transform(padded, cfg, r_pad.R, r_pad.t, r_pad.nn_idx)
    np.testing.assert_allclose(float(s_plain.error), float(s_pad.error),
                               rtol=1e-4)
    assert int(s_plain.incomp_count) == int(s_pad.incomp_count)
    c1 = int(bnb_incompatibility_count(plain, cfg, jnp.asarray(R, jnp.float32),
                                       jnp.asarray(tv, jnp.float32)))
    c2 = int(bnb_incompatibility_count(padded, cfg,
                                       jnp.asarray(R, jnp.float32),
                                       jnp.asarray(tv, jnp.float32)))
    assert c1 == c2


def test_full_register_padding_invariance():
    data, model, dp, mp, R, tv = _clouds(48, 52, seed=7)
    cfg = GoICPConfig(MSEThresh=0.001, regularization=0.0005, ponderation=0,
                      distTransSize=16, rot_batch=4, trans_capacity=64,
                      trans_pop=4, inner_max_iters=60)
    plain = prepare_pair(data, model, dp, mp, cfg)
    padded = prepare_pair(data, model, dp, mp, cfg, bucket=True)
    out1 = register(plain, cfg)
    out2 = register(padded, cfg)
    assert out1.converged and out2.converged
    np.testing.assert_allclose(out1.error, out2.error, rtol=1e-4, atol=1e-5)
    assert out1.compatibilities == out2.compatibilities
    np.testing.assert_allclose(out1.R, out2.R, atol=1e-4)
