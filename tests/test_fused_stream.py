"""Cross-pair fused stream engine vs the per-pair device engine.

The fused engine (search/fused_stream.py) runs every pair's search as an
asynchronous state machine inside ONE while_loop; per pair it must follow
the SAME pop/adopt/prune sequence as register_device, so its results
match the one-dispatch engine's per pair (identical search trajectory —
same optimum, same outer-step and eval counters)."""

import dataclasses

import numpy as np
import pytest

from goicp_tpu.config import GoICPConfig


def _small_cfg(**over):
    base = dict(MSEThresh=0.01, regularization=0.0005, ponderation=1,
                rot_batch=1, trans_capacity=16, trans_pop=2,
                inner_max_iters=60, device_rot_capacity=256,
                max_outer_steps=300, icp_seeds=2, icp_max_iter=60)
    base.update(over)
    return GoICPConfig(**base)


def _pairs(cfg, n=3, seed=11):
    from goicp_tpu.pipeline.prepare import (bucket_dims, make_count_dynamic,
                                            prepare_pair)
    from goicp_tpu.geom.rotation import rodrigues_np

    rng = np.random.default_rng(seed)
    raw = []
    for _ in range(n):
        nm = int(rng.integers(40, 61))
        nd = int(rng.integers(35, nm + 1))
        model = rng.uniform(-0.7, 0.7, size=(nm, 3))
        R = rodrigues_np(rng.uniform(-2, 2, 3))
        sel = rng.permutation(nm)[:nd]
        data = (model[sel] - rng.uniform(-0.1, 0.1, 3)) @ R
        mp = rng.integers(0, 9, nm).astype(np.int32)
        raw.append((data, model, mp[sel].copy(), mp))

    dims: dict = {}
    for data, model, _, _ in raw:
        d = bucket_dims(model, len(data), len(model), cfg)
        dims = {k: max(dims.get(k, 0), v) for k, v in d.items()}
    return [make_count_dynamic(prepare_pair(d, m, dp, mp, cfg, **dims))
            for d, m, dp, mp in raw]


def test_fused_stream_matches_device_engine():
    from goicp_tpu.search.device_engine import register_device
    from goicp_tpu.search.fused_stream import register_fused_stream

    cfg = _small_cfg()
    pairs = _pairs(cfg, n=3)
    out = register_fused_stream(pairs, cfg, width=2, chunk_steps=64)

    for i, pair in enumerate(pairs):
        ref = register_device(pair, cfg)
        assert bool(out.converged[i]) == bool(ref.converged), i
        np.testing.assert_allclose(out.error[i], float(ref.error),
                                   rtol=1e-5, atol=1e-5)
        assert int(out.outer_iters[i]) == int(ref.outer_iters), \
            (i, int(out.outer_iters[i]), int(ref.outer_iters))
        assert int(out.evals[i]) == int(ref.evals), i
        assert int(out.opt_comp[i]) == int(ref.opt_comp), i


def test_margin_frac_tightens_gap():
    """margin_frac < 1: every converged gap sits at or below
    margin_frac * MSEThresh * inliers (the stop/discard epsilon the
    engines searched to), giving headroom under the reported epsilon."""
    from goicp_tpu.search.device_engine import register_device

    cfg = _small_cfg(margin_frac=0.9)
    for pair in _pairs(cfg, n=2, seed=7):
        r = register_device(pair, cfg)
        assert bool(r.converged)
        eps = cfg.MSEThresh * float(np.asarray(pair.counts[1]))
        assert float(r.gap) <= 0.9 * eps + 1e-6, (float(r.gap), eps)


def test_fused_stream_checkpoint_resume(tmp_path):
    """Kill the stream mid-run (max_chunks), resume from the checkpoint,
    and land on identical results (deterministic search)."""
    from goicp_tpu.search.fused_stream import register_fused_stream

    cfg = _small_cfg()
    pairs = _pairs(cfg, n=4, seed=5)
    full = register_fused_stream(pairs, cfg, width=2, chunk_steps=16)

    ckpt = str(tmp_path / "stream.npz")
    with pytest.raises(RuntimeError, match="max_chunks"):
        register_fused_stream(pairs, cfg, width=2, chunk_steps=16,
                              checkpoint_path=ckpt, max_chunks=2)
    resumed = register_fused_stream(pairs, cfg, width=2, chunk_steps=16,
                                    checkpoint_path=ckpt, resume=True)
    np.testing.assert_array_equal(np.asarray(full.error),
                                  np.asarray(resumed.error))
    np.testing.assert_array_equal(np.asarray(full.outer_iters),
                                  np.asarray(resumed.outer_iters))
    np.testing.assert_array_equal(np.asarray(full.evals),
                                  np.asarray(resumed.evals))


def test_fused_stream_progress_and_refill():
    """Window narrower than the pair count: retire/refill must cover all
    pairs, and the progress callback surfaces in-flight telemetry."""
    from goicp_tpu.search.fused_stream import register_fused_stream

    cfg = _small_cfg()
    pairs = _pairs(cfg, n=5, seed=3)
    seen = []
    out = register_fused_stream(pairs, cfg, width=2, chunk_steps=32,
                                progress=seen.append)
    assert np.asarray(out.converged).all()
    assert len(seen) >= 1
    row = seen[0]["rows"][0]
    assert {"pair", "converged", "outer", "incumbent",
            "frontier_min"} <= set(row)
