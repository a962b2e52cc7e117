"""Chunked batched engine: compaction equivalence + checkpoint/resume."""

import numpy as np
import pytest

from goicp_tpu.config import GoICPConfig
from goicp_tpu.geom.rotation import rodrigues_np
from goicp_tpu.pipeline.prepare import (bucket_dims, make_count_dynamic,
                                        prepare_pair)
from goicp_tpu.search.chunked import register_device_batch_compact
from goicp_tpu.search.device_engine import register_device_batch


def _cfg(**kw):
    base = dict(MSEThresh=0.001, regularization=0.0, ponderation=0,
                distTransSize=20, rot_batch=4, trans_capacity=64,
                trans_pop=4, inner_max_iters=50, device_rot_capacity=512,
                max_outer_steps=500)
    base.update(kw)
    return GoICPConfig(**base)


def _clouds(seed, n, m, noise=0.0):
    rng = np.random.default_rng(seed)
    model = rng.uniform(-0.7, 0.7, size=(m, 3))
    R = rodrigues_np(rng.uniform(-2.0, 2.0, 3))
    tv = rng.uniform(-0.1, 0.1, 3)
    data = (model[:n] - tv) @ R
    if noise:
        data = data + rng.normal(0.0, noise, data.shape)
    dp = rng.integers(0, 9, n).astype(np.int32)
    mp = rng.integers(0, 9, m).astype(np.int32)
    return data, model, dp, mp


def _batch(cfg, specs):
    raw = [_clouds(seed, n, m, noise) for seed, n, m, noise in specs]
    dims: dict = {}
    for data, model, dp, mp in raw:
        d = bucket_dims(model, len(data), len(model), cfg)
        dims = {k: max(dims.get(k, 0), v) for k, v in d.items()}
    return [make_count_dynamic(prepare_pair(data, model, dp, mp, cfg,
                                            **dims))
            for data, model, dp, mp in raw]


def test_chunked_matches_one_dispatch():
    """Chunked + compacted execution runs the identical deterministic
    search: per-pair iteration and eval counters match the one-dispatch
    batched engine exactly, errors bit-close."""
    cfg = _cfg()
    # mixed difficulty: the noisy pair converges much later than the
    # clean ones, so compaction actually triggers (4 -> 2 -> 1)
    pairs = _batch(cfg, [(1, 40, 44, 0.0), (2, 48, 52, 0.0),
                         (3, 36, 40, 0.03), (4, 44, 48, 0.0)])
    ref = register_device_batch(pairs, cfg)
    out = register_device_batch_compact(pairs, cfg, chunk_steps=8)
    assert bool(np.all(np.asarray(ref.converged)))
    assert bool(np.all(out.converged))
    np.testing.assert_array_equal(np.asarray(ref.outer_iters),
                                  out.outer_iters)
    np.testing.assert_array_equal(np.asarray(ref.evals), out.evals)
    np.testing.assert_allclose(np.asarray(ref.error), out.error,
                               rtol=1e-6, atol=1e-6)


def test_checkpoint_resume(tmp_path):
    """A run killed mid-search resumes from its checkpoint to the identical
    optimum (same iteration/eval counters as the uninterrupted run)."""
    cfg = _cfg()
    pairs = _batch(cfg, [(5, 40, 44, 0.03), (6, 44, 48, 0.0)])
    full = register_device_batch_compact(pairs, cfg, chunk_steps=8)

    ckpt = str(tmp_path / "state.npz")
    with pytest.raises(RuntimeError, match="in flight"):
        register_device_batch_compact(pairs, cfg, chunk_steps=8,
                                      checkpoint_path=ckpt, max_chunks=1)
    resumed = register_device_batch_compact(pairs, cfg, chunk_steps=8,
                                            checkpoint_path=ckpt,
                                            resume=True)
    np.testing.assert_array_equal(full.outer_iters, resumed.outer_iters)
    np.testing.assert_array_equal(full.evals, resumed.evals)
    np.testing.assert_allclose(full.error, resumed.error,
                               rtol=1e-6, atol=1e-6)


def test_stream_matches_compact():
    """Continuous-batching stream (fixed width, retire-and-refill) runs the
    identical deterministic searches: per-pair counters match the
    compacting runner exactly."""
    from goicp_tpu.search.chunked import register_device_stream
    cfg = _cfg()
    pairs = _batch(cfg, [(1, 40, 44, 0.0), (2, 48, 52, 0.0),
                         (3, 36, 40, 0.03), (4, 44, 48, 0.0),
                         (5, 40, 48, 0.02), (6, 44, 44, 0.0)])
    ref = register_device_batch_compact(pairs, cfg, chunk_steps=8)
    out = register_device_stream(pairs, cfg, width=2, chunk_steps=8)
    np.testing.assert_array_equal(ref.outer_iters, out.outer_iters)
    np.testing.assert_array_equal(ref.evals, out.evals)
    np.testing.assert_allclose(ref.error, out.error, rtol=1e-6, atol=1e-6)
    assert bool(np.all(out.converged))
