"""Slot-packed cross-pair stream vs the per-pair device engine.

The packed engine (search/packed_stream.py) serves S lanes per global
iteration picked across every in-flight pair; each lane's translation
search depends only on its own state, so per-pair results must equal
register_device's (same optimum / outer steps / compat; eval totals can
differ only for pairs cut off mid-inner-phase at max_outer_steps)."""

import dataclasses

import numpy as np
import pytest

from tests.test_fused_stream import _pairs, _small_cfg


def _packed_cfg(**over):
    over.setdefault("packed_slots", 5)
    return dataclasses.replace(_small_cfg(), **over)


def test_packed_stream_matches_device_engine():
    from goicp_tpu.search.device_engine import register_device
    from goicp_tpu.search.packed_stream import (register_packed_stream,
                                                supports_packed)

    cfg = _packed_cfg()
    pairs = _pairs(cfg, n=3)
    assert supports_packed(pairs[0], cfg)
    out = register_packed_stream(pairs, cfg, width=2, chunk_steps=64)

    for i, pair in enumerate(pairs):
        ref = register_device(pair, cfg)
        assert bool(out.converged[i]) == bool(ref.converged), i
        np.testing.assert_allclose(out.error[i], float(ref.error),
                                   rtol=1e-5, atol=1e-5)
        assert int(out.outer_iters[i]) == int(ref.outer_iters), \
            (i, int(out.outer_iters[i]), int(ref.outer_iters))
        assert int(out.evals[i]) == int(ref.evals), i
        assert int(out.opt_comp[i]) == int(ref.opt_comp), i
        assert float(out.gap[i]) <= cfg.MSEThresh * float(
            np.asarray(pair.counts[1])) + 1e-3


def test_packed_slot_count_invariance():
    """The slot budget is pure scheduling: S=2 and S=16 must produce the
    identical per-pair results (trajectory equality, not just epsilon)."""
    from goicp_tpu.search.packed_stream import register_packed_stream

    cfg2 = _packed_cfg(packed_slots=2)
    cfg16 = _packed_cfg(packed_slots=16)
    pairs = _pairs(cfg2, n=3, seed=23)
    a = register_packed_stream(pairs, cfg2, width=3, chunk_steps=48)
    b = register_packed_stream(pairs, cfg16, width=3, chunk_steps=48)
    np.testing.assert_array_equal(np.asarray(a.error), np.asarray(b.error))
    np.testing.assert_array_equal(np.asarray(a.outer_iters),
                                  np.asarray(b.outer_iters))
    np.testing.assert_array_equal(np.asarray(a.evals), np.asarray(b.evals))
    np.testing.assert_array_equal(np.asarray(a.opt_comp),
                                  np.asarray(b.opt_comp))


def test_packed_trimmed_matches_device():
    from goicp_tpu.search.device_engine import register_device
    from goicp_tpu.search.packed_stream import register_packed_stream

    cfg = _packed_cfg(trimFraction=0.15)
    pairs = _pairs(cfg, n=2, seed=5)
    out = register_packed_stream(pairs, cfg, width=2, chunk_steps=64)
    for i, pair in enumerate(pairs):
        ref = register_device(pair, cfg)
        np.testing.assert_allclose(out.error[i], float(ref.error),
                                   rtol=1e-5, atol=1e-5)
        assert int(out.outer_iters[i]) == int(ref.outer_iters), i
        assert int(out.opt_comp[i]) == int(ref.opt_comp), i


def test_packed_checkpoint_resume(tmp_path):
    """Kill mid-run (max_chunks), resume from the checkpoint: identical
    results to the uninterrupted run."""
    from goicp_tpu.search.packed_stream import register_packed_stream

    cfg = _packed_cfg()
    pairs = _pairs(cfg, n=3, seed=31)
    ref = register_packed_stream(pairs, cfg, width=2, chunk_steps=24)
    ck = str(tmp_path / "packed_ck.npz")
    with pytest.raises(RuntimeError):
        register_packed_stream(pairs, cfg, width=2, chunk_steps=24,
                               checkpoint_path=ck, max_chunks=2)
    out = register_packed_stream(pairs, cfg, width=2, chunk_steps=24,
                                 checkpoint_path=ck, resume=True)
    np.testing.assert_array_equal(np.asarray(ref.error),
                                  np.asarray(out.error))
    np.testing.assert_array_equal(np.asarray(ref.outer_iters),
                                  np.asarray(out.outer_iters))
    np.testing.assert_array_equal(np.asarray(ref.opt_comp),
                                  np.asarray(out.opt_comp))


def test_packed_rejects_unsupported_config():
    from goicp_tpu.search.packed_stream import register_packed_stream

    cfg = _packed_cfg(regularizationNeighbors=0.1)
    pairs = _pairs(cfg, n=2, seed=3)
    with pytest.raises(ValueError):
        register_packed_stream(pairs, cfg, width=2)
