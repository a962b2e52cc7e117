"""Two-phase bound evaluation (cfg.chem_survivors): chem corner terms only
for children surviving the geometric lower bound.

Contract under test (see search/inner.py):
  * with a budget covering every possible survivor (8 * trans_pop), the
    search trajectory is IDENTICAL to the unconditional lattice path —
    same error/R/t/comp AND same eval/iteration counters;
  * with a small budget, overflow children keep their (valid) geometric
    lb, so the search stays epsilon-optimal — results agree within the
    reference's own epsilon band — while chem kernel volume drops;
  * the chem_corners counter reports the kernel volume honestly.

Reference semantics being beaten: the reference evaluates the chem corner
terms unconditionally for every popped translation node
(jly_goicp.cpp:429-550).
"""

import numpy as np
import pytest
import jax

from goicp_tpu.config import GoICPConfig
from goicp_tpu.geom.rotation import rodrigues_np
from goicp_tpu.pipeline.prepare import prepare_pair
from goicp_tpu.search.device_engine import register_device


def _cfg(**kw):
    base = dict(MSEThresh=0.01, regularization=0.0005, ponderation=1,
                distTransSize=16, rot_batch=2, trans_capacity=64,
                trans_pop=4, inner_max_iters=60, device_rot_capacity=512,
                max_outer_steps=600)
    base.update(kw)
    return GoICPConfig(**base)


def _pair(cfg, seed=3, n=48, m=52, pad=False):
    rng = np.random.default_rng(seed)
    model = rng.uniform(-0.7, 0.7, size=(m, 3))
    R = rodrigues_np(rng.uniform(-2.0, 2.0, 3))
    tv = rng.uniform(-0.1, 0.1, 3)
    data = (model[:n] - tv) @ R
    dp = rng.integers(0, 9, n).astype(np.int32)
    mp = rng.integers(0, 9, m).astype(np.int32)
    kw = dict(pad_data_to=64, pad_model_to=64, pad_cells=64,
              pad_points=8) if pad else {}
    return prepare_pair(data, model, dp, mp, cfg, **kw)


@pytest.mark.parametrize("fused_inner", [1, 0])
def test_full_budget_identical_trajectory(fused_inner):
    cfg0 = _cfg(fused_inner=fused_inner)
    pair = _pair(cfg0)
    full = 8 * cfg0.trans_pop
    cfg2 = _cfg(fused_inner=fused_inner, chem_survivors=full)
    r0 = jax.device_get(register_device(pair, cfg0))
    r2 = jax.device_get(register_device(pair, cfg2))
    assert float(r0.error) == float(r2.error)
    np.testing.assert_array_equal(np.asarray(r0.R), np.asarray(r2.R))
    np.testing.assert_array_equal(np.asarray(r0.t), np.asarray(r2.t))
    assert int(r0.opt_comp) == int(r2.opt_comp)
    assert int(r0.evals) == int(r2.evals)
    assert int(r0.outer_iters) == int(r2.outer_iters)
    assert int(r0.inner_iters) == int(r2.inner_iters)
    assert int(r0.geom_surv) == int(r2.geom_surv)
    # full-budget two-phase evaluates 8 corners per survivor vs 27 per
    # parent; both counters are positive kernel volumes
    assert int(r0.chem_corners) > 0 and int(r2.chem_corners) > 0


def test_small_budget_sound_and_cheaper_per_eval():
    """Small budgets are SOUND but measurably counterproductive (the
    round-5 refutation, PERF.md): overflow children keep only their
    geometric lb, which prunes almost nothing once the chem term
    dominates the incumbent, so the search floods with weak nodes and
    does NOT converge within a step budget a lattice search needs.
    What must still hold even unconverged: the incumbent is a true
    upper bound (cannot beat the optimum by more than epsilon), the
    reported gap is a valid bound, and per-pop kernel volume drops."""
    cfg0 = _cfg()
    pair = _pair(cfg0)
    r0 = jax.device_get(register_device(pair, cfg0))
    cfgS = _cfg(chem_survivors=8)
    rS = jax.device_get(register_device(pair, cfgS))
    eps = cfg0.MSEThresh * pair.inlier_num
    # soundness: an incumbent is achievable, so it can undercut the
    # epsilon-optimal baseline by at most epsilon
    assert float(rS.error) >= float(r0.error) - eps - 1e-5
    # the reported gap is still a true bound (error - proven lb >= 0)
    assert float(rS.gap) >= -1e-5
    # budget 8 of 32 children: chem volume PER INNER ITERATION drops
    # (8 corners x 8 survivors vs 27 x trans_pop parents), even though
    # TOTAL volume explodes with the eval count — the refutation in one
    # pair of counters
    assert (int(rS.chem_corners) / max(int(rS.inner_iters), 1)
            < int(r0.chem_corners) / max(int(r0.inner_iters), 1))


def test_counters_present_without_chem():
    cfg = _cfg(regularization=0.0, ponderation=0)
    pair = _pair(cfg)
    r = jax.device_get(register_device(pair, cfg))
    assert int(r.chem_corners) == 0
    assert int(r.geom_surv) > 0   # survivors are counted regardless


def test_fused_stream_two_phase_matches_device():
    from goicp_tpu.search.fused_stream import register_fused_stream
    cfg = _cfg(chem_survivors=16, rot_batch=1, trans_pop=2,
               trans_capacity=32)
    # stacking a stream window requires a shared shape bucket
    pairs = [_pair(cfg, seed=s, pad=True) for s in (3, 5)]
    out = register_fused_stream(pairs, cfg, width=2, chunk_steps=64)
    for i, p in enumerate(pairs):
        single = jax.device_get(register_device(p, cfg))
        assert float(np.asarray(out.error)[i]) == float(single.error)
        assert int(np.asarray(out.evals)[i]) == int(single.evals)
        # kernel volume is engine-dependent (lane compaction): >= only
        assert int(np.asarray(out.chem_corners)[i]) >= \
            int(single.chem_corners)
