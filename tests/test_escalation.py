"""Frontier-capacity escalation (fused stream): eval-heavy rows evicted
mid-flight, losslessly migrated to a deeper translation frontier
(fused_stream.migrate_row_capacity), and finished in the deferred hard
phase — results must stay epsilon-optimal and converged, and easy runs
must be unaffected.
"""

import dataclasses

import numpy as np
import pytest

from goicp_tpu.config import GoICPConfig
from goicp_tpu.geom.rotation import rodrigues_np
from goicp_tpu.pipeline.prepare import make_count_dynamic, prepare_pair
from goicp_tpu.search.fused_stream import (migrate_row_capacity,
                                           register_fused_stream)

CFG = GoICPConfig(MSEThresh=0.01, regularization=0.0005, ponderation=1,
                  rot_batch=1, trans_capacity=16, trans_pop=2,
                  inner_max_iters=60, device_rot_capacity=256,
                  max_outer_steps=400, icp_seeds=2, icp_max_iter=60,
                  chem_reuse=1)


def _pairs(n=4, seed=11):
    from goicp_tpu.pipeline.prepare import bucket_dims
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
        d = bucket_dims(model, len(data), len(model), CFG)
        dims = {k: max(dims.get(k, 0), v) for k, v in d.items()}
    return [make_count_dynamic(prepare_pair(d, m, dp, mp, CFG, **dims))
            for d, m, dp, mp in raw]


def test_migrate_row_capacity_shapes_and_invariants():
    import jax
    from goicp_tpu.dist.mesh import stack_pairs
    from goicp_tpu.search import fused_stream as fs
    pairs = _pairs(1)
    pb = stack_pairs(pairs)
    st = fs._jit_init(CFG)(pb)
    st = fs.fused_run_chunk(pb, CFG, st, np.int32(6))
    row = jax.tree_util.tree_map(lambda x: x[0], st)
    cfg2 = dataclasses.replace(CFG, trans_capacity=48)
    mig = migrate_row_capacity(row, CFG, cfg2)
    assert mig["inner"]["nodes"].shape[1] == 48
    assert mig["inner"]["lbs"].shape[1] == 48
    lbs = np.asarray(mig["inner"]["lbs"])
    # the padded tail is INF (empty slots) and the sorted-frontier
    # invariant survives the migration
    assert np.isinf(lbs[:, 16:]).all()
    assert (np.sort(lbs, axis=1) == lbs).all()
    if "cvals" in mig["inner"]:
        assert mig["inner"]["cvals"].shape[1] == 48


@pytest.mark.slow
def test_escalated_stream_matches_plain():
    pairs = _pairs(4)
    plain = register_fused_stream(pairs, CFG, width=2, chunk_steps=8)
    assert np.asarray(plain.converged).all()
    # aggressive eviction: every pair alive after 2 chunks (16 global
    # iterations) escalates, so most of the search runs in the deferred
    # hard phase at capacity 48
    esc = register_fused_stream(pairs, CFG, width=2, chunk_steps=8,
                                escalate_capacity=48,
                                escalate_after_chunks=2)
    assert np.asarray(esc.converged).all()
    for i, p in enumerate(pairs):
        eps = CFG.MSEThresh * float(np.asarray(p.counts[1]))
        assert abs(float(esc.error[i]) - float(plain.error[i])) <= eps + 1e-5


def test_escalation_rejects_checkpoint_and_mesh(tmp_path):
    pairs = _pairs(2)
    with pytest.raises(ValueError):
        register_fused_stream(pairs, CFG, width=2,
                              checkpoint_path=str(tmp_path / "ck.npz"),
                              escalate_capacity=48)
