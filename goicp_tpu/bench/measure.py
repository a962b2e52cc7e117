"""Inner benchmark measurement (run in a child process by bench.py).

Measures DISTINCT-pair registration throughput on TWO workloads — the
honest forms of the headline number:

  * similar: the two real BO1 golden pairs + synthetic rigid-subset
    pairs spanning the BO1 cavity size range (165-306 points);
  * trimmed dissimilar-style: noisy/outlier synthetic pairs registered
    with trimFraction (BASELINE.json config 4).

Both run through the cross-pair fused stream (search/fused_stream.py) at
the tuned round-3 shape, with golden parity and the convergence-margin
guard asserted in-run.  Identical pairs would converge in lockstep and
flatter the measurement; distinct pairs with distinct convergence
behavior measure what a real sweep sees.

Reports both BASELINE.json metrics:
  * pairs_per_s        — batch / wall (per workload)
  * bound_evals_per_s  — total translation-node bound evaluations / wall
    (each eval = one (node x Nd) DT-lookup + trim + ub/lb computation, the
    reference's InnerBnB per-node hot loop, jly_goicp.cpp:343-415)

Writes one JSON object to the path given in argv[1].
"""

import json
import sys
import time

import numpy as np

REF = "/root/reference"
BATCH = 64
TRIM_BATCH = 32     # trimmed (dissimilar-style) workload size
TRIM_FRACTION = 0.1  # BASELINE.json config 4 / READMEGo-ICP.md:82-84
FUSED_WIDTH = 2     # fused-stream window (tools/fused_study.py, round 3:
                    # 2 -> 30.8s, 3 -> 40.9s, 4 -> 68.8s, 8 -> 86.4s on
                    # the 64-pair workload — the engine is kernel-volume-
                    # bound, and 2 rows keep the sum of the other pairs'
                    # sequential depth under the hardest pair's own)
FUSED_CHUNK = 512   # global iterations per dispatch


def bench_shape(cfg):
    """The tuned TPU search shape, shared by the bench, tools/sweep383.py
    and the A/B tools (ONE source of truth; PERF.md holds the measurement
    behind every choice here)."""
    import dataclasses
    # chem_reuse: corner reuse cuts chem kernel volume to 19/27 at a
    # bit-identical trajectory (pair-2 A/B: 2.479 -> 2.158 s, round 5).
    # trans_capacity stays 128 for the similar pool: 256 wins on an
    # eval-heavy straggler alone (pair-2 A/B 2.15 -> 1.868 s, -20% evals)
    # but LOSES on the mixed 64-pair stream (2.51 -> 2.38 pairs/s —
    # easy pairs pay the wider merge every iteration); the trimmed
    # workload flips the other way (see main()).
    return dataclasses.replace(cfg, rot_batch=1, trans_capacity=128,
                               icp_seeds=4, max_outer_steps=12000,
                               margin_frac=0.9, chem_reuse=1)


def _load_real_pair(src_name: str, tgt_name: str, cfg):
    """Reference-pipeline load: mol2 -> common-scale normalize -> the
    write-then-reload 6-sig-digit quantization (jly_main.cpp:72-99)."""
    from goicp_tpu.geom.normalize import normalize_pair
    from goicp_tpu.io.mol2 import read_mol_file
    from goicp_tpu.io.xyz import quantize_like_file

    src, sp = read_mol_file(f"{REF}/cavities/{src_name}_cavity6.mol2")
    tgt, tp = read_mol_file(f"{REF}/cavities/{tgt_name}_cavity6.mol2")
    norm = normalize_pair(src, tgt)
    return (quantize_like_file(norm["source"]),
            quantize_like_file(norm["target"]), sp, tp)


def _synthetic_pair(rng):
    """A similar-style synthetic RAW pair in the BO1 size envelope: the data
    cloud is a rigidly transformed subset of the model cloud, properties
    carried along.  RAW = pre-normalization coordinates (rounded to 6
    decimals so a %.6f .mol2 round-trip is exact): both our pipeline and
    the reference binary consume these through their own (identical)
    centralize + common-scale + 6-sig-digit quantize paths, so the
    workload-baseline comparison (tools/ref_workload_baseline.py) solves
    the very same normalized problem."""
    from goicp_tpu.geom.rotation import rodrigues_np

    nm = int(rng.integers(165, 307))
    nd = int(rng.integers(165, nm + 1))
    model = rng.uniform(-0.75, 0.75, size=(nm, 3))
    R = rodrigues_np(rng.uniform(-2.5, 2.5, 3))
    tv = rng.uniform(-0.15, 0.15, 3)
    sel = rng.permutation(nm)[:nd]
    data = (model[sel] - tv) @ R
    mp = rng.integers(0, 9, nm).astype(np.int32)
    return (np.round(data, 6), np.round(model, 6),
            mp[sel].copy(), mp)


def synthetic_pool(n: int, seed: int = 7):
    """The bench's synthetic raw pairs, reproducibly:
    [(name, data_raw f64 (Nd,3), model_raw f64 (Nm,3),
      data_prop_idx i32, model_prop_idx i32)].
    tools/ref_workload_baseline.py writes THESE clouds to .mol2 and runs
    the reference C++ binary on them — the same-workload comparator."""
    rng = np.random.default_rng(seed)
    return [(f"syn{i:02d}",) + _synthetic_pair(rng) for i in range(n)]


def _synthetic_pair_noisy(rng):
    """A dissimilar-style synthetic RAW pair: rigid subset PLUS coordinate
    noise and unmatched outlier points (no model counterpart) — the
    workload class the reference handles with trimming
    (cavities_dissimilar_BO1_clean.tsv + trimFraction, READMEGo-ICP.md:82-84,
    trim semantics jly_goicp.cpp:384-390).  Outlier fraction ~10% stays
    below the bench trimFraction so the trimmed optimum still aligns the
    true subset."""
    nm = int(rng.integers(165, 307))
    n_match = int(rng.integers(150, min(nm, 270) + 1))
    n_out = max(1, int(0.10 * n_match / 0.9))      # ~10% of the data cloud
    model = rng.uniform(-0.75, 0.75, size=(nm, 3))
    from goicp_tpu.geom.rotation import rodrigues_np
    R = rodrigues_np(rng.uniform(-2.5, 2.5, 3))
    tv = rng.uniform(-0.15, 0.15, 3)
    sel = rng.permutation(nm)[:n_match]
    matched = (model[sel] - tv) @ R
    matched = matched + rng.normal(0.0, 0.004, size=matched.shape)
    outliers = rng.uniform(-0.9, 0.9, size=(n_out, 3))
    data = np.vstack([matched, outliers])
    mp = rng.integers(0, 9, nm).astype(np.int32)
    dp = np.concatenate([mp[sel], rng.integers(0, 9, n_out)]).astype(
        np.int32)
    perm = rng.permutation(len(data))
    return (np.round(data[perm], 6), np.round(model, 6),
            dp[perm].copy(), mp)


def synthetic_pool_trimmed(n: int, seed: int = 23):
    """Noisy/outlier raw pairs for the trimmed (dissimilar-style) bench
    workload; tools/ref_workload_baseline.py --trimmed runs the reference
    binary on the same clouds with the same trimFraction."""
    rng = np.random.default_rng(seed)
    return [(f"trm{i:02d}",) + _synthetic_pair_noisy(rng)
            for i in range(n)]


def _normalized_synthetic(entry):
    """Raw synthetic pair -> the normalized quantized clouds the engine
    registers (identical to what the reference binary computes from the
    same .mol2: centralize each, common scale, 6-sig-digit file round-trip
    — jly_main.cpp:83-99)."""
    from goicp_tpu.geom.normalize import normalize_pair
    from goicp_tpu.io.xyz import quantize_like_file

    _, data, model, dp, mp = entry
    norm = normalize_pair(data, model)
    return (quantize_like_file(norm["source"]),
            quantize_like_file(norm["target"]), dp, mp)


def _bucket_and_prepare(raw, cfg):
    from goicp_tpu.pipeline.prepare import (bucket_dims, make_count_dynamic,
                                            prepare_pair)
    dims: dict = {}
    for data, model, _, _ in raw:
        d = bucket_dims(model, len(data), len(model), cfg)
        dims = {k: max(dims.get(k, 0), v) for k, v in d.items()}
    return [make_count_dynamic(
        prepare_pair(data, model, dp, mp, cfg, **dims))
        for data, model, dp, mp in raw]


def _bucket_and_prepare_multi(raw, cfg, max_buckets: int = 3):
    """Shape-BUCKETED prep (round 5): pairs grouped by their own kernel
    dims instead of one pool-max bucket — the hot kernels' work tile is
    (pad_cells x ceil(pad_data, 128)) and a pool-max bucket wastes 1.8x
    mean volume (2.7x on the eval-heavy pair 2).  One fused stream runs
    per bucket; trajectories are padding-invariant so per-pair results
    and eval counts are IDENTICAL to the single-bucket protocol
    (tools/bucket_study.py checks this on-chip; measured 64-pair wall
    34.5 -> 27.1 s).  Returns [(pairs, original_indices)]."""
    from goicp_tpu.pipeline.prepare import (bucket_dims, make_count_dynamic,
                                            plan_buckets, prepare_pair)
    dims_list = [bucket_dims(m, len(d), len(m), cfg) for d, m, _, _ in raw]
    plan = plan_buckets(dims_list, max_buckets=max_buckets)
    return [([make_count_dynamic(prepare_pair(*raw[i], cfg, **bd))
              for i in idxs], idxs) for bd, idxs in plan]


def _reassemble(outs, n: int):
    """[(original_indices, DeviceResult batch)] -> DeviceResult rows in
    original pair order (the per-bucket streams' inverse permutation)."""
    from goicp_tpu.search.device_engine import DeviceResult
    rows = [None] * n
    for idxs, out in outs:
        for j, i in enumerate(idxs):
            rows[i] = tuple(np.asarray(getattr(out, f))[j]
                            for f in DeviceResult._fields)
    return DeviceResult(*(np.stack([r[k] for r in rows])
                          for k in range(len(DeviceResult._fields))))


def _similar_raw(cfg, n_total: int = BATCH):
    raw = [_load_real_pair("2x86_3", "1eq2_6", cfg),    # BO1 pair 1
           _load_real_pair("2ktd_1", "4imo_2", cfg)]    # BO1 pair 2
    raw += [_normalized_synthetic(e)
            for e in synthetic_pool(n_total - len(raw))]
    return raw


def build_batch(cfg, n_total: int = BATCH):
    """The two real golden pairs + synthetic fill, shape-bucketed together
    and made dynamic-count so they share one compiled program."""
    return _bucket_and_prepare(_similar_raw(cfg, n_total), cfg)


def build_batch_buckets(cfg, n_total: int = BATCH, max_buckets: int = 3):
    """The similar workload, shape-bucketed into up to max_buckets groups
    (see _bucket_and_prepare_multi) -> [(pairs, original_indices)]."""
    return _bucket_and_prepare_multi(_similar_raw(cfg, n_total), cfg,
                                     max_buckets)


def build_trimmed_batch(cfg, n_total: int = TRIM_BATCH):
    """The trimmed (dissimilar-style) workload: noisy/outlier synthetic
    pairs registered with trimFraction=TRIM_FRACTION (the reference's
    dissimilar-batch setting, bo1_GoICP.py:56-68 + READMEGo-ICP.md:82-84).
    cfg must already carry trimFraction=TRIM_FRACTION."""
    raw = [_normalized_synthetic(e)
           for e in synthetic_pool_trimmed(n_total)]
    return _bucket_and_prepare(raw, cfg)


def build_trimmed_batch_buckets(cfg, n_total: int = TRIM_BATCH,
                                max_buckets: int = 3):
    """Trimmed workload, shape-bucketed -> [(pairs, original_indices)]."""
    raw = [_normalized_synthetic(e)
           for e in synthetic_pool_trimmed(n_total)]
    return _bucket_and_prepare_multi(raw, cfg, max_buckets)


def _check_parity(out, cfg, batch_pairs):
    """Golden parity on the real pairs inside the measured batch."""
    err = np.asarray(out.error)
    comp = np.asarray(out.opt_comp)
    conv = np.asarray(out.converged)
    nd1 = batch_pairs[0].counts[0]
    eps = cfg.MSEThresh * float(nd1)          # the reference's own epsilon
    assert bool(conv.all()), f"unconverged pairs: {np.where(~conv)[0]}"
    assert abs(float(err[0]) - 8.45388) < eps, \
        f"pair-1 parity failed: error={float(err[0])}"
    # compat can flip by one correspondence across backends (f32 tie-breaks)
    assert abs((int(nd1) - int(comp[0])) - 133) <= 2, int(comp[0])
    # convergence-margin guard (VERDICT r2 weak #6): every converged gap
    # must sit at least (1 - margin_frac) below the reported epsilon, so
    # a numeric perturbation cannot flip a benched pair to unconverged
    if cfg.margin_frac < 1.0:
        gap = np.asarray(out.gap)
        for i, p in enumerate(batch_pairs):
            eps_i = cfg.MSEThresh * float(np.asarray(p.counts[1]))
            # 1e-3 tolerance: converged gaps land JUST under the tightened
            # threshold by construction, so an exact-boundary assert would
            # itself be numerically flaky; the headroom being proven
            # ((1-margin_frac)*eps ~ 0.25) dwarfs the tolerance
            assert gap[i] <= cfg.margin_frac * eps_i + 1e-3, \
                (i, float(gap[i]), eps_i)


def main(out_path: str):
    from goicp_tpu.config import GoICPConfig
    import jax

    platform = jax.devices()[0].platform

    cfg = GoICPConfig.from_file(f"{REF}/config.txt")
    # tuned search shape (strict parity: golden error band AND compat
    # count on pair 1).  Measured on-chip: narrow pops win — a WIDE shape
    # (rot_batch=6, trans_pop=32) cuts sequential depth ~20x but its
    # per-iteration kernel/sort volume costs 2x more wall (351 s vs 171 s
    # on the 64-pair stream); the engine is latency-bound at narrow shapes
    # and volume-bound at wide ones, and narrow is the better trade here
    # trans_capacity 128: the deeper translation frontier folds fewer
    # dropped lbs into lb_safe, so rotation nodes carry TIGHTER bounds and
    # the margin-guarded search converges in ~25% fewer outer steps
    # (measured: 64-pair workload 61.8s at cap 64 -> 29.8s at cap 128)
    cfg = bench_shape(cfg)

    if platform == "cpu":
        # no lane-level parallel hardware: sequential single-pair is the
        # honest CPU fallback (batching just multiplies work per XLA op)
        from goicp_tpu.pipeline.prepare import prepare_pair
        from goicp_tpu.search.outer import register
        data, model, dp, mp = _load_real_pair("2x86_3", "1eq2_6", cfg)
        pair = prepare_pair(data, model, dp, mp, cfg, nd_downsampled=238,
                            bucket=True)
        eps = cfg.MSEThresh * 238
        r = register(pair, cfg)           # warm-up + parity
        assert abs(r.error - 8.45388) < eps
        n = 3
        t0 = time.time()
        evals = 0
        for _ in range(n):
            r = register(pair, cfg)
            evals += r.bound_evals
            assert abs(r.error - 8.45388) < eps
        wall = time.time() - t0
        batch = n
    else:
        from goicp_tpu.search.fused_stream import register_fused_stream

        def run():
            # cross-pair fused stream, one per SHAPE BUCKET: every stream's
            # while_loop advances its in-flight pairs by one inner-BnB
            # iteration per step, outer transitions fire per pair
            # asynchronously (round 3: fused width=2 beats wider windows —
            # the engine is kernel-volume-bound); round 5 groups pairs by
            # their own kernel dims (plan_buckets) instead of one pool-max
            # bucket — identical per-pair trajectories, 1.8x mean kernel
            # volume removed (64-pair wall 34.5 -> 27.1 s on-chip A/B,
            # tools/bucket_study.py)
            return [(idxs, register_fused_stream(bp, cfg, width=FUSED_WIDTH,
                                                 chunk_steps=FUSED_CHUNK))
                    for bp, idxs in buckets]

        # 4 buckets measured best on the 64-pair similar pool (best-of-2
        # walls: 4 buckets 22.9 s vs 3 buckets 27.1 s vs single 34.5 s;
        # trimmed showed no 4-vs-3 gain, so it stays at 3)
        buckets = build_batch_buckets(cfg, BATCH, max_buckets=4)
        ordered_pairs = [None] * BATCH
        for bp, idxs in buckets:
            for j, i in enumerate(idxs):
                ordered_pairs[i] = bp[j]
        out = _reassemble(run(), BATCH)            # warm (compile) + check
        _check_parity(out, cfg, ordered_pairs)
        wall = float("inf")
        evals = 0
        for _ in range(2):                         # steady-state: best of 2
            t0 = time.time()
            outs = run()
            w = time.time() - t0
            out = _reassemble(outs, BATCH)
            if w < wall:
                wall = w
                evals = int(np.sum(np.asarray(out.evals)))
            _check_parity(out, cfg, ordered_pairs)
        batch = BATCH

    result = {"pairs_per_s": batch / wall,
              "bound_evals_per_s": evals / wall,
              "platform": platform, "wall_s": wall, "batch": batch,
              # distinct_pairs: the CPU fallback registers ONE distinct
              # pair (repeated), so bench.py must not compare it against
              # the 64-pair mixed-workload baseline (ADVICE r2)
              "distinct_pairs": 1 if platform == "cpu" else batch}

    if platform != "cpu":
        # second workload: trimmed dissimilar-style (BASELINE.json config
        # 4) — noisy/outlier pairs registered with trimFraction, the
        # reference's dissimilar-batch setting
        import dataclasses as _dc
        # trimmed pool runs deeper frontiers: measured round 5 on-chip,
        # cap 256 + reuse = 4.16 pairs/s vs 3.86 at cap 128 (the noisy
        # pairs are eval-heavier, so the 256-frontier's tighter lbs win
        # where the similar pool's easy pairs lose to merge cost)
        cfg_t = _dc.replace(cfg, trimFraction=TRIM_FRACTION,
                            trans_capacity=256)
        tbuckets = build_trimmed_batch_buckets(cfg_t, TRIM_BATCH)

        def trun():
            return [(idxs, register_fused_stream(bp, cfg_t,
                                                 width=FUSED_WIDTH,
                                                 chunk_steps=FUSED_CHUNK))
                    for bp, idxs in tbuckets]

        trun()                                     # warm
        twall = float("inf")
        for _ in range(2):                         # steady-state: best of 2
            t0 = time.time()
            touts = trun()
            twall = min(twall, time.time() - t0)
            tout = _reassemble(touts, TRIM_BATCH)
            conv = np.asarray(tout.converged)
            assert conv.all(), \
                f"unconverged trimmed pairs: {np.where(~conv)[0]}"
        result["trimmed_pairs_per_s"] = TRIM_BATCH / twall
        result["trimmed_batch"] = TRIM_BATCH
        result["trimmed_wall_s"] = twall

    with open(out_path, "w") as fh:
        json.dump(result, fh)


if __name__ == "__main__":
    main(sys.argv[1])
