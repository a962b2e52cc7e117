"""Full-scale BO1-sized sweep: 383 pairs end-to-end through the fused
stream engine, with JSONL output, checkpoint/resume, and an optional
mid-run kill to prove resume at scale.

The reference sweeps 383 similar pairs (bo1_GoICP.py:40-54, one process
per pair) and carries the 383-pair dissimilar TSV for the trimmed
workload (the disabled loop at bo1_GoICP.py:56-68 + trimFraction,
READMEGo-ICP.md:82-84).  Only 2 real BO1 pairs ship with the repo, so
the similar pool is the two real golden pairs + 381 synthetic pairs in
the BO1 size envelope (bench.measure.synthetic_pool semantics, larger
draw); --trimmed switches to 383 noisy/outlier pairs registered with
trimFraction=0.1 (bench.measure.synthetic_pool_trimmed semantics) —
the dissimilar-style workload class at full dataset scale.

Quality gates (VERDICT r4 weak #3): every pair must converge; the real
golden pair keeps BOTH its error band AND its golden compatibility
count (133 +- 2) INSIDE the sweep — the same bar the bench enforces.

Usage:
    python tools/sweep383.py [--n 383] [--width 3] [--out sweep383.jsonl]
        [--trimmed]               # 383-pair trimmed (dissimilar-style)
        [--kill-after-chunks N]   # exits after N chunks (state saved);
                                  # re-run WITHOUT the flag to resume
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=383)
    ap.add_argument("--width", type=int, default=2)
    ap.add_argument("--chunk-steps", type=int, default=512)
    ap.add_argument("--out", default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--trimmed", action="store_true",
                    help="383-pair trimmed dissimilar-style pool "
                         "(trimFraction=0.1) instead of the similar pool")
    ap.add_argument("--kill-after-chunks", type=int, default=None)
    ap.add_argument("--verbose", action="store_true",
                    help="per-chunk progress prints (each costs a window "
                         "state device_get through the tunnel, ~0.25 s)")
    ap.add_argument("--ckpt-every", type=int, default=8)
    args = ap.parse_args()

    from goicp_tpu.bench.measure import (build_batch, build_trimmed_batch,
                                         TRIM_FRACTION, bench_shape)
    from goicp_tpu.config import GoICPConfig
    from goicp_tpu.search.fused_stream import register_fused_stream

    tag = "trimmed" if args.trimmed else "similar"
    if args.out is None:
        args.out = os.path.join(
            REPO, "sweep383_trimmed.jsonl" if args.trimmed
            else "sweep383.jsonl")
    if args.ckpt is None:
        args.ckpt = os.path.join(REPO, f".sweep383_{tag}.npz")

    cfg = GoICPConfig.from_file("/root/reference/config.txt")
    cfg = bench_shape(cfg)
    if args.trimmed:
        cfg = dataclasses.replace(cfg, trimFraction=TRIM_FRACTION)

    t0 = time.time()
    if args.trimmed:
        pairs = build_trimmed_batch(cfg, args.n)
        names = [f"trm{i:02d}" for i in range(args.n)]
    else:
        pairs = build_batch(cfg, args.n)
        names = ["similar1_2x86_3->1eq2_6", "similar2_2ktd_1->4imo_2"] + \
            [f"syn{i:02d}" for i in range(args.n - 2)]
    prep_s = time.time() - t0
    print(f"prepared {len(pairs)} {tag} pairs in {prep_s:.1f}s", flush=True)

    def progress(p):
        inflight = [r for r in p["rows"] if not r["dead"]]
        best = min((r["incumbent"] for r in inflight), default=float("nan"))
        print(f"chunk {p['chunk']:4d}: in-flight="
              f"{[r['pair'] for r in inflight]} "
              f"outer={[r['outer'] for r in inflight]} "
              f"best_incumbent={best:.3f}", flush=True)

    t0 = time.time()
    try:
        out = register_fused_stream(
            pairs, cfg, width=args.width, chunk_steps=args.chunk_steps,
            checkpoint_path=args.ckpt, resume=True,
            max_chunks=args.kill_after_chunks,
            progress=progress if args.verbose else None,
            checkpoint_every=args.ckpt_every)
    except RuntimeError as e:
        print(f"KILLED (as requested): {e}", flush=True)
        return 3
    reg_s = time.time() - t0

    with open(args.out, "w") as fh:
        for i in range(args.n):
            fh.write(json.dumps({
                "pair": names[i],
                "error": round(float(out.error[i]), 6),
                "geom": round(float(out.terms[i][0]), 6),
                "incomp": round(float(out.terms[i][1]), 6),
                "fpfh": round(float(out.terms[i][2]), 6),
                "compat": int(out.opt_comp[i]),
                "gap": round(float(out.gap[i]), 6),
                "converged": bool(out.converged[i]),
                "outer": int(out.outer_iters[i]),
                "inner": int(out.inner_iters[i]),
                "evals": int(out.evals[i]),
                "icp_runs": int(out.icp_runs[i]),
            }) + "\n")

    conv = np.asarray(out.converged)
    evals = int(np.sum(np.asarray(out.evals)))
    print(f"SWEEP DONE ({tag}): {args.n} pairs, registration wall "
          f"{reg_s:.1f}s = {args.n / reg_s:.3f} pairs/s, prep "
          f"{prep_s:.1f}s, {int(conv.sum())}/{args.n} converged, "
          f"{evals} bound evals ({evals / reg_s:.0f}/s); "
          f"rows -> {args.out}", flush=True)
    assert conv.all(), f"unconverged pairs: {np.where(~conv)[0].tolist()}"
    if not args.trimmed:
        # golden parity INSIDE the sweep — the same bar as the bench
        # (bench/measure._check_parity): error band AND compat count
        eps1 = cfg.MSEThresh * 238
        assert abs(float(out.error[0]) - 8.45388) < eps1, \
            float(out.error[0])
        comp1 = 238 - int(out.opt_comp[0])
        assert abs(comp1 - 133) <= 2, \
            (f"pair-1 compat {comp1} != golden 133+-2 — basin swap "
             f"inside the sweep (error {float(out.error[0]):.4f})")
    if os.path.exists(args.ckpt):
        os.unlink(args.ckpt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
