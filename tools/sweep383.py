"""Full-scale BO1-sized sweep: 383 pairs end-to-end through the fused
stream engine, with JSONL output, checkpoint/resume, and an optional
mid-run kill to prove resume at scale.

The reference sweeps 383 similar pairs (bo1_GoICP.py:40-54, one process
per pair); only 2 real BO1 pairs ship with the repo, so the pool is the
two real golden pairs + 381 synthetic pairs spanning the BO1 size
envelope (bench.measure.synthetic_pool semantics, larger draw).

Usage:
    python tools/sweep383.py [--n 383] [--width 3] [--out sweep383.jsonl]
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
    ap.add_argument("--out", default=os.path.join(REPO, "sweep383.jsonl"))
    ap.add_argument("--ckpt", default=os.path.join(REPO, ".sweep383.npz"))
    ap.add_argument("--kill-after-chunks", type=int, default=None)
    ap.add_argument("--verbose", action="store_true",
                    help="per-chunk progress prints (each costs a window "
                         "state device_get through the tunnel, ~0.25 s)")
    ap.add_argument("--ckpt-every", type=int, default=8)
    args = ap.parse_args()

    from goicp_tpu.bench.measure import build_batch
    from goicp_tpu.config import GoICPConfig
    from goicp_tpu.search.fused_stream import register_fused_stream

    cfg = GoICPConfig.from_file("/root/reference/config.txt")
    cfg = dataclasses.replace(cfg, rot_batch=1, trans_capacity=128,
                              icp_seeds=4, max_outer_steps=12000,
                              margin_frac=0.9)

    t0 = time.time()
    pairs = build_batch(cfg, args.n)
    prep_s = time.time() - t0
    names = ["similar1_2x86_3->1eq2_6", "similar2_2ktd_1->4imo_2"] + \
        [f"syn{i:02d}" for i in range(args.n - 2)]
    print(f"prepared {len(pairs)} pairs in {prep_s:.1f}s", flush=True)

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
    print(f"SWEEP DONE: {args.n} pairs, registration wall {reg_s:.1f}s "
          f"= {args.n / reg_s:.3f} pairs/s, prep {prep_s:.1f}s, "
          f"{int(conv.sum())}/{args.n} converged, "
          f"{evals} bound evals ({evals / reg_s:.0f}/s); "
          f"rows -> {args.out}", flush=True)
    # parity: the two real pairs keep their golden behavior inside the sweep
    eps1 = cfg.MSEThresh * 238
    assert abs(float(out.error[0]) - 8.45388) < eps1, float(out.error[0])
    if os.path.exists(args.ckpt):
        os.unlink(args.ckpt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
