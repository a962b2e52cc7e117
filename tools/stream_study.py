"""Measure the 64-pair bench workload on the chip at several stream widths
and dump per-pair difficulty (outer/inner iterations, bound evals, wall).

Answers: is the stream's wall dominated by window COUPLING (vmapped chunks
cost the max over rows -> wide windows waste latency-bound iterations) or
by pairs that are intrinsically slow for this engine?  Prints a JSON line
per width plus the top-10 hardest pairs, cross-referenced against the
reference binary's per-pair walls (REF_BASELINE_WORKLOAD.json).

Usage: python tools/stream_study.py [width ...]   (default: 1 8)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"


def main():
    widths = [int(a) for a in sys.argv[1:]] or [1, 8]

    from goicp_tpu.bench.measure import BATCH, build_batch, _check_parity
    from goicp_tpu.config import GoICPConfig
    from goicp_tpu.search.chunked import register_device_stream
    import jax

    cfg = GoICPConfig.from_file(f"{REF}/config.txt")
    cfg = dataclasses.replace(cfg, rot_batch=1, trans_capacity=64,
                              icp_seeds=4, max_outer_steps=4000)
    pairs = build_batch(cfg, BATCH)

    ref = None
    try:
        with open(os.path.join(REPO, "REF_BASELINE_WORKLOAD.json")) as fh:
            ref = {r["pair"]: r["wall_s"]
                   for r in json.load(fh)["pairs"]}
            ref_names = list(ref.keys())
    except Exception:
        ref_names = [str(i) for i in range(BATCH)]

    print("platform:", jax.devices()[0].platform, flush=True)
    for width in widths:
        out = register_device_stream(pairs, cfg, width=width, chunk_steps=32)
        _check_parity(out, cfg, pairs)          # also warms the compile
        t0 = time.time()
        out = register_device_stream(pairs, cfg, width=width, chunk_steps=32)
        wall = time.time() - t0
        _check_parity(out, cfg, pairs)
        evals = int(np.sum(np.asarray(out.evals)))
        print(json.dumps({
            "width": width, "wall_s": round(wall, 2),
            "pairs_per_s": round(BATCH / wall, 4),
            "bound_evals_per_s": round(evals / wall),
            "total_inner_iters": int(np.sum(np.asarray(out.inner_iters))),
        }), flush=True)
        if width == widths[0]:
            inner = np.asarray(out.inner_iters)
            order = np.argsort(-inner)
            print("hardest pairs for the engine (by inner iters):")
            for i in order[:10]:
                name = ref_names[i] if i < len(ref_names) else str(i)
                print(f"  {name:24s} outer={int(out.outer_iters[i]):6d} "
                      f"inner={int(inner[i]):8d} "
                      f"evals={int(out.evals[i]):9d} "
                      f"err={float(out.error[i]):8.3f} "
                      f"ref_wall={ref.get(name, float('nan')):7.2f}s"
                      if ref else "", flush=True)


if __name__ == "__main__":
    main()
