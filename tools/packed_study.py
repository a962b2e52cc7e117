"""Packed vs fused stream on the 64-pair bench workload (real chip).

Sweeps (width, packed_slots); golden parity asserted per run by the
bench's own checker.  Run ALONE (one TPU process; idle host CPUs —
contention skews walls ~1.8x).

  timeout 560 env PYTHONPATH=/root/repo:/root/.axon_site \
      python tools/packed_study.py [fused|WxS ...]
e.g. python tools/packed_study.py fused 8x8 16x8 16x16
"""

import dataclasses
import json
import sys
import time

REF = "/root/reference"


def main():
    import numpy as np
    from goicp_tpu.bench.measure import (build_batch, _check_parity,
                                         BATCH, FUSED_CHUNK)
    from goicp_tpu.config import GoICPConfig
    from goicp_tpu.search.fused_stream import register_fused_stream
    from goicp_tpu.search.packed_stream import register_packed_stream

    from goicp_tpu.bench.measure import bench_shape
    cfg = bench_shape(GoICPConfig.from_file(f"{REF}/config.txt"))
    overrides = {}
    for a in sys.argv[1:]:
        if "=" in a:
            k, v = a.split("=", 1)
            overrides[k] = float(v) if "." in v else int(v)
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
        print(f"overrides={overrides}", flush=True)
    pairs = build_batch(cfg, BATCH)

    runs = [a for a in sys.argv[1:] if "=" not in a] \
        or ["fused", "8x8", "16x8", "16x16", "32x16"]
    for spec in runs:
        import os
        chunk_count = [0]
        prog = (lambda d: chunk_count.__setitem__(0, d["chunk"])) \
            if os.environ.get("PACKED_PROGRESS") else None
        if spec == "fused":
            run = lambda: register_fused_stream(pairs, cfg, width=2,
                                                chunk_steps=FUSED_CHUNK,
                                                progress=prog)
            tag = {"engine": "fused", "width": 2}
        else:
            parts = spec.split("x")
            w, s = int(parts[0]), int(parts[1])
            te = int(parts[2]) if len(parts) > 2 else 8
            sd = int(parts[3]) if len(parts) > 3 else 4
            cfgp = dataclasses.replace(cfg, packed_slots=s,
                                       packed_trans_every=te, icp_seeds=sd)
            run = (lambda cfgp=cfgp, w=w:
                   register_packed_stream(pairs, cfgp, width=w,
                                          chunk_steps=FUSED_CHUNK,
                                          progress=prog))
            tag = {"engine": "packed", "width": w, "slots": s,
                   "te": te, "seeds": sd}
        out = run()                                   # warm + parity
        _check_parity(out, cfg, pairs)
        t0 = time.time()
        out = run()
        wall = time.time() - t0
        _check_parity(out, cfg, pairs)
        evals = int(np.sum(np.asarray(out.evals)))
        print(json.dumps(dict(tag, wall_s=round(wall, 2),
                              pairs_per_s=round(BATCH / wall, 3),
                              evals=evals, chunks=chunk_count[0],
                              evals_per_s=int(evals / wall))), flush=True)


if __name__ == "__main__":
    main()
