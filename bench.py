"""Benchmark: BO1 pair-1 registration throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C++ binary registers BO1 pair 1 (2x86_3 -> 1eq2_6,
238 data points, DT 20^3, MSEThresh 0.01, regularization 0.0005,
ponderation 1) in 0.703125 s single-core (output/similar1.txt:1) =>
1.4222 pairs/s.  We measure the same registration (search only, DT build
excluded on both sides, matching the reference's clock placement at
jly_main.cpp:108-123) after a warm-up run so XLA compile time is excluded
(compiles are cached across pairs of the same shape — the sweep amortizes
them exactly like this).
"""

import json
import time

REF = "/root/reference"
BASELINE_PAIRS_PER_S = 1.0 / 0.703125


def main():
    import dataclasses

    from goicp_tpu.config import GoICPConfig
    from goicp_tpu.geom.normalize import normalize_pair
    from goicp_tpu.io.mol2 import read_mol_file
    from goicp_tpu.io.xyz import quantize_like_file
    from goicp_tpu.pipeline.prepare import prepare_pair
    from goicp_tpu.search.outer import register

    cfg = GoICPConfig.from_file(f"{REF}/config.txt")
    cfg = dataclasses.replace(cfg, rot_batch=16)

    src, sp = read_mol_file(f"{REF}/cavities/2x86_3_cavity6.mol2")
    tgt, tp = read_mol_file(f"{REF}/cavities/1eq2_6_cavity6.mol2")
    norm = normalize_pair(src, tgt)
    pair = prepare_pair(quantize_like_file(norm["source"]),
                        quantize_like_file(norm["target"]),
                        sp, tp, cfg, nd_downsampled=238)

    # warm-up (compiles + verifies the result once)
    reg = register(pair, cfg)
    assert reg.converged and abs(reg.error - 8.45388) < cfg.MSEThresh * 238, \
        f"parity check failed: error={reg.error}"

    times = []
    for _ in range(3):
        t0 = time.time()
        reg = register(pair, cfg)
        times.append(time.time() - t0)
    best = min(times)
    pairs_per_s = 1.0 / best

    print(json.dumps({
        "metric": "bo1_pair1_registration_throughput",
        "value": round(pairs_per_s, 4),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
