"""Inner benchmark measurement (run in a child process by bench.py).

Measures batched BO1 pair-1 registration throughput and writes one JSON
object to the path given in argv[1].
"""

import json
import sys
import time

REF = "/root/reference"
BATCH = 64


def main(out_path: str):
    from goicp_tpu.config import GoICPConfig
    from goicp_tpu.geom.normalize import normalize_pair
    from goicp_tpu.io.mol2 import read_mol_file
    from goicp_tpu.io.xyz import quantize_like_file
    from goicp_tpu.pipeline.prepare import prepare_pair
    from goicp_tpu.search.device_engine import (register_device,
                                                register_device_batch)
    from goicp_tpu.search.outer import register
    import jax

    platform = jax.devices()[0].platform

    cfg = GoICPConfig.from_file(f"{REF}/config.txt")
    if platform != "cpu":
        # TPU: tuned search shape (tools/tune_batch.py, strict parity =
        # golden error band AND compat count): one rotation cube popped per
        # outer step but FOUR ICP seeds from the top-ub lanes — lands on the
        # golden basin (error 8.59, comp 133) with ~6.7x fewer bound evals
        # than rot_batch=6, ~60-66 pairs/s batched on a v5e chip
        import dataclasses
        cfg = dataclasses.replace(cfg, rot_batch=1, trans_capacity=64,
                                  icp_seeds=4)
    src, sp = read_mol_file(f"{REF}/cavities/2x86_3_cavity6.mol2")
    tgt, tp = read_mol_file(f"{REF}/cavities/1eq2_6_cavity6.mol2")
    norm = normalize_pair(src, tgt)
    pair = prepare_pair(quantize_like_file(norm["source"]),
                        quantize_like_file(norm["target"]),
                        sp, tp, cfg, nd_downsampled=238, bucket=True)

    # warm-up + parity check (single pair, fully device-side engine:
    # ONE dispatch per registration)
    import jax as _jax
    res = _jax.device_get(register_device(pair, cfg))
    eps = cfg.MSEThresh * 238
    assert bool(res.converged) and abs(float(res.error) - 8.45388) < eps, \
        f"parity check failed: error={float(res.error)}"
    # compat count can flip by one correspondence across backends (f32
    # matmul tie-breaks); the golden value is 133
    assert abs((238 - int(res.opt_comp)) - 133) <= 2, int(res.opt_comp)

    if platform == "cpu":
        # no lane-level parallel hardware: sequential is the best honest
        # CPU number (batching just multiplies work per XLA op)
        n = 3
        t0 = time.time()
        for _ in range(n):
            r = register(pair, cfg)
            assert abs(r.error - 8.45388) < eps
        wall = time.time() - t0
        batch = n
    else:
        pairs = [pair] * BATCH
        register_device_batch(pairs, cfg)   # warm (compile) the batch
        import numpy as _np
        wall = float("inf")
        for _ in range(3):                  # steady-state: best of 3
            t0 = time.time()
            out = register_device_batch(pairs, cfg)
            wall = min(wall, time.time() - t0)
            assert bool(_np.all(_np.abs(_np.asarray(out.error) - 8.45388)
                                < eps))
            comp = 238 - _np.asarray(out.opt_comp)
            assert bool(_np.all(_np.abs(comp - 133) <= 2)), comp
        batch = BATCH

    with open(out_path, "w") as fh:
        json.dump({"pairs_per_s": batch / wall, "platform": platform,
                   "wall_s": wall, "batch": batch}, fh)


if __name__ == "__main__":
    main(sys.argv[1])
