"""On-chip bit-exactness check: Pallas kernels vs the XLA gather path.

CPU tests run at HIGHEST matmul precision and cannot catch Mosaic
default-precision rounding; this drives both paths on the real TPU.

  timeout 560 env PYTHONPATH=/root/repo:/root/.axon_site \
      python tools/onchip_check.py
"""

import json
import os

REF = "/root/reference"


def main():
    import numpy as np
    import jax.numpy as jnp
    from goicp_tpu.config import GoICPConfig
    from goicp_tpu.geom.normalize import normalize_pair
    from goicp_tpu.io.mol2 import read_mol_file
    from goicp_tpu.io.xyz import quantize_like_file
    from goicp_tpu.pipeline.prepare import prepare_pair
    from goicp_tpu.bounds import evaluate as ev

    cfg = GoICPConfig.from_file(f"{REF}/config.txt")
    src, sp = read_mol_file(f"{REF}/cavities/2x86_3_cavity6.mol2")
    tgt, tp = read_mol_file(f"{REF}/cavities/1eq2_6_cavity6.mol2")
    norm = normalize_pair(src, tgt)
    pair = prepare_pair(quantize_like_file(norm["source"]),
                        quantize_like_file(norm["target"]),
                        sp, tp, cfg, nd_downsampled=238, bucket=True)

    rng = np.random.default_rng(11)
    L, B, Q = 8, 64, 216
    pts = jnp.asarray(rng.uniform(-0.9, 0.9,
                                  size=(L, pair.n_data_padded, 3)),
                      jnp.float32)
    centers = jnp.asarray(rng.uniform(-0.5, 0.5, size=(L, B, 3)), jnp.float32)
    widths = jnp.asarray(rng.uniform(0.05, 0.6, size=(L, B)), jnp.float32)
    corners = jnp.asarray(rng.uniform(-0.6, 0.6, size=(L, Q, 3)), jnp.float32)
    unc = ev.rot_uncertainty(
        jnp.asarray(rng.uniform(0.1, 1.0, size=(L,)), jnp.float32),
        pair.norm_data)

    report = {}
    os.environ["GOICP_KERNEL"] = "pallas"
    g_pal = ev.geometric_bounds_fused(pair, cfg, pts, centers, widths, unc)
    c_pal = ev.chem_corner_values(pair, cfg, pts, corners)["incomp"]
    os.environ["GOICP_KERNEL"] = "xla"
    g_xla = ev.geometric_bounds_fused(pair, cfg, pts, centers, widths, unc)
    c_xla = ev.chem_corner_values(pair, cfg, pts, corners)["incomp"]
    for name, a, b in (("ub", g_pal[0], g_xla[0]),
                       ("ubu", g_pal[1], g_xla[1]),
                       ("lbu", g_pal[2], g_xla[2]),
                       ("chem", c_pal, c_xla)):
        report[name + "_maxerr"] = float(
            np.abs(np.asarray(a) - np.asarray(b)).max())
    print(json.dumps(report))


if __name__ == "__main__":
    main()
