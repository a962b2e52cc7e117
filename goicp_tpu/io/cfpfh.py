"""c-FPFH descriptor files: one row of 41 floats per point
(jly_main.cpp:292-310; files cfpfh/<cavity>.cfpfh).

Bin selection by the `cfpfh` config knob (jly_goicp.cpp:1626-1640):
    1 -> bins 0..40 (full c-FPFH)
    2 -> bins 0..32 (FPFH only)
    3 -> bins 33..40 (color histogram only)
"""

from __future__ import annotations

import os

import numpy as np

NUM_BINS = 41


def read_cfpfh(path: str) -> np.ndarray:
    try:
        from goicp_tpu import native
        vals = native.parse_float_table(path, 1 << 24)
        if vals is not None and len(vals) % NUM_BINS == 0 and len(vals):
            return vals.reshape(-1, NUM_BINS)
    except Exception:
        pass
    data = np.loadtxt(path, dtype=np.float64)
    data = np.atleast_2d(data)
    if data.shape[1] != NUM_BINS:
        raise ValueError(f"{path}: expected {NUM_BINS} bins, got {data.shape[1]}")
    return data


def cfpfh_path_for_cavity(cfpfh_dir: str, cavity_file: str) -> str:
    """Derive cfpfh path from a cavity file name the way loadPointCloud does
    (jly_main.cpp:279): strip dir and the trailing `_simKN.xyz` suffix.

    e.g. cavitiesN/2x86_3_cavity6_sim1N.xyz -> cfpfh/2x86_3_cavity6.cfpfh
         cavities/2x86_3_cavity6.mol2        -> cfpfh/2x86_3_cavity6.cfpfh
    """
    base = os.path.basename(cavity_file)
    if base.endswith(".mol2"):
        stem = base[: -len(".mol2")]
    else:
        stem = base.rsplit("_", 1)[0]
    return os.path.join(cfpfh_dir, stem + ".cfpfh")


def select_bins(desc: np.ndarray, cfpfh_mode: int) -> np.ndarray:
    if cfpfh_mode in (0, 1):
        return desc
    if cfpfh_mode == 2:
        return desc[:, 0:33]
    if cfpfh_mode == 3:
        return desc[:, 33:41]
    raise ValueError(f"bad cfpfh mode {cfpfh_mode}")
