"""Normalized point-cloud (.xyz) reading/writing.

Format (transformation.cpp:340-350 / jly_main.cpp:289-301):
    line 1: N
    lines 2..N+1: x y z [prop_code]
written with C++ default ostream precision (6 significant digits).  The
reference re-reads the file it just wrote, so the search runs on the
6-sig-digit quantized coordinates; `quantize_like_file` reproduces that
round-trip without touching disk.
"""

from __future__ import annotations

import numpy as np


def _fmt(v: float) -> str:
    # C++ default ostream: 6 significant digits, shortest-ish form
    return f"{v:.6g}"


def write_normalized_cloud(path: str, coords: np.ndarray,
                           props: np.ndarray | None = None) -> None:
    n = len(coords)
    with open(path, "w") as fh:
        fh.write(f"{n}\n")
        for i in range(n):
            row = " ".join(_fmt(float(c)) for c in coords[i])
            if props is not None:
                row += f" {int(props[i])}"
            fh.write(row + "\n")


def read_point_cloud(path: str):
    """Read `N\\nx y z [c]` files. Returns (coords (N,3) f64, props (N,) i64
    or None).

    Header-tolerant: the reference data mixes headered (.txt,
    demo/model_bunny.txt:1) and raw xyz files without a count line
    (demo/model_bunny.xyz) — a non-integer first line is treated as data."""
    def _is_count(tok: str) -> bool:
        return tok.isdigit()

    with open(path, "r") as fh:
        first = fh.readline().split()
        rows = []
        # header = a bare integer count line ("N"); coordinate rows always
        # carry decimals/signs in the reference data
        headered = bool(first) and len(first) <= 2 and _is_count(first[0])
        if not headered and first:
            rows.append(first)
        for line in fh:
            tok = line.split()
            if tok:
                rows.append(tok)
        if headered:
            rows = rows[: int(first[0])]
    coords = np.array([[float(t[0]), float(t[1]), float(t[2])]
                       for t in rows], dtype=np.float64).reshape(-1, 3)
    props = None
    if any(len(t) > 3 for t in rows):
        # per-row: missing property column defaults to 0 (rows may be mixed)
        props = np.array([int(t[3]) if len(t) > 3 else 0 for t in rows],
                         dtype=np.int64)
    return coords, props


def quantize_like_file(coords: np.ndarray) -> np.ndarray:
    """Round-trip coords through the 6-sig-digit text format in memory,
    matching the reference's write-then-reload behavior (jly_main.cpp:88-99)."""
    out = np.empty_like(coords, dtype=np.float64)
    flat_in = coords.reshape(-1)
    flat_out = out.reshape(-1)
    for i, v in enumerate(flat_in):
        flat_out[i] = float(_fmt(float(v)))
    return out
