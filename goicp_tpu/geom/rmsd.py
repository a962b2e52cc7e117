"""RMSD between index-aligned point sets (transformation.cpp:453-464)."""

from __future__ import annotations

import numpy as np


def rmsd(a: np.ndarray, b: np.ndarray) -> float:
    """sqrt(mean over points of squared distance); arrays index-aligned.

    The reference iterates over len(a) and divides by len(a); mismatched
    lengths would read OOB there — we assert instead.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, f"RMSD shape mismatch {a.shape} vs {b.shape}"
    return float(np.sqrt(np.sum((a - b) ** 2) / len(a)))
