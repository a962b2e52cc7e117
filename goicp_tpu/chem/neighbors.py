"""Neighbor counts and per-point weights.

Reference semantics preserved (quirks included, documented):
  * isNeighbor(radius, p, q): true iff ||p-q|| < sqrt(radius)
    (jly_goicp.cpp:1097-1103 — the radius argument is effectively squared
    distance; sqrt(0.050) ~ 0.224 in normalized units).
  * neighborsWeights (jly_goicp.cpp:1453-1498): grow `distance` from 0.035
    by 0.001 until the max neighbor count over the data cloud reaches >= 19;
    each pass overwrites counts.  Then weights[i] = 1 + 2*minN/neighbors_i
    (minN clamped >= 1, counts clamped >= 1).
  * assignNeighbors (jly_goicp.cpp:1213-1248): fixed radius argument 0.050
    for both clouds (used by the regularizationNeighbors term).

All O(N^2) pairwise work is a tiny batched distance matrix; done in numpy on
host at pair-prep time (N <= ~300; the bunny path never uses chem terms).
"""

from __future__ import annotations

import numpy as np


def _pairwise_dist(coords: np.ndarray) -> np.ndarray:
    d = coords[:, None, :] - coords[None, :, :]
    return np.sqrt((d * d).sum(-1))


def neighbor_counts(coords: np.ndarray, radius_arg: float) -> np.ndarray:
    """Counts of j != i with ||p_i - p_j|| < sqrt(radius_arg)."""
    dist = _pairwise_dist(np.asarray(coords, dtype=np.float64))
    np.fill_diagonal(dist, np.inf)
    return (dist < np.sqrt(radius_arg)).sum(axis=1).astype(np.int32)


def adaptive_neighbor_counts(coords: np.ndarray, start: float = 0.035,
                             step: float = 0.001, target_max: int = 19,
                             max_passes: int = 10_000):
    """Grow the radius argument until max count >= target_max
    (jly_goicp.cpp:1459-1489).

    Returns (counts_final_pass, min_count_across_passes, final_radius_arg).
    The reference tracks minN cumulatively across passes without resetting,
    so with monotonically growing counts minN is the min of the FIRST pass,
    while the stored per-point counts come from the final pass.
    """
    dist = _pairwise_dist(np.asarray(coords, dtype=np.float64))
    np.fill_diagonal(dist, np.inf)
    r = start
    min_n = 100  # reference init (jly_goicp.cpp:1455)
    for _ in range(max_passes):
        counts = (dist < np.sqrt(r)).sum(axis=1).astype(np.int32)
        min_n = min(min_n, int(counts.min(initial=100)))
        if counts.max(initial=0) >= target_max:
            return counts, min_n, r
        r += step
    return counts, min_n, r


def neighbor_weights(data_coords: np.ndarray) -> np.ndarray:
    """weights = 1 + 2 * minN / counts (ponderation=1 path,
    jly_goicp.cpp:1490-1497)."""
    counts, min_n, _ = adaptive_neighbor_counts(data_coords)
    min_n = max(min_n, 1)
    counts = np.maximum(counts, 1)
    return (1.0 + 2.0 * min_n / counts).astype(np.float32)
