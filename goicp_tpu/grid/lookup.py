"""Batched distance-transform lookups (the BnB hot gather).

Reference semantics (DT3D::Distance, jly_3ddt.cpp:1139-1191):
  * voxel = ROUND((p - min) * scale) per axis (trunc(x+0.5));
  * in-bounds: field value at the voxel;
  * out-of-bounds: per-axis excess a = idx (if idx<0) or idx-SIZE+1 (if
    idx>=SIZE); result = sqrt(a^2+b^2+c^2)/scale + field at the clamped voxel.

Chem lookups (GoICP::checkCompatibility, jly_goicp.cpp:974-984) use the
CLAMPED voxel directly (no excess term) to find the nearest occupied cell.

Everything is pure gathers over the flattened (S^3,) fields; XLA vectorizes
these on the VPU.  Shapes: points (..., 3) -> outputs (...,).
"""

from __future__ import annotations

import jax.numpy as jnp

from goicp_tpu.grid.edt import round_ref


def voxel_indices(points: jnp.ndarray, consts: jnp.ndarray):
    """points (..., 3) -> (raw int idx (..., 3), clamped idx (..., 3))."""
    lo = consts[0:3]
    scale = consts[3]
    size = consts[4].astype(jnp.int32)
    raw = round_ref((points - lo) * scale)
    clamped = jnp.clip(raw, 0, size - 1)
    return raw, clamped


def flat_index(idx: jnp.ndarray, consts: jnp.ndarray) -> jnp.ndarray:
    size = consts[4].astype(jnp.int32)
    return (idx[..., 2] * size + idx[..., 1]) * size + idx[..., 0]


def dt_distance(points: jnp.ndarray, dist_field: jnp.ndarray,
                consts: jnp.ndarray) -> jnp.ndarray:
    """DT3D::Distance for a batch of points (..., 3) -> (...,)."""
    raw, clamped = voxel_indices(points, consts)
    size = consts[4].astype(jnp.int32)
    scale = consts[3]
    base = dist_field[flat_index(clamped, consts)]
    below = raw.astype(jnp.float32)                      # a = idx when idx < 0
    above = (raw - size + 1).astype(jnp.float32)         # a = idx-SIZE+1
    excess = jnp.where(raw < 0, below,
                       jnp.where(raw >= size, above, 0.0))
    oob = jnp.any((raw < 0) | (raw >= size), axis=-1)
    extra = jnp.sqrt(jnp.sum(excess * excess, axis=-1)) / scale
    return jnp.where(oob, base + extra, base)


def nearest_cell_id(points: jnp.ndarray, nearest_field: jnp.ndarray,
                    consts: jnp.ndarray) -> jnp.ndarray:
    """Clamped-voxel gather of the nearest occupied cell index (..., )."""
    _, clamped = voxel_indices(points, consts)
    return nearest_field[flat_index(clamped, consts)]
