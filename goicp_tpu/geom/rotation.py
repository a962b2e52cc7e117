"""Rotations: batched angle-axis (Rodrigues) conversion.

The BnB parameterizes SO(3) by the angle-axis ball of radius pi; a rotation
cube's center (v1,v2,v3) converts to a matrix via Rodrigues
(jly_goicp.cpp:729-757). Zero-angle maps to identity.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rodrigues(v: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis vectors (..., 3) -> rotation matrices (..., 3, 3).

    Safe at ||v|| == 0 (returns identity), matching jly_goicp.cpp:758-762.
    """
    v = jnp.asarray(v)
    t = jnp.linalg.norm(v, axis=-1, keepdims=True)
    safe_t = jnp.where(t > 0, t, 1.0)
    u = v / safe_t
    u = jnp.where(t > 0, u, jnp.zeros_like(u))
    ct = jnp.cos(t)[..., None]          # (..., 1, 1)
    st = jnp.sin(t)[..., None]
    one_ct = 1.0 - ct

    ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
    zeros = jnp.zeros_like(ux)
    K = jnp.stack([
        jnp.stack([zeros, -uz, uy], axis=-1),
        jnp.stack([uz, zeros, -ux], axis=-1),
        jnp.stack([-uy, ux, zeros], axis=-1),
    ], axis=-2)
    uuT = u[..., :, None] * u[..., None, :]
    eye = jnp.eye(3, dtype=v.dtype)
    R = ct * eye + st * K + one_ct * uuT
    # zero-angle lanes -> identity (ct=1, st=0, one_ct=0 handles it already,
    # but keep explicit for u zeroed lanes)
    return R


def rodrigues_np(v: np.ndarray) -> np.ndarray:
    """Host-side double-precision Rodrigues for output fidelity."""
    v = np.asarray(v, dtype=np.float64)
    t = np.linalg.norm(v)
    if t == 0:
        return np.eye(3)
    u = v / t
    K = np.array([[0, -u[2], u[1]], [u[2], 0, -u[0]], [-u[1], u[0], 0]])
    return np.eye(3) * np.cos(t) + np.sin(t) * K + (1 - np.cos(t)) * np.outer(u, u)
