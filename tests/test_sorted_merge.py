"""Sorted two-way rank merge (cfg.sorted_merge) vs the full argsort.

The merged frontier must be IDENTICAL (stable tie order included) so the
search trajectory is bit-equal; the helper is also unit-tested directly
against jnp.argsort on adversarial inputs (ties, inf blocks, NaN)."""

import numpy as np
import jax
import jax.numpy as jnp

from goicp_tpu.config import GoICPConfig
from goicp_tpu.search.inner import _merge_sorted_keep
from goicp_tpu.search.device_engine import register_device
from tests.test_device_engine import _cfg, _pair


def _ref_merge(rest_lbs, rest_nodes, new_lbs, new_nodes, cap):
    all_lbs = jnp.concatenate([rest_lbs, new_lbs], axis=1)
    all_nodes = jnp.concatenate([rest_nodes, new_nodes], axis=1)
    order = jnp.argsort(all_lbs, axis=1)
    s = jnp.take_along_axis(all_lbs, order, axis=1)
    n = jnp.take_along_axis(all_nodes, order[:, :, None], axis=1)
    return s[:, :cap], n[:, :cap], s[:, cap:]


def _check(rest_lbs, new_lbs, cap):
    L, R = rest_lbs.shape
    B = new_lbs.shape[1]
    rest_nodes = np.arange(L * R * 4, dtype=np.float32).reshape(L, R, 4)
    new_nodes = -np.arange(L * B * 4, dtype=np.float32).reshape(L, B, 4)
    a = _merge_sorted_keep(jnp.asarray(rest_lbs), jnp.asarray(rest_nodes),
                           jnp.asarray(new_lbs), jnp.asarray(new_nodes),
                           cap)
    b = _ref_merge(jnp.asarray(rest_lbs), jnp.asarray(rest_nodes),
                   jnp.asarray(new_lbs), jnp.asarray(new_nodes), cap)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    # node rows attached to non-inf kept lbs must match exactly (inf/nan
    # slots carry arbitrary payloads in both implementations)
    fin = np.isfinite(np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1])[fin],
                                  np.asarray(b[1])[fin])
    # dropped lbs as MULTISETS (order beyond cap is irrelevant; only
    # min over finite dropped is consumed)
    np.testing.assert_array_equal(np.sort(np.asarray(a[2]), axis=1),
                                  np.sort(np.asarray(b[2]), axis=1))


def test_merge_random():
    rng = np.random.default_rng(0)
    rest = np.sort(rng.uniform(0, 10, (3, 24)).astype(np.float32), axis=1)
    new = rng.uniform(0, 10, (3, 16)).astype(np.float32)
    _check(rest, new, 24)


def test_merge_ties_and_inf():
    rest = np.sort(np.array(
        [[1.0, 2.0, 2.0, 2.0, np.inf, np.inf, np.inf, np.inf]] * 2,
        np.float32), axis=1)
    new = np.array([[2.0, 0.5, np.inf, 2.0, 3.0, np.inf, 2.0, 9.0],
                    [np.inf] * 8], np.float32)
    _check(rest, new, 8)


def test_merge_nan_ranked_last_value_preserved():
    rest = np.array([[1.0, 2.0, np.inf, np.inf]], np.float32)
    new = np.array([[np.nan, 0.5, 3.0, np.nan]], np.float32)
    kept, _, dropped = _merge_sorted_keep(
        jnp.asarray(rest), jnp.zeros((1, 4, 4)),
        jnp.asarray(new), jnp.zeros((1, 4, 4)), 6)
    k = np.asarray(kept)[0]
    np.testing.assert_array_equal(k[:4], [0.5, 1.0, 2.0, 3.0])
    # NaNs rank with the inf tail but keep their value (infection)
    all_vals = np.concatenate([k, np.asarray(dropped)[0]])
    assert np.isnan(all_vals).sum() == 2


def test_device_engine_sorted_merge_identical():
    cfg0 = _cfg(MSEThresh=0.01, regularization=0.0005, ponderation=1,
                distTransSize=16)
    pair, *_ = _pair(cfg0, seed=3)
    import dataclasses
    cfg1 = dataclasses.replace(cfg0, sorted_merge=1)
    r0 = jax.device_get(register_device(pair, cfg0))
    r1 = jax.device_get(register_device(pair, cfg1))
    assert float(r0.error) == float(r1.error)
    np.testing.assert_array_equal(np.asarray(r0.R), np.asarray(r1.R))
    assert int(r0.evals) == int(r1.evals)
    assert int(r0.outer_iters) == int(r1.outer_iters)
    assert int(r0.inner_iters) == int(r1.inner_iters)
