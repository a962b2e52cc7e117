"""Geometry: Rodrigues, rescale identity vs reference goldens."""

import numpy as np
import pytest

from goicp_tpu.geom.normalize import normalize_pair
from goicp_tpu.geom.rotation import rodrigues, rodrigues_np
from goicp_tpu.geom.transform import rescale_transform
from goicp_tpu.io.mol2 import read_mol_file
from goicp_tpu.io.output import read_output


def test_rodrigues_identity():
    R = rodrigues_np(np.zeros(3))
    np.testing.assert_allclose(R, np.eye(3))


def test_rodrigues_axis_angle():
    # pi/2 about z
    R = rodrigues_np(np.array([0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0],
                               atol=1e-12)


def test_rodrigues_batched_matches_np():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(17, 3)) * 2.0
    v[3] = 0.0  # zero-angle lane
    R_batch = np.asarray(rodrigues(v.astype(np.float32)))
    for i in range(len(v)):
        np.testing.assert_allclose(R_batch[i], rodrigues_np(v[i]), atol=1e-5)
    # orthonormality
    eye = np.einsum("bij,bkj->bik", R_batch, R_batch)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (17, 1, 1)), atol=1e-5)


def test_rescale_identity_matches_reference_golden(ref_dir):
    """t_world = -R mu_src + s t + mu_tgt must reproduce
    output/similar1_rescaled.txt from output/similar1.txt."""
    src, _ = read_mol_file(f"{ref_dir}/cavities/2x86_3_cavity6.mol2")
    tgt, _ = read_mol_file(f"{ref_dir}/cavities/1eq2_6_cavity6.mol2")
    norm = normalize_pair(src, tgt)
    out = read_output(f"{ref_dir}/output/similar1.txt")
    golden = read_output(f"{ref_dir}/output/similar1_rescaled.txt")

    R, t_world = rescale_transform(out["R"], out["t"], norm["scale"],
                                   norm["source_mean"], norm["target_mean"])
    np.testing.assert_allclose(t_world, golden["t"], atol=2e-3)
    np.testing.assert_allclose(R, golden["R"], atol=1e-6)
    assert golden["error"] == pytest.approx(out["error"])
