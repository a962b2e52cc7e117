"""I/O parsers vs the reference's checked-in data files (goldens)."""

import os

import numpy as np
import pytest

from goicp_tpu.chem.properties import PROP_CODES
from goicp_tpu.geom.normalize import normalize_pair
from goicp_tpu.io.cfpfh import cfpfh_path_for_cavity, read_cfpfh
from goicp_tpu.io.mol2 import get_atom_block, mol2_atom_count, read_mol_file
from goicp_tpu.io.output import read_output
from goicp_tpu.io.tsv import read_pair_list
from goicp_tpu.io.xyz import quantize_like_file, read_point_cloud


def test_read_mol_file_counts(ref_dir):
    coords, props = read_mol_file(f"{ref_dir}/cavities/2x86_3_cavity6.mol2")
    assert coords.shape == (238, 3)
    assert props.shape == (238,)
    assert props[0] == PROP_CODES["OG"]
    np.testing.assert_allclose(coords[0], [52.0792, -11.0646, 96.3486])

    coords2, _ = read_mol_file(f"{ref_dir}/cavities/1eq2_6_cavity6.mol2")
    assert coords2.shape[0] == 306


def test_mol2_atom_count(ref_dir):
    assert mol2_atom_count(f"{ref_dir}/cavities/2x86_3_cavity6.mol2") == 238
    assert mol2_atom_count(f"{ref_dir}/cavities/1eq2_6_cavity6.mol2") == 306


def test_normalization_matches_reference_golden(ref_dir):
    """Normalized+quantized source cloud must match cavitiesN golden
    (written by the reference run for pair 1)."""
    src, src_props = read_mol_file(f"{ref_dir}/cavities/2x86_3_cavity6.mol2")
    tgt, tgt_props = read_mol_file(f"{ref_dir}/cavities/1eq2_6_cavity6.mol2")
    norm = normalize_pair(src, tgt)

    golden, golden_props = read_point_cloud(
        f"{ref_dir}/cavitiesN/2x86_3_cavity6_sim1N.xyz")
    ours = quantize_like_file(norm["source"])
    assert golden.shape == ours.shape
    np.testing.assert_allclose(ours, golden, atol=2e-6)
    np.testing.assert_array_equal(src_props, golden_props)

    golden_t, golden_t_props = read_point_cloud(
        f"{ref_dir}/cavitiesN/1eq2_6_cavity6_sim1N.xyz")
    ours_t = quantize_like_file(norm["target"])
    np.testing.assert_allclose(ours_t, golden_t, atol=2e-6)
    np.testing.assert_array_equal(tgt_props, golden_t_props)


def test_read_output_golden(ref_dir):
    out = read_output(f"{ref_dir}/output/similar1.txt")
    assert out["time"] == pytest.approx(0.703125)
    assert out["error"] == pytest.approx(8.45388)
    assert out["compatibilities"] == 133
    assert out["R"].shape == (3, 3)
    np.testing.assert_allclose(out["R"][0], [0.2491547, 0.7601179, 0.6001184])
    np.testing.assert_allclose(out["t"], [-0.0423267, 0.0181080, -0.0010259])


def test_read_pair_list(ref_dir):
    pairs = read_pair_list(f"{ref_dir}/cavities_similar_BO1_clean.tsv")
    assert len(pairs) == 383
    assert pairs[0] == ("2x86_3", "1eq2_6")
    dis = read_pair_list(f"{ref_dir}/cavities_dissimilar_BO1_clean.tsv")
    assert len(dis) == 383


def test_cfpfh(ref_dir):
    path = cfpfh_path_for_cavity(f"{ref_dir}/cfpfh",
                                 "cavitiesN/2x86_3_cavity6_sim1N.xyz")
    assert os.path.basename(path) == "2x86_3_cavity6.cfpfh"
    desc = read_cfpfh(path)
    assert desc.shape == (238, 41)
    assert desc[0, 0] == pytest.approx(49.01564635578058)


def test_get_atom_block(ref_dir):
    pts = get_atom_block(f"{ref_dir}/chains/2x86_3_protein.mol2")
    assert pts.ndim == 2 and pts.shape[1] == 3
    assert len(pts) > 100
