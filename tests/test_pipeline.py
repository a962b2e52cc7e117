"""End-to-end pipeline: sweep over the locally-available BO1 pairs with
RMSD evaluation, output files, resume behavior."""

import dataclasses
import json
import os

import numpy as np
import pytest

from goicp_tpu.config import GoICPConfig
from goicp_tpu.io.output import read_output
from goicp_tpu.pipeline.sweep import run_sweep

pytestmark = pytest.mark.slow


def test_sweep_two_pairs_with_rmsd(ref_dir, tmp_path):
    cfg = GoICPConfig.from_file(f"{ref_dir}/config.txt")
    cfg = dataclasses.replace(cfg, rot_batch=16)
    out_dir = str(tmp_path / "bo1")
    results = run_sweep(ref_dir, cfg, out_dir, kind="similar", limit=2)
    assert len(results) == 2

    # pair 1: 2x86_3 -> 1eq2_6 (golden error 8.45388, comp 133)
    r1 = results[0]
    assert r1["source"] == "2x86_3" and r1["target"] == "1eq2_6"
    assert abs(r1["error"] - 8.45388) < cfg.MSEThresh * 238
    assert r1["compatibilities"] == 133
    assert r1["rmsd"] is not None and r1["rmsd"] < 2.5
    assert r1["converged"]

    # pair 2: 2ktd_1 -> 4imo_2
    r2 = results[1]
    assert r2["source"] == "2ktd_1" and r2["target"] == "4imo_2"
    assert r2["converged"]
    assert r2["rmsd"] is not None
    # quality parity vs the reference's own checked-in pair-2 artifact
    # (rot/rot_2ktd_1_protein.mol2 scores RMSD 13.93 against the structural
    # alignment; our search finds a tighter optimum, RMSD ~13.39)
    from goicp_tpu.geom.rmsd import rmsd
    from goicp_tpu.io.mol2 import get_atom_block
    ref_rmsd = rmsd(
        get_atom_block(f"{ref_dir}/ref_proteins/2ktd_1.4imo_2/"
                       "aligned_2ktd_1_protein.mol2"),
        get_atom_block(f"{ref_dir}/rot/rot_2ktd_1_protein.mol2"))
    assert r2["rmsd"] <= ref_rmsd + 0.5

    # output files exist and parse
    out1 = read_output(os.path.join(out_dir, "output", "similar1.txt"))
    assert out1["error"] == pytest.approx(r1["error"], rel=1e-4)
    assert os.path.exists(os.path.join(out_dir, "output",
                                       "similar1_rescaled.txt"))
    assert os.path.exists(os.path.join(out_dir, "resultsRMSD.txt"))
    with open(os.path.join(out_dir, "results_similar.jsonl")) as fh:
        rows = [json.loads(l) for l in fh]
    assert len(rows) == 2

    # resume: re-running skips completed pairs
    again = run_sweep(ref_dir, cfg, out_dir, kind="similar", limit=2)
    assert again == []
