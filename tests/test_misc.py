"""Legacy readers, visualization, profiling utils, CLI parsing."""

import numpy as np

from goicp_tpu.io.legacy import read_config_mol_file, read_pcd_file
from goicp_tpu.pipeline.visualize import plot_registration
from goicp_tpu.utils.profiling import PhaseTimers


def test_read_config_mol_file(ref_dir):
    cavities = read_config_mol_file(
        f"{ref_dir}/cavities_similar_BO1_clean.tsv")
    assert cavities[0] == "2x86_3_cavity6.mol2"
    assert cavities[1] == "1eq2_6_cavity6.mol2"
    assert len(cavities) == 2 * 383


def test_read_pcd_file(tmp_path):
    p = tmp_path / "x.pcd"
    header = "\n".join(f"h{i}" for i in range(10))
    p.write_text(header + "\n1.0 2.0 3.0 7\n4.0 5.0 6.0 8\n")
    coords, props = read_pcd_file(str(p))
    np.testing.assert_allclose(coords, [[1, 2, 3], [4, 5, 6]])
    np.testing.assert_array_equal(props, [7, 8])


def test_plot_registration(tmp_path):
    rng = np.random.default_rng(0)
    model = rng.normal(size=(50, 3))
    data = rng.normal(size=(40, 3))
    out = str(tmp_path / "reg.png")
    ok = plot_registration(model, data, np.eye(3), np.zeros(3), out)
    if ok:
        import os
        assert os.path.getsize(out) > 1000


def test_phase_timers():
    t = PhaseTimers()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["calls"] == 2


def test_cli_help():
    import pytest
    from goicp_tpu.cli import main
    with pytest.raises(SystemExit):
        main(["--help"])
