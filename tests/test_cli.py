"""CLI launcher end-to-end (subprocess), single and multi-device."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


def _write_config(tmp_path, devices_note=""):
    cfg = tmp_path / "model.py"
    cfg.write_text(
        f"""
from scythe_tpu import BC, GridParameters, ModelParameters

model = ModelParameters(
    ts=0.05, integration_time=10.0, output_interval=10.0,
    equation_set="LinearAdvection1D",
    initial_conditions=r"{tmp_path}/ics.csv",
    output_dir=r"{tmp_path}/out{devices_note}/",
    grid_params=GridParameters(
        geometry="R", xmin=-50.0, xmax=50.0, num_cells=64,
        BCL={{"u": BC.PERIODIC}}, BCR={{"u": BC.PERIODIC}}, vars={{"u": 1}}),
    physical_params={{"c_0": 1.0, "K": 0.0}})
"""
    )
    x = np.linspace(-50, 50, 192, endpoint=False) + 50.0 / 192
    # exact mish points differ; generate via the grid for correctness
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    gen = subprocess.run(
        [
            sys.executable,
            "-c",
            "import os,sys; os.environ['JAX_PLATFORMS']='cpu'; sys.path.insert(0, r'%s');"
            "import jax; jax.config.update('jax_platforms','cpu');"
            "import numpy as np; from scythe_tpu import create_grid, GridParameters, BC;"
            "g=create_grid(GridParameters(geometry='R',xmin=-50.,xmax=50.,num_cells=64,"
            "BCL={'u':BC.PERIODIC},BCR={'u':BC.PERIODIC},vars={'u':1}));"
            "r=g.r_mish; open(r'%s/ics.csv','w').write('r,u\\n'+'\\n'.join("
            "f'{a},{b}' for a,b in zip(r, np.exp(-(r/15.)**2))))" % (REPO, tmp_path),
        ],
        env=env,
        capture_output=True,
        text=True,
    )
    assert gen.returncode == 0, gen.stderr[-500:]
    return cfg


@pytest.mark.parametrize("devices", [1, 4])
def test_cli_run(tmp_path, devices, extra=(), note=None):
    note = str(devices) if note is None else note
    cfg = _write_config(tmp_path, devices_note=note)
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "run_scythe.py"),
            "--platform",
            "cpu",
            "--dtype",
            "f64",
            "-d",
            str(devices),
            *extra,
            str(cfg),
        ],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-800:]
    out = tmp_path / f"out{note}" / "physical_out_10.0.csv"
    assert out.exists()
    data = np.loadtxt(out, delimiter=",", skiprows=1)
    assert np.isfinite(data).all()


def test_cli_runs_agree_across_device_counts(tmp_path):
    test_cli_run(tmp_path, 1)
    test_cli_run(tmp_path, 4)
    test_cli_run(tmp_path, 4, extra=["--shard-method", "halo"], note="4halo")
    a = np.loadtxt(tmp_path / "out1" / "physical_out_10.0.csv", delimiter=",", skiprows=1)
    b = np.loadtxt(tmp_path / "out4" / "physical_out_10.0.csv", delimiter=",", skiprows=1)
    c = np.loadtxt(
        tmp_path / "out4halo" / "physical_out_10.0.csv", delimiter=",", skiprows=1
    )
    np.testing.assert_allclose(a, b, atol=1e-12)
    np.testing.assert_allclose(a, c, atol=1e-12)
