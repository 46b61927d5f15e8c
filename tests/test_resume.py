"""Checkpoint/resume: a restarted run must continue the trajectory exactly."""

import os

import numpy as np
import pytest

from scythe_tpu import BC, GridParameters, ModelParameters, create_grid, integrate_model


def _model(tmp_path, T, outdir, options=()):
    gp = GridParameters(
        geometry="R",
        xmin=-50.0,
        xmax=50.0,
        num_cells=60,
        BCL={"u": BC.PERIODIC},
        BCR={"u": BC.PERIODIC},
        vars={"u": 1},
    )
    model = ModelParameters(
        ts=0.05,
        integration_time=T,
        output_interval=T / 2,
        equation_set="LinearAdvection1D",
        initial_conditions=str(tmp_path / "ics.csv"),
        output_dir=str(tmp_path / outdir),
        grid_params=gp,
        physical_params={"c_0": 1.0, "K": 0.05},
        options=dict(options),
    )
    if not os.path.exists(model.initial_conditions):
        grid = create_grid(gp)
        r = grid.r_mish
        with open(model.initial_conditions, "w") as f:
            f.write("r,u\n")
            for a, b in zip(r, np.exp(-((r / 15.0) ** 2))):
                f.write(f"{a},{b}\n")
    return model


def test_resume_matches_continuous(tmp_path):
    # continuous 20 s run
    full = _model(tmp_path, 20.0, "full")
    grid, phys_full = integrate_model(full, write_outputs=False)

    # first 10 s with a checkpoint at the end
    first = _model(tmp_path, 10.0, "first", options={"checkpoint_interval": 10.0})
    integrate_model(first)
    ckpt = os.path.join(first.output_dir, "checkpoint_10.0.npz")
    assert os.path.exists(ckpt)

    # resume for 10 more seconds
    second = _model(tmp_path, 10.0, "second")
    grid2, phys_resumed = integrate_model(
        second, write_outputs=True, resume_from=ckpt
    )

    np.testing.assert_allclose(phys_resumed, phys_full, rtol=0, atol=1e-14)
    # resumed run labels output with the absolute simulation time
    assert os.path.exists(os.path.join(second.output_dir, "physical_out_20.0.csv"))


@pytest.mark.parametrize("method", ["psum", "halo"])
def test_sharded_resume_matches_continuous(tmp_path, method):
    """Driver parity: a 4-shard run checkpointed and resumed (on either
    sharded-analysis path) continues the single-device trajectory exactly;
    checkpoints are layout-canonical so paths/devices interchange freely."""
    from scythe_tpu.parallel.sharding import integrate_sharded

    full = _model(tmp_path, 20.0, f"full_{method}")
    grid, phys_full = integrate_model(full, write_outputs=False)

    first = _model(
        tmp_path, 10.0, f"first_{method}", options={"checkpoint_interval": 10.0}
    )
    integrate_sharded(first, 4, method=method)
    ckpt = os.path.join(first.output_dir, "checkpoint_10.0.npz")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(first.output_dir, "scythe_out.log"))

    second = _model(tmp_path, 10.0, f"second_{method}")
    grid2, phys_resumed = integrate_sharded(
        second, 4, method=method, resume_from=ckpt
    )
    np.testing.assert_allclose(phys_resumed, phys_full, rtol=0, atol=1e-13)


def test_csv_restart_is_reference_compatible(tmp_path):
    """The reference's restart path: feed a physical_out CSV back in as
    initial conditions.  Approximate (multistep history is lost) but the
    fields must round-trip through the analysis filter to ~machine level."""
    m1 = _model(tmp_path, 5.0, "a")
    integrate_model(m1)
    out = os.path.join(m1.output_dir, "physical_out_5.0.csv")
    m2 = _model(tmp_path, 5.0, "b").with_(initial_conditions=out)
    grid, phys = integrate_model(m2, write_outputs=False)
    assert np.isfinite(phys).all()
