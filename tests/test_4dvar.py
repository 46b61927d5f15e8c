"""4D-Var twin experiment through the differentiable core (the adjoint's
production use-case; examples/assimilate_4dvar.py).

Reduced iteration count to keep suite time bounded; gates calibrated
well below the measured full-run results (350 iters: IC -73%, forecast
-79%; 150 iters lands around IC -50%).
"""

import importlib.util
import os

import numpy as np
import pytest

_HERE = os.path.dirname(__file__)
_spec = importlib.util.spec_from_file_location(
    "fourdvar_example",
    os.path.join(_HERE, "..", "examples", "assimilate_4dvar.py"),
)
fdv = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(fdv)


@pytest.fixture(scope="module")
def fourdvar_run():
    model, grid, sims, truth0, bg = fdv.build_case()
    obs = fdv.synthesize_obs(sims, truth0)
    x0, J = fdv.assimilate(grid, sims, bg, obs, iters=150)
    return grid, sims, truth0, bg, x0


def test_4dvar_reduces_ic_error(fourdvar_run):
    grid, sims, truth0, bg, x0 = fourdvar_run
    v = fdv.OBS_VAR
    e_bg = fdv.rms(bg[v], truth0[v])
    e_an = fdv.rms(x0[v], truth0[v])
    assert e_an < 0.65 * e_bg, (e_bg, e_an)


def test_4dvar_improves_forecast(fourdvar_run):
    grid, sims, truth0, bg, x0 = fourdvar_run
    v = fdv.OBS_VAR
    n = fdv.OBS_STEPS[-1]
    fc_tr = sims[n]({}, truth0)
    e_bg = fdv.rms(sims[n]({}, bg)[v], fc_tr[v])
    e_an = fdv.rms(sims[n]({}, x0)[v], fc_tr[v])
    assert e_an < 0.6 * e_bg, (e_bg, e_an)


def test_4dvar_recovers_wave2_asymmetry(fourdvar_run):
    """The background has exactly zero wavenumber-2 power; the analysis
    must restore it to the right order from the sparse wind obs."""
    grid, sims, truth0, bg, x0 = fourdvar_run
    v = fdv.OBS_VAR
    p_tr = fdv.wave2_power(truth0[v])
    assert fdv.wave2_power(bg[v]) == 0.0
    p_an = fdv.wave2_power(x0[v])
    assert 0.5 * p_tr < p_an < 2.0 * p_tr, (p_tr, p_an)


def test_4dvar_leaves_unobserved_fields_sane(fourdvar_run):
    """No large spurious increments in the unobserved slab-BL winds."""
    grid, sims, truth0, bg, x0 = fourdvar_run
    e_bg = fdv.rms(bg[4], truth0[4])
    e_an = fdv.rms(x0[4], truth0[4])
    assert e_an < 1.2 * e_bg, (e_bg, e_an)
