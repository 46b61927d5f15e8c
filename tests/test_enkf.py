"""Ensemble-smoother twin experiment (examples/assimilate_enkf.py).

32 members to keep suite time bounded; gates well below the measured
64-member results (IC -47%, forecast -57%).
"""

import importlib.util
import os

import numpy as np
import pytest

_HERE = os.path.dirname(__file__)
_spec = importlib.util.spec_from_file_location(
    "enkf_example",
    os.path.join(_HERE, "..", "examples", "assimilate_enkf.py"),
)
enkf = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(enkf)


@pytest.fixture(scope="module")
def enkf_run():
    model, grid, sim, truth0, bg = enkf.build_case()
    xa = enkf.assimilate(grid, sim, bg, truth0, n_members=32)
    return sim, truth0, bg, xa


def test_enkf_reduces_ic_error(enkf_run):
    sim, truth0, bg, xa = enkf_run
    v = enkf.OBS_VAR
    e_bg = enkf.rms(bg[v], truth0[v])
    e_an = enkf.rms(xa[v], truth0[v])
    assert e_an < 0.8 * e_bg, (e_bg, e_an)


def test_enkf_improves_forecast(enkf_run):
    sim, truth0, bg, xa = enkf_run
    v = enkf.OBS_VAR
    fc_t = sim({}, truth0)
    e_bg = enkf.rms(sim({}, bg)[v], fc_t[v])
    e_an = enkf.rms(sim({}, xa)[v], fc_t[v])
    assert e_an < 0.7 * e_bg, (e_bg, e_an)
