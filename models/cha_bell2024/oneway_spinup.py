"""3-hour symmetric spinup of the one-way model
(ref models/cha_bell2024/Oneway_ShallowWater_Slab_spinup.jl)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from common import GRID, PHYSICS

from scythe_tpu import ModelParameters

model = ModelParameters(
    ts=3.0,
    integration_time=10800.0,
    output_interval=3600.0,
    equation_set="Oneway_ShallowWater_Slab",
    initial_conditions="./Oneway_SWslab_spinup/SWslab_OnewayRankine.csv",
    output_dir="./Oneway_SWslab_spinup/",
    grid_params=GRID,
    physical_params={**PHYSICS, "K": 3000.0},
)
