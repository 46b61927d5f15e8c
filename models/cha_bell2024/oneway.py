"""24-hour one-way wavenumber-2 run
(ref models/cha_bell2024/Oneway_ShallowWater_Slab.jl)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from common import GRID, PHYSICS

from scythe_tpu import ModelParameters

model = ModelParameters(
    ts=3.0,
    integration_time=86400.0,
    output_interval=120.0,
    equation_set="Oneway_ShallowWater_Slab",
    initial_conditions="./Oneway_SWslab_wave2/SWslab_wave2.csv",
    output_dir="./Oneway_SWslab_wave2/",
    grid_params=GRID,
    physical_params=PHYSICS,
)
