"""Williamson case 2 (steady geostrophic flow) on the SL sphere as an
executable model config for the CLI (`run_scythe.py models/
williamson2_sphere.py`), with ICs in the reference CSV schema.

Generate the ICs first:
    python -c "import models.williamson2_sphere as m; m.write_ics()"
"""

import numpy as np

from scythe_tpu import GridParameters, ModelParameters

A_EARTH = 6.37122e6
OMEGA = 7.292e-5
G = 9.80616

model = ModelParameters(
    ts=300.0,
    integration_time=86400.0,
    output_interval=43200.0,
    equation_set="ShallowWaterSphere",
    initial_conditions="williamson2_ics.csv",
    output_dir="./williamson2_out/",
    grid_params=GridParameters(
        geometry="SL",
        xmin=-np.pi / 2,
        xmax=np.pi / 2,
        num_cells=32,
        lDim=96,
        sphere_radius=A_EARTH,
        vars={"h": 1, "u": 2, "v": 3},
    ),
    physical_params={"g": G, "Omega": OMEGA, "K": 0.0},
)


def write_ics(path=None):
    from scythe_tpu import create_grid

    grid = create_grid(model.grid_params)
    pts = grid.gridpoints()
    phi = pts[:, 0]
    u0 = 2.0 * np.pi * A_EARTH / (12.0 * 86400.0)
    h = (2.94e4 - (A_EARTH * OMEGA * u0 + u0**2 / 2.0) * np.sin(phi) ** 2) / G
    u = u0 * np.cos(phi)
    with open(path or model.initial_conditions, "w") as f:
        f.write("lat,lon,h,u,v\n")
        for i in range(len(phi)):
            f.write(f"{pts[i,0]},{pts[i,1]},{h[i]},{u[i]},0.0\n")
