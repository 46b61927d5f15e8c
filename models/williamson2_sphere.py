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
    """ICs from the validated example's w2_fields (single source of the
    balance formula)."""
    import importlib.util
    import os

    from scythe_tpu import create_grid

    spec = importlib.util.spec_from_file_location(
        "williamson_example",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "williamson_sphere.py"),
    )
    wm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wm)
    grid = create_grid(model.grid_params)
    pts = grid.gridpoints()
    h, u, v = wm.w2_fields(pts[:, 0])
    with open(path or model.initial_conditions, "w") as f:
        f.write("lat,lon,h,u,v\n")
        for i in range(len(h)):
            f.write(f"{pts[i,0]},{pts[i,1]},{h[i]},{u[i]},{v[i]}\n")
