"""Linear advection walk-through (ref notebooks/LinearAdvection_example.ipynb).

Advect a Gaussian around a periodic 100 m domain for one full period and
report the L2 difference from the initial state ("should be small").
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from scythe_tpu import BC, GridParameters, ModelParameters, create_grid, integrate_model

    model = ModelParameters(
        ts=0.05,
        integration_time=100.0,
        output_interval=50.0,
        equation_set="LinearAdvection1D",
        initial_conditions="1d_linear_advection_test_ics.csv",
        output_dir="./linear_advection_test/",
        grid_params=GridParameters(
            geometry="R",
            xmin=-50.0,
            xmax=50.0,
            num_cells=100,
            BCL={"u": BC.PERIODIC},
            BCR={"u": BC.PERIODIC},
            vars={"u": 1},
        ),
        physical_params={"c_0": 1.0, "K": 0.0},
    )

    grid = create_grid(model.grid_params)
    pts = grid.gridpoints()
    sigma = 20.0
    u0 = np.exp(-((pts[:, 0] / sigma) ** 2))
    with open(model.initial_conditions, "w") as f:
        f.write("r,u\n")
        for r, u in zip(pts[:, 0], u0):
            f.write(f"{r},{u}\n")

    integrate_model(model)

    initial = np.loadtxt(
        "./linear_advection_test/physical_out_0.0.csv", delimiter=",", skiprows=1
    )
    final = np.loadtxt(
        "./linear_advection_test/physical_out_100.0.csv", delimiter=",", skiprows=1
    )
    l2 = float(np.sqrt(np.sum((initial[:, 1] - final[:, 1]) ** 2)))
    print(f"L2 norm of (initial - final): {l2:.3e}  (should be small)")


if __name__ == "__main__":
    main()
