"""Demo config: full 3-D cylindrical moist core (MoistEulerRLZ).

Needs a sounding file and ICs; see tests/test_rlz_tcbl.py::test_moist_euler_rlz
for a complete programmatic setup.
"""

from scythe_tpu import BC, GridParameters, ModelParameters

model = ModelParameters(
    ts=0.25,
    integration_time=600.0,
    output_interval=60.0,
    equation_set="MoistEulerRLZ",
    initial_conditions="./moist_rlz/ics.csv",
    output_dir="./moist_rlz/",
    ref_state_file="./moist_rlz/sounding.txt",
    grid_params=GridParameters(
        geometry="RLZ",
        xmin=0.0,
        xmax=20000.0,
        num_cells=16,
        lDim=32,
        zmin=0.0,
        zmax=10000.0,
        zDim=40,
        BCL={"u": BC.R1T0, "v": BC.R1T0, "w": BC.R1T1},
        BCR={"u": BC.R1T0, "v": BC.R0},
        vars={
            "s": 1, "xi": 2, "mu": 3, "u": 4, "v": 5, "w": 6,
            "mu_c": 7, "mu_r": 8, "qss": 9,
        },
    ),
    physical_params={"K": 10.0, "f": 5.0e-5},
    options={"semiimplicit": True},
)
