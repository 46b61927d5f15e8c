"""3-D convective shower in the Cartesian XYZ box (MoistEulerXYZ).

A warm MOIST thermal in a conditionally unstable, sheared,
fully-periodic-horizontal environment grows a cloud, rains out (active
sedimentation: the rain actually falls and exits through the floor), and
deepens a second cell — the warm-rain convective cycle on the
geometry/equation-set pair this framework adds beyond the reference.

Configuration notes (each the result of a measured failure mode,
docs/RESULTS.md "Active rain sedimentation" and "Warm-rain stability
envelope"):
* ``options['sedimentation'] = 'active'`` — with the reference's
  always-zero quirk, rain accumulates without bound and long moist runs
  blow up;
* the sounding is capped sub-saturated aloft (a supersaturated
  stratosphere drives runaway condensation at the model top);
* PERIODIC x: with closed walls, the low-level mean flow piles moisture
  against the upstream boundary until spurious wall convection blows up
  (measured at t ~ 2500 s);
* the thermal carries a +30% moisture excess — a dry thermal in this
  environment makes only a thin transient cloud;
* vertical BCs per variable follow the wall-flux physics: insulated
  (R1T1) tops/bottoms for every K-diffused scalar EXCEPT the rain bottom,
  which must stay unconstrained (R0) so surface rain can form a boundary
  max and drain out; each wrong combination produced a measured
  exponential boundary runaway (docs/RESULTS.md);
* the default 45-minute window covers the first shower raining out and
  the secondary DEEP convection it triggers (w to +-15 m/s by ~56 min);
  with the default (reference-matching) prognostic-qss condensation the
  measured stability envelope at this 1.25 km resolution ends in the
  mature extreme cell around t ~ 3200-3600 s;
* for LONG convection-resolving runs, add
  ``options['condensation'] = 'diagnostic'`` (rate-capped saturation
  adjustment) AND ``options['modal_filter_tau'] = 30.0`` — the measured
  stable pair (a 6 h / 86,400-step run completes with no growth;
  docs/RESULTS.md "Diagnostic condensation closes the grid-storm
  envelope"; probe: tools/shower_envelope.py);
* ts respects the horizontal acoustic CFL (min mish gap 0.2254*dx).

Usage:
    python examples/convective_shower_xyz.py [--cpu] [--time 2700]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VARS = {
    "s": 1, "xi": 2, "mu": 3, "u": 4, "v": 5, "w": 6,
    "mu_c": 7, "mu_r": 8, "qss": 9,
}


def build_model(out_dir, num_cells=48, ny=16, nz=32, ts=0.25, t_end=2700.0):
    from scythe_tpu import BC, ZBC, GridParameters, ModelParameters

    os.makedirs(out_dir, exist_ok=True)
    # conditionally unstable tropical-ish sounding: Weisman-Klemp theta
    # profile, moist boundary layer, DRY above 9 km (sub-saturated
    # everywhere -- mandatory, see module docstring)
    zs = np.linspace(0.0, 18000.0, 80)
    ztr, thtr, ttr = 12000.0, 343.0, 213.0
    theta = np.where(
        zs <= ztr,
        300.0 + 43.0 * (zs / ztr) ** 1.25,
        thtr * np.exp(9.81 / (1004.0 * ttr) * (zs - ztr)),
    )
    qv = np.where(zs <= 1200.0, 13.0, 13.0 * np.exp(-(zs - 1200.0) / 2200.0))
    qv = np.where(zs > 9000.0, 0.02, qv)
    sounding = os.path.join(out_dir, "sounding.txt")
    with open(sounding, "w") as f:
        f.write(f"1000.0 {theta[0]} {qv[0]}\n")
        for z, th, q in zip(zs[1:], theta[1:], qv[1:]):
            f.write(f"{z} {th} {q}\n")

    gp = GridParameters(
        geometry="XYZ",
        xmin=-30000.0,
        xmax=30000.0,
        num_cells=num_cells,
        lDim=ny,
        ymin=0.0,
        ymax=20000.0,
        zmin=0.0,
        zmax=15000.0,
        zDim=nz,
        BCL={n: BC.PERIODIC for n in VARS},
        BCR={n: BC.PERIODIC for n in VARS},
        # Diffused scalars need the insulated (R1T1) fit at walls they
        # cannot flux through -- an unconstrained (R0) boundary under
        # K*dzz pumps spuriously (the Straka finding); leaving mu_c/mu_r
        # at R0 at the TOP produced an exponential cloud-water runaway
        # there (docs/RESULTS.md).  Their BOTTOM stays R0: surface rain
        # must form a boundary max and drain (an insulated bottom fit of
        # the rain spike rings and blows up -- measured both ways).
        BCB={"s": ZBC.R1T1, "u": ZBC.R1T1, "v": ZBC.R1T1, "mu": ZBC.R1T1,
             "mu_c": ZBC.R1T1, "w": ZBC.R1T0},
        BCT={"s": ZBC.R1T1, "u": ZBC.R1T1, "v": ZBC.R1T1, "mu": ZBC.R1T1,
             "mu_c": ZBC.R1T1, "mu_r": ZBC.R1T1, "w": ZBC.R1T0},
        vars=VARS,
    )
    return ModelParameters(
        ts=ts,
        integration_time=t_end,
        output_interval=t_end / 6.0,
        equation_set="MoistEulerXYZ",
        initial_conditions=os.path.join(out_dir, "ics.csv"),
        output_dir=out_dir,
        ref_state_file=sounding,
        grid_params=gp,
        physical_params={"K": 50.0},
        options={"semiimplicit": True, "sedimentation": "active"},
    )


def write_ics(model, grid, ref_state):
    """Warm (+~3 K), moist (+30% qv) thermal with a y modulation, plus
    low-level shear."""
    import jax.numpy as jnp

    from scythe_tpu.physics import thermodynamics as td

    pts = grid.gridpoints()
    x = pts[:, 0].reshape(grid.spatial_shape)
    y = pts[:, 1].reshape(grid.spatial_shape)
    z = pts[:, 2].reshape(grid.spatial_shape)
    ly = float(model.grid_params.ymax - model.grid_params.ymin)
    rad = np.sqrt((x / 10000.0) ** 2 + ((z - 1400.0) / 1400.0) ** 2)
    shape = (
        np.maximum(0.0, np.cos(np.pi * np.minimum(rad, 1.0) / 2.0)) ** 2
        * (1.0 + 0.15 * np.cos(2.0 * np.pi * y / ly))
    )
    s_pert = 10.0 * shape
    qv_bar = np.asarray(td.ahyp(ref_state.mubar[None, None, :, 0])) * np.ones_like(z)
    mu_pert = np.asarray(
        td.bhyp(jnp.asarray(qv_bar * (1.0 + 0.30 * shape)))
    ) - np.asarray(ref_state.mubar[None, None, :, 0])
    u0 = np.where(z <= 3000.0, -10.0 * (1.0 - z / 3000.0), 0.0)
    names = list(model.grid_params.vars)
    with open(model.initial_conditions, "w") as f:
        f.write("x,y,z," + ",".join(names) + "\n")
        for xv, yv, zv, sv, mv, uv in zip(
            x.ravel(), y.ravel(), z.ravel(), s_pert.ravel(),
            mu_pert.ravel(), u0.ravel()
        ):
            vals = {"s": sv, "mu": mv, "u": uv}
            f.write(
                f"{xv},{yv},{zv},"
                + ",".join(str(vals.get(n, 0.0)) for n in names)
                + "\n"
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--time", type=float, default=2700.0)
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    from scythe_tpu import create_grid, integrate_model
    from scythe_tpu.model import default_dtype
    from scythe_tpu.physics import thermodynamics as td
    import jax.numpy as jnp

    from scythe_tpu.model import build_context

    model = build_model("./convective_shower_out", t_end=args.time)
    grid = create_grid(model.grid_params, default_dtype())
    ctx = build_context(model, grid, default_dtype())
    write_ics(model, grid, ctx.ref_state)
    grid, phys = integrate_model(model)
    vi = model.grid_params.var_index
    qc = np.asarray(td.ahyp(jnp.asarray(phys[vi("mu_c")])))
    qr = np.asarray(td.ahyp(jnp.asarray(phys[vi("mu_r")])))
    w = phys[vi("w")]
    print(
        f"t = {args.time:.0f} s: w in ({w.min():.1f}, {w.max():.1f}) m/s, "
        f"cloud water max {qc.max()*1e3:.2f} g/kg, rain max "
        f"{qr.max()*1e3:.2f} g/kg (surface {qr[:, :, :4].max()*1e3:.2f})"
    )


if __name__ == "__main__":
    main()
