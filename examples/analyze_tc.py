"""Analyze a two-layer TC run directory: intensity timeseries and azimuthal
wavenumber decomposition of the vorticity field.

Usage:  python examples/analyze_tc.py <run_dir> [--model models/cha_bell2024/twoway.py]

Prints a per-output-time table (Vmax free layer / BL, minimum h, RMW) and
the final-state azimuthal vorticity power spectrum — the quantities the
Cha & Bell (2024) analysis is built on.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", nargs="?", default="-")
    ap.add_argument("--model", default=None, help="model config file (for the grid)")
    ap.add_argument("--empi-sounding", default=None,
                    help="sounding file (z theta qv; first line surface "
                    "pressure): print the Emanuel potential intensity of "
                    "that environment and the simulated overshoot vs "
                    "--vmax (diagnostics.emanuel_potential_intensity)")
    ap.add_argument("--sst", type=float, default=301.15,
                    help="sea-surface temperature [K] for --empi-sounding")
    ap.add_argument("--vmax", type=float, default=None,
                    help="simulated peak intensity [m/s] to compare "
                    "against E-MPI (e.g. 78 for the round-4 mature run)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import scythe_tpu.io as sio
    from scythe_tpu import create_grid, diagnostics as dg

    if args.empi_sounding:
        # E-MPI of the run's environment, via the framework's own
        # reference-state builder (hydrostatic theta->T inversion) and
        # thermodynamics
        from scythe_tpu.physics import reference_state as rsmod
        from scythe_tpu.physics import thermodynamics as td

        rs = rsmod.interpolate_reference_file(
            args.empi_sounding, 0.0, 20.0e3, 48, 33, jnp.float64
        )
        q_v, rho_d, Tk, phPa = (np.asarray(a) for a in td.thermodynamic_tuple(
            np.asarray(rs.sbar[:, 0]), np.asarray(rs.xibar[:, 0]),
            np.asarray(rs.mubar[:, 0])))
        vmpi, To, dk = dg.emanuel_potential_intensity(
            Tk, phPa, q_v, args.sst
        )
        print(f"E-MPI of {args.empi_sounding} at SST {args.sst:.2f} K: "
              f"{vmpi:.1f} m/s  (outflow T {To:.1f} K, "
              f"air-sea disequilibrium {dk:.0f} J/kg)")
        if args.vmax is not None:
            print(f"simulated Vmax {args.vmax:.1f} m/s = "
                  f"{args.vmax / vmpi:.2f}x E-MPI "
                  "(axisymmetric superintensity up to ~1.5x is the "
                  "known regime: Persing & Montgomery 2003)")
        if not args.run_dir or args.run_dir == "-":
            return

    if args.model:
        import runpy

        model = runpy.run_path(args.model)["model"]
        gp = model.grid_params
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "models", "cha_bell2024"))
        from common import GRID as gp  # type: ignore

    grid = create_grid(gp, jnp.float64)
    files = sorted(
        glob.glob(os.path.join(args.run_dir, "physical_out_*.csv"))
        + glob.glob(os.path.join(args.run_dir, "physical_out_*.nc")),
        key=lambda p: float(re.search(r"physical_out_(.*)\.(?:csv|nc)", p).group(1)),
    )
    if not files:
        sys.exit(f"no physical_out_*.csv or .nc in {args.run_dir}")

    vi = gp.var_index
    r1d = grid.r_mish
    print(f"{'t[s]':>10} {'Vmax(free)':>11} {'Vmax(BL)':>9} {'h_min':>8} {'RMW[km]':>8}")
    for path in files:
        t = float(re.search(r"physical_out_(.*)\.(?:csv|nc)", path).group(1))
        phys = sio.read_physical_grid(path, grid)
        v = phys[vi("v")]
        vb = phys[vi("vb")]
        h = phys[vi("h")]
        vbar = v.mean(axis=1)  # azimuthal mean
        rmw = r1d[int(np.argmax(vbar))] / 1000.0
        print(f"{t:>10.0f} {v.max():>11.2f} {vb.max():>9.2f} {h.min():>8.1f} {rmw:>8.1f}")

    phys = sio.read_physical_grid(files[-1], grid)
    fields = grid.synthesis(grid.analysis(jnp.asarray(phys)))
    zeta = np.asarray(
        dg.relative_vorticity(fields, grid.coords()["r"], vi("u"), vi("v"))
    )
    power = np.abs(np.fft.rfft(zeta, axis=1)).mean(axis=0)
    rel = power[:6] / (power[0] + 1e-30)
    print("\nfinal azimuthal vorticity power (rel to k=0):")
    for k, p in enumerate(rel):
        print(f"  k={k}: {p:.4f}")


if __name__ == "__main__":
    main()
