"""Find the ONSET of the flagship f32 blow-up: step where |ub| or |vb|
first exceeds a physical threshold, and the radial/azimuthal structure of
the growing mode at that moment."""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "models", "cha_bell2024"))


def main():
    import jax
    import jax.numpy as jnp

    from common import GRID, PHYSICS
    from scythe_tpu import ModelParameters
    from scythe_tpu.model import build_step, initialize, make_scan
    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    model = ModelParameters(
        ts=3.0,
        integration_time=86400.0,
        output_interval=86400.0,
        equation_set="Twoway_ShallowWater_Slab",
        initial_conditions="/tmp/flagship_f32/SWslab_wave2.csv",
        output_dir="/tmp/twoway_probe",
        grid_params=GRID,
        physical_params={**PHYSICS, "S1": 1.0e-5},
    )
    dtype = jnp.float32
    grid, ctx, state = initialize(model, dtype)
    step = build_step(model, grid, ctx, dtype)
    scan100 = make_scan(step, 100)
    names = list(model.grid_params.vars)

    def vbmax(st):
        return float(np.abs(np.asarray(grid.synthesis(st.spec)["val"][4])).max())

    n = 0
    thresholds = [150.0, 300.0, 1000.0, 1e5]
    ti = 0
    while n < 28800:
        nxt = scan100(state)
        m = vbmax(nxt)
        n += 100
        if ti < len(thresholds) and m > thresholds[ti]:
            phys = np.asarray(grid.synthesis(nxt.spec)["val"])
            print(f"\n=== step {n} (t={n*3/3600:.2f}h): |vb|max={m:.1f} ===")
            vb = phys[4]
            prof = np.abs(vb).max(axis=1)  # max over azimuth per radius
            top = np.argsort(prof)[-6:][::-1]
            for i in top:
                # dominant azimuthal wavenumber at that radius
                sp = np.abs(np.fft.rfft(vb[i]))
                k = int(np.argmax(sp[1:]) + 1)
                print(
                    f"  r={grid.r_mish[i]/1000:7.1f} km |vb|={prof[i]:9.2f} "
                    f"dominant k={k} (sp[k]/sp[0]={sp[k]/(sp[0]+1e-9):.2f}) "
                    f"h_min_ring={phys[0][i].min():9.1f}"
                )
            hm = np.abs(phys[0]).max(axis=1)
            print(f"  |h| profile peaks at r={grid.r_mish[int(np.argmax(hm))]/1000:.1f} km")
            ti += 1
            if ti >= len(thresholds):
                break
        state = nxt
        if not np.isfinite(m):
            print(f"NaN at step {n}")
            break
        if n % 2400 == 0:
            print(f"step {n} (t={n*3/3600:.1f}h) |vb|max={m:.1f}", flush=True)


if __name__ == "__main__":
    main()
