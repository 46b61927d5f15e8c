"""Pinpoint the first non-finite step/variable/location of the flagship
f32 Twoway run (reuses the cached wave-2 ICs from flagship_stability.py)."""

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
    from scythe_tpu.model import build_context, build_step, initialize, make_scan
    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    ics = "/tmp/flagship_f32/SWslab_wave2.csv"
    model = ModelParameters(
        ts=3.0,
        integration_time=86400.0,
        output_interval=86400.0,
        equation_set="Twoway_ShallowWater_Slab",
        initial_conditions=ics,
        output_dir="/tmp/twoway_probe",
        grid_params=GRID,
        physical_params={**PHYSICS, "S1": 1.0e-5},
    )
    dtype = jnp.float32
    grid, ctx, state = initialize(model, dtype)
    step = build_step(model, grid, ctx, dtype)
    scan600 = make_scan(step, 600)
    scan10 = make_scan(step, 10)
    scan1 = make_scan(step, 1)
    names = list(model.grid_params.vars)

    def finite(st):
        return bool(np.isfinite(np.asarray(st.spec)).all())

    # coarse: 30-min chunks to the last finite chunk
    n = 0
    while True:
        nxt = scan600(state)
        if not finite(nxt):
            break
        state = nxt
        n += 600
        print(f"ok to step {n} (t={n*3/3600:.2f}h)", flush=True)
        if n > 28800:
            print("completed?!")
            return
    # medium: 10-step
    while True:
        nxt = scan10(state)
        if not finite(nxt):
            break
        state = nxt
        n += 10
    # fine: single steps
    while True:
        prev = state
        nxt = scan1(state)
        if not finite(nxt):
            break
        state = nxt
        n += 1
    print(f"first non-finite at step {n+1} (t={(n+1)*3/3600:.3f}h)")
    pf = np.asarray(grid.synthesis(prev.spec)["val"])
    fields = grid.synthesis(prev.spec)
    nx = np.asarray(grid.synthesis(nxt.spec)["val"])
    for v, nm in enumerate(names):
        bad = ~np.isfinite(nx[v])
        print(
            f"  {nm}: bad={bad.sum():6d}  prev_absmax={np.abs(pf[v]).max():.4e} "
            f"prev_min={pf[v].min():.4e}"
        )
        if bad.any():
            idx = np.argwhere(bad)
            r_idx = sorted(set(idx[:, 0]))
            print(f"    bad radial rows: {r_idx[:10]} of {nx.shape[1]}")
            i0 = tuple(idx[0])
            print(f"    first bad at {i0}; prev value {pf[v][i0]:.4e}")
    # expdot of the previous state
    from scythe_tpu.equations.common import get_equation_set

    eq = get_equation_set(model.equation_set)
    res = eq(fields, ctx)
    ed = np.asarray(res.expdot)
    for v, nm in enumerate(names):
        print(f"  expdot[{nm}]: absmax={np.abs(ed[v]).max():.4e} finite={np.isfinite(ed[v]).all()}")
    # where is the tendency extreme?
    v_ext = int(np.argmax([np.abs(ed[v]).max() for v in range(len(names))]))
    i = np.unravel_index(np.argmax(np.abs(ed[v_ext])), ed[v_ext].shape)
    print(f"  largest tendency: var {names[v_ext]} at {i}, r={grid.r_mish[i[0]]:.0f} m")
    for v, nm in enumerate(names):
        print(f"    {nm}[{i}] = {pf[v][i]:.5e}")


if __name__ == "__main__":
    main()
