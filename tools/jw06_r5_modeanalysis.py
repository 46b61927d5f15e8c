"""Post-mortem analysis of the JW06 equatorial surface killer mode.

Loads the last finite state dumped by jw06_r5_forensic.py and
characterizes the equatorial surface mode (u k~24, s/v k~7-28, z 0-1.5
km): meridional/vertical structure, per-ring spectra, the zonal-mean
absolute-vorticity profile (inertial-instability criterion f*eta_a<0),
and the static stability of the near-surface zonal mean.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import importlib.util

_spec = importlib.util.spec_from_file_location(
    "jw06_example",
    os.path.join(os.path.dirname(__file__), "..", "examples",
                 "jw06_baroclinic_slz.py"),
)
jw = importlib.util.module_from_spec(_spec)
sys.modules["jw06_example"] = jw
_spec.loader.exec_module(jw)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax.numpy as jnp

    from scythe_tpu import create_grid
    from scythe_tpu.model import build_context

    dump = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jw06_forensic_last.npz"
    spec = np.load(dump)["spec"]
    model = jw.build_model("/tmp/jw06_ma", num_cells=48, nl=96, zdim=24,
                           ts=15.0, t_end=86400.0, l_q=0.0)
    grid = create_grid(model.grid_params, jnp.float32)
    f = grid.synthesis(jnp.asarray(spec))
    phys = np.asarray(f["val"])
    sh = grid.spatial_shape
    lat = np.degrees(np.asarray(grid.r_mish))
    zkm = np.asarray(grid.z_mish) / 1e3
    names = ["s", "xi", "mu", "u", "v", "w"]

    print("== zonal-eddy RMS(lat) at z=0 (first 3 z-levels avg) ==")
    for vi, nm in enumerate(names):
        g = phys[vi].reshape(sh)
        ed = g - g.mean(axis=1, keepdims=True)
        rms = np.sqrt((ed[:, :, :3] ** 2).mean(axis=(1, 2)))
        j = int(np.argmax(rms))
        print(f"  {nm}: peak rms={rms[j]:.3e} at lat={lat[j]:.1f}; "
              f"profile [-10..10]: "
              + " ".join(f"{rms[i]:.1e}" for i in range(len(lat))
                         if abs(lat[i]) < 11))

    print("== vertical profile of u-eddy rms at the peak latitude ==")
    u = phys[3].reshape(sh)
    ued = u - u.mean(axis=1, keepdims=True)
    rms_lat = np.sqrt((ued[:, :, :3] ** 2).mean(axis=(1, 2)))
    j = int(np.argmax(rms_lat))
    prof = np.sqrt((ued[j] ** 2).mean(axis=0))
    print("  lat", lat[j], ":",
          " ".join(f"z{zkm[k]:.1f}:{prof[k]:.1e}" for k in range(len(zkm))))

    print("== u-eddy zonal spectrum at peak (lat, z=0) ==")
    ring = ued[j, :, 0]
    sp = np.abs(np.fft.rfft(ring)) / len(ring)
    top = np.argsort(sp)[::-1][:8]
    print("  ", [(int(k), float(f"{sp[k]:.2e}")) for k in top])

    print("== neighbor rings' u-eddy k-spectra (z=0) ==")
    for dj in (-2, -1, 0, 1, 2):
        ring = ued[j + dj, :, 0]
        sp = np.abs(np.fft.rfft(ring)) / len(ring)
        top = np.argsort(sp)[::-1][:3]
        print(f"  lat {lat[j+dj]:6.1f}: "
              + str([(int(k), float(f"{sp[k]:.2e}")) for k in top]))

    print("== zonal-mean inertial stability f*eta_a near the surface ==")
    a = 6.371e6
    Om = 7.292e-5
    phi = np.radians(lat)
    fcor = 2 * Om * np.sin(phi)
    uzm = u.mean(axis=1)  # [lat, z]
    # absolute vorticity of the zonal mean: eta = f - d(u cos)/dy /cos
    cos = np.cos(phi)
    dudy = np.gradient(uzm * cos[:, None], a * phi, axis=0) / cos[:, None]
    eta = fcor[:, None] - dudy
    crit = fcor[:, None] * eta
    band = np.abs(lat) < 15
    kz = 0
    print("   lat      u_zm    f*eta (z=0)  [<0 = inertially unstable]")
    for i in np.where(band)[0]:
        flag = " <-- UNSTABLE" if crit[i, kz] < 0 else ""
        print(f"  {lat[i]:6.1f} {uzm[i, kz]:8.2f}  {crit[i, kz]:.3e}{flag}")

    print("== zonal-mean ds/dz (static stability proxy) at equator ==")
    s = phys[0].reshape(sh)
    szm = s.mean(axis=1)
    jeq = int(np.argmin(np.abs(lat)))
    dsdz = np.gradient(szm[jeq], np.asarray(grid.z_mish))
    print("  ", " ".join(f"z{zkm[k]:.1f}:{dsdz[k]:+.2e}"
                         for k in range(min(8, len(zkm)))))
    # compare with t=0 balanced base
    cache = "/tmp/jw06_bal_c48_z24.npz"
    if os.path.exists(cache):
        bal = np.load(cache)["bal"]
        dsdz0 = np.gradient(bal[0, jeq], np.asarray(grid.z_mish))
        print("  t=0:",
              " ".join(f"z{zkm[k]:.1f}:{dsdz0[k]:+.2e}"
                       for k in range(min(8, len(zkm)))))
        du = uzm - bal[3]
        print("== zonal-mean u drift from balanced base (equator band) ==")
        for i in np.where(np.abs(lat) < 15)[0]:
            print(f"  lat {lat[i]:6.1f}: "
                  + " ".join(f"{du[i, k]:+6.2f}" for k in range(0, 12, 2)))


if __name__ == "__main__":
    main()
