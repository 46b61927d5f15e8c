"""Probe: Mosaic ELEMENTWISE codegen vs XLA fusion on a moist-tendency
proxy (adv + diffusion + a transcendental garnish over [9, 144, 64x48]
tensors -- the shape of the MoistEulerRLZ tendency stage).

Measured (v5e, slope-timed, one session): XLA 176.7 us vs Pallas
324.0 us -- Mosaic loses ~1.8x on pure elementwise work too (matching
its measured GEMM gap, docs/RESULTS.md).  A single-pass Pallas port of
the full tendency would start from that per-pass handicap against XLA's
~3 fused passes, i.e. break-even at best: the "moist tendency fusion"
roadmap item is closed as a measured negative on this runtime.
"""

import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from scythe_tpu.utils.runtime import enable_compile_cache
enable_compile_cache()
from profile_moist3d import chain_time

V, R, L, Z = 9, 144, 64, 48
LZ = L * Z  # 3072 lanes
K = 10.0
rng = np.random.default_rng(0)
mk = lambda: jnp.asarray(rng.normal(size=(V, R, LZ)).astype(np.float32))
val, dr, drr, dl, dll, dz, dzz = (mk() for _ in range(7))
rinv = jnp.asarray((1.0 / np.linspace(100.0, 20000.0, R)).astype(np.float32))[None, :, None]

def expr(val, dr, drr, dl, dll, dz, dzz, rinv):
    u, v, w = val[3:4], val[4:5], val[5:6]
    adv = -u * dr - (v * rinv) * dl - w * dz
    lap = K * (drr + dr * rinv + dll * (rinv * rinv) + dzz)
    thermo = jnp.exp(val * 0.01) * jnp.log1p(val * val)
    return adv + lap + thermo

xla = jax.jit(expr)
ref = xla(val, dr, drr, dl, dll, dz, dzz, rinv)

BR = 8
def kernel(val_ref, dr_ref, drr_ref, dl_ref, dll_ref, dz_ref, dzz_ref, rinv_ref, o_ref):
    o_ref[...] = expr(val_ref[...], dr_ref[...], drr_ref[...], dl_ref[...],
                      dll_ref[...], dz_ref[...], dzz_ref[...], rinv_ref[...])

BL = 1536
spec = pl.BlockSpec((V, BR, BL), lambda i, j: (0, i, j))
rspec = pl.BlockSpec((1, BR, BL), lambda i, j: (0, i, j))
pk = pl.pallas_call(
    kernel,
    grid=(R // BR, LZ // BL),
    in_specs=[spec]*7 + [rspec],
    out_specs=spec,
    out_shape=jax.ShapeDtypeStruct((V, R, LZ), jnp.float32),
)
pall = jax.jit(lambda *a: pk(*a[:7], jnp.broadcast_to(a[7], (1, R, LZ))))
got = pall(val, dr, drr, dl, dll, dz, dzz, rinv)
err = float(jnp.abs(got - ref).max() / jnp.abs(ref).max())
print("rel err:", err)

args = (val, dr, drr, dl, dll, dz, dzz, rinv)
def t(f):
    return chain_time(lambda a: f(*a), args)
print(f"XLA fused expr:    {t(xla)*1e6:8.1f} us")
print(f"Pallas kernel:     {t(pall)*1e6:8.1f} us")
