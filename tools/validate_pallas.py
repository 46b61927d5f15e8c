"""Validate the fused Pallas semi-implicit kernel on REAL TPU hardware.

Round-1 left the kernel opt-in, having only ever run in interpret mode
(VERDICT missing #3).  This compiles the Mosaic kernel on the current
device and measures, against a float64 CPU reference of the same chain:

  * einsum path at Precision.HIGHEST (the current default)
  * pallas mode="plain"  (f32 dots; Mosaic rounds to bf16)
  * pallas mode="comp"   (compensated bf16_3x inside the kernel)

and their per-call device times over a realistic column batch.

Usage: python tools/validate_pallas.py [ncols [nz]]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L = 50


def chain_time(f, *args, reps=3):
    import jax
    import jax.numpy as jnp

    def run(x0, *rest):
        def body(carry, _):
            (poison,) = carry
            y = f(x0 * (1.0 + poison), *rest)
            y0 = y[0] if isinstance(y, tuple) else y
            return ((jnp.ravel(y0)[0] * 1e-30).astype(x0.dtype),), None

        out, _ = jax.lax.scan(body, (jnp.zeros((), x0.dtype),), None, length=L)
        return out

    g = jax.jit(run)
    jax.block_until_ready(g(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(g(*args))
        best = min(best, time.time() - t0)
    return best / L


def main():
    import jax
    import jax.numpy as jnp

    from scythe_tpu import timeintegration as ti
    from scythe_tpu.ops.pallas_semiimplicit import fused_column_solve
    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    ncols = int(sys.argv[1]) if len(sys.argv) > 1 else 192 * 128
    nz = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    ts, pxi = 2.0, 90000.0
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}); ncols={ncols} nz={nz}")

    rng = np.random.default_rng(0)
    x64 = rng.normal(size=(ncols, nz))
    w64 = rng.normal(size=(ncols, nz))
    ts_term = 1.25 * ts

    # float64 CPU ground truth of the same chain
    ops64 = ti.build_semiimplicit_ops(nz, 0.0, 1.0e4, None, pxi, ts, jnp.float64)
    F = np.asarray(ops64.col_filter, np.float64)
    Dz = np.asarray(ops64.col_deriv, np.float64)
    Hinv = np.asarray(ops64.hinv, np.float64)
    S = np.asarray(ops64.synth, np.float64)
    Ds = np.asarray(ops64.dsynth, np.float64)
    xf = x64 @ F.T
    g = ts_term * pxi * (x64 @ Dz.T) - w64
    g = np.concatenate([np.zeros((ncols, 2)), g[:, 1:-1]], axis=1)
    a = g @ Hinv.T
    w_true = a @ S.T
    xi_true = xf - ts_term * (a @ Ds.T)
    scale_w = np.abs(w_true).max()
    scale_xi = np.abs(xi_true).max()

    with jax.default_device(dev):
        f32 = jnp.float32
        x = jnp.asarray(x64, f32)
        w = jnp.asarray(w64, f32)
        opsf = [jnp.asarray(o, f32) for o in (F, Dz, Hinv, S, Ds)]

        def einsum_path(x, w):
            PREC = jax.lax.Precision.HIGHEST
            xf = jnp.einsum("zk,ck->cz", opsf[0], x, precision=PREC)
            gg = ts_term * pxi * jnp.einsum(
                "zk,ck->cz", opsf[1], x, precision=PREC
            ) - w
            zeros = jnp.zeros((gg.shape[0], 2), gg.dtype)
            gg = jnp.concatenate([zeros, gg[:, 1:-1]], axis=1)
            a = jnp.einsum("zk,ck->cz", opsf[2], gg, precision=PREC)
            return (
                jnp.einsum("zk,ck->cz", opsf[3], a, precision=PREC),
                xf - ts_term * jnp.einsum("zk,ck->cz", opsf[4], a, precision=PREC),
            )

        results = {}
        we, xe = jax.jit(einsum_path)(x, w)
        results["einsum HIGHEST"] = (
            np.abs(np.asarray(we) - w_true).max() / scale_w,
            np.abs(np.asarray(xe) - xi_true).max() / scale_xi,
            chain_time(einsum_path, x, w),
        )
        for mode in ("plain", "comp"):
            try:
                fk = lambda x, w, m=mode: fused_column_solve(
                    x, w, *opsf, ts_term, pxi, mode=m
                )
                wk, xk = jax.jit(fk)(x, w)
                results[f"pallas {mode}"] = (
                    np.abs(np.asarray(wk) - w_true).max() / scale_w,
                    np.abs(np.asarray(xk) - xi_true).max() / scale_xi,
                    chain_time(fk, x, w),
                )
            except Exception as e:
                results[f"pallas {mode}"] = ("FAILED", str(e)[:200], None)

    print(f"\n{'path':<16} {'rel err w':>11} {'rel err xi':>11} {'us/call':>9}")
    for k, (ew, ex, t) in results.items():
        tstr = f"{t*1e6:9.1f}" if t else "      -"
        print(f"{k:<16} {ew if isinstance(ew,str) else f'{ew:11.2e}'} "
              f"{ex if isinstance(ex,str) else f'{ex:11.2e}'} {tstr}")


if __name__ == "__main__":
    main()
