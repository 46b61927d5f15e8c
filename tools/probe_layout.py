"""Probe: does the RLZ axis order (z-minor vs l-minor) change transform
throughput on TPU?  Times the same synthesis-like contraction chain in both
layouts, back-to-back in one session (tunnel variance rule, CLAUDE.md).

Also probes zDim padding 60 -> 64 and a flattened-batch GEMM formulation.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L = 100


def chain_time(f, x, reps=3):
    import jax
    import jax.numpy as jnp

    def run(x0):
        def body(carry, _):
            (poison,) = carry
            y = f(x0 * (1.0 + poison))
            return ((jnp.ravel(y)[0] * 1e-300).astype(x0.dtype),), None

        out, _ = jax.lax.scan(body, (jnp.zeros((), x0.dtype),), None, length=L)
        return out

    g = jax.jit(run)
    jax.block_until_ready(g(x))
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(g(x))
        best = min(best, time.time() - t0)
    return best / L


def main():
    import jax
    import jax.numpy as jnp

    from scythe_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    v, b, r, nl, nz = 8, 67, 192, 128, 60
    f32 = jnp.float32

    def mk(shape):
        return jnp.asarray(np.random.default_rng(0).normal(size=shape), f32)

    zop = mk((3, nz, nz))
    lop = mk((3, nl, nl))
    rop = mk((3, r, b))

    results = {}

    # A: current layout [v, b, k, K] -> [v, d, r, l, z] (z minor)
    spec_a = mk((v, b, nl, nz))

    def chain_a(s):
        zc = jnp.einsum("dzK,vbkK->vdbkz", zop, s)
        lv = jnp.einsum("dlk,vbkz->vdblz", lop, zc[:, 0])
        out = jnp.einsum("drb,vblz->vdrlz", rop, lv[:, 0])
        return out

    results["z-minor [vbkK]->[vdrlz]"] = chain_time(chain_a, spec_a)

    # B: swapped layout [v, b, K, k] -> [v, d, r, z, l] (l minor)
    spec_b = mk((v, b, nz, nl))

    def chain_b(s):
        zc = jnp.einsum("dzK,vbKk->vdbzk", zop, s)
        lv = jnp.einsum("dlk,vbzk->vdbzl", lop, zc[:, 0])
        out = jnp.einsum("drb,vbzl->vdrzl", rop, lv[:, 0])
        return out

    results["l-minor [vbKk]->[vdrzl]"] = chain_time(chain_b, spec_b)

    # C: z padded to 64, z minor
    nzp = 64
    zopp = mk((3, nzp, nzp))
    spec_c = mk((v, b, nl, nzp))

    def chain_c(s):
        zc = jnp.einsum("dzK,vbkK->vdbkz", zopp, s)
        lv = jnp.einsum("dlk,vbkz->vdblz", lop, zc[:, 0])
        out = jnp.einsum("drb,vblz->vdrlz", rop, lv[:, 0])
        return out

    results["z-minor padded z=64"] = chain_time(chain_c, spec_c)

    # D: flattened trailing batch: one true GEMM per stage, [v*k*z] flat
    spec_d = mk((b, v * nl * nz))

    def chain_d(s):
        return rop[0] @ s  # radial synthesis as single [r,b]@[b,N]

    results["bare radial GEMM flat N"] = chain_time(chain_d, spec_d)

    # E: full 7-slot synthesis traffic, z minor vs l minor
    def syn_a(s):
        zc = jnp.einsum("dzK,vbkK->vdbkz", zop, s)
        lv = jnp.einsum("dlk,vbkz->vdblz", lop, zc[:, 0])
        lz = jnp.einsum("lk,vdbkz->vdblz", lop[0], zc[:, 1:])
        r3 = jnp.einsum("drb,vblz->vdrlz", rop, lv[:, 0])
        rl = jnp.einsum("rb,vdblz->vdrlz", rop[0], lv[:, 1:])
        rz = jnp.einsum("rb,vdblz->vdrlz", rop[0], lz)
        return r3, rl, rz

    results["7-slot synthesis z-minor"] = chain_time(lambda s: syn_a(s)[0], spec_a)

    def syn_b(s):
        zc = jnp.einsum("dzK,vbKk->vdbzk", zop, s)
        lv = jnp.einsum("dlk,vbzk->vdbzl", lop, zc[:, 0])
        lz = jnp.einsum("lk,vdbzk->vdbzl", lop[0], zc[:, 1:])
        r3 = jnp.einsum("drb,vbzl->vdrzl", rop, lv[:, 0])
        rl = jnp.einsum("rb,vdbzl->vdrzl", rop[0], lv[:, 1:])
        rz = jnp.einsum("rb,vdbzl->vdrzl", rop[0], lz)
        return r3, rl, rz

    results["7-slot synthesis l-minor"] = chain_time(lambda s: syn_b(s)[0], spec_b)

    print(f"{'variant':<34} {'us':>9}")
    for k, t in results.items():
        print(f"{k:<34} {t*1e6:9.1f}")


if __name__ == "__main__":
    main()
