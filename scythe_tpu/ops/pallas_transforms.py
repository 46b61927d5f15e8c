"""Fused Pallas TPU kernel for the RLZ spectral analysis (EXPERIMENTAL —
measured SLOWER than the einsum path; kept as a documented negative
result, not wired into production.  See docs/RESULTS.md "Fused Pallas
transform kernels").

Motivation: the einsum transform path materializes every stage to HBM —
the analysis chain (ref spectralTransform!, src/semiimplicit.jl:301-332)
writes the azimuthal-coefficient intermediate (same size as the physical
field), the ring-mask product, and the radial contraction — ~270 MB of
HBM traffic per analysis at flagship-RLZ size against ~65 MB of
unavoidable input+output.  This kernel runs the whole chain — lambda
real-DFT, per-ring dealias mask, radial quadrature+solve contraction,
vertical Chebyshev analysis — inside VMEM, reading the physical field
once and writing only the spectral array.

Measured outcome (TPU v5e, 2026-08-17, A/B in one session): correct to
2.8e-7 vs the einsum path, but 0.6-0.7x its speed — and a minimal ceiling
test showed Mosaic runs even a SINGLE identical fat dot 1.9x slower than
XLA's einsum lowering (1.14 vs 0.60 ms for the [v,r,l,z] x [l,k] l-stage,
both compensated).  The transform is therefore not HBM-bound enough for
fusion to beat XLA's GEMM codegen at these shapes; the einsum path stays
production.

Numerics are identical in structure to ``Grid._mm``'s compensated-bf16
scheme (docs/NUMERICS.md): every operator is pre-split into (hi, lo) bf16
parts on the host, every activation is split in-kernel, and each
contraction is the 3-dot sum O_hi x_hi + O_lo x_hi + O_hi x_lo with f32
accumulation on the MXU.

Grid layout: ``(nvars, n_rblocks)``; the radial contraction accumulates
into a persistent VMEM scratch across r-blocks and the vertical stage +
output write run on the last r-block (grid iteration on TPU is sequential,
so the scratch carries across grid steps of the same variable).

RLZ only, dense-DFT mode only (the factored-DFT path keeps its einsum
chain); other geometries keep the einsum path — they are small enough that
fusion does not pay.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_act(x):
    """In-kernel (hi, lo) bf16 split of an f32 activation."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return xh, xl


def _dot3(dims, f32: bool):
    """3-term dot builder; ``f32=True`` upcasts operands (the interpreter's
    CPU thunk lacks bf16 x bf16 -> f32 for >2D dots)."""
    def d(a, b):
        if f32:
            a, b = a.astype(jnp.float32), b.astype(jnp.float32)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
        )
    return d


def _cdot(xh, xl, oh, ol, dims, f32=False):
    """Compensated contraction, activation on the LEFT: 3 bf16 MXU dots
    with f32 accumulation (O_hi x_hi + O_lo x_hi + O_hi x_lo)."""
    d = _dot3(dims, f32)
    return d(xh, oh) + d(xh, ol) + d(xl, oh)


def _cdot_r(oh, ol, xh, xl, dims, f32=False):
    """Compensated contraction with the OPERATOR on the left (output dims
    ordered operator-free-dims first)."""
    d = _dot3(dims, f32)
    return d(oh, xh) + d(ol, xh) + d(oh, xl)


def _pick_rblock(rdim: int, nl: int, nz: int, budget_mb: float = 2.0) -> int:
    """Largest divisor of rDim whose [RB, nl, nz] f32 block fits the
    budget (several such buffers are live at once in the kernel)."""
    target = int(budget_mb * 2**20 / (nl * nz * 4))
    best = None
    for rb in range(1, rdim + 1):
        if rdim % rb == 0 and rb <= max(1, target):
            best = rb
    return best or 1


def rlz_analysis_supported(grid) -> bool:
    """The fused kernel covers the TPU production configuration: RLZ,
    compensated mode, dense (unfactored) azimuthal DFT."""
    return (
        grid.geometry == "RLZ"
        and grid.comp
        and grid.l_fact is None
        and jax.default_backend() == "tpu"
    )


def build_rlz_analysis(grid, interpret: bool = False):
    """Returns ``analysis(phys) -> spec`` running the fused kernel.

    Operator prep mirrors ``create_grid``'s float64 construction: the
    (hi, lo) splits are taken from the same float64 numpy operators the
    einsum path uses, transposed into contraction-friendly layouts
    (r/l/z as leading block dims; see module docstring)."""
    p = grid.params
    V, R, L, Z = p.nvars, p.rDim, grid.nl, p.zDim
    B = p.b_rDim
    RB = _pick_rblock(R, L, Z)
    NRB = R // RB

    # --- host operator prep (from the grid's float64 sources) ----------
    # lambda: values -> masked coeffs. grid.l_analysis is the comp stack
    # [3, k, l] ([hi, lo, hi]); recover hi/lo and store transposed [l, k].
    la = np.asarray(grid.l_analysis, np.float32)  # [3, k, l]
    la_h = jnp.asarray(np.ascontiguousarray(la[0].T), jnp.bfloat16)
    la_l = jnp.asarray(np.ascontiguousarray(la[1].T), jnp.bfloat16)
    # radial: analysis_r comp stack [3, v, b, r] -> [v, r, b] hi/lo
    an = np.asarray(grid.analysis_r, np.float32)
    an_h = jnp.asarray(np.ascontiguousarray(np.swapaxes(an[0], 1, 2)), jnp.bfloat16)
    an_l = jnp.asarray(np.ascontiguousarray(np.swapaxes(an[1], 1, 2)), jnp.bfloat16)
    # vertical: analysis_z comp stack [3, v, K, z] -> [v, z, K] hi/lo
    az = np.asarray(grid.analysis_z, np.float32)
    az_h = jnp.asarray(np.ascontiguousarray(np.swapaxes(az[0], 1, 2)), jnp.bfloat16)
    az_l = jnp.asarray(np.ascontiguousarray(np.swapaxes(az[1], 1, 2)), jnp.bfloat16)
    mask = jnp.asarray(grid.ring_mask, jnp.float32)  # [r, k]

    def kernel(phys_ref, lah_ref, lal_ref, anh_ref, anl_ref, azh_ref,
               azl_ref, mask_ref, out_ref, acc):
        # transpose-free formulation: every stage is a single-contraction
        # dot_general whose free-dim ordering yields the next stage's
        # layout directly ([RB,L,Z] -o(L)-> [RB,Z,k] -o(RB)-> [B,Z,k]
        # -o(Z)-> [B,k,K]); Mosaic relayouts, not HBM traffic, were the
        # cost of the reshape/transpose variant.
        rb = pl.program_id(1)

        @pl.when(rb == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        x = phys_ref[0]                         # [RB, L, Z] f32
        xh, xl = _split_act(x)
        a = _cdot(xh, xl, lah_ref[:], lal_ref[:], ((1,), (0,)), interpret)
        a = a * mask_ref[:][:, None, :]          # [RB, Z, k]
        ah, al = _split_act(a)
        acc[:] += _cdot_r(
            anh_ref[0], anl_ref[0], ah, al, ((0,), (0,)), interpret
        )

        @pl.when(rb == NRB - 1)
        def _():
            c = acc[:]                           # [B, Z, k]
            ch, cl = _split_act(c)
            out_ref[0] = _cdot(
                ch, cl, azh_ref[0], azl_ref[0], ((1,), (0,)), interpret
            )                                    # [B, k, K]

    call = pl.pallas_call(
        kernel,
        grid=(V, NRB),
        out_shape=jax.ShapeDtypeStruct((V, B, L, Z), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, RB, L, Z), lambda v, rb: (v, rb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # la_h [L, k]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # la_l
            pl.BlockSpec((1, RB, B), lambda v, rb: (v, rb, 0),
                         memory_space=pltpu.VMEM),  # an_h
            pl.BlockSpec((1, RB, B), lambda v, rb: (v, rb, 0),
                         memory_space=pltpu.VMEM),  # an_l
            pl.BlockSpec((1, Z, Z), lambda v, rb: (v, 0, 0),
                         memory_space=pltpu.VMEM),  # az_h
            pl.BlockSpec((1, Z, Z), lambda v, rb: (v, 0, 0),
                         memory_space=pltpu.VMEM),  # az_l
            pl.BlockSpec((RB, L), lambda v, rb: (rb, 0),
                         memory_space=pltpu.VMEM),  # mask
        ],
        out_specs=pl.BlockSpec((1, B, L, Z), lambda v, rb: (v, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, Z, L), jnp.float32)],
        # the default 16 MB scoped-vmem limit is conservative (v5e has
        # 128 MB); the block/temporary budget here peaks near ~20 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )

    def analysis(phys):
        return call(
            phys.astype(jnp.float32), la_h, la_l, an_h, an_l, az_h, az_l, mask
        ).astype(grid.dtype)

    return analysis
