"""Radial domain decomposition over a TPU device mesh.

TPU-native replacement for the reference's tile/halo runtime
(src/semiimplicit.jl:126-332).  The mapping (SURVEY.md 2.8):

* reference radial tiles (one per Distributed worker)  ->  a 1-D
  `jax.sharding.Mesh` axis ``"r"``; physical-space arrays are sharded along
  the radial mish dimension, cut on cell boundaries so each shard owns whole
  spline cells.
* reference halo exchange + SharedArray overlap-add of spectral
  coefficients (semiimplicit.jl:272-329)  ->  a single `psum` of the local
  quadrature projections.  Because the projection is an exact sum of
  per-cell contributions (basis/bspline.py), the psum reproduces the global
  analysis bit-for-bit up to reduction order: no approximation at tile
  boundaries, unlike the reference's per-tile refit.
* the replicated Gram/filter/BC solve (the reference's splineTransform! on
  every worker) stays replicated: it is a [b_rDim, b_rDim] matmul, far
  cheaper than the communication it would take to shard it.
* azimuthal FFTs and vertical Chebyshev columns stay chip-local (the
  reference never decomposes lambda or z either).

Per-step communication = one psum of ``[nvars, b_rDim(, nl)(, nz)]`` — a
few hundred KB at flagship sizes, riding ICI.
"""

from __future__ import annotations

import copy
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import timeintegration as ti
from ..grids.base import Grid
from ..model import build_context, build_step

AXIS = "r"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def _check_divisible(grid: Grid, n: int):
    if grid.params.num_cells % n != 0:
        raise ValueError(
            f"num_cells={grid.params.num_cells} must be divisible by the "
            f"mesh size {n} (shards own whole spline cells)"
        )


def _local_grid(grid: Grid, idx, rows: int) -> Grid:
    """A shallow grid copy whose radial-row operators are this shard's
    slice (synthesis rows, projection columns, ring masks, coords).
    Compensated operator stacks carry a leading length-3 axis."""
    start = idx * rows
    off = 1 if grid.comp else 0
    lg = copy.copy(grid)
    lg.synth_r = jax.lax.dynamic_slice_in_dim(grid.synth_r, start, rows, axis=1 + off)
    lg.synth_r_val = jax.lax.dynamic_slice_in_dim(
        grid.synth_r_val, start, rows, axis=0 + off
    )
    lg.project_r = jax.lax.dynamic_slice_in_dim(
        grid.project_r, start, rows, axis=1 + off
    )
    if grid.ring_mask is not None:
        lg.ring_mask = jax.lax.dynamic_slice_in_dim(grid.ring_mask, start, rows, axis=0)
    return lg


def _local_coords(coords: dict, idx, rows: int) -> dict:
    out = dict(coords)
    if "r" in out:
        r = out["r"]
        out["r"] = jax.lax.dynamic_slice_in_dim(r, idx * rows, rows, axis=0)
    return out


def state_specs() -> ti.ModelState:
    """PartitionSpecs for a ModelState: spectral replicated, physical
    histories sharded along the radial axis."""
    return ti.ModelState(
        spec=P(),
        expdot_nm1=P(None, AXIS),
        expdot_nm2=P(None, AXIS),
        impdot_nm1=P(None, AXIS),
        impdot_nm2=P(None, AXIS),
        t=P(),
    )


def shard_state(state: ti.ModelState, mesh: Mesh) -> ti.ModelState:
    specs = state_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


def build_sharded_step(model, grid: Grid, ctx, dtype, mesh: Mesh):
    """Shard-mapped single step.  Returns step(state) -> state (not jitted;
    compose with model.make_scan)."""
    n = mesh.shape[AXIS]
    _check_divisible(grid, n)
    rows = grid.params.rDim // n

    def body(spec, e1, e2, i1, i2, t):
        idx = jax.lax.axis_index(AXIS)
        lg = _local_grid(grid, idx, rows)
        lctx = dataclasses.replace(
            ctx, grid=lg, coords=_local_coords(ctx.coords, idx, rows)
        )

        def analysis_fn(phys):
            proj = lg.project(phys)
            return grid.solve_spectral(jax.lax.psum(proj, AXIS))

        step = build_step(
            model,
            lg,
            lctx,
            dtype,
            analysis_fn=analysis_fn,
            synthesis_fn=lg.synthesis,
        )
        st = ti.ModelState(spec, e1, e2, i1, i2, t)
        out = step(st)
        return tuple(out)

    specs = state_specs()
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(specs),
        out_specs=tuple(specs),
        check_vma=False,
    )

    def step(state: ti.ModelState) -> ti.ModelState:
        return ti.ModelState(*mapped(*state))

    return step


def integrate_sharded(model, n_devices: int, dtype=None):
    """Sharded analog of model.integrate_model: same output cadence and
    watchdog, radial dimension split over ``n_devices``."""
    import numpy as np

    from .. import io as sio
    from ..model import _pick_chunk, default_dtype, make_scan

    dtype = dtype or default_dtype()
    mesh = make_mesh(n_devices)
    grid, ctx, state = initialize_sharded(model, mesh, dtype)
    step = build_sharded_step(model, grid, ctx, dtype, mesh)
    num_ts = model.num_ts
    output_int = max(1, min(model.output_int, num_ts))
    chunk = _pick_chunk(output_int)
    scan = make_scan(step, chunk)
    phys = np.asarray(grid.synthesis(state.spec)["val"])
    sio.check_cfl(grid, phys)
    sio.write_output(grid, model, 0.0, phys)
    done = 0
    while done < num_ts:
        n = min(output_int, num_ts - done)
        if n % chunk == 0:
            for _ in range(n // chunk):
                state = scan(state)
        else:
            state = make_scan(step, n)(state)
        done += n
        phys = np.asarray(grid.synthesis(state.spec)["val"])
        sio.check_cfl(grid, phys)
        sio.write_output(grid, model, done * model.ts, phys)
        print(f"ts: {done * model.ts}", flush=True)
    return grid, phys


def initialize_sharded(model, mesh: Mesh, dtype=None):
    """Sharded analog of model.initialize: build grid/context/state and
    place the state according to the mesh."""
    from .. import io as sio
    from ..grids.base import create_grid
    from ..model import default_dtype

    dtype = dtype or default_dtype()
    grid = create_grid(model.grid_params, dtype)
    _check_divisible(grid, mesh.shape[AXIS])
    ctx = build_context(model, grid, dtype)
    phys0 = sio.read_physical_grid(model.initial_conditions, grid)
    spec0 = grid.analysis(jnp.asarray(phys0, dtype))
    state = ti.initial_state(spec0, (grid.nvars,) + grid.spatial_shape, dtype)
    return grid, ctx, shard_state(state, mesh)
