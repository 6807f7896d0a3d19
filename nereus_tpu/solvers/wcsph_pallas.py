"""WCSPH step on the Pallas neighbor engine (TPU hot path).

Same physics and integration as :func:`nereus_tpu.solvers.wcsph.wcsph_step`
— the jnp segment path remains the oracle — but the gather sweeps run as
two gather-free Pallas window sweeps: density, then fused
viscosity+surface-tension+pressure forces. With a boundary set present each
sweep covers the boundary terms too (rows 9-17 of a fused source matrix) —
one kernel launch per sweep total. See ``ops/pallas_neighbors.py``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .. import grid as gridlib
from ..ops import pallas_sph as PS
from ..params import SimConfig, SimParams
from ..state import BoundaryData, FluidState
from .pallas_common import build_pallas_ctx
from .wcsph import StepDiagnostics, density_errors, tait_pressure


def wcsph_step_pallas(state: FluidState, params: SimParams,
                      grid: gridlib.Grid, cfg: SimConfig,
                      boundary: Optional[BoundaryData] = None,
                      xsph_eps=None):
    """One WCSPH step; returns ``(new_state, StepDiagnostics)``.

    ``seg_overflow`` in the diagnostics reports Pallas window-coverage
    misses (0 in healthy runs) rather than segment-window truncation.
    """
    ctx = build_pallas_ctx(state, params, grid, cfg, boundary)
    vel = (ctx.vx, ctx.vy, ctx.vz)
    c, cb = ctx.c, ctx.cb
    active = ctx.active
    interp = ctx.interp
    pvec, gsize, n_rows = ctx.pvec, ctx.gsize, ctx.n_rows
    pm = params.particle_mass

    # -- density (fluid ψ slot = m; boundary region ψ real) -----------------
    # ONE pack per step: the density pair ignores the velocity rows, so
    # the matrix is built with them up front and only the dens/ψ row
    # changes between the two sweeps (ctx.update_rows — repacking costs a
    # column→field-major transpose at 1M).
    q4 = ctx.queries(width=4)
    psi_fluid = jnp.full((c,), 1.0, ctx.dtype) * pm
    src_d = ctx.pack(vel=vel, slot6=psi_fluid)
    # self term ψ·W(0) is included by the sweep (self-pairs not excluded)
    dens = PS.density_sweep(cfg, q4, src_d, ctx.anchors, pvec, gsize,
                            n_rows=n_rows, interpret=interp)
    pres = tait_pressure(dens, params)

    # -- forces (viscosity + surface tension + pressure + boundary terms) ---
    implicit_visc = cfg.viscosity_model == "implicit"
    dens_safe = jnp.maximum(dens, 1e-12)
    pd2 = pres / (dens_safe * dens_safe)
    q8 = ctx.queries(*vel, dens, pd2)
    src_f = ctx.update_rows(src_d, 6, [dens])
    force = PS.fluid_force_sweep(cfg, q8, src_f, ctx.anchors, pvec, gsize,
                                 n_rows=n_rows,
                                 moving_boundary=ctx.moving_boundary,
                                 include_viscosity=not implicit_visc,
                                 interpret=interp)
    fx, fy, fz = (force[:, k] for k in range(3))

    # -- symplectic Euler (``integrate_functor``) --------------------------
    dt = params.dt
    g = params.gravity

    nv = tuple(v + (dt / pm) * (f + pm * gk) for v, f, gk in
               ((ctx.vx, fx, g[0]), (ctx.vy, fy, g[1]),
                (ctx.vz, fz, g[2])))
    if implicit_visc:
        # Weiler-2018 backward-Euler viscosity (solvers/viscosity.py):
        # replaces the explicit viscous term AND the boundary friction
        from .viscosity import implicit_viscosity_pallas
        v_sol, _, _ = implicit_viscosity_pallas(ctx, params, cfg, dens, nv)
        nv = tuple(jnp.where(active, v_sol[k], nv[k]) for k in range(3))

    if xsph_eps is None:
        v_adv = nv
    else:
        # XSPH (Monaghan): smooth the advection velocity over FLUID
        # neighbors (one extra sweep on the fluid-only plan); the carried
        # momentum stays un-smoothed. ε scales outside the sweep so a
        # traced value never recompiles.
        q8x = ctx.queries(*nv, dens, width=8)
        src_x = ctx.update_rows(src_f, 3, list(nv))
        sm = PS.generic_sweep(cfg, PS.xsph_pair, q8x, src_x,
                              ctx.anchors_f, pvec, gsize, out_width=4,
                              n_rows=ctx.rows_local, interpret=interp)
        v_adv = tuple(nv[k] + xsph_eps * sm[:, k] for k in range(3))
    npx = jnp.where(active, ctx.px + dt * v_adv[0], ctx.px)
    npy = jnp.where(active, ctx.py + dt * v_adv[1], ctx.py)
    npz = jnp.where(active, ctx.pz + dt * v_adv[2], ctx.pz)
    nvx = jnp.where(active, nv[0], ctx.vx)
    nvy = jnp.where(active, nv[1], ctx.vy)
    nvz = jnp.where(active, nv[2], ctx.vz)

    new_state = FluidState(
        pos=jnp.stack([npx[:c], npy[:c], npz[:c]], axis=1),
        vel=jnp.stack([nvx[:c], nvy[:c], nvz[:c]], axis=1),
        pressure=jnp.where(active, pres, 0.0)[:c],
        num_active=state.num_active)
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    mae, mc = density_errors(dens, active, nact, params.rest_density)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=mae,
        mean_compression=mc,
        seg_overflow=ctx.miss,
        solver_iters=jnp.asarray(0, jnp.int32),
    )
    return new_state, diag
