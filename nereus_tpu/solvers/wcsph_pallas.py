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
    if state.multiphase:
        return _wcsph_pallas_multiphase(state, params, grid, cfg,
                                        boundary, xsph_eps)
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


def _wcsph_pallas_multiphase(state: FluidState, params: SimParams,
                             grid: gridlib.Grid, cfg: SimConfig,
                             boundary: Optional[BoundaryData],
                             xsph_eps):
    """Multiphase WCSPH step on the Pallas engine: per-particle mass/ρ₀
    through density, EOS and the volume-form forces — the same
    discretization as the oracle's ``_wcsph_step_multiphase``
    (equivalence-tested). Two ``generic_sweep`` launches: the density
    sweep keeps the boundary sum in a separate output column (rescaled
    per query phase outside), the force sweep returns ACCELERATION with
    the β wall penalty and friction folded in-kernel (query columns
    carry inv_ρ_i, p_i, m_i, 1/m_i)."""
    if xsph_eps is not None:
        raise NotImplementedError("XSPH is single-phase-only")
    if cfg.viscosity_model == "implicit":
        raise NotImplementedError("implicit viscosity is single-phase-only")
    from ..params import SurfaceTensionModel
    if cfg.surface_tension_model == SurfaceTensionModel.AKINCI:
        raise NotImplementedError(
            "AKINCI surface tension is single-phase-only (its curvature "
            "correction has no per-phase meaning); multiphase supports "
            "NONE or BECKER (phase-pair cohesion, SimConfig.st_cross)")
    st_becker = cfg.surface_tension_model == SurfaceTensionModel.BECKER
    from .wcsph import density_errors, tait_pressure

    ctx = build_pallas_ctx(state, params, grid, cfg, boundary)
    vel = (ctx.vx, ctx.vy, ctx.vz)
    c = ctx.c
    active = ctx.active
    interp = ctx.interp
    pvec, gsize, n_rows = ctx.pvec, ctx.gsize, ctx.n_rows
    mass, rho0 = ctx.mass, ctx.rho0

    # -- adapted density: fluid δ = Σ W (col 0) + boundary Σ ψ W (col 1)
    q4 = ctx.queries(width=4)
    src_d = ctx.pack(vel=vel)
    dout = PS.generic_sweep(
        cfg, PS.multiphase_density_pair, q4, src_d, ctx.anchors, pvec,
        gsize, out_width=4, pair_fn_b=PS.multiphase_density_bpair,
        n_rows=n_rows, interpret=interp)
    delta = dout[:, 0]
    dens = mass * delta + (rho0 / params.rest_density) * dout[:, 1]
    pres = tait_pressure(dens, params, rho0)

    # -- forces (acceleration; adapted volume form + walls) -------------
    # The 8-row pack has exactly ONE free scalar slot (row 7 is the hash
    # row — the reason the single-phase force pair recomputes pd2_j
    # in-kernel instead of shipping it). The multiphase pair needs TWO
    # per-source scalars (V_j, p_j·V_j²), so this sweep ships a 16-row
    # wide source (hash in row 15); the doubled window fetch is the
    # documented price of the wide format.
    inv_rho = 1.0 / jnp.maximum(dens, 1e-12)
    vol = 1.0 / jnp.maximum(delta, 1e-12)
    pv2 = pres * vol * vol
    qcols = [*vel, pv2, 1.0 / mass, mass, inv_rho]
    wcols = [vel[0], vel[1], vel[2], vol, pv2]
    if st_becker:
        # phase-pair cohesion: ship the exact ρ₀ phase column both sides
        qcols.append(rho0)
        wcols.append(rho0)
    q10 = ctx.queries(*qcols)
    src_f = ctx.pack_wide(wcols, rows=16)
    acc = PS.generic_sweep(
        cfg, PS.multiphase_force_pair, q10, src_f, ctx.anchors, pvec,
        gsize, out_width=4, pair_fn_b=PS.multiphase_boundary_pair,
        pair_b_kw={"moving": ctx.moving_boundary},
        st_becker=st_becker,
        n_rows=n_rows, interpret=interp)

    dt = params.dt
    g = params.gravity
    nv = tuple(v + dt * (acc[:, k] + gk) for k, (v, gk) in
               enumerate(((ctx.vx, g[0]), (ctx.vy, g[1]),
                          (ctx.vz, g[2]))))
    npx = jnp.where(active, ctx.px + dt * nv[0], ctx.px)
    npy = jnp.where(active, ctx.py + dt * nv[1], ctx.py)
    npz = jnp.where(active, ctx.pz + dt * nv[2], ctx.pz)
    nvx = jnp.where(active, nv[0], ctx.vx)
    nvy = jnp.where(active, nv[1], ctx.vy)
    nvz = jnp.where(active, nv[2], ctx.vz)

    new_state = FluidState(
        pos=jnp.stack([npx[:c], npy[:c], npz[:c]], axis=1),
        vel=jnp.stack([nvx[:c], nvy[:c], nvz[:c]], axis=1),
        pressure=jnp.where(active, pres, 0.0)[:c],
        num_active=state.num_active,
        mass=mass[:c], rho0=rho0[:c])
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    mae, mc = density_errors(dens, active, nact, rho0)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=mae,
        mean_compression=mc,
        seg_overflow=ctx.miss,
        solver_iters=jnp.asarray(0, jnp.int32),
    )
    return new_state, diag
