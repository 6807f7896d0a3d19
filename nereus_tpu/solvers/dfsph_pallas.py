"""DFSPH step on the Pallas neighbor engine (TPU hot path).

Same physics as :func:`nereus_tpu.solvers.dfsph.dfsph_step` (the jnp
oracle) with every 27-cell gather replaced by gather-free Pallas window
sweeps. Both stiffness loops run as on-device ``lax.while_loop``s; each
iteration costs two fused sweeps (velocity-divergence + the symmetric
κ-gradient correction, which reuses the implicit-solver
``grad_pressure_force_pair`` with κ/ρ in the pressure slot) over
loop-invariant window plans.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import grid as gridlib
from ..ops import pallas_sph as PS
from ..params import SimConfig, SimParams
from ..state import BoundaryData, FluidState
from .pallas_common import build_pallas_ctx
from .wcsph import StepDiagnostics

_EPS_DENOM = 1e-6


def dfsph_multiphase_pallas(state: FluidState, params: SimParams,
                            grid: gridlib.Grid, cfg: SimConfig,
                            boundary: Optional[BoundaryData] = None,
                            tol: float = 1.0, tol_v: float = 1.0):
    """Multiphase DFSPH on the Pallas engine — the adapted number-density
    formulation of ``solvers.dfsph._dfsph_step_multiphase`` (see the
    derivation block there), equivalence-tested against it. Per
    iteration: one dδ̂/dt sweep + one κV̂² correction sweep, both on the
    standard 8-row pack (each ships exactly ONE per-source scalar:
    nothing for dδ̂/dt — the adapted rate is unweighted — and κ_jV̂_j²
    for the correction)."""
    ctx = build_pallas_ctx(state, params, grid, cfg, boundary)
    vel = (ctx.vx, ctx.vy, ctx.vz)
    c, cb = ctx.c, ctx.cb
    active = ctx.active
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    dt = params.dt
    interp = ctx.interp
    pvec, gsize, n_rows = ctx.pvec, ctx.gsize, ctx.n_rows
    mass, rho0 = ctx.mass, ctx.rho0

    def mean_active(x):
        return jnp.sum(jnp.where(active, x, 0.0)) / nact

    # --- adapted density + factor α̂ -------------------------------------
    q4 = ctx.queries(width=4)
    dout = PS.generic_sweep(
        cfg, PS.multiphase_density_pair, q4, ctx.pack(), ctx.anchors,
        pvec, gsize, out_width=4, pair_fn_b=PS.multiphase_density_bpair,
        n_rows=n_rows, interpret=interp)
    delta = dout[:, 0]
    dens = mass * delta + (rho0 / params.rest_density) * dout[:, 1]
    delta_hat = dens / mass
    delta0 = rho0 / mass
    vhat2 = 1.0 / jnp.maximum(delta_hat * delta_hat, 1e-24)
    sm = (rho0 / params.rest_density) / mass
    to_kg = mass * (params.rest_density / rho0)
    im = 1.0 / mass

    al = PS.generic_sweep(
        cfg, PS.multiphase_alpha_pair, q4, ctx.pack(slot6=im),
        ctx.anchors, pvec, gsize, out_width=8,
        pair_fn_b=PS.multiphase_alpha_bpair,
        n_rows=n_rows, interpret=interp)
    ghx = al[:, 0] + sm * al[:, 4]
    ghy = al[:, 1] + sm * al[:, 5]
    ghz = al[:, 2] + sm * al[:, 6]
    denom = ghx * ghx + ghy * ghy + ghz * ghz + mass * al[:, 3]
    alpha = mass * delta_hat * delta_hat / jnp.maximum(denom, _EPS_DENOM)

    def drho_of(v):
        q8 = ctx.queries(*v, width=8)
        d = PS.generic_sweep(
            cfg, PS.multiphase_drho_pair, q8, ctx.pack(vel=v),
            ctx.anchors, pvec, gsize, out_width=4,
            pair_fn_b=PS.multiphase_drho_bpair,
            n_rows=n_rows, interpret=interp)
        return d[:, 0] + sm * d[:, 1]

    def apply_kappa(kappa, v):
        kv2 = kappa * vhat2
        qk = ctx.queries(kv2, sm * kv2)
        f = PS.generic_sweep(
            cfg, PS.multiphase_kappa_pair, qk, ctx.pack(slot6=kv2),
            ctx.anchors, pvec, gsize, out_width=4,
            pair_fn_b=PS.multiphase_kappa_bpair,
            n_rows=n_rows, interpret=interp)
        return tuple(v[k] - dt * im * f[:, k] for k in range(3))

    # --- divergence-free solve -------------------------------------------
    def vcond(carry):
        v, err, it = carry
        return (((err > tol_v) | (it < cfg.dfsph_min_iters_v))
                & (it < cfg.dfsph_max_iters_v))

    def vbody(carry):
        v, _, it = carry
        dhat = jnp.maximum(drho_of(v), 0.0)
        v = apply_kappa(dhat * alpha / dt, v)
        return (v, dt * mean_active(dhat * to_kg), it + 1)

    init_v = (vel, jnp.asarray(2.0, cfg.dtype) * tol_v,
              jnp.asarray(0, jnp.int32))
    vel_df, err_v, iters_v = jax.lax.while_loop(vcond, vbody, init_v)

    # --- non-pressure forces: the multiphase WCSPH force sweep with zero
    # pressure IS the volume-form viscosity + β walls + friction ----------
    vol = 1.0 / jnp.maximum(delta, 1e-12)
    inv_rho = 1.0 / jnp.maximum(dens, 1e-12)
    zcb = jnp.zeros((cb,), ctx.dtype)
    from ..params import SurfaceTensionModel
    st_becker = cfg.surface_tension_model == SurfaceTensionModel.BECKER
    qcols = [*vel_df, zcb, im, mass, inv_rho]
    wcols = [vel_df[0], vel_df[1], vel_df[2], vol, zcb]
    if st_becker:
        qcols.append(rho0)
        wcols.append(rho0)
    q10 = ctx.queries(*qcols)
    src_adv = ctx.pack_wide(wcols, rows=16)
    acc = PS.generic_sweep(
        cfg, PS.multiphase_force_pair, q10, src_adv, ctx.anchors, pvec,
        gsize, out_width=4, pair_fn_b=PS.multiphase_boundary_pair,
        pair_b_kw={"moving": ctx.moving_boundary},
        st_becker=st_becker,
        n_rows=n_rows, interpret=interp)
    g = params.gravity
    v_star = tuple(vel_df[k] + dt * (acc[:, k] + g[k]) for k in range(3))

    # --- constant-density solve on v* -------------------------------------
    kap0 = jnp.zeros_like(dens)
    if cfg.dfsph_warm_start:
        kap0 = 0.5 * jnp.maximum(
            jnp.where(active, ctx.pres_prev, 0.0), 0.0)
        v_star = apply_kappa(kap0, v_star)

    def cond(carry):
        v, kap, err, it = carry
        return (((err > tol) | (it < cfg.dfsph_min_iters))
                & (it < cfg.dfsph_max_iters))

    def body(carry):
        v, kap, _, it = carry
        dstar = delta_hat + dt * drho_of(v)
        comp = jnp.maximum(dstar - delta0, 0.0)
        kappa = comp * alpha / (dt * dt)
        v = apply_kappa(kappa, v)
        return (v, kap + kappa, mean_active(comp * to_kg), it + 1)

    init = (v_star, kap0,
            jnp.asarray(2.0, cfg.dtype) * tol, jnp.asarray(0, jnp.int32))
    v_new, kappa, rho_err, iters = jax.lax.while_loop(cond, body, init)

    # --- integrate ---------------------------------------------------------
    pos = (ctx.px, ctx.py, ctx.pz)
    nv, np_ = [], []
    for k in range(3):
        nv.append(jnp.where(active, v_new[k], vel[k]))
        np_.append(jnp.where(active, pos[k] + dt * v_new[k], pos[k]))

    new_state = FluidState(
        pos=jnp.stack([a[:c] for a in np_], axis=1),
        vel=jnp.stack([a[:c] for a in nv], axis=1),
        pressure=jnp.where(active, kappa, 0.0)[:c],
        num_active=state.num_active,
        mass=mass[:c], rho0=rho0[:c])
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=rho_err / params.rest_density,
        mean_compression=rho_err / params.rest_density,
        seg_overflow=ctx.miss,
        solver_iters=iters + iters_v,
    )
    return new_state, diag


def dfsph_step_pallas(state: FluidState, params: SimParams,
                      grid: gridlib.Grid, cfg: SimConfig,
                      boundary: Optional[BoundaryData] = None,
                      tol: float = 1.0, tol_v: float = 1.0):
    ctx = build_pallas_ctx(state, params, grid, cfg, boundary)
    vel = (ctx.vx, ctx.vy, ctx.vz)
    c, cb = ctx.c, ctx.cb
    active = ctx.active
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    dt = params.dt
    pm = params.particle_mass
    interp = ctx.interp
    pvec, gsize, n_rows = ctx.pvec, ctx.gsize, ctx.n_rows

    def mean_active(x):
        return jnp.sum(jnp.where(active, x, 0.0)) / nact

    # --- density + DFSPH factor α --------------------------------------------
    q4 = ctx.queries(width=4)
    psi_fluid = jnp.full((c,), 1.0, ctx.dtype) * pm
    src_psi = ctx.pack(slot6=psi_fluid)
    dens = PS.density_sweep(cfg, q4, src_psi, ctx.anchors, pvec, gsize,
                            n_rows=n_rows, interpret=interp)
    dens_safe = jnp.maximum(dens, 1e-12)
    al = PS.generic_sweep(cfg, PS.alpha_pair, q4, src_psi, ctx.anchors,
                          pvec, gsize, out_width=4, n_rows=n_rows,
                          interpret=interp, include_sq=True,
                          pair_fn_b=PS.alpha_pair,
                          pair_b_kw=dict(include_sq=False))
    denom = al[:, 0] ** 2 + al[:, 1] ** 2 + al[:, 2] ** 2 + al[:, 3]
    alpha = dens / jnp.maximum(denom, _EPS_DENOM)

    def drho_of(v):
        """Fused velocity-divergence sweep — the same pair formula covers
        both window groups (boundary source vel slots carry the prescribed
        rigid-motion velocities when present, zeros otherwise)."""
        q8 = ctx.queries(*v, width=8)
        src = ctx.pack(vel=v, slot6=psi_fluid)
        return PS.generic_sweep(cfg, PS.drho_pair, q8, src, ctx.anchors,
                                pvec, gsize, out_width=1, n_rows=n_rows,
                                interpret=interp,
                                pair_fn_b=PS.drho_pair)[:, 0]

    def apply_kappa(kappa, v):
        """v ← v − dt·Σ ψ(κ_i/ρ_i + κ_j/ρ_j)∇W (κ/ρ rides the implicit
        solvers' pressure-force pair: F = −m²(kd_i+kd_j)∇W, dv=(dt/m)F)."""
        kd = kappa / dens_safe
        q_kd = ctx.queries(kd)
        src = ctx.pack(slot6=kd)   # boundary region slot6 = ψ
        f = PS.generic_sweep(
            cfg, PS.grad_pressure_force_pair, q_kd, src, ctx.anchors,
            pvec, gsize, out_width=4, n_rows=n_rows, interpret=interp,
            boundary=False, pair_fn_b=PS.grad_pressure_force_pair,
            pair_b_kw=dict(boundary=True, boundary_sign=-1.0))
        return tuple(v[k] + (dt / pm) * f[:, k] for k in range(3))

    # --- divergence-free solve on the incoming velocity field ----------------
    def vcond(carry):
        v, err, it = carry
        return (((err > tol_v) | (it < cfg.dfsph_min_iters_v))
                & (it < cfg.dfsph_max_iters_v))

    def vbody(carry):
        v, _, it = carry
        drho = jnp.maximum(drho_of(v), 0.0)
        v = apply_kappa(drho * alpha / dt, v)
        return (v, dt * mean_active(drho), it + 1)

    init_v = (vel, jnp.asarray(2.0, cfg.dtype) * tol_v,
              jnp.asarray(0, jnp.int32))
    vel_df, err_v, iters_v = jax.lax.while_loop(vcond, vbody, init_v)

    # --- non-pressure forces --------------------------------------------------
    implicit_visc = cfg.viscosity_model == "implicit"
    q8 = ctx.queries(*vel_df, dens, jnp.zeros((cb,), ctx.dtype))
    f_adv = PS.fluid_force_sweep(cfg, q8, ctx.pack(vel=vel_df, slot6=dens),
                                 ctx.anchors, pvec, gsize,
                                 include_pressure=False, n_rows=n_rows,
                                 moving_boundary=ctx.moving_boundary,
                                 include_viscosity=not implicit_visc,
                                 interpret=interp)
    g = params.gravity
    v_star = tuple(vel_df[k] + (dt / pm) * (f_adv[:, k] + pm * g[k])
                   for k in range(3))
    if implicit_visc:
        # Weiler-2018 backward-Euler viscosity (solvers/viscosity.py)
        from .viscosity import implicit_viscosity_pallas
        v_sol, _, _ = implicit_viscosity_pallas(ctx, params, cfg, dens,
                                                v_star)
        v_star = tuple(jnp.where(active, v_sol[k], v_star[k])
                       for k in range(3))

    # --- constant-density solve on v* -----------------------------------------
    # warm start (Bender & Koschier 2017 §3.3): half the previous step's
    # accumulated κ (ctx.pres_prev) applied once before the loop; the
    # first step (pressure 0) is bit-identical to cold.
    kap0 = jnp.zeros_like(dens)
    if cfg.dfsph_warm_start:
        kap0 = 0.5 * jnp.maximum(
            jnp.where(active, ctx.pres_prev, 0.0), 0.0)
        v_star = apply_kappa(kap0, v_star)

    def cond(carry):
        v, kap, err, it = carry
        return (((err > tol) | (it < cfg.dfsph_min_iters))
                & (it < cfg.dfsph_max_iters))

    def body(carry):
        v, kap, _, it = carry
        rho_star = dens + dt * drho_of(v)
        comp = jnp.maximum(rho_star - params.rest_density, 0.0)
        kappa = comp * alpha / (dt * dt)
        v = apply_kappa(kappa, v)
        return (v, kap + kappa, mean_active(comp), it + 1)

    init = (v_star, kap0,
            jnp.asarray(2.0, cfg.dtype) * tol, jnp.asarray(0, jnp.int32))
    v_new, kappa, rho_err, iters = jax.lax.while_loop(cond, body, init)

    # --- integrate -------------------------------------------------------------
    pos = (ctx.px, ctx.py, ctx.pz)
    nv, np_ = [], []
    for k in range(3):
        nv.append(jnp.where(active, v_new[k], vel[k]))
        np_.append(jnp.where(active, pos[k] + dt * v_new[k], pos[k]))

    new_state = FluidState(
        pos=jnp.stack([a[:c] for a in np_], axis=1),
        vel=jnp.stack([a[:c] for a in nv], axis=1),
        pressure=jnp.where(active, kappa, 0.0)[:c],
        num_active=state.num_active)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=rho_err / params.rest_density,
        mean_compression=rho_err / params.rest_density,
        seg_overflow=ctx.miss,
        solver_iters=iters + iters_v,
    )
    return new_state, diag
