"""IISPH step on the Pallas neighbor engine (TPU hot path).

Same physics as :func:`nereus_tpu.solvers.iisph.iisph_step` (the jnp oracle,
including its documented intended-semantics divergences from the reference)
with every 27-cell gather replaced by gather-free Pallas window sweeps.
Boundary terms run *fused* (rows 9-17 of each sweep over one concatenated
source matrix). The relaxed-Jacobi solve stays one on-device
``lax.while_loop``; each iteration re-packs the pressure-dependent source
slots (cheap elementwise) and runs two sweeps (fluid-only Σd_ij·p_j; the
fused fluid+boundary Jacobi sum). Window plans are loop-invariant.
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


def iisph_step_pallas(state: FluidState, params: SimParams,
                      grid: gridlib.Grid, cfg: SimConfig,
                      boundary: Optional[BoundaryData] = None,
                      tol: float = 1.0, omega: float = 0.5):
    ctx = build_pallas_ctx(state, params, grid, cfg, boundary)
    vel = (ctx.vx, ctx.vy, ctx.vz)
    c, cb = ctx.c, ctx.cb
    active = ctx.active
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    dt = params.dt
    pm = params.particle_mass
    interp = ctx.interp
    pvec, gsize, n_rows = ctx.pvec, ctx.gsize, ctx.n_rows

    # --- density -----------------------------------------------------------
    q4 = ctx.queries(width=4)
    psi_fluid = jnp.full((c,), 1.0, ctx.dtype) * pm
    # self term ψ·W(0) is included by the sweep (self-pairs not excluded)
    dens = PS.density_sweep(cfg, q4, ctx.pack(slot6=psi_fluid), ctx.anchors,
                            pvec, gsize, n_rows=n_rows, interpret=interp)
    dens_safe = jnp.maximum(dens, 1e-12)
    inv_d2 = 1.0 / (dens_safe * dens_safe)

    # --- non-pressure (advection) forces ------------------------------------
    q8 = ctx.queries(*vel, dens, jnp.zeros((cb,), ctx.dtype))
    f_adv = PS.fluid_force_sweep(cfg, q8, ctx.pack(vel=vel, slot6=dens),
                                 ctx.anchors, pvec, gsize,
                                 include_pressure=False, n_rows=n_rows,
                                 moving_boundary=ctx.moving_boundary,
                                 interpret=interp)
    g = params.gravity
    vel_adv = tuple(v + (dt / pm) * (f_adv[:, k] + pm * g[k])
                    for k, v in enumerate(vel))

    # --- dii + rho_adv (fused fluid+boundary), then aii ----------------------
    q12 = ctx.queries(*vel_adv, *vel, inv_d2, width=12)
    src_p = ctx.pack(vel=vel_adv, slot6=psi_fluid)
    pr = PS.generic_sweep(cfg, PS.dii_rhoadv_pair, q12, src_p, ctx.anchors,
                          pvec, gsize, out_width=4,
                          n_rows=n_rows, interpret=interp, vel_q_offset=3,
                          pair_fn_b=PS.dii_rhoadv_pair,
                          pair_b_kw=dict(vel_q_offset=6))
    diix, diiy, diiz = (pr[:, k] for k in range(3))
    rho_adv = dens + pr[:, 3]

    dpi = pm * inv_d2
    q_aii = ctx.queries(diix, diiy, diiz, dpi, width=8)
    # aii formula is identical for fluid (ψ = m) and boundary (ψ) rows
    aii = PS.generic_sweep(cfg, PS.aii_pair, q_aii, src_p, ctx.anchors,
                           pvec, gsize, out_width=1,
                           n_rows=n_rows, interpret=interp)[:, 0]

    p0 = 0.5 * ctx.pres_prev  # p⁰ = ½·p_prev (sph_kernel_impl.cuh:1197)

    # --- relaxed-Jacobi solve, fully on device -------------------------------
    # Clamped-positive mean density error (see solvers/iisph.py — the
    # reference's signed test is a documented free-surface defect).
    def cond(carry):
        p, rho_err, it = carry
        return (((rho_err > tol) | (it < cfg.iisph_min_iters))
                & (it < cfg.iisph_max_iters))

    def body(carry):
        p, _, it = carry
        pd2 = p * inv_d2
        # Σd_ij·p_j runs over the FLUID region only (fluid-rows plan over
        # the same fused matrix — windows never reach the boundary region)
        src_sd = ctx.pack(slot6=pd2)
        sum_dij = PS.generic_sweep(
            cfg, PS.sum_dij_pair, q4, src_sd, ctx.anchors_f, pvec, gsize,
            out_width=4, n_rows=ctx.rows_local, interpret=interp)[:, :3]

        src16 = ctx.pack_wide(
            [diix, diiy, diiz, p,
             sum_dij[:, 0], sum_dij[:, 1], sum_dij[:, 2]], rows=16)
        qj = ctx.queries(sum_dij[:, 0], sum_dij[:, 1], sum_dij[:, 2],
                         dpi * p, width=8)
        # fused: fluid Jacobi sum + boundary ψ term in one sweep
        fb = PS.generic_sweep(cfg, PS.jacobi_fluid_pair, qj, src16,
                              ctx.anchors, pvec, gsize, out_width=1,
                              n_rows=n_rows, interpret=interp,
                              pair_fn_b=PS.jacobi_boundary_pair)[:, 0]

        dt2 = dt * dt
        denom = aii * dt2
        b = params.rest_density - rho_adv
        p_new = jnp.where(
            jnp.abs(denom) > 1e-12,
            (1.0 - omega) * p + (omega / denom) * (b - dt2 * fb),
            0.0)
        p_new = jnp.maximum(p_new, 0.0)
        rho_corr = rho_adv + dt2 * (fb + aii * p)
        err = jnp.maximum(rho_corr - params.rest_density, 0.0)
        rho_err = jnp.sum(jnp.where(active, err, 0.0)) / nact
        return (p_new, rho_err, it + 1)

    init = (p0, jnp.asarray(2.0, cfg.dtype) * tol, jnp.asarray(0, jnp.int32))
    p, rho_err, iters = jax.lax.while_loop(cond, body, init)

    # --- pressure force + integration ---------------------------------------
    pd2 = p * inv_d2
    q_pf = ctx.queries(pd2)
    src_pf = ctx.pack(slot6=pd2)   # boundary region slot6 = ψ
    f_p = PS.generic_sweep(
        cfg, PS.grad_pressure_force_pair, q_pf, src_pf, ctx.anchors, pvec,
        gsize, out_width=4, n_rows=n_rows,
        interpret=interp, boundary=False,
        pair_fn_b=PS.grad_pressure_force_pair,
        pair_b_kw=dict(boundary=True, boundary_sign=-1.0))

    pos = (ctx.px, ctx.py, ctx.pz)
    nv, np_ = [], []
    for k in range(3):
        v = vel_adv[k] + (dt / pm) * f_p[:, k]
        nv.append(jnp.where(active, v, vel[k]))
        np_.append(jnp.where(active, pos[k] + dt * v, pos[k]))

    new_state = FluidState(
        pos=jnp.stack([a[:c] for a in np_], axis=1),
        vel=jnp.stack([a[:c] for a in nv], axis=1),
        pressure=jnp.where(active, p, 0.0)[:c],
        num_active=state.num_active)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        # solver residual is already clamped-positive (compression side)
        mean_density_error=rho_err / params.rest_density,
        mean_compression=rho_err / params.rest_density,
        seg_overflow=ctx.miss,
        solver_iters=iters,
    )
    return new_state, diag
