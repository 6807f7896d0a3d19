"""PCISPH step on the Pallas neighbor engine (TPU hot path).

Same physics as :func:`nereus_tpu.solvers.pcisph.pcisph_step` (the jnp
oracle implementing the predictive-corrective loop the reference stubbed
out). Boundary terms run fused (rows 9-17 of each sweep). The corrective
``lax.while_loop`` reuses the step's frozen window plans and hash masks —
standard PCISPH keeps start-of-step neighborhoods for every iteration —
while the pair *distances* use the predicted positions: the source pack's
fluid position rows are refreshed each iteration, its hash row is not.
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
from .pcisph import pcisph_delta
from .wcsph import StepDiagnostics


def pcisph_step_pallas(state: FluidState, params: SimParams,
                       grid: gridlib.Grid, cfg: SimConfig,
                       boundary: Optional[BoundaryData] = None,
                       delta=None, tol_frac: float = 0.01):
    if delta is None:
        delta = pcisph_delta(params, cfg)
    delta = jnp.asarray(delta, cfg.dtype)

    ctx = build_pallas_ctx(state, params, grid, cfg, boundary)
    pos = (ctx.px, ctx.py, ctx.pz)
    vel = (ctx.vx, ctx.vy, ctx.vz)
    c, cb = ctx.c, ctx.cb
    active = ctx.active
    dt = params.dt
    pm = params.particle_mass
    g = params.gravity
    interp = ctx.interp
    pvec, gsize, n_rows = ctx.pvec, ctx.gsize, ctx.n_rows

    # --- density + advection forces -----------------------------------------
    q4 = ctx.queries(width=4)
    psi_fluid = jnp.full((c,), 1.0, ctx.dtype) * pm
    # self term ψ·W(0) is included by the sweeps (self-pairs not excluded)
    dens = PS.density_sweep(cfg, q4, ctx.pack(slot6=psi_fluid), ctx.anchors,
                            pvec, gsize, n_rows=n_rows, interpret=interp)
    dens_safe = jnp.maximum(dens, 1e-12)
    inv_d2 = 1.0 / (dens_safe * dens_safe)

    q8 = ctx.queries(*vel, dens, width=8)
    f_adv = PS.fluid_force_sweep(cfg, q8, ctx.pack(vel=vel, slot6=dens),
                                 ctx.anchors, pvec, gsize,
                                 include_pressure=False, n_rows=n_rows,
                                 moving_boundary=ctx.moving_boundary,
                                 interpret=interp)
    f_adv = tuple(f_adv[:, k] + pm * g[k] for k in range(3))

    tol = tol_frac * params.rest_density

    # --- predictive-corrective loop ------------------------------------------
    def cond(carry):
        p, fpx, fpy, fpz, err, it = carry
        return ((err > tol) | (it < cfg.pcisph_min_iters)) & \
            (it < cfg.pcisph_max_iters)

    def body(carry):
        p, fpx, fpy, fpz, _, it = carry
        f_p = (fpx, fpy, fpz)
        pos_pred = tuple(
            pos[k] + dt * (vel[k] + (dt / pm) * (f_adv[k] + f_p[k]))
            for k in range(3))
        # predicted density over the frozen neighbor structure: columns 0-2
        # keep the start-of-step positions so the in-kernel hash masks match
        # the frozen window plan; columns 3-5 carry the predicted positions
        # for the pair distances (geom_offset=3). The source pack likewise
        # refreshes its position rows but keeps the hash row.
        q6p = ctx.queries(*pos_pred, width=8)
        src_dp = ctx.pack(slot6=psi_fluid, pos_override=pos_pred)
        rho_pred = PS.density_sweep(cfg, q6p, src_dp, ctx.anchors, pvec,
                                    gsize, n_rows=n_rows,
                                    geom_offset=3, interpret=interp)
        rho_err = jnp.maximum(rho_pred - params.rest_density, 0.0)
        rho_err = jnp.where(active, rho_err, 0.0)
        p_new = p + delta * rho_err

        pd2 = p_new * inv_d2
        q_pf = ctx.queries(pd2)
        f_p_new = PS.generic_sweep(
            cfg, PS.grad_pressure_force_pair, q_pf, ctx.pack(slot6=pd2),
            ctx.anchors, pvec, gsize, out_width=4,
            n_rows=n_rows, interpret=interp, boundary=False,
            pair_fn_b=PS.grad_pressure_force_pair,
            pair_b_kw=dict(boundary=True, boundary_sign=-1.0))
        err = jnp.max(rho_err)
        return (p_new, f_p_new[:, 0], f_p_new[:, 1], f_p_new[:, 2],
                err, it + 1)

    zc = jnp.zeros((cb,), cfg.dtype)
    p0, fp0 = zc, (zc, zc, zc)
    if cfg.pcisph_warm_start:
        # a fraction of the previous step's converged pressure
        # (ctx.pres_prev) + its force, one sweep before the loop (see
        # pcisph.py); the sweep is cond-skipped while the carried
        # pressure is all-zero (ballistic phases — pure cost otherwise)
        p0 = cfg.pcisph_warm_frac * jnp.maximum(
            jnp.where(active, ctx.pres_prev, 0.0), 0.0)

        def _warm_sweep():
            q_p0 = ctx.queries(p0 * inv_d2)
            f0 = PS.generic_sweep(
                cfg, PS.grad_pressure_force_pair, q_p0,
                ctx.pack(slot6=p0 * inv_d2),
                ctx.anchors, pvec, gsize, out_width=4,
                n_rows=n_rows, interpret=interp, boundary=False,
                pair_fn_b=PS.grad_pressure_force_pair,
                pair_b_kw=dict(boundary=True, boundary_sign=-1.0))
            return f0[:, 0], f0[:, 1], f0[:, 2]

        fp0 = jax.lax.cond(jnp.max(p0) > 0.0, _warm_sweep,
                           lambda: (zc, zc, zc))
    init = (p0, *fp0,
            jnp.asarray(jnp.inf, cfg.dtype), jnp.asarray(0, jnp.int32))
    p, fpx, fpy, fpz, err, iters = jax.lax.while_loop(cond, body, init)

    nv, np_ = [], []
    for k, fp in enumerate((fpx, fpy, fpz)):
        v = vel[k] + (dt / pm) * (f_adv[k] + fp)
        nv.append(jnp.where(active, v, vel[k]))
        np_.append(jnp.where(active, pos[k] + dt * v, pos[k]))

    new_state = FluidState(
        pos=jnp.stack([a[:c] for a in np_], axis=1),
        vel=jnp.stack([a[:c] for a in nv], axis=1),
        pressure=jnp.where(active, p, 0.0)[:c],
        num_active=state.num_active)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        # max positive predicted-density error — already compression-side
        mean_density_error=err / params.rest_density,
        mean_compression=err / params.rest_density,
        seg_overflow=ctx.miss,
        solver_iters=iters,
    )
    return new_state, diag
