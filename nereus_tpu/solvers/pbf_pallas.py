"""PBF step on the Pallas neighbor engine (TPU hot path).

Same physics as :func:`nereus_tpu.solvers.pbf.pbf_step` (the jnp
oracle). One plan on the advected positions x*; each of the
``cfg.pbf_iters`` fixed Jacobi iterations costs TWO fused sweeps — the
constraint accumulators (ρ, Σψ∇W, Σ|ψ∇W|² in one ``pbf_lambda_pair``
pass) and the position correction (``pbf_dp_pair``) — over the frozen
plan with the current iterate riding the ``geom_offset`` query columns
and re-packed source position rows (the PCISPH frozen-neighborhood
contract, ``ops/pallas_sph._pair_geometry``).
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
from .wcsph import StepDiagnostics, density_errors


def pbf_step_pallas(state: FluidState, params: SimParams,
                    grid: gridlib.Grid, cfg: SimConfig,
                    boundary: Optional[BoundaryData] = None,
                    xsph_eps=None, vorticity_eps=None):
    dt = params.dt
    pm = params.particle_mass
    rd = params.rest_density
    g = jnp.asarray(params.gravity, cfg.dtype)

    # --- external-force advection → x* ------------------------------------
    mask = state.active_mask()[:, None]
    vel_star = jnp.where(mask, state.vel + dt * g[None, :], state.vel)
    pos_star = jnp.where(mask, state.pos + dt * vel_star, state.pos)
    st = FluidState(pos=pos_star, vel=vel_star,
                    pressure=state.pressure,
                    num_active=state.num_active)

    ctx = build_pallas_ctx(st, params, grid, cfg, boundary)
    c, cb = ctx.c, ctx.cb
    active = ctx.active
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    interp = ctx.interp
    pvec, gsize, n_rows = ctx.pvec, ctx.gsize, ctx.n_rows

    x0 = (ctx.px, ctx.py, ctx.pz)          # sorted x* (plan positions)
    zeros = jnp.zeros((cb,), ctx.dtype)

    def body(_, carry):
        x, _, _ = carry
        # constraint accumulators: one fused sweep (frozen plan; current
        # iterate in query cols 4-6 + source rows 0-2)
        q8 = ctx.queries(zeros, *x, width=8)
        src = ctx.pack(slot6=jnp.full((c,), 1.0, ctx.dtype) * pm,
                       pos_override=tuple(a[:c] for a in x))
        al = PS.generic_sweep(cfg, PS.pbf_lambda_pair, q8, src,
                              ctx.anchors, pvec, gsize, out_width=8,
                              n_rows=n_rows, interpret=interp,
                              include_sq=True,
                              pair_fn_b=PS.pbf_lambda_pair,
                              pair_b_kw=dict(include_sq=False))
        dens = al[:, 0]
        comp = jnp.maximum(dens / rd - 1.0, 0.0)
        denom = (al[:, 1] ** 2 + al[:, 2] ** 2 + al[:, 3] ** 2
                 + al[:, 4]) / (rd * rd)
        lam = -comp / (denom + cfg.pbf_eps)

        # position correction: fluid slot6 = λ_j, boundary slot6 = ψ
        q_dp = ctx.queries(lam, *x, width=8)
        src_dp = ctx.pack(slot6=lam[:c],
                          pos_override=tuple(a[:c] for a in x))
        dp = PS.generic_sweep(cfg, PS.pbf_dp_pair, q_dp, src_dp,
                              ctx.anchors, pvec, gsize, out_width=4,
                              n_rows=n_rows, interpret=interp,
                              boundary=False,
                              pair_fn_b=PS.pbf_dp_pair,
                              pair_b_kw=dict(boundary=True))
        x = tuple(jnp.where(active, x[k] + dp[:, k] / rd, x[k])
                  for k in range(3))
        return (x, lam, dens)

    init = (x0, jnp.zeros((cb,), ctx.dtype), jnp.zeros((cb,), ctx.dtype))
    x_new, lam, dens = jax.lax.fori_loop(0, cfg.pbf_iters, body, init)

    vstar = (ctx.vx, ctx.vy, ctx.vz)
    vel_new = tuple(vstar[k] + (x_new[k] - x0[k]) / dt for k in range(3))
    if vorticity_eps is not None:
        # vorticity confinement (paper §5): ω from one cross-product
        # sweep, its |ω|-gradient N from the λ-accumulator pair's
        # gradient columns, then v += dt·ε (N̂ × ω). Fluid-only plan;
        # geometry over the advected configuration.
        dens_safe = jnp.maximum(dens, 1e-12)
        mrho = (jnp.full((cb,), 1.0, ctx.dtype) * params.particle_mass
                / dens_safe)
        q8w = ctx.queries(*vel_new, width=8)
        src_w = ctx.pack(vel=vel_new, slot6=mrho[:c])
        om = PS.generic_sweep(cfg, PS.pbf_omega_pair, q8w, src_w,
                              ctx.anchors_f, pvec, gsize, out_width=4,
                              n_rows=ctx.rows_local, interpret=interp)
        omn = jnp.sqrt(om[:, 0] ** 2 + om[:, 1] ** 2 + om[:, 2] ** 2)
        qn = ctx.queries(zeros, *x0, width=8)
        src_n = ctx.pack(slot6=(mrho * omn)[:c],
                         pos_override=tuple(a[:c] for a in x0))
        al_n = PS.generic_sweep(cfg, PS.pbf_lambda_pair, qn, src_n,
                                ctx.anchors_f, pvec, gsize, out_width=8,
                                n_rows=ctx.rows_local, interpret=interp,
                                include_sq=False)
        nx, ny, nz = al_n[:, 1], al_n[:, 2], al_n[:, 3]
        ninv = jax.lax.rsqrt(jnp.maximum(
            nx * nx + ny * ny + nz * nz, 1e-20))
        fx = (ny * om[:, 2] - nz * om[:, 1]) * ninv
        fy = (nz * om[:, 0] - nx * om[:, 2]) * ninv
        fz = (nx * om[:, 1] - ny * om[:, 0]) * ninv
        vel_new = (vel_new[0] + (dt * vorticity_eps) * fx,
                   vel_new[1] + (dt * vorticity_eps) * fy,
                   vel_new[2] + (dt * vorticity_eps) * fz)
    if xsph_eps is not None:
        # Monaghan XSPH on the carried velocity (the paper's viscosity);
        # geometry over the advected configuration (frozen plan)
        q8x = ctx.queries(*vel_new, dens, width=8)
        src_x = ctx.pack(vel=vel_new, slot6=dens)
        sm = PS.generic_sweep(cfg, PS.xsph_pair, q8x, src_x,
                              ctx.anchors_f, pvec, gsize, out_width=4,
                              n_rows=ctx.rows_local, interpret=interp)
        vel_new = tuple(vel_new[k] + xsph_eps * sm[:, k]
                        for k in range(3))
    nv, np_ = [], []
    for k in range(3):
        nv.append(jnp.where(active, vel_new[k],
                            (ctx.vx, ctx.vy, ctx.vz)[k]))
        np_.append(x_new[k])
    new_state = FluidState(
        pos=jnp.stack([a[:c] for a in np_], axis=1),
        vel=jnp.stack([a[:c] for a in nv], axis=1),
        pressure=jnp.where(active, lam, 0.0)[:c],
        num_active=state.num_active)
    mae, mc = density_errors(dens, active, nact, rd)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=mae, mean_compression=mc,
        seg_overflow=ctx.miss,
        solver_iters=jnp.asarray(cfg.pbf_iters, jnp.int32))
    return new_state, diag
