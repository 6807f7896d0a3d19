"""PBF: Position Based Fluids (Macklin & Müller 2013) — beyond-reference.

The real-time incompressible-SPH standard: instead of solving for
pressure *forces*, a fixed number of Jacobi iterations project the
particle POSITIONS onto the constant-density constraint manifold

  C_i = ρ_i/ρ₀ − 1 ≤ 0
  λ_i = −C_i / (Σ_k |∇_{p_k} C_i|² + ε)
  Δp_i = (1/ρ₀) Σ_j m (λ_i + λ_j + scorr)∇W_ij
         + (1/ρ₀) Σ_b ψ_b λ_i ∇W_ib                 (Akinci walls)
  scorr = −k (W(r)/W(Δq·h))⁴                        (anti-clustering)

then v = (x_new − x_old)/dt, with optional XSPH smoothing (Monaghan) of
the carried velocity — the paper's viscosity. C is clamped ≥ 0 (only
compression is projected; the free surface is left to scorr), matching
this framework's IISPH/DFSPH free-surface convention.

Positions move inside the iteration, so both engines run on the
**frozen-neighborhood contract** pioneered by the PCISPH loop
(``ops/pallas_sph._pair_geometry``): the neighbor structure (sort,
window plan, hash masks / segments) is built ONCE on the advected
positions x*; pair geometry uses the current iterate through
``geom_offset`` query columns and re-packed source rows 0-2, while the
plan columns stay frozen. Per-iteration displacements are a small
fraction of h, the same regime PCISPH's predictions live in.

Solver iterations are a FIXED count (``SimConfig.pbf_iters``) — the
real-time convention (no tolerance loop, perfectly static control flow).

Reference contrast: the upstream framework has no position-based solver
at all (its newest solver is IISPH; PCISPH is an empty stub,
``sph/pcisph/sph_cuda.cu:944-952``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import grid as gridlib
from .. import kernels as K
from ..ops.neighbors import masked
from ..params import SimConfig, SimParams
from ..state import BoundaryData, FluidState
from . import common
from .wcsph import StepDiagnostics, density_errors, xsph_velocity

_EPS_DENOM_SCALE = 1.0   # cfg.pbf_eps is used directly (paper ε)


def pbf_step(state: FluidState, params: SimParams, grid: gridlib.Grid,
             cfg: SimConfig, boundary: Optional[BoundaryData] = None,
             xsph_eps=None, vorticity_eps=None):
    """One PBF step. ``xsph_eps`` (None = off; may be traced) enables
    Monaghan XSPH smoothing of the carried velocity — the paper's
    viscosity (its c ≈ 0.01). ``vorticity_eps`` enables vorticity
    confinement (paper §5): v += dt·ε (N̂ × ω) with N = ∇|ω| — restores
    the rotational energy the position projection damps.

    Returns ``(new_state, StepDiagnostics)``; ``solver_iters`` reports
    the fixed ``cfg.pbf_iters``, ``pressure`` carries the final λ
    (diagnostic)."""
    if state.multiphase:
        raise NotImplementedError(
            "multiphase (per-particle mass/rho0) is WCSPH-only; "
            "pbf refuses rather than silently dropping the columns")
    if cfg.use_pallas():
        from .pbf_pallas import pbf_step_pallas
        return pbf_step_pallas(state, params, grid, cfg, boundary,
                               xsph_eps=xsph_eps,
                               vorticity_eps=vorticity_eps)
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

    # frozen neighbor structure on x*
    ctx = common.build_ctx(st, grid, cfg, boundary)
    x0 = ctx.state.pos            # sorted x*
    vel_s = ctx.state.vel
    active = ctx.active
    n = x0.shape[0]
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    ir = params.interaction_radius

    scorr_s = np_scorr_s(params, cfg)

    def lam_parts(x):
        """(ρ, Σψ∇W, Σ|ψ∇W|²) at the current iterate (frozen segments)."""
        def pair(i, j, valid):
            rij = i["pos"][:, None, :] - j["pos"]
            ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
            w = K.w_value(cfg.kernel_set, rij, params)
            gr = K.w_default_grad(cfg.kernel_set, rij, params)
            mg = pm * gr
            return {"d": masked(ok, pm * w),
                    "gs": masked(ok, mg),
                    "sq": masked(ok, jnp.sum(mg * mg, axis=-1))}

        acc = common.fluid_reduce(
            ctx, pair,
            {"d": jnp.zeros((n,), cfg.dtype),
             "gs": jnp.zeros((n, 3), cfg.dtype),
             "sq": jnp.zeros((n,), cfg.dtype)},
            {"pos": x}, {"pos": x}, cfg)

        def bpair(i, j, valid):
            rij = i["pos"][:, None, :] - j["pos"]
            ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
            w = K.w_value(cfg.kernel_set, rij, params)
            gr = K.w_default_grad(cfg.kernel_set, rij, params)
            return {"d": masked(ok, j["psi"] * w),
                    "gs": masked(ok, j["psi"][..., None] * gr),
                    "sq": masked(ok, jnp.zeros_like(w))}

        acc = common.boundary_reduce(ctx, boundary, bpair, acc,
                                     {"pos": x}, cfg)
        # the segments engine excludes self-pairs; add the ρ self term
        # m·W(0) explicitly (the Pallas engine self-includes — its ∇W(0)
        # and scorr·0⃗ self terms are exactly 0, so only ρ differs)
        w0 = K.w_value(cfg.kernel_set,
                       jnp.zeros((1, 1, 3), cfg.dtype), params)[0, 0]
        return acc["d"] + pm * w0, acc["gs"], acc["sq"]

    def dp_of(x, lam):
        def pair(i, j, valid):
            rij = i["pos"][:, None, :] - j["pos"]
            r2 = jnp.sum(rij * rij, axis=-1)
            ok = valid & (r2 < ir * ir)
            w = K.w_value(cfg.kernel_set, rij, params)
            gr = K.w_default_grad(cfg.kernel_set, rij, params)
            t = w * scorr_s
            t2 = t * t
            coef = pm * (i["lam"][:, None] + j["lam"] - t2 * t2)
            return {"dp": masked(ok, coef[..., None] * gr)}

        acc = common.fluid_reduce(
            ctx, pair, {"dp": jnp.zeros((n, 3), cfg.dtype)},
            {"pos": x, "lam": lam}, {"pos": x, "lam": lam}, cfg)

        def bpair(i, j, valid):
            rij = i["pos"][:, None, :] - j["pos"]
            ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
            gr = K.w_default_grad(cfg.kernel_set, rij, params)
            coef = j["psi"] * i["lam"][:, None]
            return {"dp": masked(ok, coef[..., None] * gr)}

        acc = common.boundary_reduce(ctx, boundary, bpair, acc,
                                     {"pos": x, "lam": lam}, cfg)
        return acc["dp"] / rd

    def body(_, carry):
        x, _, _ = carry
        dens, gs, sq = lam_parts(x)
        comp = jnp.maximum(dens / rd - 1.0, 0.0)
        denom = (jnp.sum(gs * gs, axis=-1) + sq) / (rd * rd)
        lam = -comp / (denom + cfg.pbf_eps)
        x = jnp.where(active[:, None], x + dp_of(x, lam), x)
        return (x, lam, dens)

    init = (x0, jnp.zeros((n,), cfg.dtype), jnp.zeros((n,), cfg.dtype))
    x_new, lam, dens = jax.lax.fori_loop(0, cfg.pbf_iters, body, init)

    vel_new = vel_s + (x_new - x0) / dt
    vel_new = jnp.where(active[:, None], vel_new, ctx.state.vel)
    if vorticity_eps is not None:
        # vorticity confinement (paper §5), fluid pairs over the
        # advected configuration — mirrors the Pallas path
        dens_safe = jnp.maximum(dens, 1e-12)
        mrho = pm / dens_safe

        def om_pair(i, j, valid):
            rij = i["pos"][:, None, :] - j["pos"]
            ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
            gr = K.w_default_grad(cfg.kernel_set, rij, params)
            dv = j["vel"] - i["vel"][:, None, :]
            return {"om": masked(
                ok, j["mr"][..., None] * jnp.cross(dv, gr))}

        om = common.fluid_reduce(
            ctx, om_pair, {"om": jnp.zeros((n, 3), cfg.dtype)},
            {"pos": x0, "vel": vel_new, "mr": mrho},
            {"pos": x0, "vel": vel_new}, cfg)["om"]
        omn = jnp.linalg.norm(om, axis=-1)

        def n_pair(i, j, valid):
            rij = i["pos"][:, None, :] - j["pos"]
            ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
            gr = K.w_default_grad(cfg.kernel_set, rij, params)
            return {"gn": masked(ok, j["w"][..., None] * gr)}

        gn = common.fluid_reduce(
            ctx, n_pair, {"gn": jnp.zeros((n, 3), cfg.dtype)},
            {"pos": x0, "w": mrho * omn}, {"pos": x0}, cfg)["gn"]
        nhat = gn / jnp.maximum(
            jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-10)
        fv = jnp.cross(nhat, om)
        vel_new = jnp.where(active[:, None],
                            vel_new + (dt * vorticity_eps) * fv, vel_new)
    if xsph_eps is not None:
        v_carry = xsph_velocity(ctx, params, cfg, vel_new, dens, xsph_eps)
        vel_new = jnp.where(active[:, None], v_carry, vel_new)
    new_state = FluidState(pos=x_new, vel=vel_new,
                           pressure=jnp.where(active, lam, 0.0),
                           num_active=state.num_active)
    mae, mc = density_errors(dens, active, nact, rd)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=mae, mean_compression=mc,
        seg_overflow=ctx.overflow,
        solver_iters=jnp.asarray(cfg.pbf_iters, jnp.int32))
    return new_state, diag


def np_scorr_s(params: SimParams, cfg: SimConfig):
    """The folded scorr constant s = k^(1/4)/W(Δq·h): scorr = −(W·s)⁴
    (shared definition with ``ops.pallas_sph.build_pvec``)."""
    if cfg.pbf_scorr_k <= 0.0:
        return jnp.zeros(())
    h = params.interaction_radius
    dqv = jnp.stack([cfg.pbf_scorr_dq * h, jnp.zeros_like(h),
                     jnp.zeros_like(h)])
    wdq = K.w_value(cfg.kernel_set, dqv[None, :], params)[0]
    return (cfg.pbf_scorr_k ** 0.25) / jnp.maximum(wdq, 1e-30)
