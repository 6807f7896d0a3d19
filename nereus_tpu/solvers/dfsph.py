"""DFSPH: Divergence-Free SPH (Bender & Koschier 2015/2017).

A beyond-reference solver family: the upstream repo stops at IISPH (its
PCISPH is an empty stub, ``sph/pcisph/sph_cuda.cu:944-952``), while the
modern production standard for incompressible SPH is DFSPH — two cheap
stiffness solves per step sharing one precomputed factor α_i, enforcing
BOTH the constant-density condition (ρ = ρ₀) and the divergence-free
condition (Dρ/Dt = 0). It reuses this framework's entire neighbor
pipeline: the same sorted-hash context, the same pair-reduction shapes as
the IISPH Jacobi loop (one velocity-divergence sweep + one symmetric
stiffness-gradient sweep per iteration), and on TPU the same Pallas
window-sweep engine (``solvers/dfsph_pallas.py``).

Formulation (paper notation; ψ_b = Akinci boundary pseudo-mass):

  α_i  = ρ_i / max(|Σ_j m∇W_ij + Σ_b ψ_b∇W_ib|² + Σ_j m²|∇W_ij|², ε)
  divergence solve (start of step, velocity field v):
      Dρ_i/Dt = Σ_j m (v_i−v_j)·∇W_ij + Σ_b ψ_b v_i·∇W_ib   (clamped ≥ 0:
      only compression is corrected — the free-surface analogue of the
      IISPH p ≥ 0 clamp)
      κᵛ_i = (Dρ_i/Dt)·α_i / dt
      v_i ← v_i − dt Σ_j m (κᵛ_i/ρ_i + κᵛ_j/ρ_j)∇W_ij
                 − dt Σ_b ψ_b (κᵛ_i/ρ_i)∇W_ib
  density solve (on v* = v + dt·f_adv/m):
      ρ*_i = ρ_i + dt·(Dρ_i/Dt)(v*)
      κ_i  = max(ρ*_i − ρ₀, 0)·α_i / dt²
      v* update of the same shape; iterate until the mean clamped
      density error ≤ tol (kg/m³), then x += dt·v*.

Convergence accounting matches the IISPH rows: the mean is over active
particles, compression-side only. ``solver_iters`` reports the TOTAL
iterations of both loops (each iteration costs the same two sweeps).
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
from .wcsph import StepDiagnostics

_EPS_DENOM = 1e-6


def _grad(cfg, rij, params):
    return K.w_default_grad(cfg.kernel_set, rij, params)


def alpha_parts(ctx, params, cfg, boundary):
    """The two α accumulators: (Σ ψ∇W gradient sum incl. Akinci boundary
    terms, Σ|m∇W|² fluid-only square sum). Split out so the rigid-coupled
    step can fold body-shell gradient sums in before forming α."""
    pos = ctx.state.pos
    n = pos.shape[0]
    ir = params.interaction_radius
    pm = params.particle_mass

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = _grad(cfg, rij, params)
        mg = pm * g
        return {"gs": masked(ok, mg),
                "sq": masked(ok, jnp.sum(mg * mg, axis=-1))}

    acc = common.fluid_reduce(
        ctx, pair,
        {"gs": jnp.zeros((n, 3), cfg.dtype), "sq": jnp.zeros((n,), cfg.dtype)},
        {"pos": pos}, {"pos": pos}, cfg)

    def bpair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = _grad(cfg, rij, params)
        # static boundaries contribute to the gradient sum only
        return {"gs": masked(ok, j["psi"][..., None] * g),
                "sq": masked(ok, jnp.zeros_like(g[..., 0]))}

    acc = common.boundary_reduce(ctx, boundary, bpair, acc, {"pos": pos}, cfg)
    return acc["gs"], acc["sq"]


def compute_alpha(ctx, params, cfg, boundary, dens):
    """DFSPH factor α_i (paper eq. 9, with Akinci boundary terms in the
    gradient sum). Returns (alpha, grad_sum) — grad_sum reused by tests."""
    gs, sq = alpha_parts(ctx, params, cfg, boundary)
    denom = jnp.sum(gs * gs, axis=-1) + sq
    alpha = dens / jnp.maximum(denom, _EPS_DENOM)
    return alpha, gs


def compute_drho(ctx, params, cfg, boundary, vel):
    """Velocity-field density derivative Dρ_i/Dt (unclamped):
    Σ_j m (v_i−v_j)·∇W + Σ_b ψ_b (v_i−v_b)·∇W (v_b = 0 for static
    boundaries; prescribed rigid-motion velocity when the boundary moves)."""
    pos = ctx.state.pos
    n = pos.shape[0]
    ir = params.interaction_radius
    pm = params.particle_mass

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = _grad(cfg, rij, params)
        dv = i["vel"][:, None, :] - j["vel"]
        return {"d": masked(ok, pm * jnp.sum(dv * g, axis=-1))}

    acc = common.fluid_reduce(
        ctx, pair, {"d": jnp.zeros((n,), cfg.dtype)},
        {"pos": pos, "vel": vel}, {"pos": pos, "vel": vel}, cfg)

    def bpair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = _grad(cfg, rij, params)
        dv = (i["vel"][:, None, :] - j["vel"] if "vel" in j
              else i["vel"][:, None, :])
        dot = jnp.sum(dv * g, axis=-1)
        return {"d": masked(ok, j["psi"] * dot)}

    acc = common.boundary_reduce(ctx, boundary, bpair, acc,
                                 {"pos": pos, "vel": vel}, cfg)
    return acc["d"]


def apply_kappa(ctx, params, cfg, boundary, dens, kappa, vel):
    """v ← v − dt Σ_j m (κ_i/ρ_i + κ_j/ρ_j)∇W − dt Σ_b ψ (κ_i/ρ_i)∇W."""
    pos = ctx.state.pos
    n = pos.shape[0]
    ir = params.interaction_radius
    pm = params.particle_mass
    dt = params.dt
    kd = kappa / jnp.maximum(dens, 1e-12)

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = _grad(cfg, rij, params)
        coef = pm * (i["kd"][:, None] + j["kd"])
        return {"dv": masked(ok, coef[..., None] * g)}

    acc = common.fluid_reduce(
        ctx, pair, {"dv": jnp.zeros((n, 3), cfg.dtype)},
        {"pos": pos, "kd": kd}, {"pos": pos, "kd": kd}, cfg)

    def bpair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = _grad(cfg, rij, params)
        coef = j["psi"] * i["kd"][:, None]
        return {"dv": masked(ok, coef[..., None] * g)}

    acc = common.boundary_reduce(ctx, boundary, bpair, acc,
                                 {"pos": pos, "kd": kd}, cfg)
    return tuple(vel[:, k] - dt * acc["dv"][:, k] for k in range(3))


def _mean_active(x, active, nact):
    return jnp.sum(jnp.where(active, x, 0.0)) / nact


# ---------------------------------------------------------------------------
# Multiphase DFSPH (beyond-reference): incompressible multiphase in the
# adapted number-density domain.
#
# Work with δ̂_i = ρ̃_i/m_i = δ_i + (s_i/m_i)·B_i  (δ = Σ_j W, B = Σ_b ψW,
# s_i = ρ0_i/ρ0_ref — the same adapted density the multiphase WCSPH uses,
# divided by the particle's own mass) and the rest target δ0_i = ρ0_i/m_i.
#
#   rate:   dδ̂_i/dt = Σ_j (v_i−v_j)·∇W + (s_i/m_i) Σ_b ψ_b (v_i−v_b)·∇W
#   force:  a_i = −(1/m_i)[Σ_j (κ_iV̂_i² + κ_jV̂_j²)∇W
#                          + (s_i/m_i)·κ_iV̂_i² Σ_b ψ_b ∇W],  V̂ = 1/δ̂
#   factor: α̂_i = m_i δ̂_i² / max(|Ĝ_i|² + m_i S_i, ε),
#           Ĝ_i = Σ_j ∇W + (s_i/m_i) Σ_b ψ_b ∇W,  S_i = Σ_j |∇W|²/m_j
#   κ_i    = max(δ̂*_i − δ0_i, 0)·α̂_i/dt²   (divergence: κᵛ = D̂⁺·α̂/dt)
#
# This reduces EXACTLY to the single-phase DFSPH above at uniform phase
# (substitute V̂ = m/ρ: the force becomes Σ m(κ'_i/ρ_i + κ'_j/ρ_j)∇W with
# κ' = κ/ρ... i.e. the carried stiffness differs by the factor ρ, the
# applied velocity changes are identical) — tested in
# tests/test_multiphase.py::test_dfsph_multiphase_reduces_to_single_phase.
# Error accounting: comp·m_i·(ρ0_ref/ρ0_i) puts each phase's clamped
# deviation in the single-phase kg/m³ convention (1 ≙ 0.1% of OWN ρ₀).
# ---------------------------------------------------------------------------


def _check_multiphase_cfg(cfg: SimConfig):
    from ..params import SurfaceTensionModel
    if cfg.surface_tension_model == SurfaceTensionModel.AKINCI:
        raise NotImplementedError(
            "AKINCI surface tension is single-phase-only (its curvature "
            "correction has no per-phase meaning); multiphase supports "
            "NONE or BECKER (phase-pair cohesion, SimConfig.st_cross)")
    if cfg.viscosity_model == "implicit":
        raise NotImplementedError("implicit viscosity is single-phase-only")


def alpha_parts_multiphase(ctx, params, cfg, boundary):
    """Accumulators for the adapted-domain DFSPH factor: the UNWEIGHTED
    fluid gradient sum G = Σ_j ∇W, the mass-weighted square sum
    S = Σ_j |∇W|²/m_j, and the boundary gradient sum B⃗ = Σ_b ψ_b ∇W
    (kept separate — it scales by the query's s_i/m_i)."""
    pos = ctx.state.pos
    n = pos.shape[0]
    ir = params.interaction_radius

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = _grad(cfg, rij, params)
        return {"g": masked(ok, g),
                "s": masked(ok, j["im"] * jnp.sum(g * g, axis=-1)),
                "bg": masked(ok, jnp.zeros_like(g))}

    acc = common.fluid_reduce(
        ctx, pair,
        {"g": jnp.zeros((n, 3), cfg.dtype),
         "s": jnp.zeros((n,), cfg.dtype),
         "bg": jnp.zeros((n, 3), cfg.dtype)},
        {"pos": pos, "im": 1.0 / ctx.state.mass}, {"pos": pos}, cfg)

    def bpair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = _grad(cfg, rij, params)
        return {"g": masked(ok, jnp.zeros_like(g)),
                "s": masked(ok, jnp.zeros_like(g[..., 0])),
                "bg": masked(ok, j["psi"][..., None] * g)}

    acc = common.boundary_reduce(ctx, boundary, bpair, acc, {"pos": pos},
                                 cfg)
    return acc["g"], acc["s"], acc["bg"]


def compute_alpha_multiphase(ctx, params, cfg, boundary, delta_hat):
    """α̂_i = m_i δ̂_i² / max(|Ĝ_i|² + m_i S_i, ε)."""
    st = ctx.state
    g, s, bg = alpha_parts_multiphase(ctx, params, cfg, boundary)
    sm = (st.rho0 / params.rest_density) / st.mass
    ghat = g + sm[:, None] * bg
    denom = jnp.sum(ghat * ghat, axis=-1) + st.mass * s
    return st.mass * delta_hat * delta_hat / jnp.maximum(denom, _EPS_DENOM)


def compute_drho_multiphase(ctx, params, cfg, boundary, vel):
    """Adapted number-density rate dδ̂_i/dt (unclamped)."""
    st = ctx.state
    pos = st.pos
    n = pos.shape[0]
    ir = params.interaction_radius

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = _grad(cfg, rij, params)
        dv = i["vel"][:, None, :] - j["vel"]
        return {"d": masked(ok, jnp.sum(dv * g, axis=-1)),
                "db": masked(ok, jnp.zeros_like(g[..., 0]))}

    acc = common.fluid_reduce(
        ctx, pair,
        {"d": jnp.zeros((n,), cfg.dtype), "db": jnp.zeros((n,), cfg.dtype)},
        {"pos": pos, "vel": vel}, {"pos": pos, "vel": vel}, cfg)

    def bpair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = _grad(cfg, rij, params)
        dv = (i["vel"][:, None, :] - j["vel"] if "vel" in j
              else i["vel"][:, None, :])
        return {"d": masked(ok, jnp.zeros_like(g[..., 0])),
                "db": masked(ok, j["psi"] * jnp.sum(dv * g, axis=-1))}

    acc = common.boundary_reduce(ctx, boundary, bpair, acc,
                                 {"pos": pos, "vel": vel}, cfg)
    sm = (st.rho0 / params.rest_density) / st.mass
    return acc["d"] + sm * acc["db"]


def apply_kappa_multiphase(ctx, params, cfg, boundary, kv2, vel):
    """v ← v − (dt/m_i)[Σ_j (κV̂²_i + κV̂²_j)∇W + (s_i/m_i)κV̂²_i Σ_b ψ∇W].

    ``kv2`` is the per-particle κ·V̂² (the caller owns the κ → κV̂²
    conversion so the warm start and both loops share one code path)."""
    st = ctx.state
    pos = st.pos
    n = pos.shape[0]
    ir = params.interaction_radius
    dt = params.dt
    sm = (st.rho0 / params.rest_density) / st.mass
    qc = sm * kv2

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = _grad(cfg, rij, params)
        coef = i["kv2"][:, None] + j["kv2"]
        return {"dv": masked(ok, coef[..., None] * g)}

    acc = common.fluid_reduce(
        ctx, pair, {"dv": jnp.zeros((n, 3), cfg.dtype)},
        {"pos": pos, "kv2": kv2}, {"pos": pos, "kv2": kv2}, cfg)

    def bpair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = _grad(cfg, rij, params)
        coef = j["psi"] * i["qc"][:, None]
        return {"dv": masked(ok, coef[..., None] * g)}

    acc = common.boundary_reduce(ctx, boundary, bpair, acc,
                                 {"pos": pos, "qc": qc}, cfg)
    im = 1.0 / st.mass
    return tuple(vel[:, k] - dt * im * acc["dv"][:, k] for k in range(3))


def _dfsph_step_multiphase(state: FluidState, params: SimParams,
                           grid: gridlib.Grid, cfg: SimConfig,
                           boundary: Optional[BoundaryData],
                           tol: float, tol_v: float):
    """Multiphase DFSPH step body (jnp oracle) — see the derivation block
    above. Same loop structure, tolerances and warm-start contract as the
    single-phase :func:`dfsph_step`; ``state.pressure`` carries the
    accumulated ADAPTED-domain stiffness κ̂."""
    from .wcsph import density_errors, multiphase_accels

    ctx = common.build_ctx(state, grid, cfg, boundary)
    st = ctx.state
    pos, vel = st.pos, st.vel
    active = ctx.active
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    dt = params.dt

    dens, delta = common.compute_density_multiphase(ctx, params, cfg,
                                                    boundary)
    delta_hat = dens / st.mass
    delta0 = st.rho0 / st.mass
    vhat2 = 1.0 / jnp.maximum(delta_hat * delta_hat, 1e-24)
    alpha = compute_alpha_multiphase(ctx, params, cfg, boundary, delta_hat)
    # clamped deviations in the single-phase kg/m³ convention: each
    # phase's error relative to its OWN rest density, times ρ0_ref
    to_kg = st.mass * (params.rest_density / st.rho0)

    def apply_k(kappa, vt):
        return apply_kappa_multiphase(ctx, params, cfg, boundary,
                                      kappa * vhat2, vt)

    # --- divergence-free solve ------------------------------------------
    def vcond(carry):
        v, err, it = carry
        return (((err > tol_v) | (it < cfg.dfsph_min_iters_v))
                & (it < cfg.dfsph_max_iters_v))

    def vbody(carry):
        v, _, it = carry
        vt = jnp.stack(v, axis=1)
        dhat = jnp.maximum(
            compute_drho_multiphase(ctx, params, cfg, boundary, vt), 0.0)
        v = apply_k(dhat * alpha / dt, vt)
        err = dt * _mean_active(dhat * to_kg, active, nact)
        return (v, err, it + 1)

    v0 = tuple(vel[:, k] for k in range(3))
    init_v = (v0, jnp.asarray(2.0, cfg.dtype) * tol_v,
              jnp.asarray(0, jnp.int32))
    v_df, err_v, iters_v = jax.lax.while_loop(vcond, vbody, init_v)
    vel_df = jnp.stack(v_df, axis=1)

    # --- non-pressure forces (volume-form viscosity + β walls + friction:
    # multiphase_accels with zero pressure IS the non-pressure subset) ---
    import dataclasses as _dc
    ctx_adv = _dc.replace(ctx, state=_dc.replace(st, vel=vel_df))
    accel_adv = multiphase_accels(ctx_adv, params, cfg, boundary, dens,
                                  delta, jnp.zeros_like(dens))
    g = jnp.asarray(params.gravity, cfg.dtype)
    v_star = tuple(vel_df[:, k] + dt * (accel_adv[:, k] + g[k])
                   for k in range(3))

    # --- constant-density solve on v* ------------------------------------
    kap0 = jnp.zeros_like(dens)
    if cfg.dfsph_warm_start:
        kap0 = 0.5 * jnp.maximum(jnp.where(active, st.pressure, 0.0), 0.0)
        v_star = apply_k(kap0, jnp.stack(v_star, axis=1))

    def cond(carry):
        v, kap, err, it = carry
        return (((err > tol) | (it < cfg.dfsph_min_iters))
                & (it < cfg.dfsph_max_iters))

    def body(carry):
        v, kap, _, it = carry
        vt = jnp.stack(v, axis=1)
        dstar = delta_hat + dt * compute_drho_multiphase(
            ctx, params, cfg, boundary, vt)
        comp = jnp.maximum(dstar - delta0, 0.0)
        kappa = comp * alpha / (dt * dt)
        v = apply_k(kappa, vt)
        err = _mean_active(comp * to_kg, active, nact)
        return (v, kap + kappa, err, it + 1)

    init = (v_star, kap0,
            jnp.asarray(2.0, cfg.dtype) * tol, jnp.asarray(0, jnp.int32))
    v_new, kappa, rho_err, iters = jax.lax.while_loop(cond, body, init)
    vel_new = jnp.stack(v_new, axis=1)

    new_pos = pos + dt * vel_new
    vel_new = jnp.where(active[:, None], vel_new, st.vel)
    new_pos = jnp.where(active[:, None], new_pos, pos)
    new_state = FluidState(pos=new_pos, vel=vel_new,
                           pressure=jnp.where(active, kappa, 0.0),
                           num_active=state.num_active,
                           mass=st.mass, rho0=st.rho0)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=rho_err / params.rest_density,
        mean_compression=rho_err / params.rest_density,
        seg_overflow=ctx.overflow,
        solver_iters=iters + iters_v,
    )
    return new_state, diag


def dfsph_step(state: FluidState, params: SimParams, grid: gridlib.Grid,
               cfg: SimConfig, boundary: Optional[BoundaryData] = None,
               tol: float = 1.0, tol_v: float = 1.0):
    """One DFSPH step. ``tol``: mean predicted-density error bound in
    kg/m³ for the constant-density solve (same convention as IISPH's
    reference tolerance, 1 ≙ 0.1% of ρ₀). ``tol_v``: bound on
    dt·mean(max(Dρ/Dt, 0)) — the per-step density drift the remaining
    divergence would cause — in the same kg/m³ units.

    Returns ``(new_state, StepDiagnostics)``; ``solver_iters`` is the
    total of divergence + density iterations, ``pressure`` carries the
    ACCUMULATED density-solver stiffness κ — the next step's warm start
    (``SimConfig.dfsph_warm_start``; the divergence loop is not
    warm-started, it usually exits at its configured minimum).
    """
    if state.multiphase:
        _check_multiphase_cfg(cfg)
        if cfg.use_pallas():
            from .dfsph_pallas import dfsph_multiphase_pallas
            return dfsph_multiphase_pallas(state, params, grid, cfg,
                                           boundary, tol=tol, tol_v=tol_v)
        return _dfsph_step_multiphase(state, params, grid, cfg, boundary,
                                      tol, tol_v)
    if cfg.use_pallas():
        from .dfsph_pallas import dfsph_step_pallas
        return dfsph_step_pallas(state, params, grid, cfg, boundary,
                                 tol=tol, tol_v=tol_v)
    ctx = common.build_ctx(state, grid, cfg, boundary)
    pos, vel = ctx.state.pos, ctx.state.vel
    active = ctx.active
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    dt = params.dt
    pm = params.particle_mass

    dens = common.compute_density(ctx, params, cfg, boundary)
    alpha, _ = compute_alpha(ctx, params, cfg, boundary, dens)

    # --- divergence-free solve on the incoming velocity field ---------------
    def vcond(carry):
        v, err, it = carry
        return (((err > tol_v) | (it < cfg.dfsph_min_iters_v))
                & (it < cfg.dfsph_max_iters_v))

    def vbody(carry):
        v, _, it = carry
        vt = jnp.stack(v, axis=1)
        drho = jnp.maximum(compute_drho(ctx, params, cfg, boundary, vt), 0.0)
        kappa_v = drho * alpha / dt
        v = apply_kappa(ctx, params, cfg, boundary, dens, kappa_v, vt)
        err = dt * _mean_active(drho, active, nact)
        return (v, err, it + 1)

    v0 = tuple(vel[:, k] for k in range(3))
    init_v = (v0, jnp.asarray(2.0, cfg.dtype) * tol_v,
              jnp.asarray(0, jnp.int32))
    v_df, err_v, iters_v = jax.lax.while_loop(vcond, vbody, init_v)
    vel_df = jnp.stack(v_df, axis=1)

    # --- non-pressure forces (on the divergence-corrected velocities) --------
    import dataclasses as _dc
    ctx_adv = _dc.replace(ctx, state=FluidState(
        pos=pos, vel=vel_df, pressure=ctx.state.pressure,
        num_active=ctx.state.num_active))
    implicit_visc = cfg.viscosity_model == "implicit"
    f_adv = common.compute_nonpressure_forces(
        ctx_adv, params, cfg, boundary, dens,
        include_viscosity=not implicit_visc)
    v_star = tuple(vel_df[:, k] + (dt / pm) * f_adv[:, k] for k in range(3))
    if implicit_visc:
        # Weiler-2018 backward-Euler viscosity (solvers/viscosity.py):
        # unconditionally stable at high ν; replaces the explicit term
        # AND the boundary friction
        from .viscosity import implicit_viscosity_oracle
        v_mat, _, _ = implicit_viscosity_oracle(
            ctx, params, cfg, boundary, dens, jnp.stack(v_star, axis=1))
        v_star = tuple(jnp.where(active, v_mat[:, k], v_star[k])
                       for k in range(3))

    # --- constant-density solve on v* ---------------------------------------
    # warm start (Bender & Koschier 2017 §3.3): apply half the previous
    # step's ACCUMULATED stiffness (carried in state.pressure) once before
    # the loop; the loop then only solves the residual. κ ≥ 0 by
    # construction; the first step (pressure 0) is bit-identical to cold.
    kap0 = jnp.zeros_like(dens)
    if cfg.dfsph_warm_start:
        kap0 = 0.5 * jnp.maximum(
            jnp.where(active, ctx.state.pressure, 0.0), 0.0)
        v_star = apply_kappa(ctx, params, cfg, boundary, dens, kap0,
                             jnp.stack(v_star, axis=1))

    def cond(carry):
        v, kap, err, it = carry
        return (((err > tol) | (it < cfg.dfsph_min_iters))
                & (it < cfg.dfsph_max_iters))

    def body(carry):
        v, kap, _, it = carry
        vt = jnp.stack(v, axis=1)
        rho_star = dens + dt * compute_drho(ctx, params, cfg, boundary, vt)
        comp = jnp.maximum(rho_star - params.rest_density, 0.0)
        kappa = comp * alpha / (dt * dt)
        v = apply_kappa(ctx, params, cfg, boundary, dens, kappa, vt)
        err = _mean_active(comp, active, nact)
        return (v, kap + kappa, err, it + 1)

    init = (v_star, kap0,
            jnp.asarray(2.0, cfg.dtype) * tol, jnp.asarray(0, jnp.int32))
    v_new, kappa, rho_err, iters = jax.lax.while_loop(cond, body, init)
    vel_new = jnp.stack(v_new, axis=1)

    new_pos = pos + dt * vel_new
    vel_new = jnp.where(active[:, None], vel_new, ctx.state.vel)
    new_pos = jnp.where(active[:, None], new_pos, pos)
    new_state = FluidState(pos=new_pos, vel=vel_new,
                           pressure=jnp.where(active, kappa, 0.0),
                           num_active=state.num_active)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=rho_err / params.rest_density,
        mean_compression=rho_err / params.rest_density,
        seg_overflow=ctx.overflow,
        solver_iters=iters + iters_v,
    )
    return new_state, diag
