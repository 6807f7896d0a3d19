"""DFSPH step with two-way rigid-body coupling (beyond-reference).

Couples the divergence-free/constant-density solver (``solvers/dfsph.py``)
to free rigid bodies through the *pressure solver* itself: each body's
Akinci shell enters

1. the fluid DENSITY (Σ ψ W) and the DFSPH factor α's gradient sum,
2. the velocity-divergence estimate Dρ/Dt (Σ ψ (v_i − v_b)·∇W with
   per-sample body velocities v + ω×r),
3. every κ velocity correction of BOTH stiffness loops, with the exact
   Newton-3rd reaction: the per-pair impulse is central (∥ r_ib), so
   force and torque accumulate from the fluid side —
   (x_b − c)×f ≡ (x_i − c)×f,
4. the non-pressure stage's Akinci friction (no Becker β penalty, no
   pressure term: incompressibility does the pushing).

**Interface coupling is Gauss–Seidel, not Jacobi**: the body's linear and
angular velocities are updated by each iteration's reaction impulse and
the NEXT iteration's divergence estimate sees the body respond (its
per-sample velocities are respliced into the packed source every
iteration). A frozen-body (Jacobi) interface diverges for light bodies
regardless of dt — the classic added-mass instability of explicit
partitioned coupling (measured here: a ρ=100 box on ρ₀=1000 water blows
up through the torque channel at dt 5e-4, 2e-4 AND 1e-4, while ρ=400 is
stable; the in-loop response is the standard cure, cf. Gissler et al.
2019, "Interlinked SPH pressure solvers for strong fluid-rigid
coupling"). The body pose (com, R) and the reaction torque arm stay
frozen across one step; gravity, wall- and body-body contact
(``_rigid_extras``) integrate once at the end.

``body`` may be a single :class:`RigidBody` or a sequence; fully traced —
moving bodies never recompile.

Reference contrast: upstream has neither DFSPH (its PCISPH is an empty
stub, ``sph/pcisph/sph_cuda.cu:944-952``) nor any body dynamics
(boundaries are immovable scenery, ``sph/sph.cpp:391-432``).
"""

from __future__ import annotations

import dataclasses as _dc
from typing import Optional

import jax
import jax.numpy as jnp

from .. import grid as gridlib
from .. import kernels as K
from ..ops.neighbors import masked, neighbor_reduce
from ..params import SimConfig, SimParams
from ..rigid import RigidBody, body_boundary, integrate_rigid
from ..state import BoundaryData, FluidState
from . import common
from .coupled import (_body_density_oracle, _body_reduce_oracle,
                      _reaction, _rigid_extras)
from .dfsph import _EPS_DENOM, _mean_active, apply_kappa, compute_drho
from .wcsph import StepDiagnostics


def dfsph_coupled_step(state: FluidState, params: SimParams,
                       grid: gridlib.Grid, cfg: SimConfig,
                       body,
                       boundary: Optional[BoundaryData] = None,
                       tol: float = 1.0, tol_v: float = 1.0):
    """One coupled DFSPH + rigid-body step.

    Returns ``(new_state, new_body_or_bodies, StepDiagnostics)``;
    tolerances as :func:`nereus_tpu.solvers.dfsph.dfsph_step`.
    """
    single = isinstance(body, RigidBody)
    bodies = (body,) if single else tuple(body)
    if state.multiphase:
        from .dfsph import _check_multiphase_cfg
        _check_multiphase_cfg(cfg)
        if cfg.use_pallas():
            out = _coupled_mp_pallas(state, params, grid, cfg, bodies,
                                     boundary, tol, tol_v)
        else:
            out = _coupled_mp_oracle(state, params, grid, cfg, bodies,
                                     boundary, tol, tol_v)
    elif cfg.use_pallas():
        out = _coupled_pallas(state, params, grid, cfg, bodies, boundary,
                              tol, tol_v)
    else:
        out = _coupled_oracle(state, params, grid, cfg, bodies, boundary,
                              tol, tol_v)
    new_state, new_bodies, diag = out
    return new_state, (new_bodies[0] if single else new_bodies), diag


def _body_inertia_world(b: RigidBody):
    return b.R @ b.inertia_body @ b.R.T


def _kick(bv_k, F, T, dt, mass, Iw):
    """Apply one reaction (force, torque) over dt to a body's (v, ω)."""
    vk, wk = bv_k
    return (vk + (dt / mass) * F, wk + dt * jnp.linalg.solve(Iw, T))


# ---------------------------------------------------------------------------
# jnp oracle
# ---------------------------------------------------------------------------

def _body_segments(ctx, cfg, grid, bd):
    coords = gridlib.cell_coords(grid, ctx.state.pos)
    bs, be = gridlib.row_segments(grid, bd.sorted_hash, coords)
    return bs, be, gridlib.segment_overflow(bs, be,
                                            cfg.boundary_seg_window)


def _body_alpha_gs(ctx, params, cfg, grid, bd):
    """Σ_b ψ_b ∇W_ib — one body's contribution to the α gradient sum."""
    pos = ctx.state.pos
    ir = params.interaction_radius

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = K.w_default_grad(cfg.kernel_set, rij, params)
        return {"gs": masked(ok, j["psi"][..., None] * g)}

    bs, be, _ = _body_segments(ctx, cfg, grid, bd)
    acc = neighbor_reduce(
        pair, {"gs": jnp.zeros((pos.shape[0], 3), cfg.dtype)}, bs, be,
        {"pos": bd.pos, "psi": bd.psi}, {"pos": pos},
        cfg.boundary_seg_window)
    return acc["gs"]


def _body_drho(ctx, params, cfg, grid, bd, vel, velb):
    """Σ_b ψ_b (v_i − v_b)·∇W_ib with the CURRENT body velocities."""
    pos = ctx.state.pos
    ir = params.interaction_radius

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = K.w_default_grad(cfg.kernel_set, rij, params)
        dv = i["vel"][:, None, :] - j["vel"]
        return {"d": masked(ok, j["psi"] * jnp.sum(dv * g, axis=-1))}

    bs, be, _ = _body_segments(ctx, cfg, grid, bd)
    acc = neighbor_reduce(
        pair, {"d": jnp.zeros((pos.shape[0],), cfg.dtype)}, bs, be,
        {"pos": bd.pos, "psi": bd.psi, "vel": velb},
        {"pos": pos, "vel": vel}, cfg.boundary_seg_window)
    return acc["d"]


def _body_kappa_dv(ctx, params, cfg, grid, bd, kd):
    """Σ_b ψ_b (κ_i/ρ_i) ∇W_ib — the body term of one κ correction
    (v ← v − dt·dv). The reaction is −pm·dv accumulated from the fluid
    side (central pair forces)."""
    pos = ctx.state.pos
    ir = params.interaction_radius

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = K.w_default_grad(cfg.kernel_set, rij, params)
        coef = j["psi"] * i["kd"][:, None]
        return {"dv": masked(ok, coef[..., None] * g)}

    bs, be, _ = _body_segments(ctx, cfg, grid, bd)
    acc = neighbor_reduce(
        pair, {"dv": jnp.zeros((pos.shape[0], 3), cfg.dtype)}, bs, be,
        {"pos": bd.pos, "psi": bd.psi}, {"pos": pos, "kd": kd},
        cfg.boundary_seg_window)
    return acc["dv"]


def _coupled_oracle(state, params, grid, cfg, bodies, boundary, tol,
                    tol_v):
    bds = [body_boundary(b, grid) for b in bodies]
    coms = [b.com for b in bodies]
    relbs = [bd.pos - b.com[None, :] for bd, b in zip(bds, bodies)]
    masses = [b.mass for b in bodies]
    Iws = [_body_inertia_world(b) for b in bodies]
    ctx = common.build_ctx(state, grid, cfg, boundary)
    pos = ctx.state.pos
    active = ctx.active
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    dt = params.dt
    pm = params.particle_mass

    dens = common.compute_density(ctx, params, cfg, boundary)
    ovf = ctx.overflow
    for bd in bds:
        dens = dens + _body_density_oracle(ctx, params, cfg, grid, bd)
        ovf = jnp.maximum(ovf, _body_segments(ctx, cfg, grid, bd)[2])
    dens_safe = jnp.maximum(dens, 1e-12)

    # α with body shells in the gradient sum (bodies, like static
    # boundaries, contribute no |ψ∇W|² term). With strong coupling
    # (SimConfig.dfsph_strong_coupling) each body also adds its MOBILITY
    # to the diagonal: per unit κ_i the body yields Δv ∝ g/M and
    # Δω ∝ I⁻¹t (t = (x_i−com)×g by centrality), feeding back
    # pm·(|g|²/M + t·I⁻¹t) into Dρ/Dt — the static-source α overshoots
    # by exactly this for light bodies (the added-mass divergence;
    # Gissler et al. 2019 put rigid unknowns inside the solve, this is
    # the diagonal of that system).
    from .dfsph import alpha_parts
    gs, sq = alpha_parts(ctx, params, cfg, boundary)
    mob = jnp.zeros_like(dens)
    for k, bd in enumerate(bds):
        gk = _body_alpha_gs(ctx, params, cfg, grid, bd)
        gs = gs + gk
        if cfg.dfsph_strong_coupling:
            tk = jnp.cross(pos - coms[k][None, :], gk)
            mob = mob + pm * (
                jnp.sum(gk * gk, axis=-1) / masses[k]
                + jnp.einsum("ni,ij,nj->n", tk,
                             jnp.linalg.inv(Iws[k]), tk))
    alpha = dens / jnp.maximum(jnp.sum(gs * gs, axis=-1) + sq + mob,
                               _EPS_DENOM)

    bv0 = tuple((b.vel, b.omega) for b in bodies)

    def body_vels(bv):
        return [bv[k][0][None, :] + jnp.cross(
            jnp.broadcast_to(bv[k][1], relbs[k].shape), relbs[k])
            for k in range(len(bodies))]

    def drho_total(vt, bv):
        d = compute_drho(ctx, params, cfg, boundary, vt)
        for k, bd in enumerate(bds):
            d = d + _body_drho(ctx, params, cfg, grid, bd, vt,
                               body_vels(bv)[k])
        return d

    def correct(v, kappa, bv):
        """One κ correction: walls + fluid via apply_kappa, plus per-body
        terms; each body's (v, ω) receives its reaction impulse so the
        next iteration sees the response (Gauss–Seidel interface)."""
        vt = jnp.stack(v, axis=1)
        v = apply_kappa(ctx, params, cfg, boundary, dens, kappa, vt)
        kd = kappa / dens_safe
        bv = list(bv)
        for k, bd in enumerate(bds):
            dv = _body_kappa_dv(ctx, params, cfg, grid, bd, kd)
            v = tuple(v[a] - dt * dv[:, a] for a in range(3))
            Fk, Tk = _reaction(pos, -pm * dv, active, coms[k])
            bv[k] = _kick(bv[k], Fk, Tk, dt, masses[k], Iws[k])
        return v, tuple(bv)

    # --- divergence-free solve ------------------------------------------
    def vcond(carry):
        _, _, err, it = carry
        return (((err > tol_v) | (it < cfg.dfsph_min_iters_v))
                & (it < cfg.dfsph_max_iters_v))

    def vbody(carry):
        v, bv, _, it = carry
        drho = jnp.maximum(drho_total(jnp.stack(v, axis=1), bv), 0.0)
        v, bv = correct(v, drho * alpha / dt, bv)
        return (v, bv, dt * _mean_active(drho, active, nact), it + 1)

    v0 = tuple(ctx.state.vel[:, k] for k in range(3))
    init_v = (v0, bv0, jnp.asarray(2.0, cfg.dtype) * tol_v,
              jnp.asarray(0, jnp.int32))
    v_df, bv, err_v, iters_v = jax.lax.while_loop(vcond, vbody, init_v)
    vel_df = jnp.stack(v_df, axis=1)

    # --- non-pressure forces + body friction ------------------------------
    ctx_adv = _dc.replace(ctx, state=FluidState(
        pos=pos, vel=vel_df, pressure=ctx.state.pressure,
        num_active=ctx.state.num_active))
    f_adv = common.compute_nonpressure_forces(ctx_adv, params, cfg,
                                              boundary, dens)
    bv = list(bv)
    zeros_pd2 = jnp.zeros_like(dens)
    for k, bd in enumerate(bds):
        bd_k = _dc.replace(bd, vel=body_vels(bv)[k])
        f_fric, _ = _body_reduce_oracle(ctx_adv, params, cfg, grid, bd_k,
                                        dens, zeros_pd2)
        f_adv = f_adv + f_fric
        Fk, Tk = _reaction(pos, f_fric, active, coms[k])
        bv[k] = _kick(bv[k], Fk, Tk, dt, masses[k], Iws[k])
    bv = tuple(bv)
    v_star = tuple(vel_df[:, k] + (dt / pm) * f_adv[:, k]
                   for k in range(3))

    # warm start (SimConfig.dfsph_warm_start): half the previous step's
    # accumulated κ, reaction-kicked like any other correction
    kap0 = jnp.zeros_like(dens)
    if cfg.dfsph_warm_start:
        kap0 = 0.5 * jnp.maximum(
            jnp.where(active, ctx.state.pressure, 0.0), 0.0)
        v_star, bv = correct(v_star, kap0, bv)

    # --- constant-density solve -------------------------------------------
    def cond(carry):
        _, _, _, err, it = carry
        return (((err > tol) | (it < cfg.dfsph_min_iters))
                & (it < cfg.dfsph_max_iters))

    def body_fn(carry):
        v, bv, kap, _, it = carry
        rho_star = dens + dt * drho_total(jnp.stack(v, axis=1), bv)
        comp = jnp.maximum(rho_star - params.rest_density, 0.0)
        kappa = comp * alpha / (dt * dt)
        v, bv = correct(v, kappa, bv)
        return (v, bv, kap + kappa, _mean_active(comp, active, nact),
                it + 1)

    init = (v_star, bv, kap0,
            jnp.asarray(2.0, cfg.dtype) * tol, jnp.asarray(0, jnp.int32))
    v_new, bv, kappa, rho_err, iters = jax.lax.while_loop(
        cond, body_fn, init)
    vel_new = jnp.stack(v_new, axis=1)

    # --- integrate ----------------------------------------------------------
    Fx, Tx = _rigid_extras(bodies, boundary, params, cfg)
    new_bodies = tuple(
        integrate_rigid(_dc.replace(b, vel=bv[k][0], omega=bv[k][1]),
                        Fx[k], Tx[k], dt, params.gravity)
        for k, b in enumerate(bodies))
    new_pos = pos + dt * vel_new
    actf = active[:, None]
    vel_new = jnp.where(actf, vel_new, ctx.state.vel)
    new_pos = jnp.where(actf, new_pos, pos)
    new_state = FluidState(pos=new_pos, vel=vel_new,
                           pressure=jnp.where(active, kappa, 0.0),
                           num_active=state.num_active)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=rho_err / params.rest_density,
        mean_compression=rho_err / params.rest_density,
        seg_overflow=ovf,
        solver_iters=iters + iters_v)
    return new_state, new_bodies, diag


# ---------------------------------------------------------------------------
# Multiphase (adapted number-density domain; see the derivation block in
# solvers/dfsph.py) — body shells enter δ̂, α̂ (incl. the mobility
# diagonal), dδ̂/dt, and every κ̂ correction exactly like walls, scaled
# by the query's s_i/m_i; the reaction momentum is exact because the
# fluid-side velocity change is known per pair (central impulses).
# Reduces to the single-phase coupled step at uniform phase (the κ̂ = ρ·κ
# correspondence of the uncoupled reduction carries over unchanged —
# every body term here is the single-phase body term divided by m_i on
# the acceleration side).
# ---------------------------------------------------------------------------

def _coupled_mp_oracle(state, params, grid, cfg, bodies, boundary, tol,
                       tol_v):
    from .coupled import _body_accel_mp_oracle
    from .dfsph import (alpha_parts_multiphase, apply_kappa_multiphase,
                        compute_drho_multiphase)
    from .wcsph import multiphase_accels

    bds = [body_boundary(b, grid) for b in bodies]
    coms = [b.com for b in bodies]
    relbs = [bd.pos - b.com[None, :] for bd, b in zip(bds, bodies)]
    masses = [b.mass for b in bodies]
    Iws = [_body_inertia_world(b) for b in bodies]
    ctx = common.build_ctx(state, grid, cfg, boundary)
    st = ctx.state
    pos = st.pos
    active = ctx.active
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    dt = params.dt
    mass, rho0 = st.mass, st.rho0
    s_phase = rho0 / params.rest_density
    sm = s_phase / mass
    im = 1.0 / mass

    dens, delta = common.compute_density_multiphase(ctx, params, cfg,
                                                    boundary)
    ovf = ctx.overflow
    for bd in bds:
        dens = dens + s_phase * _body_density_oracle(ctx, params, cfg,
                                                     grid, bd)
        ovf = jnp.maximum(ovf, _body_segments(ctx, cfg, grid, bd)[2])
    delta_hat = dens / mass
    delta0 = rho0 / mass
    vhat2 = 1.0 / jnp.maximum(delta_hat * delta_hat, 1e-24)
    to_kg = mass * (params.rest_density / rho0)

    # α̂ with body shells in the ψ gradient sum; the strong-coupling
    # mobility diagonal in adapted units is the single-phase
    # pm·(|g|²/M + t·I⁻¹t) with pm → s_i²/m_i (denominators scale as
    # 1/m² under the exact single-phase reduction)
    g, sq, bg = alpha_parts_multiphase(ctx, params, cfg, boundary)
    mob = jnp.zeros_like(dens)
    for k, bd in enumerate(bds):
        gk = _body_alpha_gs(ctx, params, cfg, grid, bd)
        bg = bg + gk
        if cfg.dfsph_strong_coupling:
            tk = jnp.cross(pos - coms[k][None, :], gk)
            mob = mob + (s_phase * s_phase * im) * (
                jnp.sum(gk * gk, axis=-1) / masses[k]
                + jnp.einsum("ni,ij,nj->n", tk,
                             jnp.linalg.inv(Iws[k]), tk))
    ghat = g + sm[:, None] * bg
    denom = jnp.sum(ghat * ghat, axis=-1) + mass * sq + mob
    alpha = mass * delta_hat * delta_hat / jnp.maximum(denom, _EPS_DENOM)

    bv0 = tuple((b.vel, b.omega) for b in bodies)

    def body_vels(bv):
        return [bv[k][0][None, :] + jnp.cross(
            jnp.broadcast_to(bv[k][1], relbs[k].shape), relbs[k])
            for k in range(len(bodies))]

    def drho_total(vt, bv):
        d = compute_drho_multiphase(ctx, params, cfg, boundary, vt)
        for k, bd in enumerate(bds):
            d = d + sm * _body_drho(ctx, params, cfg, grid, bd, vt,
                                    body_vels(bv)[k])
        return d

    def correct(v, kappa, bv):
        """One κ̂ correction (fluid + walls via apply_kappa_multiphase,
        plus each body with its Gauss–Seidel reaction kick)."""
        vt = jnp.stack(v, axis=1)
        kv2 = kappa * vhat2
        v = apply_kappa_multiphase(ctx, params, cfg, boundary, kv2, vt)
        qc = sm * kv2
        bv = list(bv)
        for k, bd in enumerate(bds):
            dv = _body_kappa_dv(ctx, params, cfg, grid, bd, qc)
            v = tuple(v[a] - dt * im * dv[:, a] for a in range(3))
            # fluid momentum rate from this body's term is −dv exactly
            # (m_i·(1/m_i)·dv); the reaction is its negation
            Fk, Tk = _reaction(pos, -dv, active, coms[k])
            bv[k] = _kick(bv[k], Fk, Tk, dt, masses[k], Iws[k])
        return v, tuple(bv)

    # --- divergence-free solve ------------------------------------------
    def vcond(carry):
        _, _, err, it = carry
        return (((err > tol_v) | (it < cfg.dfsph_min_iters_v))
                & (it < cfg.dfsph_max_iters_v))

    def vbody(carry):
        v, bv, _, it = carry
        dhat = jnp.maximum(drho_total(jnp.stack(v, axis=1), bv), 0.0)
        v, bv = correct(v, dhat * alpha / dt, bv)
        return (v, bv, dt * _mean_active(dhat * to_kg, active, nact),
                it + 1)

    v0 = tuple(st.vel[:, k] for k in range(3))
    init_v = (v0, bv0, jnp.asarray(2.0, cfg.dtype) * tol_v,
              jnp.asarray(0, jnp.int32))
    v_df, bv, err_v, iters_v = jax.lax.while_loop(vcond, vbody, init_v)
    vel_df = jnp.stack(v_df, axis=1)

    # --- non-pressure (volume-form viscosity + β walls + wall friction =
    # multiphase_accels at zero pressure) + body friction ------------------
    ctx_adv = _dc.replace(ctx, state=_dc.replace(st, vel=vel_df))
    accel_adv = multiphase_accels(ctx_adv, params, cfg, boundary, dens,
                                  delta, jnp.zeros_like(dens))
    inv_r2 = 1.0 / jnp.maximum(dens, 1e-12) ** 2
    bp0 = jnp.zeros_like(dens)      # zero pressure → friction only
    fr = mass * inv_r2
    bv = list(bv)
    for k, bd in enumerate(bds):
        bd_k = _dc.replace(bd, vel=body_vels(bv)[k])
        a_f, _ = _body_accel_mp_oracle(ctx_adv, params, cfg, grid, bd_k,
                                       bp0, fr)
        accel_adv = accel_adv + a_f
        Fk, Tk = _reaction(pos, mass[:, None] * a_f, active, coms[k])
        bv[k] = _kick(bv[k], Fk, Tk, dt, masses[k], Iws[k])
    bv = tuple(bv)
    gvec = jnp.asarray(params.gravity, cfg.dtype)
    v_star = tuple(vel_df[:, k] + dt * (accel_adv[:, k] + gvec[k])
                   for k in range(3))

    # warm start: half the previous accumulated κ̂, reaction-kicked
    kap0 = jnp.zeros_like(dens)
    if cfg.dfsph_warm_start:
        kap0 = 0.5 * jnp.maximum(
            jnp.where(active, st.pressure, 0.0), 0.0)
        v_star, bv = correct(v_star, kap0, bv)

    # --- constant-density solve -------------------------------------------
    def cond(carry):
        _, _, _, err, it = carry
        return (((err > tol) | (it < cfg.dfsph_min_iters))
                & (it < cfg.dfsph_max_iters))

    def body_fn(carry):
        v, bv, kap, _, it = carry
        dstar = delta_hat + dt * drho_total(jnp.stack(v, axis=1), bv)
        comp = jnp.maximum(dstar - delta0, 0.0)
        kappa = comp * alpha / (dt * dt)
        v, bv = correct(v, kappa, bv)
        return (v, bv, kap + kappa,
                _mean_active(comp * to_kg, active, nact), it + 1)

    init = (v_star, bv, kap0,
            jnp.asarray(2.0, cfg.dtype) * tol, jnp.asarray(0, jnp.int32))
    v_new, bv, kappa, rho_err, iters = jax.lax.while_loop(
        cond, body_fn, init)
    vel_new = jnp.stack(v_new, axis=1)

    # --- integrate ----------------------------------------------------------
    Fx, Tx = _rigid_extras(bodies, boundary, params, cfg)
    new_bodies = tuple(
        integrate_rigid(_dc.replace(b, vel=bv[k][0], omega=bv[k][1]),
                        Fx[k], Tx[k], dt, params.gravity)
        for k, b in enumerate(bodies))
    new_pos = pos + dt * vel_new
    actf = active[:, None]
    vel_new = jnp.where(actf, vel_new, st.vel)
    new_pos = jnp.where(actf, new_pos, pos)
    new_state = FluidState(pos=new_pos, vel=vel_new,
                           pressure=jnp.where(active, kappa, 0.0),
                           num_active=state.num_active,
                           mass=mass, rho0=rho0)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=rho_err / params.rest_density,
        mean_compression=rho_err / params.rest_density,
        seg_overflow=ovf,
        solver_iters=iters + iters_v)
    return new_state, new_bodies, diag


# ---------------------------------------------------------------------------
# Pallas engine
# ---------------------------------------------------------------------------

def _coupled_pallas(state, params, grid, cfg, bodies, boundary, tol,
                    tol_v):
    from ..ops import pallas_sph as PS
    from ..ops.pallas_neighbors import (anchors_pack16, hash_payload,
                                        pack_source, plan_windows)
    from .pallas_common import build_pallas_ctx, padded_len

    bds = [body_boundary(b, grid) for b in bodies]
    coms = [b.com for b in bodies]
    relbs = [bd.pos - b.com[None, :] for bd, b in zip(bds, bodies)]
    masses = [b.mass for b in bodies]
    Iws = [_body_inertia_world(b) for b in bodies]
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

    # one plan + one packed source per body (slot 6 = ψ); rows 3-5 are
    # respliced with the body's CURRENT per-sample velocities every
    # iteration (Gauss–Seidel interface — see the module docstring)
    win = ctx.win
    block = cfg.resolve_block(ctx.rows_local == 3)
    qcoords = gridlib.cell_coords_cols(grid, ctx.px, ctx.py, ctx.pz)
    plans = []
    miss_total = ctx.miss
    for bd in bds:
        mb = bd.num_boundaries
        pk16_b = anchors_pack16(padded_len(mb, win), win)
        anchors_b, miss_b = plan_windows(
            bd.sorted_hash, qcoords, gsize, block, padded_len(mb, win),
            active_mask=active, win=win, pack16=pk16_b,
            rows_local=ctx.rows_local)
        src_b = pack_source(
            tuple(bd.pos[:, k] for k in range(3)),
            hash_payload(bd.sorted_hash, ctx.dtype, gsize),
            vel=tuple(bd.vel[:, k] for k in range(3)),
            dens_or_psi=bd.psi, win=win)
        plans.append((anchors_b, src_b))
        miss_total = miss_total + miss_b

    bv0 = tuple((b.vel.astype(ctx.dtype), b.omega.astype(ctx.dtype))
                for b in bodies)

    def body_srcs(bv):
        out = []
        for k, (anchors_b, src_b) in enumerate(plans):
            vk, wk = bv[k]
            velb = vk[None, :] + jnp.cross(
                jnp.broadcast_to(wk, relbs[k].shape), relbs[k])
            rows = velb.T.astype(ctx.dtype)          # (3, M)
            out.append(jax.lax.dynamic_update_slice(src_b, rows, (3, 0)))
        return out

    # --- density + α -------------------------------------------------------
    q4 = ctx.queries(width=4)
    psi_fluid = jnp.full((c,), 1.0, ctx.dtype) * pm
    src_psi = ctx.pack(slot6=psi_fluid)
    dens = PS.density_sweep(cfg, q4, src_psi, ctx.anchors, pvec, gsize,
                            n_rows=n_rows, interpret=interp)
    al = PS.generic_sweep(cfg, PS.alpha_pair, q4, src_psi, ctx.anchors,
                          pvec, gsize, out_width=4, n_rows=n_rows,
                          interpret=interp, include_sq=True,
                          pair_fn_b=PS.alpha_pair,
                          pair_b_kw=dict(include_sq=False))
    rel_base = jnp.stack([ctx.px, ctx.py, ctx.pz], axis=1)
    mob = jnp.zeros_like(dens)
    for k, (anchors_b, src_b) in enumerate(plans):
        dens = dens + PS.density_sweep(cfg, q4, src_b, anchors_b, pvec,
                                       gsize, n_rows=ctx.rows_local,
                                       interpret=interp)
        alb = PS.generic_sweep(cfg, PS.alpha_pair, q4, src_b,
                               anchors_b, pvec, gsize, out_width=4,
                               n_rows=ctx.rows_local,
                               interpret=interp, include_sq=False)
        al = al + alb
        if cfg.dfsph_strong_coupling:
            # body-mobility diagonal (see the oracle path / params.py):
            # g = alb[:, :3] is this body's Σψ∇W; t = (x_i − com)×g
            gk = alb[:, :3]
            tk = jnp.cross(rel_base - coms[k][None, :].astype(ctx.dtype),
                           gk)
            mob = mob + pm * (
                jnp.sum(gk * gk, axis=-1) / masses[k].astype(ctx.dtype)
                + jnp.einsum("ni,ij,nj->n", tk,
                             jnp.linalg.inv(Iws[k]).astype(ctx.dtype),
                             tk))
    dens_safe = jnp.maximum(dens, 1e-12)
    denom = al[:, 0] ** 2 + al[:, 1] ** 2 + al[:, 2] ** 2 + al[:, 3] + mob
    alpha = dens / jnp.maximum(denom, _EPS_DENOM)

    def drho_of(v, src_bs):
        q8 = ctx.queries(*v, width=8)
        src = ctx.pack(vel=v, slot6=psi_fluid)
        d = PS.generic_sweep(cfg, PS.drho_pair, q8, src, ctx.anchors,
                             pvec, gsize, out_width=1, n_rows=n_rows,
                             interpret=interp,
                             pair_fn_b=PS.drho_pair)[:, 0]
        for k, (anchors_b, _) in enumerate(plans):
            d = d + PS.generic_sweep(cfg, PS.drho_pair, q8, src_bs[k],
                                     anchors_b, pvec, gsize, out_width=1,
                                     n_rows=ctx.rows_local,
                                     interpret=interp)[:, 0]
        return d

    def correct(kappa, v, bv):
        kd = kappa / dens_safe
        q_kd = ctx.queries(kd)
        src = ctx.pack(slot6=kd)   # boundary region slot6 = ψ
        f = PS.generic_sweep(
            cfg, PS.grad_pressure_force_pair, q_kd, src, ctx.anchors,
            pvec, gsize, out_width=4, n_rows=n_rows, interpret=interp,
            boundary=False, pair_fn_b=PS.grad_pressure_force_pair,
            pair_b_kw=dict(boundary=True, boundary_sign=-1.0))
        v = tuple(v[k] + (dt / pm) * f[:, k] for k in range(3))
        bv = list(bv)
        for k, (anchors_b, _) in enumerate(plans):
            fb = PS.generic_sweep(
                cfg, PS.grad_pressure_force_pair, q_kd,
                body_srcs(bv)[k], anchors_b,
                pvec, gsize, out_width=4, n_rows=ctx.rows_local,
                interpret=interp, boundary=True, boundary_sign=-1.0)
            v = tuple(v[a] + (dt / pm) * fb[:, a] for a in range(3))
            Fk, Tk = _reaction(rel_base, fb[:, :3], active, coms[k])
            bv[k] = _kick(bv[k], Fk, Tk, dt, masses[k], Iws[k])
        return v, tuple(bv)

    # --- divergence-free solve ----------------------------------------------
    def vcond(carry):
        _, _, err, it = carry
        return (((err > tol_v) | (it < cfg.dfsph_min_iters_v))
                & (it < cfg.dfsph_max_iters_v))

    def vbody(carry):
        v, bv, _, it = carry
        drho = jnp.maximum(drho_of(v, body_srcs(bv)), 0.0)
        v, bv = correct(drho * alpha / dt, v, bv)
        return (v, bv, dt * mean_active(drho), it + 1)

    init_v = (vel, bv0, jnp.asarray(2.0, cfg.dtype) * tol_v,
              jnp.asarray(0, jnp.int32))
    vel_df, bv, err_v, iters_v = jax.lax.while_loop(vcond, vbody,
                                                    init_v)

    # --- non-pressure forces + body friction ---------------------------------
    q8 = ctx.queries(*vel_df, dens, jnp.zeros((cb,), ctx.dtype))
    f_adv = PS.fluid_force_sweep(cfg, q8, ctx.pack(vel=vel_df,
                                                   slot6=dens),
                                 ctx.anchors, pvec, gsize,
                                 include_pressure=False, n_rows=n_rows,
                                 moving_boundary=ctx.moving_boundary,
                                 interpret=interp)
    fxyz = [f_adv[:, k] for k in range(3)]
    bv = list(bv)
    for k, (anchors_b, _) in enumerate(plans):
        fb = PS.generic_sweep(cfg, PS.boundary_force_pair, q8,
                              body_srcs(bv)[k], anchors_b,
                              pvec, gsize, out_width=4,
                              n_rows=ctx.rows_local, interpret=interp,
                              include_pressure=False, moving=True,
                              include_adhesion=False)
        for a in range(3):
            fxyz[a] = fxyz[a] + fb[:, a]
        Fk, Tk = _reaction(rel_base, fb[:, :3], active, coms[k])
        bv[k] = _kick(bv[k], Fk, Tk, dt, masses[k], Iws[k])
    bv = tuple(bv)
    g = params.gravity
    v_star = tuple(vel_df[k] + (dt / pm) * (fxyz[k] + pm * g[k])
                   for k in range(3))

    # warm start: half the previous step's accumulated κ (ctx.pres_prev),
    # reaction-kicked like any other correction
    kap0 = jnp.zeros_like(dens)
    if cfg.dfsph_warm_start:
        kap0 = 0.5 * jnp.maximum(
            jnp.where(active, ctx.pres_prev, 0.0), 0.0)
        v_star, bv = correct(kap0, v_star, bv)

    # --- constant-density solve -----------------------------------------------
    def cond(carry):
        _, _, _, err, it = carry
        return (((err > tol) | (it < cfg.dfsph_min_iters))
                & (it < cfg.dfsph_max_iters))

    def body_fn(carry):
        v, bv, kap, _, it = carry
        rho_star = dens + dt * drho_of(v, body_srcs(bv))
        comp = jnp.maximum(rho_star - params.rest_density, 0.0)
        kappa = comp * alpha / (dt * dt)
        v, bv = correct(kappa, v, bv)
        return (v, bv, kap + kappa, mean_active(comp), it + 1)

    init = (v_star, bv, kap0,
            jnp.asarray(2.0, cfg.dtype) * tol, jnp.asarray(0, jnp.int32))
    v_new, bv, kappa, rho_err, iters = jax.lax.while_loop(
        cond, body_fn, init)

    # --- integrate ---------------------------------------------------------
    Fx, Tx = _rigid_extras(bodies, boundary, params, cfg)
    new_bodies = tuple(
        integrate_rigid(_dc.replace(b, vel=bv[k][0], omega=bv[k][1]),
                        Fx[k], Tx[k], dt, g)
        for k, b in enumerate(bodies))
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
        seg_overflow=miss_total,
        solver_iters=iters + iters_v)
    return new_state, new_bodies, diag


def _coupled_mp_pallas(state, params, grid, cfg, bodies, boundary, tol,
                       tol_v):
    """Multiphase coupled step, Pallas engine — the adapted-domain
    formulation of :func:`_coupled_mp_oracle` on window sweeps
    (equivalence-tested). Per κ̂ correction: one fused fluid+walls sweep
    plus one ``multiphase_kappa_bpair`` sweep per body (ψ-only — the κ
    correction never reads body velocities, so the body packs stay
    static there; the dδ̂/dt sweeps resplice the current sample
    velocities per iteration, the Gauss–Seidel interface)."""
    from ..ops import pallas_sph as PS
    from ..ops.pallas_neighbors import (anchors_pack16, hash_payload,
                                        pack_source, plan_windows)
    from ..params import SurfaceTensionModel
    from .pallas_common import build_pallas_ctx, padded_len

    bds = [body_boundary(b, grid) for b in bodies]
    coms = [b.com for b in bodies]
    relbs = [bd.pos - b.com[None, :] for bd, b in zip(bds, bodies)]
    masses = [b.mass for b in bodies]
    Iws = [_body_inertia_world(b) for b in bodies]
    ctx = build_pallas_ctx(state, params, grid, cfg, boundary)
    vel = (ctx.vx, ctx.vy, ctx.vz)
    c, cb = ctx.c, ctx.cb
    active = ctx.active
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    dt = params.dt
    interp = ctx.interp
    pvec, gsize, n_rows = ctx.pvec, ctx.gsize, ctx.n_rows
    mass, rho0 = ctx.mass, ctx.rho0
    s_phase = rho0 / params.rest_density
    sm = s_phase / mass
    im = 1.0 / mass

    def mean_active(x):
        return jnp.sum(jnp.where(active, x, 0.0)) / nact

    # body plans (velocity rows respliced where the sweep needs them)
    win = ctx.win
    block = cfg.resolve_block(ctx.rows_local == 3)
    qcoords = gridlib.cell_coords_cols(grid, ctx.px, ctx.py, ctx.pz)
    plans = []
    miss_total = ctx.miss
    for bd in bds:
        mb = bd.num_boundaries
        pk16_b = anchors_pack16(padded_len(mb, win), win)
        anchors_b, miss_b = plan_windows(
            bd.sorted_hash, qcoords, gsize, block, padded_len(mb, win),
            active_mask=active, win=win, pack16=pk16_b,
            rows_local=ctx.rows_local)
        src_b = pack_source(
            tuple(bd.pos[:, k] for k in range(3)),
            hash_payload(bd.sorted_hash, ctx.dtype, gsize),
            vel=tuple(bd.vel[:, k] for k in range(3)),
            dens_or_psi=bd.psi, win=win)
        plans.append((anchors_b, src_b))
        miss_total = miss_total + miss_b

    bv0 = tuple((b.vel.astype(ctx.dtype), b.omega.astype(ctx.dtype))
                for b in bodies)

    def body_srcs(bv):
        out = []
        for k, (anchors_b, src_b) in enumerate(plans):
            vk, wk = bv[k]
            velb = vk[None, :] + jnp.cross(
                jnp.broadcast_to(wk, relbs[k].shape), relbs[k])
            out.append(jax.lax.dynamic_update_slice(
                src_b, velb.T.astype(ctx.dtype), (3, 0)))
        return out

    # --- adapted density + factor α̂ (bodies in ψ sums + mobility) -------
    q4 = ctx.queries(width=4)
    dout = PS.generic_sweep(
        cfg, PS.multiphase_density_pair, q4, ctx.pack(), ctx.anchors,
        pvec, gsize, out_width=4, pair_fn_b=PS.multiphase_density_bpair,
        n_rows=n_rows, interpret=interp)
    delta = dout[:, 0]
    bsum = dout[:, 1]
    al = PS.generic_sweep(
        cfg, PS.multiphase_alpha_pair, q4, ctx.pack(slot6=im),
        ctx.anchors, pvec, gsize, out_width=8,
        pair_fn_b=PS.multiphase_alpha_bpair,
        n_rows=n_rows, interpret=interp)
    rel_base = jnp.stack([ctx.px, ctx.py, ctx.pz], axis=1)
    bgx, bgy, bgz = al[:, 4], al[:, 5], al[:, 6]
    mob = jnp.zeros_like(delta)
    for k, (anchors_b, src_b) in enumerate(plans):
        bsum = bsum + PS.density_sweep(cfg, q4, src_b, anchors_b, pvec,
                                       gsize, n_rows=ctx.rows_local,
                                       interpret=interp)
        albk = PS.generic_sweep(
            cfg, PS.multiphase_alpha_bpair, q4, src_b, anchors_b, pvec,
            gsize, out_width=8, n_rows=ctx.rows_local, interpret=interp)
        gk = albk[:, 4:7]
        bgx = bgx + gk[:, 0]
        bgy = bgy + gk[:, 1]
        bgz = bgz + gk[:, 2]
        if cfg.dfsph_strong_coupling:
            # adapted-units body-mobility diagonal: the single-phase
            # pm·(|g|²/M + t·I⁻¹t) with pm → s²/m (see _coupled_mp_oracle)
            tk = jnp.cross(rel_base - coms[k][None, :].astype(ctx.dtype),
                           gk)
            mob = mob + (s_phase * s_phase * im) * (
                jnp.sum(gk * gk, axis=-1) / masses[k].astype(ctx.dtype)
                + jnp.einsum("ni,ij,nj->n", tk,
                             jnp.linalg.inv(Iws[k]).astype(ctx.dtype),
                             tk))
    dens = mass * delta + s_phase * bsum
    delta_hat = dens / mass
    delta0 = rho0 / mass
    vhat2 = 1.0 / jnp.maximum(delta_hat * delta_hat, 1e-24)
    to_kg = mass * (params.rest_density / rho0)
    ghx = al[:, 0] + sm * bgx
    ghy = al[:, 1] + sm * bgy
    ghz = al[:, 2] + sm * bgz
    denom = ghx * ghx + ghy * ghy + ghz * ghz + mass * al[:, 3] + mob
    alpha = mass * delta_hat * delta_hat / jnp.maximum(denom, _EPS_DENOM)

    def drho_of(v, src_bs):
        q8 = ctx.queries(*v, width=8)
        d = PS.generic_sweep(
            cfg, PS.multiphase_drho_pair, q8, ctx.pack(vel=v),
            ctx.anchors, pvec, gsize, out_width=4,
            pair_fn_b=PS.multiphase_drho_bpair,
            n_rows=n_rows, interpret=interp)
        dd = d[:, 0] + sm * d[:, 1]
        for k, (anchors_b, _) in enumerate(plans):
            db = PS.generic_sweep(
                cfg, PS.multiphase_drho_bpair, q8, src_bs[k], anchors_b,
                pvec, gsize, out_width=4, n_rows=ctx.rows_local,
                interpret=interp)[:, 1]
            dd = dd + sm * db
        return dd

    def correct(kappa, v, bv):
        kv2 = kappa * vhat2
        qc = sm * kv2
        qk = ctx.queries(kv2, qc)
        f = PS.generic_sweep(
            cfg, PS.multiphase_kappa_pair, qk, ctx.pack(slot6=kv2),
            ctx.anchors, pvec, gsize, out_width=4,
            pair_fn_b=PS.multiphase_kappa_bpair,
            n_rows=n_rows, interpret=interp)
        v = tuple(v[k] - dt * im * f[:, k] for k in range(3))
        bv = list(bv)
        for k, (anchors_b, src_b) in enumerate(plans):
            fb = PS.generic_sweep(
                cfg, PS.multiphase_kappa_bpair, qk, src_b, anchors_b,
                pvec, gsize, out_width=4, n_rows=ctx.rows_local,
                interpret=interp)
            v = tuple(v[a] - dt * im * fb[:, a] for a in range(3))
            # fluid momentum rate from this body's term = −fb exactly
            Fk, Tk = _reaction(rel_base, -fb[:, :3], active, coms[k])
            bv[k] = _kick(bv[k], Fk, Tk, dt, masses[k], Iws[k])
        return v, tuple(bv)

    # --- divergence-free solve ------------------------------------------
    def vcond(carry):
        _, _, err, it = carry
        return (((err > tol_v) | (it < cfg.dfsph_min_iters_v))
                & (it < cfg.dfsph_max_iters_v))

    def vbody(carry):
        v, bv, _, it = carry
        dhat = jnp.maximum(drho_of(v, body_srcs(bv)), 0.0)
        v, bv = correct(dhat * alpha / dt, v, bv)
        return (v, bv, dt * mean_active(dhat * to_kg), it + 1)

    init_v = (vel, bv0, jnp.asarray(2.0, cfg.dtype) * tol_v,
              jnp.asarray(0, jnp.int32))
    vel_df, bv, err_v, iters_v = jax.lax.while_loop(vcond, vbody, init_v)

    # --- non-pressure (volume form, zero pressure) + body friction -------
    vol = 1.0 / jnp.maximum(delta, 1e-12)
    inv_rho = 1.0 / jnp.maximum(dens, 1e-12)
    zcb = jnp.zeros((cb,), ctx.dtype)
    st_becker = cfg.surface_tension_model == SurfaceTensionModel.BECKER
    qcols = [*vel_df, zcb, im, mass, inv_rho]
    wcols = [vel_df[0], vel_df[1], vel_df[2], vol, zcb]
    if st_becker:
        qcols.append(rho0)
        wcols.append(rho0)
    q10 = ctx.queries(*qcols)
    src_adv = ctx.pack_wide(wcols, rows=16)
    acc4 = PS.generic_sweep(
        cfg, PS.multiphase_force_pair, q10, src_adv, ctx.anchors, pvec,
        gsize, out_width=4, pair_fn_b=PS.multiphase_boundary_pair,
        pair_b_kw={"moving": ctx.moving_boundary},
        st_becker=st_becker,
        n_rows=n_rows, interpret=interp)
    accel = [acc4[:, k] for k in range(3)]
    fr = mass * inv_rho * inv_rho
    q8b = ctx.queries(*vel_df, zcb, fr)   # bp = 0 → friction only
    bv = list(bv)
    for k, (anchors_b, _) in enumerate(plans):
        ab = PS.generic_sweep(
            cfg, PS.multiphase_body_pair, q8b, body_srcs(bv)[k],
            anchors_b, pvec, gsize, out_width=4, n_rows=ctx.rows_local,
            interpret=interp)
        for a in range(3):
            accel[a] = accel[a] + ab[:, a]
        Fk, Tk = _reaction(rel_base, mass[:, None] * ab[:, :3], active,
                           coms[k])
        bv[k] = _kick(bv[k], Fk, Tk, dt, masses[k], Iws[k])
    bv = tuple(bv)
    g = params.gravity
    v_star = tuple(vel_df[k] + dt * (accel[k] + g[k]) for k in range(3))

    # warm start: half the previous accumulated κ̂, reaction-kicked
    kap0 = jnp.zeros_like(delta)
    if cfg.dfsph_warm_start:
        kap0 = 0.5 * jnp.maximum(
            jnp.where(active, ctx.pres_prev, 0.0), 0.0)
        v_star, bv = correct(kap0, v_star, bv)

    # --- constant-density solve -------------------------------------------
    def cond(carry):
        _, _, _, err, it = carry
        return (((err > tol) | (it < cfg.dfsph_min_iters))
                & (it < cfg.dfsph_max_iters))

    def body_fn(carry):
        v, bv, kap, _, it = carry
        dstar = delta_hat + dt * drho_of(v, body_srcs(bv))
        comp = jnp.maximum(dstar - delta0, 0.0)
        kappa = comp * alpha / (dt * dt)
        v, bv = correct(kappa, v, bv)
        return (v, bv, kap + kappa, mean_active(comp * to_kg), it + 1)

    init = (v_star, bv, kap0,
            jnp.asarray(2.0, cfg.dtype) * tol, jnp.asarray(0, jnp.int32))
    v_new, bv, kappa, rho_err, iters = jax.lax.while_loop(
        cond, body_fn, init)

    # --- integrate ---------------------------------------------------------
    Fx, Tx = _rigid_extras(bodies, boundary, params, cfg)
    new_bodies = tuple(
        integrate_rigid(_dc.replace(b, vel=bv[k][0], omega=bv[k][1]),
                        Fx[k], Tx[k], dt, g)
        for k, b in enumerate(bodies))
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
        seg_overflow=miss_total,
        solver_iters=iters + iters_v)
    return new_state, new_bodies, diag
