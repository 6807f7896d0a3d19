"""Weakly-compressible SPH (state-equation / Tait EOS) solver.

TPU-native rebuild of the reference's base solver ``Nereus::SPH``
(``sph/sph.h:23``, step pipeline ``SPH::update`` at ``sph/sph.cpp:215-285``).
One step = one jit-compiled function: hash → sort → density+EOS → forces →
symplectic Euler, with **zero host synchronisation** (the reference round-trips
the full particle state over PCIe every step, ``sph.cpp:233-234,283-284``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .. import grid as gridlib
from .. import kernels as K
from ..ops.neighbors import masked
from ..params import SimConfig, SimParams
from ..state import BoundaryData, FluidState
from . import common


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepDiagnostics:
    """On-device per-step diagnostics (replaces the reference's ad-hoc
    host-side probes: ``maxDensity`` prints, FPS title bar)."""

    max_density: jax.Array
    mean_density_error: jax.Array   # mean |rho - rho0| / rho0 over active
    # mean max(rho - rho0, 0) / rho0 over active: the COMPRESSION-side
    # error the incompressibility criterion cares about. The |.| metric
    # above is dominated by free-surface/rarefaction deficit (a splashing
    # scene reads ~0.1-0.3 there while perfectly healthy); compare THIS
    # one against the reference's ~1% criterion (its maxDensity probes,
    # sph_cuda.cu:32-41).
    mean_compression: jax.Array
    seg_overflow: jax.Array         # >0 → SimConfig windows too small
    solver_iters: jax.Array         # pressure-solver iterations (IISPH/PCISPH)


def density_errors(dens, active, nact, rest):
    """(mean |ρ−ρ₀|/ρ₀, mean max(ρ−ρ₀,0)/ρ₀) over active particles.

    ``rest`` may be a per-particle (N,) array (multiphase): each particle's
    deviation is normalized by ITS OWN rest density."""
    dev = (dens - rest) / rest
    mae = jnp.sum(jnp.where(active, jnp.abs(dev), 0.0)) / nact
    mc = jnp.sum(jnp.where(active, jnp.maximum(dev, 0.0), 0.0)) / nact
    return mae, mc


def tait_pressure(dens, params: SimParams, rho0=None):
    """Tait EOS p = k((ρ/ρ₀)⁷ − 1) (``sph_kernel_impl.cuh:426``).

    Like the reference, negative pressures are *not* clamped here.
    ``rho0`` (optional, (N,)) — per-particle rest densities (multiphase);
    each phase is weakly-compressible about ITS OWN rest density.
    """
    ratio = dens / (params.rest_density if rho0 is None else rho0)
    r2 = ratio * ratio
    return params.gas_stiffness * (r2 * r2 * r2 * ratio - 1.0)


def compute_pressure_force(ctx: common.NeighborCtx, params: SimParams,
                           cfg: SimConfig, boundary: Optional[BoundaryData],
                           dens, pres, src_dens=None, src_pres=None):
    """Symmetric WCSPH pressure force.

    Net semantics of the fpres accumulation in ``computeCellForces``
    (``sph_kernel_impl.cuh:528``, boundary term ``:594``) after the
    ``computeForces`` scalings (``:664,669`` — ·ρ_i then ·(−m/ρ_i)):

      F_p = −m Σ_j m (p_i/ρ_i² + p_j/ρ_j²) ∇W_press(r_ij)
            + m Σ_b m ψ_b (p_i/ρ_i²) ∇W_dflt(r_ib)

    (The boundary pressure term uses the default/poly6 gradient in the
    reference, not the spiky one — reproduced.)
    """
    pos = ctx.state.pos
    n = pos.shape[0]
    ir = params.interaction_radius
    pm = params.particle_mass
    dens_safe = jnp.maximum(dens, 1e-12)

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        dist2 = jnp.sum(rij * rij, axis=-1)
        ok = valid & (dist2 < ir * ir)
        grad = K.w_pressure_grad(cfg.kernel_set, rij, params)
        coef = pm * (i["p_over_d2"][:, None] + j["p_over_d2"])
        return {"fp": masked(ok, coef[..., None] * grad)}

    p_over_d2 = pres / (dens_safe * dens_safe)
    if src_dens is None:
        src_p_over_d2 = p_over_d2
    else:
        sd = jnp.maximum(src_dens, 1e-12)
        src_p_over_d2 = src_pres / (sd * sd)
    acc = common.fluid_reduce(
        ctx, pair, {"fp": jnp.zeros((n, 3), cfg.dtype)},
        {"pos": ctx.source_pos, "p_over_d2": src_p_over_d2},
        {"pos": pos, "p_over_d2": p_over_d2}, cfg)

    def bpair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        dist2 = jnp.sum(rij * rij, axis=-1)
        ok = valid & (dist2 < ir * ir)
        grad = K.w_default_grad(cfg.kernel_set, rij, params)
        coef = -pm * j["psi"] * i["p_over_d2"][:, None]
        return {"fp": masked(ok, coef[..., None] * grad)}

    acc = common.boundary_reduce(ctx, boundary, bpair, acc,
                                 {"pos": pos, "p_over_d2": p_over_d2}, cfg)
    return -pm * acc["fp"]


def multiphase_accels(ctx: common.NeighborCtx, params: SimParams,
                      cfg: SimConfig, boundary: Optional[BoundaryData],
                      dens, delta, pres, src_vol=None, src_pv2=None,
                      src_rho0=None):
    """Per-particle ACCELERATION (N, 3) for the multiphase WCSPH step,
    gravity excluded (beyond-reference — upstream is strictly
    single-phase).

    Adapted-density volume form (Solenthaler & Pajarola 2008 densities,
    Hu & Adams 2006 pressure symmetrization) with V_i = 1/δ_i the
    number-density volume — mass never appears inside a pair sum, so a
    sharp density interface exerts no spurious pressure (the mixture
    form blows up at ratios ≳2, measured):

      a_p = −(1/m_i) Σ_j (p_i V_i² + p_j V_j²) ∇W_press
            (pairwise antisymmetric force — exact momentum conservation;
             reduces to the reference's symmetric form at equal ρ)
      a_v =  2μ Σ_j V_j (r·∇W_visc)/(|r|²+0.01h²) (v_i − v_j)
            (the reference's Müller viscosity with V_j = m_j/ρ_j → 1/δ_j;
             identical at uniform phase)
      a_β =  (β/m_i) Σ_b ψ_b W r                      (wall penalty)
      a_f =  2μ m_i Σ_b ψ_b ν̂ max((v_i−v_b)·r, 0)/(1+0.01h²) ∇W_dflt,
             ν̂ = ν_wall/ρ̃_i²   (same scalings as the single-phase path)

    Every per-pair quantity is expressible from the source pair
    (V_j, p_j·V_j²) — two scalars, shipped in the Pallas engine's wide
    source (see ``_wcsph_pallas_multiphase``). ``src_vol``/``src_pv2``
    (optional, source-span arrays) override the source-side V/p·V² when
    the source array is longer than the query array (the sharded step's
    spliced ghost halos, ``parallel.domain``); default = the query-side
    values (single-chip: queries ARE the sources).

    The reference's boundary pd2 pressure term is dropped: it points
    ALONG ∇W (attractive for p>0) and is measured negligible next to the
    β penalty (CLAUDE.md physics notes); the wall-holding physics is a_β.
    XSPH is single-phase-only (gated at the step). BECKER surface
    tension applies per PHASE PAIR: a_st = −(κ_eff/m_i)·min(W, W_diam)·r⃗
    with κ_eff = κ within a phase and κ·``cfg.st_cross`` across phases
    (0 = immiscible cohesion) — exact single-phase reduction at uniform
    ρ₀. ``src_rho0`` (optional) overrides the source-side phase column
    like ``src_vol``/``src_pv2``.
    """
    from ..params import SurfaceTensionModel
    st = ctx.state
    pos, vel = st.pos, st.vel
    n = pos.shape[0]
    ir = params.interaction_radius
    dtype = cfg.dtype
    dens_safe = jnp.maximum(dens, 1e-12)
    vol = 1.0 / jnp.maximum(delta, 1e-12)
    pv2 = pres * vol * vol
    st_becker = cfg.surface_tension_model == SurfaceTensionModel.BECKER

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        dist2 = jnp.sum(rij * rij, axis=-1)
        ok = valid & (dist2 < ir * ir)
        gp = K.w_pressure_grad(cfg.kernel_set, rij, params)
        fp = (i["inv_m"][:, None]
              * (i["pv2"][:, None] + j["pv2"]))[..., None] * gp
        gv = K.w_viscosity_grad_set(cfg.kernel_set, rij, params)
        a = jnp.sum(rij * gv, axis=-1)
        b = dist2 + 0.01 * ir * ir
        fv = (j["V"] * a / b)[..., None] * (i["vel"][:, None, :] - j["vel"])
        out = {"fp": masked(ok, fp), "fv": masked(ok, fv)}
        if st_becker:
            w = K.w_value(cfg.kernel_set, rij, params)
            diameter = 2.0 * params.particle_radius
            dvec = jnp.stack([diameter, jnp.zeros_like(diameter),
                              jnp.zeros_like(diameter)])
            w_diam = K.w_value(cfg.kernel_set, dvec[None, :], params)[0]
            w_eff = jnp.minimum(w, w_diam)
            same = (i["rho0"][:, None] == j["rho0"]).astype(dtype)
            keff = params.surface_tension * (
                same + (1.0 - same) * cfg.st_cross)
            out["fst"] = masked(
                ok, (keff * i["inv_m"][:, None] * w_eff)[..., None] * rij)
        return out

    src = {"pos": ctx.source_pos, "vel": ctx.source_vel,
           "V": vol if src_vol is None else src_vol,
           "pv2": pv2 if src_pv2 is None else src_pv2}
    init = {"fp": jnp.zeros((n, 3), dtype), "fv": jnp.zeros((n, 3), dtype)}
    qdata = {"pos": pos, "vel": vel, "pv2": pv2, "inv_m": 1.0 / st.mass}
    if st_becker:
        src["rho0"] = st.rho0 if src_rho0 is None else src_rho0
        init["fst"] = jnp.zeros((n, 3), dtype)
        qdata["rho0"] = st.rho0
    acc = common.fluid_reduce(ctx, pair, init, src, qdata, cfg)

    def bpair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        dist2 = jnp.sum(rij * rij, axis=-1)
        ok = valid & (dist2 < ir * ir)
        w = K.w_value(cfg.kernel_set, rij, params)
        grad = K.w_default_grad(cfg.kernel_set, rij, params)
        fadh = (params.beta * j["psi"] * w)[..., None] * rij
        nu = (params.viscosity * ir * params.sound_speed) / \
            jnp.maximum(i["dens"][:, None] ** 2, 1e-12)
        dv = (i["vel"][:, None, :] - j["vel"] if "vel" in j
              else i["vel"][:, None, :])
        nom = jnp.maximum(jnp.sum(dv * rij, axis=-1), 0.0)
        denom = 1.0 + 0.01 * ir * ir
        pij = -nu * (nom / denom)
        ffric = -(j["psi"] * pij)[..., None] * grad
        return {"fbound": masked(ok, fadh), "ffric": masked(ok, ffric)}

    binit = {"fbound": jnp.zeros((n, 3), dtype),
             "ffric": jnp.zeros((n, 3), dtype)}
    bacc = common.boundary_reduce(
        ctx, boundary, bpair, binit,
        {"pos": pos, "vel": vel, "dens": dens}, cfg)

    a_fluid = -acc["fp"] + (2.0 * params.viscosity) * acc["fv"]
    if st_becker:
        a_fluid = a_fluid - acc["fst"]
    a_bound = bacc["fbound"] / st.mass[:, None] \
        + (2.0 * params.viscosity) * st.mass[:, None] * bacc["ffric"]
    return a_fluid + a_bound


def xsph_velocity(ctx: common.NeighborCtx, params: SimParams,
                  cfg: SimConfig, vel, dens, eps):
    """Monaghan XSPH velocity smoothing (beyond-reference; the classic
    WCSPH disorder stabilizer, Monaghan 1989):

      v̂_i = v_i + ε Σ_j (2m/(ρ_i+ρ_j)) (v_j − v_i) W(r_ij)

    over fluid neighbors. The smoothed velocity advects positions only;
    the carried momentum stays un-smoothed.
    """
    pos = ctx.state.pos
    n = pos.shape[0]
    ir = params.interaction_radius
    pm = params.particle_mass

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        dist2 = jnp.sum(rij * rij, axis=-1)
        ok = valid & (dist2 < ir * ir)
        w = K.w_value(cfg.kernel_set, rij, params)
        coef = (2.0 * pm) * w / jnp.maximum(
            i["dens"][:, None] + j["dens"], 1e-12)
        dv = j["vel"] - i["vel"][:, None, :]
        return {"dx": masked(ok, coef[..., None] * dv)}

    src = {"pos": ctx.source_pos, "vel": vel, "dens": dens}
    acc = common.fluid_reduce(
        ctx, pair, {"dx": jnp.zeros((n, 3), cfg.dtype)}, src,
        {"pos": pos, "vel": vel, "dens": dens}, cfg)
    return vel + eps * acc["dx"]


def wcsph_step(state: FluidState, params: SimParams, grid: gridlib.Grid,
               cfg: SimConfig, boundary: Optional[BoundaryData] = None,
               xsph_eps=None):
    """One WCSPH step (``SPH::update``, ``sph/sph.cpp:215-285``).

    Returns ``(new_state, StepDiagnostics)``; the new state is in hash-sorted
    order (as the reference's is after its reorder+integrate). Dispatches to
    the Pallas engine on TPU (``SimConfig.engine``); this jnp segment path
    is the everywhere-correct oracle. ``xsph_eps`` (None = off; may be a
    traced scalar — no recompile when it changes) enables Monaghan XSPH
    velocity smoothing for the position update (:func:`xsph_velocity`).
    """
    if cfg.use_pallas():
        from .wcsph_pallas import wcsph_step_pallas
        return wcsph_step_pallas(state, params, grid, cfg, boundary,
                                 xsph_eps=xsph_eps)
    ctx = common.build_ctx(state, grid, cfg, boundary)
    pos, vel = ctx.state.pos, ctx.state.vel
    active = ctx.active

    if state.multiphase:
        return _wcsph_step_multiphase(state, ctx, params, cfg, boundary,
                                      xsph_eps)

    dens = common.compute_density(ctx, params, cfg, boundary)
    pres = tait_pressure(dens, params)

    implicit_visc = cfg.viscosity_model == "implicit"
    f_np = common.compute_nonpressure_forces(
        ctx, params, cfg, boundary, dens,
        include_viscosity=not implicit_visc)
    f_p = compute_pressure_force(ctx, params, cfg, boundary, dens, pres)
    force = f_np + f_p

    # Symplectic Euler (``integrate_functor``, ``sph_kernel_impl.cuh:71-100``):
    # v += dt·F/m; x += dt·v.
    dt = params.dt
    new_vel = vel + (dt / params.particle_mass) * force
    if implicit_visc:
        # Weiler-2018 backward-Euler viscosity (solvers/viscosity.py):
        # replaces the explicit viscous term AND the boundary friction;
        # unconditionally stable at high ν (honey/lava regimes).
        from .viscosity import implicit_viscosity_oracle
        v_mat, _, _ = implicit_viscosity_oracle(
            ctx, params, cfg, boundary, dens, new_vel)
        new_vel = jnp.where(active[:, None], v_mat, new_vel)
    if xsph_eps is not None:
        v_adv = xsph_velocity(ctx, params, cfg, new_vel, dens, xsph_eps)
    else:
        v_adv = new_vel
    new_pos = pos + dt * v_adv
    new_vel = jnp.where(active[:, None], new_vel, vel)
    new_pos = jnp.where(active[:, None], new_pos, pos)

    new_state = FluidState(pos=new_pos, vel=new_vel,
                           pressure=jnp.where(active, pres, 0.0),
                           num_active=state.num_active)
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    mae, mc = density_errors(dens, active, nact, params.rest_density)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=mae,
        mean_compression=mc,
        seg_overflow=ctx.overflow,
        solver_iters=jnp.asarray(0, jnp.int32),
    )
    return new_state, diag


def _wcsph_step_multiphase(state: FluidState, ctx, params: SimParams,
                           cfg: SimConfig,
                           boundary: Optional[BoundaryData],
                           xsph_eps):
    """Multiphase WCSPH step body (jnp oracle): per-particle mass/ρ₀
    through density, EOS and the volume-form forces. See
    :func:`multiphase_accels` for the discretization."""
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
    st = ctx.state
    pos, vel = st.pos, st.vel
    active = ctx.active

    dens, delta = common.compute_density_multiphase(ctx, params, cfg,
                                                    boundary)
    pres = tait_pressure(dens, params, st.rho0)
    accel = multiphase_accels(ctx, params, cfg, boundary, dens, delta,
                              pres)

    dt = params.dt
    g = jnp.asarray(params.gravity, cfg.dtype)
    new_vel = vel + dt * (accel + g[None, :])
    new_pos = pos + dt * new_vel
    new_vel = jnp.where(active[:, None], new_vel, vel)
    new_pos = jnp.where(active[:, None], new_pos, pos)

    new_state = FluidState(pos=new_pos, vel=new_vel,
                           pressure=jnp.where(active, pres, 0.0),
                           num_active=state.num_active,
                           mass=st.mass, rho0=st.rho0)
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    mae, mc = density_errors(dens, active, nact, st.rho0)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=mae,
        mean_compression=mc,
        seg_overflow=ctx.overflow,
        solver_iters=jnp.asarray(0, jnp.int32),
    )
    return new_state, diag


def cfl_dt(state: FluidState, params: SimParams, lam: float = 0.4):
    """CFL timestep Δt = λ·h/|v|_max — written but disabled in the reference
    (``#if 0`` block, ``sph/sph.cpp:217-231``); live opt-in here."""
    vmax = jnp.max(jnp.where(state.active_mask(),
                             jnp.linalg.norm(state.vel, axis=-1), 0.0))
    return jnp.where(vmax > 0.0,
                     lam * params.interaction_radius / jnp.maximum(vmax, 1e-12),
                     params.dt)
