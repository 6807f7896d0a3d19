"""PCISPH: Predictive-Corrective Incompressible SPH.

The reference declares ``Nereus::PCISPH`` (``sph/pcisph/pcisph.h:8``) and
allocates its per-particle state (RhoAdv, VelAdv, ForcesAdv, ForcesP, PosAdv —
``sph/pcisph/pcisph.h:28-34``) but the actual corrective loop is an **empty
stub** (``sph/sph_cuda.cu:944-952``, ``sph/sph_kernel_impl.cuh:1722-1730``);
its ``update()`` only runs the WCSPH density/EOS pass
(``sph/pcisph/pcisph.cpp:161-204``). This module implements the *intended*
algorithm in full (Solenthaler & Pajarola 2009, the paper the allocated
arrays map onto), TPU-native:

  1. densities + non-pressure (advection) forces — shared pipeline;
  2. precomputed stiffness δ from a prototype filled neighborhood
     (:func:`pcisph_delta`, host-side, once per parameter set);
  3. predictive-corrective loop as a ``lax.while_loop``: predict x*,v* from
     current pressure forces → predict density at x* over the step's fixed
     neighbor segments → accumulate p += δ·(ρ*−ρ₀) → recompute pressure
     force — with an on-device max-density-error convergence check (the
     host-blocking reduce the reference's IISPH uses per iteration,
     ``sph_cuda.cu:817-819``, never leaves the device here);
  4. symplectic-Euler integration with the converged pressure force.

Parameter defaults follow ``sph/pcisph/pcisph.cpp:37-80`` (note: particle
mass has no 0.5 factor there, ``pcisph.cpp:48-51``).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import grid as gridlib
from .. import kernels as K
from ..ops.neighbors import masked
from ..params import KernelSet, SimConfig, SimParams
from ..state import BoundaryData, FluidState
from . import common
from .wcsph import StepDiagnostics


def pcisph_grad_denom(params: SimParams, cfg: SimConfig,
                      spacing: float | None = None) -> float:
    """The dt-independent lattice term of the PCISPH stiffness:

    S = −(Σ_j ∇W_ij)·(Σ_j ∇W_ij) − Σ_j ∇W_ij·∇W_ij

    over a template particle with a completely filled neighborhood (a
    rest-spacing lattice clipped to the support radius). Host-side, once
    per parameter set. δ(dt) = −1 / (2 (dt m / ρ₀)² · S); split out so an
    adaptive-CFL step can recompute δ from a *traced* dt
    (:func:`pcisph_delta_from_denom`).
    """
    h = float(params.interaction_radius)
    if spacing is None:
        # Physical packing distance: one particle diameter (reference default
        # particleRadius 0.02, ``pcisph.cpp:47``). The mass-derived rest
        # spacing (m/ρ₀)^⅓ degenerates to exactly h for the reference's
        # PCISPH mass m = h³ρ₀ (``pcisph.cpp:48-51``) — a lattice with all
        # neighbors *on* the support boundary where ∇W ≡ 0 — so the diameter
        # is the robust prototype spacing.
        spacing = 2.0 * float(params.particle_radius)
    # support radius: h for the Müller set, 2h for the Monaghan spline
    support = h if cfg.kernel_set == KernelSet.MULLER else 2.0 * h
    k = int(math.ceil(support / spacing)) + 1
    ax = np.arange(-k, k + 1) * spacing
    xx, yy, zz = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=-1)
    r2 = np.sum(pts * pts, axis=-1)
    pts = pts[(r2 > 1e-12) & (r2 <= support * support)]

    grads = np.asarray(K.w_default_grad(cfg.kernel_set,
                                        jnp.asarray(pts, cfg.dtype), params),
                       dtype=np.float64)
    sum_g = grads.sum(axis=0)
    sum_gg = float(np.sum(grads * grads))
    denom = -float(sum_g @ sum_g) - sum_gg
    if denom == 0.0:
        raise ValueError(
            "degenerate PCISPH prototype neighborhood (all ∇W = 0); "
            "pass an explicit `spacing` < support radius")
    return denom


def pcisph_delta_from_denom(params: SimParams, denom: float, dt=None):
    """δ(dt) = −1 / (2 (dt m / ρ₀)² · S) — jnp-traceable in ``dt`` so an
    adaptive-CFL step can rescale the stiffness per step."""
    dt = params.dt if dt is None else dt
    beta = 2.0 * (dt * params.particle_mass / params.rest_density) ** 2
    return -1.0 / (beta * denom)


def pcisph_delta(params: SimParams, cfg: SimConfig,
                 spacing: float | None = None) -> float:
    """Precompute the PCISPH stiffness δ from a prototype filled neighborhood.

    δ = −1 / (β (−(Σ_j ∇W_ij)·(Σ_j ∇W_ij) − Σ_j ∇W_ij·∇W_ij)), with
    β = 2 (dt m / ρ₀)². Host-side, once per parameter set — the analogue of
    the kernel-constant precompute at ``sph/sph.cpp:73-86`` for the solve
    the reference never finished. (Host precompute: call OUTSIDE jit.)
    """
    return float(pcisph_delta_from_denom(
        params, pcisph_grad_denom(params, cfg, spacing),
        dt=float(params.dt)))


def _predicted_density(ctx, params, cfg, boundary, pos_pred):
    """Density at predicted positions over the step's fixed neighbor segments.

    Standard PCISPH reuses the start-of-step neighborhoods for every
    corrective iteration (positions move ≪ h per iteration); only the pair
    distances use x*.
    """
    ir = params.interaction_radius
    pm = params.particle_mass
    n = pos_pred.shape[0]

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        dist2 = jnp.sum(rij * rij, axis=-1)
        ok = valid & (dist2 < ir * ir)
        return {"dens": masked(ok, pm * K.w_value(cfg.kernel_set, rij, params))}

    acc = common.fluid_reduce(
        ctx, pair, {"dens": jnp.zeros((n,), cfg.dtype)},
        {"pos": pos_pred}, {"pos": pos_pred}, cfg)

    def bpair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        dist2 = jnp.sum(rij * rij, axis=-1)
        ok = valid & (dist2 < ir * ir)
        return {"dens": masked(ok, j["psi"] * K.w_value(cfg.kernel_set, rij, params))}

    acc = common.boundary_reduce(ctx, boundary, bpair, acc,
                                 {"pos": pos_pred}, cfg)
    zero = jnp.zeros((1, 3), dtype=cfg.dtype)
    self_w = pm * K.w_value(cfg.kernel_set, zero, params)[0]
    return acc["dens"] + self_w


def _pressure_force(ctx, params, cfg, boundary, dens, p):
    """Symmetric pressure force from the corrective pressure field.

    Same form as the IISPH final force (``computePressureForce``,
    ``sph_kernel_impl.cuh:1497-1620``): F = −m² Σ_j (p_i/ρ_i² + p_j/ρ_j²)∇W,
    plus the ψ-weighted boundary mirror term.
    """
    pos = ctx.state.pos
    n = pos.shape[0]
    ir = params.interaction_radius
    pm = params.particle_mass
    pd2 = p / jnp.maximum(dens, 1e-12) ** 2

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = K.w_default_grad(cfg.kernel_set, rij, params)
        coef = -pm * pm * (i["pd2"][:, None] + j["pd2"])
        return {"f": masked(ok, coef[..., None] * g)}

    acc = common.fluid_reduce(
        ctx, pair, {"f": jnp.zeros((n, 3), cfg.dtype)},
        {"pos": pos, "pd2": pd2}, {"pos": pos, "pd2": pd2}, cfg)

    def bpair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = K.w_default_grad(cfg.kernel_set, rij, params)
        coef = -pm * j["psi"] * i["pd2"][:, None]
        return {"f": masked(ok, coef[..., None] * g)}

    acc = common.boundary_reduce(ctx, boundary, bpair, acc,
                                 {"pos": pos, "pd2": pd2}, cfg)
    return acc["f"]


def pcisph_step(state: FluidState, params: SimParams, grid: gridlib.Grid,
                cfg: SimConfig, boundary: Optional[BoundaryData] = None,
                delta: float | jax.Array | None = None,
                tol_frac: float = 0.01):
    """One PCISPH step.

    Args:
      delta: precomputed stiffness from :func:`pcisph_delta`. Pass it in when
        stepping inside ``jit``/``scan`` (it is a host precompute); if None it
        is computed here (fine outside jit).
      tol_frac: max density error as a fraction of ρ₀ for convergence
        (standard PCISPH targets 1%).

    Returns ``(new_state, StepDiagnostics)`` with the corrective iteration
    count in ``solver_iters``. Dispatches to the Pallas engine on TPU
    (``SimConfig.engine``).
    """
    if state.multiphase:
        raise NotImplementedError(
            "multiphase (per-particle mass/rho0) is WCSPH-only; "
            "pcisph refuses rather than silently dropping the columns")
    if cfg.use_pallas():
        from .pcisph_pallas import pcisph_step_pallas
        return pcisph_step_pallas(state, params, grid, cfg, boundary,
                                  delta=delta, tol_frac=tol_frac)
    if delta is None:
        delta = pcisph_delta(params, cfg)
    delta = jnp.asarray(delta, cfg.dtype)

    ctx = common.build_ctx(state, grid, cfg, boundary)
    pos, vel = ctx.state.pos, ctx.state.vel
    active = ctx.active
    dt = params.dt
    pm = params.particle_mass

    dens = common.compute_density(ctx, params, cfg, boundary)
    f_adv = common.compute_nonpressure_forces(ctx, params, cfg, boundary, dens)

    tol = tol_frac * params.rest_density
    zeros3 = jnp.zeros_like(pos)

    def cond(carry):
        p, f_p, err, it = carry
        return ((err > tol) | (it < cfg.pcisph_min_iters)) & \
            (it < cfg.pcisph_max_iters)

    def body(carry):
        p, f_p, _, it = carry
        # predict (``pciComputePosVelAdv`` intent, sph_kernel_impl.cuh:1663-1720)
        vel_pred = vel + (dt / pm) * (f_adv + f_p)
        pos_pred = pos + dt * vel_pred
        rho_pred = _predicted_density(ctx, params, cfg, boundary, pos_pred)
        rho_err = jnp.maximum(rho_pred - params.rest_density, 0.0)
        rho_err = jnp.where(active, rho_err, 0.0)
        p_new = p + delta * rho_err
        f_p_new = _pressure_force(ctx, params, cfg, boundary, dens, p_new)
        err = jnp.max(rho_err)
        return (p_new, f_p_new, err, it + 1)

    # warm start: half the previous step's converged pressure (carried in
    # state.pressure) + its force, computed once before the loop. Half,
    # because the corrective loop only ADDS non-negative increments — an
    # overshoot could never relax. First step (pressure 0) = cold.
    p0 = jnp.zeros_like(dens)
    f_p0 = zeros3
    if cfg.pcisph_warm_start:
        p0 = cfg.pcisph_warm_frac * jnp.maximum(
            jnp.where(active, ctx.state.pressure, 0.0), 0.0)
        # skip the warm sweep while the carried pressure is all-zero
        # (ballistic phases: its force is exactly 0 — measured 11% of
        # the free-fall row's step as pure cost)
        f_p0 = jax.lax.cond(
            jnp.max(p0) > 0.0,
            lambda: _pressure_force(ctx, params, cfg, boundary, dens, p0),
            lambda: zeros3)
    init = (p0, f_p0,
            jnp.asarray(jnp.inf, cfg.dtype), jnp.asarray(0, jnp.int32))
    p, f_p, err, iters = jax.lax.while_loop(cond, body, init)

    new_vel = vel + (dt / pm) * (f_adv + f_p)
    new_pos = pos + dt * new_vel
    new_vel = jnp.where(active[:, None], new_vel, vel)
    new_pos = jnp.where(active[:, None], new_pos, pos)

    new_state = FluidState(pos=new_pos, vel=new_vel,
                           pressure=jnp.where(active, p, 0.0),
                           num_active=state.num_active)
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        # max positive predicted-density error — already compression-side
        mean_density_error=err / params.rest_density,
        mean_compression=err / params.rest_density,
        seg_overflow=ctx.overflow,
        solver_iters=iters,
    )
    return new_state, diag
