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
    """(mean |ρ−ρ₀|/ρ₀, mean max(ρ−ρ₀,0)/ρ₀) over active particles."""
    dev = dens - rest
    mae = jnp.sum(jnp.where(active, jnp.abs(dev), 0.0)) / (nact * rest)
    mc = jnp.sum(jnp.where(active, jnp.maximum(dev, 0.0), 0.0)) / (nact * rest)
    return mae, mc


def tait_pressure(dens, params: SimParams):
    """Tait EOS p = k((ρ/ρ₀)⁷ − 1) (``sph_kernel_impl.cuh:426``).

    Like the reference, negative pressures are *not* clamped here.
    """
    ratio = dens / params.rest_density
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


def cfl_dt(state: FluidState, params: SimParams, lam: float = 0.4):
    """CFL timestep Δt = λ·h/|v|_max — written but disabled in the reference
    (``#if 0`` block, ``sph/sph.cpp:217-231``); live opt-in here."""
    vmax = jnp.max(jnp.where(state.active_mask(),
                             jnp.linalg.norm(state.vel, axis=-1), 0.0))
    return jnp.where(vmax > 0.0,
                     lam * params.interaction_radius / jnp.maximum(vmax, 1e-12),
                     params.dt)
