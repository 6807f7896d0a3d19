"""Shared solver pipeline: sorting, neighbor contexts, and the physics passes
common to WCSPH / IISPH / PCISPH (density; non-pressure forces).

The reference shares these through ``computeCellDensity`` /
``computeBoundaryCellDensity`` / ``computeCellForces``
(``sph/sph_kernel_impl.cuh:290-604``), reused verbatim by the IISPH
(``computeIisphDensity``, ``computeDisplacementFactor``) and PCISPH
(``pcisph_internalForces``, ``pciComputePosVelAdv``) paths. Composition here
replaces the C++ inheritance: solvers are pure step functions over a shared
:class:`NeighborCtx`.

All physics runs in **sorted space** (the hash-sorted particle order becomes
the state order after each step, exactly as the reference writes its sorted
arrays back out, ``sph/sph.cpp:283-284``). The reference's index-space mixing
and its boundary-loop start-index bug (SURVEY §5 defect list) are *not*
reproduced — this implements the intended semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .. import grid as gridlib
from .. import kernels as K
from ..ops.neighbors import masked, neighbor_reduce
from ..params import SimConfig, SimParams, SurfaceTensionModel
from ..state import BoundaryData, FluidState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NeighborCtx:
    """Per-step neighbor structure: the sorted state plus 9-segment bounds
    into the fluid set and (optionally) the static boundary set.

    On a single chip the *query* set (``state``) and the *source* set the
    segments index into are the same particles. Under domain sharding
    (``nereus_tpu.parallel.domain``) the source set is the owned particles
    plus the ghost halo received from neighbor shards, so the source arrays
    are carried separately in ``src_pos``/``src_vel`` (None ⇒ same as state).
    """

    state: FluidState          # hash-sorted queries
    sorted_hash: jax.Array     # (S,) hashes of the *source* set
    self_idx: jax.Array        # (C,) each query's own index in source order
    fluid_start: jax.Array     # (9, C)
    fluid_end: jax.Array       # (9, C)
    bnd_start: Optional[jax.Array]   # (9, C) or None
    bnd_end: Optional[jax.Array]     # (9, C) or None
    active: jax.Array          # (C,) bool, in sorted order (tail = inactive)
    overflow: jax.Array        # () int32 diagnostic (seg window truncation)
    src_pos: Optional[jax.Array] = None   # (S, 3) or None ⇒ state.pos
    src_vel: Optional[jax.Array] = None   # (S, 3) or None ⇒ state.vel

    @property
    def source_pos(self):
        return self.state.pos if self.src_pos is None else self.src_pos

    @property
    def source_vel(self):
        return self.state.vel if self.src_vel is None else self.src_vel


def build_ctx(state: FluidState, grid: gridlib.Grid, cfg: SimConfig,
              boundary: Optional[BoundaryData]) -> NeighborCtx:
    """Hash → sort → segment search: the ``calcHash``/``sortParticles``/
    ``reorderDataAndFindCellStart`` pipeline (``sph/sph.cpp:238-260``) as
    three fused XLA ops."""
    mask = state.active_mask()
    h = gridlib.hash_positions(grid, state.pos, mask)
    phase_cols = (state.mass, state.rho0) if state.multiphase else ()
    sorted_hash, _, (pos_s, vel_s, pres_s, *phase_s) = gridlib.sort_by_hash(
        h, state.pos, state.vel, state.pressure, *phase_cols)
    sstate = FluidState(pos=pos_s, vel=vel_s, pressure=pres_s,
                        num_active=state.num_active,
                        mass=phase_s[0] if phase_s else None,
                        rho0=phase_s[1] if phase_s else None)
    coords = gridlib.cell_coords(grid, pos_s)
    fs, fe = gridlib.row_segments(grid, sorted_hash, coords)
    overflow = gridlib.segment_overflow(fs, fe, cfg.seg_window)
    if boundary is not None and boundary.num_boundaries > 0:
        bs, be = gridlib.row_segments(grid, boundary.sorted_hash, coords)
        overflow = jnp.maximum(
            overflow, gridlib.segment_overflow(bs, be, cfg.boundary_seg_window))
    else:
        bs = be = None
    c = pos_s.shape[0]
    return NeighborCtx(
        state=sstate,
        sorted_hash=sorted_hash,
        self_idx=jnp.arange(c, dtype=jnp.int32),
        fluid_start=fs, fluid_end=fe,
        bnd_start=bs, bnd_end=be,
        active=jnp.arange(c) < state.num_active,
        overflow=overflow,
    )


def fluid_reduce(ctx: NeighborCtx, pair_fn, init, src, i_data, cfg: SimConfig):
    return neighbor_reduce(pair_fn, init, ctx.fluid_start, ctx.fluid_end,
                           src, i_data, cfg.seg_window,
                           exclude_idx=ctx.self_idx)


def boundary_reduce(ctx: NeighborCtx, boundary: Optional[BoundaryData],
                    pair_fn, init, i_data, cfg: SimConfig):
    if boundary is None or boundary.num_boundaries == 0 or ctx.bnd_start is None:
        return init
    src = {"pos": boundary.pos, "psi": boundary.psi}
    if boundary.vel is not None:
        # moving boundary (beyond-reference): prescribed rigid-motion
        # velocities enter the velocity-dependent boundary pair terms
        src["vel"] = boundary.vel
    return neighbor_reduce(pair_fn, init, ctx.bnd_start, ctx.bnd_end,
                           src, i_data, cfg.boundary_seg_window)


# ---------------------------------------------------------------------------
# Density
# ---------------------------------------------------------------------------

def compute_density(ctx: NeighborCtx, params: SimParams, cfg: SimConfig,
                    boundary: Optional[BoundaryData]):
    """ρ_i = m·W(0) + Σ_j m·W(r_ij) + Σ_b ψ_b·W(r_ib), cutoff |r| < h.

    Reference: ``computeDensityPressure`` density part
    (``sph_kernel_impl.cuh:365-423``) including the self-contribution
    (``:405-409``), and ``computeBoundaryCellDensity`` (``:326-360``).
    Shared verbatim by IISPH (``computeIisphDensity``, ``:770-846``).
    """
    pos = ctx.state.pos
    ir = params.interaction_radius
    pm = params.particle_mass

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        dist2 = jnp.sum(rij * rij, axis=-1)
        w = K.w_value(cfg.kernel_set, rij, params)
        ok = valid & (dist2 < ir * ir)
        return {"dens": masked(ok, pm * w)}

    acc = fluid_reduce(ctx, pair, {"dens": jnp.zeros(pos.shape[0], cfg.dtype)},
                       {"pos": ctx.source_pos}, {"pos": pos}, cfg)

    def bpair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        dist2 = jnp.sum(rij * rij, axis=-1)
        w = K.w_value(cfg.kernel_set, rij, params)
        ok = valid & (dist2 < ir * ir)
        return {"dens": masked(ok, j["psi"] * w)}

    acc = boundary_reduce(ctx, boundary, bpair, acc, {"pos": pos}, cfg)

    zero = jnp.zeros((1, 3), dtype=cfg.dtype)
    self_w = pm * K.w_value(cfg.kernel_set, zero, params)[0]
    return acc["dens"] + self_w


def compute_density_multiphase(ctx: NeighborCtx, params: SimParams,
                               cfg: SimConfig,
                               boundary: Optional[BoundaryData]):
    """Multiphase ADAPTED density (Solenthaler & Pajarola 2008, "Density
    contrast SPH"): ρ̃_i = m_i·δ_i with the NUMBER density
    δ_i = Σ_j W_ij (self included) — a particle's density never smooths
    over its neighbors' masses, so a sharp density interface reads each
    phase's own rest density on both sides (the plain mixture sum
    Σ m_j W reads intermediate densities in the transition band, drives
    spurious interface pressures, and blows up at ratios ≳2 — measured).

    Walls: + (ρ0_i/ρ0_ref)·Σ_b ψ_b·W — the baked ψ = ρ0_ref·V_b rescaled
    per QUERY phase (Akinci boundary handling measures the displaced
    fluid of the phase doing the querying).

    Returns ``(rho, delta)`` — callers need δ for the volume-form forces
    (V_i = 1/δ_i).
    """
    st = ctx.state
    pos = st.pos
    ir = params.interaction_radius

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        dist2 = jnp.sum(rij * rij, axis=-1)
        w = K.w_value(cfg.kernel_set, rij, params)
        ok = valid & (dist2 < ir * ir)
        return {"delta": masked(ok, w)}

    acc = fluid_reduce(ctx, pair,
                       {"delta": jnp.zeros(pos.shape[0], cfg.dtype)},
                       {"pos": ctx.source_pos},
                       {"pos": pos}, cfg)

    def bpair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        dist2 = jnp.sum(rij * rij, axis=-1)
        w = K.w_value(cfg.kernel_set, rij, params)
        ok = valid & (dist2 < ir * ir)
        return {"bdens": masked(ok, j["psi"] * w)}

    bacc = boundary_reduce(ctx, boundary, bpair,
                           {"bdens": jnp.zeros(pos.shape[0], cfg.dtype)},
                           {"pos": pos}, cfg)

    zero = jnp.zeros((1, 3), dtype=cfg.dtype)
    w0 = K.w_value(cfg.kernel_set, zero, params)[0]
    delta = acc["delta"] + w0
    scale = st.rho0 / params.rest_density
    rho = st.mass * delta + scale * bacc["bdens"]
    return rho, delta


# ---------------------------------------------------------------------------
# Non-pressure forces (viscosity, surface tension, boundary adhesion/friction)
# ---------------------------------------------------------------------------

def compute_nonpressure_forces(ctx: NeighborCtx, params: SimParams,
                               cfg: SimConfig,
                               boundary: Optional[BoundaryData],
                               dens, src_dens=None,
                               include_viscosity=True):
    """Viscosity + surface tension + boundary adhesion/friction + gravity.

    Net semantics of ``computeCellForces`` (``sph_kernel_impl.cuh:442-604``)
    with the trailing scalings of ``computeForces`` (``:663-673``) folded in:

      F_visc  = 2·m·μ · Σ_j (m/ρ_j)(v_i−v_j)·(r_ij·∇W_visc)/(|r_ij|²+0.01h²)
                − 2·m·μ · Σ_b m·ψ_b·Π_ib·∇W_dflt            (friction, :597-601)
      F_surf  = −κ Σ_j r_ij · W(max(|r_ij|, 2·particleRadius))  (Becker, :535-546;
                the reference's ``kappa/pm*pm`` folds to κ by C++ evaluation order)
      F_bound = β Σ_b ψ_b · r_ib · W(r_ib)                    (adhesion, :591)
      F_grav  = m·g                                           (:673)

    Returns the sum; the IISPH/PCISPH predict-advection steps use exactly this
    (``computeDisplacementFactor``, ``:908-938``; ``pciComputePosVelAdv``).
    The Akinci cohesion variant (dead code in the reference) is live here via
    ``SimConfig.surface_tension_model``.
    """
    pos, vel = ctx.state.pos, ctx.state.vel
    n = pos.shape[0]
    ir = params.interaction_radius
    pm = params.particle_mass
    kappa = params.surface_tension
    use_st = cfg.surface_tension_model
    dtype = cfg.dtype

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        dist2 = jnp.sum(rij * rij, axis=-1)
        ok = valid & (dist2 < ir * ir)
        v1v2 = i["vel"][:, None, :] - j["vel"]

        grad_v = K.w_viscosity_grad_set(cfg.kernel_set, rij, params)
        a = jnp.sum(rij * grad_v, axis=-1)
        b = dist2 + 0.01 * ir * ir
        fvisc = (pm / jnp.maximum(j["dens"], 1e-12) * (a / b))[..., None] * v1v2

        out = {"fvisc": masked(ok, fvisc)}
        if use_st == SurfaceTensionModel.BECKER:
            w = K.w_value(cfg.kernel_set, rij, params)
            diameter = 2.0 * params.particle_radius
            dvec = jnp.stack(
                [diameter, jnp.zeros_like(diameter), jnp.zeros_like(diameter)])
            w_diam = K.w_value(cfg.kernel_set, dvec[None, :], params)[0]
            w_eff = jnp.where(dist2 > diameter * diameter, w, w_diam)
            out["fsurf"] = masked(ok, -kappa * w_eff[..., None] * rij)
        elif use_st == SurfaceTensionModel.AKINCI:
            # Akinci 2013 cohesion (reference's dead ``Cakinci`` made live):
            # F = −γ m² C(|r|) r̂ with the 2ρ₀/(ρ_i+ρ_j) correction factor.
            c = K.c_akinci(rij, ir, params.ksurf1, params.ksurf2)
            rl = jnp.sqrt(jnp.maximum(dist2, 1e-24))
            kij = 2.0 * params.rest_density / (
                i["dens"][:, None] + jnp.maximum(j["dens"], 1e-12))
            out["fsurf"] = masked(
                ok, (-kappa * pm * pm * kij * c / rl)[..., None] * rij)
        return out

    init = {"fvisc": jnp.zeros((n, 3), dtype)}
    if use_st != SurfaceTensionModel.NONE:
        init["fsurf"] = jnp.zeros((n, 3), dtype)
    i_data = {"pos": pos, "vel": vel, "dens": dens}
    src = {"pos": ctx.source_pos, "vel": ctx.source_vel,
           "dens": dens if src_dens is None else src_dens}
    acc = fluid_reduce(ctx, pair, init, src, i_data, cfg)

    # Boundary: adhesion + friction (``computeCellForces`` boundary loop,
    # ``sph_kernel_impl.cuh:552-602``). The reference omits the |r|<h test
    # here; for the Müller set the kernels vanish beyond h anyway, and we
    # apply the cutoff uniformly (documented divergence for Monaghan).
    def bpair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        dist2 = jnp.sum(rij * rij, axis=-1)
        ok = valid & (dist2 < ir * ir)
        w = K.w_value(cfg.kernel_set, rij, params)
        grad = K.w_default_grad(cfg.kernel_set, rij, params)
        fadh = (params.beta * j["psi"] * w)[..., None] * rij
        # friction Π_ib (:597-601); note the reference's r̂·r̂ denominator
        # evaluates to 1 + 0.01 h² — reproduced as written.
        nu = (params.viscosity * ir * params.sound_speed) / \
            jnp.maximum(i["dens"][:, None] ** 2, 1e-12)
        # moving boundary: friction damps the RELATIVE approach velocity
        # (v_i − v_b)·r; static boundaries keep the reference's v_i·r
        dv = (i["vel"][:, None, :] - j["vel"] if "vel" in j
              else i["vel"][:, None, :])
        nom = jnp.maximum(jnp.sum(dv * rij, axis=-1), 0.0)
        denom = 1.0 + 0.01 * ir * ir
        pij = -nu * (nom / denom)
        ffric = -(pm * j["psi"] * pij)[..., None] * grad
        return {"fbound": masked(ok, fadh), "ffric": masked(ok, ffric)}

    binit = {"fbound": jnp.zeros((n, 3), dtype),
             "ffric": jnp.zeros((n, 3), dtype)}
    bacc = boundary_reduce(ctx, boundary, bpair,
                           binit, {"pos": pos, "vel": vel, "dens": dens}, cfg)

    # Trailing scalings (``computeForces``, :663-673): the friction term is
    # accumulated into fvisc *before* the 2·m·μ scaling, so it inherits it.
    # include_viscosity=False drops BOTH (the implicit viscosity solver,
    # solvers/viscosity.py, owns fluid AND boundary viscous coupling).
    total = bacc["fbound"] + pm * params.gravity
    if include_viscosity:
        total = total + (bacc["ffric"] + acc["fvisc"]) * (
            2.0 * pm * params.viscosity)
    if use_st != SurfaceTensionModel.NONE:
        total = total + acc["fsurf"]
    return total
