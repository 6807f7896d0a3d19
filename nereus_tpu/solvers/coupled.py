"""WCSPH step with two-way rigid-body coupling (beyond-reference).

One jitted step advances fluid AND rigid state together:

1. the body's Akinci shell contributes ψ to the fluid DENSITY (so
   approaching fluid compresses and pressure resists penetration), with
   per-particle rigid velocities ``v+ω×r``;
2. the fluid↔body contact force is **Akinci-2012 pressure + friction** —
   deliberately NOT the Becker β penalty the static walls use: the
   penalty is stiff scenery physics (measured ~2000× a light body's
   weight at close range) that blows a small dynamic body up, while the
   pressure contact shares the fluid's own Tait stiffness and timestep;
3. the reaction rides Newton's third law: every contact pair force is
   central, so ``F = −Σ_i f_i`` and ``τ = −Σ_i (x_i−c)×f_i`` accumulated
   from the FLUID side are exact (see ``nereus_tpu.rigid``). ONE body
   sweep computes f_i and serves both sides — applied to the fluid,
   negated and reduced for the body;
4. rigid semi-implicit Euler on device. Fully traced: the body moving
   never recompiles.

Reference contrast: the upstream framework has no body dynamics at all —
its boundaries are immovable scenery (``sph/sph.cpp:391-432``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .. import grid as gridlib
from .. import kernels as K
from ..ops.neighbors import masked, neighbor_reduce
from ..params import SimConfig, SimParams
from ..rigid import (RigidBody, body_boundary, integrate_rigid,
                     wall_contact_force)
from ..state import BoundaryData, FluidState
from . import common
from .wcsph import StepDiagnostics, density_errors, tait_pressure


def _body_density_oracle(ctx, params, cfg, grid, bd_body):
    """Σ_b ψ_b W(r_ib) — the body shell's density contribution (plus the
    body's row segments, reused by the contact reduce)."""
    pos = ctx.state.pos
    ir = params.interaction_radius

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        d2 = jnp.sum(rij * rij, axis=-1)
        ok = valid & (d2 < ir * ir)
        return {"d": masked(ok, j["psi"] * K.w_value(
            cfg.kernel_set, rij, params))}

    coords = gridlib.cell_coords(grid, pos)
    bs, be = gridlib.row_segments(grid, bd_body.sorted_hash, coords)
    ovf = gridlib.segment_overflow(bs, be, cfg.boundary_seg_window)
    acc = neighbor_reduce(
        pair, {"d": jnp.zeros((pos.shape[0],), cfg.dtype)}, bs, be,
        {"pos": bd_body.pos, "psi": bd_body.psi}, {"pos": pos},
        cfg.boundary_seg_window)
    return acc["d"], bs, be, ovf


def wcsph_coupled_step(state: FluidState, params: SimParams,
                       grid: gridlib.Grid, cfg: SimConfig,
                       body: RigidBody,
                       boundary: Optional[BoundaryData] = None):
    """One coupled WCSPH + rigid-body step.

    Returns ``(new_state, new_body, StepDiagnostics)``; dispatches between
    the Pallas engine (TPU) and this jnp oracle by ``SimConfig.engine``
    like every other solver.
    """
    if cfg.use_pallas():
        return _coupled_step_pallas(state, params, grid, cfg, body,
                                    boundary)

    bd_body = body_boundary(body, grid)
    ctx = common.build_ctx(state, grid, cfg, boundary)
    pos, vel = ctx.state.pos, ctx.state.vel
    active = ctx.active
    pm = params.particle_mass
    ir = params.interaction_radius

    # density: fluid + walls + body shell
    dens_fw = common.compute_density(ctx, params, cfg, boundary)
    dens_b, bs, be, body_ovf = _body_density_oracle(ctx, params, cfg,
                                                    grid, bd_body)
    dens = dens_fw + dens_b
    pres = tait_pressure(dens, params)
    dens_safe = jnp.maximum(dens, 1e-12)
    pd2 = pres / (dens_safe * dens_safe)

    from .wcsph import compute_pressure_force
    f_np = common.compute_nonpressure_forces(ctx, params, cfg, boundary,
                                             dens)
    f_p = compute_pressure_force(ctx, params, cfg, boundary, dens, pres)

    # --- body contact (Akinci pressure + friction; NO Becker penalty) ---
    def bpair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        dist2 = jnp.sum(rij * rij, axis=-1)
        ok = valid & (dist2 < ir * ir)
        grad = K.w_default_grad(cfg.kernel_set, rij, params)
        nu = (params.viscosity * ir * params.sound_speed) / \
            jnp.maximum(i["dens"][:, None] ** 2, 1e-12)
        dv = i["vel"][:, None, :] - j["vel"]
        nom = jnp.maximum(jnp.sum(dv * rij, axis=-1), 0.0)
        pij = -nu * (nom / (1.0 + 0.01 * ir * ir))
        ffric = -(pm * j["psi"] * pij)[..., None] * grad
        # Akinci repulsive sign: −mψ pd2 ∇W (see boundary_force_pair
        # pressure_sign note)
        fp = -(pm * pm * j["psi"] * i["pd2"][:, None])[..., None] * grad
        return {"fb": masked(
            ok, (2.0 * pm * params.viscosity) * ffric + fp)}

    acc = neighbor_reduce(
        bpair, {"fb": jnp.zeros((pos.shape[0], 3), cfg.dtype)}, bs, be,
        {"pos": bd_body.pos, "psi": bd_body.psi, "vel": bd_body.vel},
        {"pos": pos, "vel": vel, "dens": dens, "pd2": pd2},
        cfg.boundary_seg_window)
    f_body = acc["fb"]
    force = f_np + f_p + f_body

    actf = active[:, None]
    F_body = -jnp.sum(jnp.where(actf, f_body, 0.0), axis=0)
    tau = -jnp.sum(jnp.where(
        actf, jnp.cross(pos - body.com[None, :], f_body), 0.0), axis=0)

    if boundary is not None and boundary.num_boundaries > 0:
        fw, tw = wall_contact_force(body, boundary, params,
                                    kernel_set=cfg.kernel_set)
        F_body = F_body + fw
        tau = tau + tw

    dt = params.dt
    new_vel = vel + (dt / pm) * force
    new_pos = pos + dt * new_vel
    new_vel = jnp.where(actf, new_vel, vel)
    new_pos = jnp.where(actf, new_pos, pos)
    new_body = integrate_rigid(body, F_body, tau, dt, params.gravity)

    new_state = FluidState(pos=new_pos, vel=new_vel,
                           pressure=jnp.where(active, pres, 0.0),
                           num_active=state.num_active)
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    mae, mc = density_errors(dens, active, nact, params.rest_density)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=mae, mean_compression=mc,
        seg_overflow=jnp.maximum(ctx.overflow, body_ovf),
        solver_iters=jnp.asarray(0, jnp.int32))
    return new_state, new_body, diag


def _coupled_step_pallas(state, params, grid, cfg, body, boundary):
    """Pallas engine: the WCSPH step over walls, plus a body-density sweep
    and ONE body contact sweep that serves fluid force AND reaction."""
    from ..ops import pallas_sph as PS
    from ..ops.pallas_neighbors import (anchors_pack16, hash_payload,
                                        pack_source, plan_windows)
    from .pallas_common import build_pallas_ctx, padded_len

    bd_body = body_boundary(body, grid)
    ctx = build_pallas_ctx(state, params, grid, cfg, boundary)
    vel = (ctx.vx, ctx.vy, ctx.vz)
    c = ctx.c
    active = ctx.active
    interp = ctx.interp
    pvec, gsize, n_rows = ctx.pvec, ctx.gsize, ctx.n_rows
    pm = params.particle_mass

    # --- body plan + packed body source (shared by both body sweeps) ----
    mb = bd_body.num_boundaries
    win = ctx.win
    block = cfg.resolve_block(ctx.rows_local == 3)
    qcoords = gridlib.cell_coords_cols(grid, ctx.px, ctx.py, ctx.pz)
    pk16_b = anchors_pack16(padded_len(mb, win), win)
    anchors_b, miss_b = plan_windows(
        bd_body.sorted_hash, qcoords, gsize, block, padded_len(mb, win),
        active_mask=active, win=win, pack16=pk16_b,
        rows_local=ctx.rows_local)
    src_b = pack_source(
        tuple(bd_body.pos[:, k] for k in range(3)),
        hash_payload(bd_body.sorted_hash, ctx.dtype, gsize),
        vel=tuple(bd_body.vel[:, k] for k in range(3)),
        dens_or_psi=bd_body.psi, win=win)

    # --- density: fluid+walls (fused) + body shell ----------------------
    q4 = ctx.queries(width=4)
    psi_fluid = jnp.full((c,), 1.0, ctx.dtype) * pm
    src_d = ctx.pack(vel=vel, slot6=psi_fluid)
    dens = PS.density_sweep(cfg, q4, src_d, ctx.anchors, pvec, gsize,
                            n_rows=n_rows, interpret=interp)
    dens = dens + PS.density_sweep(cfg, q4, src_b, anchors_b, pvec,
                                   gsize, n_rows=ctx.rows_local,
                                   interpret=interp)
    pres = tait_pressure(dens, params)
    dens_safe = jnp.maximum(dens, 1e-12)
    pd2 = pres / (dens_safe * dens_safe)

    # --- forces: fluid+walls (fused) + body contact ----------------------
    q8 = ctx.queries(*vel, dens, pd2)
    src_f = ctx.update_rows(src_d, 6, [dens])
    force = PS.fluid_force_sweep(cfg, q8, src_f, ctx.anchors, pvec, gsize,
                                 n_rows=n_rows,
                                 moving_boundary=ctx.moving_boundary,
                                 interpret=interp)
    fb = PS.generic_sweep(cfg, PS.boundary_force_pair, q8, src_b,
                          anchors_b, pvec, gsize, out_width=4,
                          n_rows=ctx.rows_local, interpret=interp,
                          include_pressure=True, moving=True,
                          include_adhesion=False, pressure_sign=-1.0)
    f_body = fb[:, :3]

    actf = active[:, None]
    rel = jnp.stack([ctx.px - body.com[0], ctx.py - body.com[1],
                     ctx.pz - body.com[2]], axis=1)
    F_body = -jnp.sum(jnp.where(actf, f_body, 0.0), axis=0)
    tau = -jnp.sum(jnp.where(actf, jnp.cross(rel, f_body), 0.0), axis=0)
    if boundary is not None and boundary.num_boundaries > 0:
        fw, tw = wall_contact_force(body, boundary, params,
                                    kernel_set=cfg.kernel_set)
        F_body = F_body + fw
        tau = tau + tw

    dt = params.dt
    g = params.gravity

    def integ(v, p, f, gk):
        nv = v + (dt / pm) * (f + pm * gk)
        return jnp.where(active, nv, v), jnp.where(active, p + dt * nv, p)

    nvx, npx = integ(ctx.vx, ctx.px, force[:, 0] + f_body[:, 0], g[0])
    nvy, npy = integ(ctx.vy, ctx.py, force[:, 1] + f_body[:, 1], g[1])
    nvz, npz = integ(ctx.vz, ctx.pz, force[:, 2] + f_body[:, 2], g[2])
    new_body = integrate_rigid(body, F_body, tau, dt, g)

    new_state = FluidState(
        pos=jnp.stack([npx[:c], npy[:c], npz[:c]], axis=1),
        vel=jnp.stack([nvx[:c], nvy[:c], nvz[:c]], axis=1),
        pressure=jnp.where(active, pres, 0.0)[:c],
        num_active=state.num_active)
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    mae, mc = density_errors(dens, active, nact, params.rest_density)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=mae, mean_compression=mc,
        seg_overflow=ctx.miss + miss_b,
        solver_iters=jnp.asarray(0, jnp.int32))
    return new_state, new_body, diag
