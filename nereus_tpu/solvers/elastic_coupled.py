"""WCSPH with two-way fluid–elastic coupling (beyond-reference).

One jitted step advances fluid AND a deformable elastic body together —
a soft ball splashes into a tank, water piles deform a rubber sheet:

1. the body's particles act as a MOVING Akinci boundary for the fluid
   (per-sample ψ from the reference configuration, velocities live):
   they contribute ψ·W to the fluid density, and the fluid feels the
   Akinci-2012 pressure+friction contact (repulsive sign, no Becker
   penalty) — exactly the dynamic-contact force the rigid coupling uses
   (``solvers/coupled.py``);
2. the reaction is distributed PER BODY SAMPLE by a REVERSE sweep (body
   particles as queries, the step's fluid source matrix as source —
   :func:`nereus_tpu.ops.pallas_sph.fluid_reaction_pair`); a rigid body
   only needs Σf and Στ from the fluid side, a deformable one needs
   where the force lands;
3. the elastic body SUBSTEPS under the frozen reaction (its CFL is set
   by the material wave speed, typically stiffer than the fluid's):
   ``substeps`` total-Lagrangian steps of dt/substeps inside the same
   jit, each three static-plan sweeps (``solvers/elastic.py``).

Weak (staggered) coupling: body state is frozen during the fluid step
and the reaction is frozen during the substeps — the standard explicit
scheme (SPlisHSPlasH couples its elasticity the same way). Walls and
rigid bodies compose through the unchanged fluid machinery.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .. import grid as gridlib
from .. import kernels as K
from ..ops.neighbors import masked, neighbor_reduce
from ..params import SimConfig, SimParams
from ..state import BoundaryData, FluidState
from . import common
from .coupled import _body_density_oracle, _body_reduce_oracle
from .elastic import ElasticParams, ElasticState, ElasticStatics, elastic_step
from .wcsph import StepDiagnostics, density_errors, tait_pressure


def elastic_psi(statics: ElasticStatics, params: SimParams,
                cfg: SimConfig) -> jnp.ndarray:
    """Per-sample Akinci ψ = ρ₀·V_bi over the body's REFERENCE positions
    (host-side, once per body). Volumetric sets self-calibrate: interior
    samples see more neighbors → smaller V_bi → less ψ, so the body's
    total boundary volume stays honest without surface extraction."""
    from ..boundary import compute_vbi
    import numpy as np
    vbi = compute_vbi(np.asarray(statics.x0),
                      float(np.asarray(params.interaction_radius)),
                      cfg.kernel_set)
    return jnp.asarray(vbi, cfg.dtype) * params.rest_density


def _body_boundary(estate: ElasticState, psi, grid, cfg):
    """The body as a hash-sorted moving BoundaryData (on device, per
    step) + the sort permutation for routing the reaction back to the
    body's statics order."""
    h = gridlib.hash_positions(grid, estate.pos,
                               jnp.ones((estate.capacity,), bool))
    px, py, pz = (estate.pos[:, k] for k in range(3))
    vx, vy, vz = (estate.vel[:, k] for k in range(3))
    sh, perm, (px, py, pz, vx, vy, vz, psi_s) = gridlib.sort_by_hash(
        h, px, py, pz, vx, vy, vz, psi, return_perm=True)
    bd = BoundaryData(pos=jnp.stack([px, py, pz], axis=1), psi=psi_s,
                      sorted_hash=sh,
                      vel=jnp.stack([vx, vy, vz], axis=1))
    return bd, perm


def wcsph_elastic_step(state: FluidState, params: SimParams,
                       grid: gridlib.Grid, cfg: SimConfig,
                       estate: ElasticState, statics: ElasticStatics,
                       ep: ElasticParams, psi,
                       boundary: Optional[BoundaryData] = None,
                       substeps: int = 4):
    """One coupled WCSPH + elastic-body step.

    ``psi``: the body's per-sample ψ from :func:`elastic_psi` (statics
    order). Returns ``(new_state, new_estate, StepDiagnostics)``. The
    body must satisfy its own CFL at dt/substeps (soft materials or
    more substeps; the elastic wave speed is √((λ+2µ)/ρ))."""
    if state.multiphase:
        raise NotImplementedError(
            "multiphase fluid + elastic coupling is not implemented")
    if cfg.use_pallas():
        out = _estep_pallas(state, params, grid, cfg, estate, statics,
                            ep, psi, boundary)
    else:
        out = _estep_oracle(state, params, grid, cfg, estate, statics,
                            ep, psi, boundary)
    new_state, f_react, ovf, dens, pres, active = out

    # --- elastic substeps under the frozen reaction ---------------------
    p_sub = dataclasses.replace(params, dt=params.dt / substeps)

    def body(_, carry):
        es, _d = carry
        return elastic_step(es, statics, p_sub, ep, grid, cfg,
                            f_ext=f_react)

    es0, d0 = elastic_step(estate, statics, p_sub, ep, grid, cfg,
                           f_ext=f_react)
    new_estate, ediag = jax.lax.fori_loop(1, substeps, body, (es0, d0))

    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    mae, mc = density_errors(dens, active, nact, params.rest_density)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=mae, mean_compression=mc,
        seg_overflow=jnp.maximum(ovf, ediag.seg_overflow),
        solver_iters=jnp.asarray(0, jnp.int32))
    return new_state, new_estate, diag


# ---------------------------------------------------------------------------
# jnp segment oracle
# ---------------------------------------------------------------------------

def _reaction_oracle(ctx, params, cfg, grid, bd, dens):
    """Force on each body sample from the fluid (reverse sweep): body
    samples are the queries, the hash-sorted fluid the source."""
    pos, vel = ctx.state.pos, ctx.state.vel
    ir = params.interaction_radius
    pm = params.particle_mass

    def pair(b, i, valid):
        d = b["pos"][:, None, :] - i["pos"]            # x_b − x_i
        d2 = jnp.sum(d * d, axis=-1)
        ok = valid & (d2 < ir * ir)
        grad = K.w_default_grad(cfg.kernel_set, d, params)
        dens_i = jnp.maximum(i["dens"], 1e-12)
        nu = ((2.0 * pm * pm * params.viscosity * params.viscosity
               * ir * params.sound_speed) / (1.0 + 0.01 * ir * ir)) \
            / (dens_i * dens_i)
        vdotr = jnp.sum((b["vel"][:, None, :] - i["vel"]) * d, axis=-1)
        pd2_i = jnp.maximum(tait_pressure(dens_i, params), 0.0) \
            / (dens_i * dens_i)
        c = (nu * jnp.maximum(vdotr, 0.0)
             - pm * pd2_i) * b["psi"][:, None]
        return {"f": masked(ok, c[..., None] * grad)}

    coords = gridlib.cell_coords(grid, bd.pos)
    fs, fe = gridlib.row_segments(grid, ctx.sorted_hash, coords)
    ovf = gridlib.segment_overflow(fs, fe, cfg.seg_window)
    acc = neighbor_reduce(
        pair, {"f": jnp.zeros_like(bd.pos)}, fs, fe,
        {"pos": pos, "vel": vel, "dens": dens},
        {"pos": bd.pos, "vel": bd.vel, "psi": bd.psi},
        cfg.seg_window)
    return acc["f"], ovf


def _estep_oracle(state, params, grid, cfg, estate, statics, ep, psi,
                  boundary):
    bd, perm = _body_boundary(estate, psi, grid, cfg)
    ctx = common.build_ctx(state, grid, cfg, boundary)
    pos, vel = ctx.state.pos, ctx.state.vel
    active = ctx.active
    pm = params.particle_mass

    dens = common.compute_density(ctx, params, cfg, boundary)
    dens = dens + _body_density_oracle(ctx, params, cfg, grid, bd)
    pres = tait_pressure(dens, params)
    dens_safe = jnp.maximum(dens, 1e-12)
    pd2 = pres / (dens_safe * dens_safe)

    from .wcsph import compute_pressure_force
    f_np = common.compute_nonpressure_forces(ctx, params, cfg, boundary,
                                             dens)
    f_p = compute_pressure_force(ctx, params, cfg, boundary, dens, pres)
    f_body, o1 = _body_reduce_oracle(ctx, params, cfg, grid, bd, dens, pd2)
    force = f_np + f_p + f_body

    f_rev_sorted, o2 = _reaction_oracle(ctx, params, cfg, grid, bd, dens)
    f_react = jnp.zeros_like(f_rev_sorted).at[perm].set(f_rev_sorted)
    ovf = jnp.maximum(jnp.maximum(ctx.overflow, o1), o2)

    dt = params.dt
    actf = active[:, None]
    new_vel = vel + (dt / pm) * force
    new_pos = pos + dt * new_vel
    new_state = FluidState(
        pos=jnp.where(actf, new_pos, pos),
        vel=jnp.where(actf, new_vel, vel),
        pressure=jnp.where(active, pres, 0.0),
        num_active=state.num_active)
    return new_state, f_react, ovf, dens, pres, active


# ---------------------------------------------------------------------------
# Pallas engine
# ---------------------------------------------------------------------------

def _estep_pallas(state, params, grid, cfg, estate, statics, ep, psi,
                  boundary):
    from ..ops import pallas_sph as PS
    from ..ops.pallas_neighbors import (anchors_pack16, hash_payload,
                                        pack_source, plan_windows,
                                        round_up)
    from .pallas_common import build_pallas_ctx, padded_len

    bd, perm = _body_boundary(estate, psi, grid, cfg)
    ctx = build_pallas_ctx(state, params, grid, cfg, boundary)
    vel = (ctx.vx, ctx.vy, ctx.vz)
    c = ctx.c
    active = ctx.active
    interp = ctx.interp
    pvec, gsize, n_rows = ctx.pvec, ctx.gsize, ctx.n_rows
    pm = params.particle_mass
    win = ctx.win
    block = cfg.resolve_block(ctx.rows_local == 3)

    # --- body as moving-boundary source (fluid queries) -----------------
    mb = bd.num_boundaries
    qcoords = gridlib.cell_coords_cols(grid, ctx.px, ctx.py, ctx.pz)
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

    # --- fluid density incl. walls (fused) + body ------------------------
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

    # --- fluid forces: walls (fused) + body contact ----------------------
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
                          include_adhesion=False, pressure_sign=-1.0,
                          consistent_pressure=True)
    fx = force[:, 0] + fb[:, 0]
    fy = force[:, 1] + fb[:, 1]
    fz = force[:, 2] + fb[:, 2]

    # --- reverse sweep: reaction per body sample --------------------------
    # body queries vs the step's fluid source matrix; the plan addresses
    # the FLUID region of the (possibly fused) matrix, which starts at
    # column 0 regardless of walls
    cb_b = round_up(mb, block)
    pad_b = cb_b - mb

    def padc(a, fill):
        return (a if pad_b == 0
                else jnp.concatenate([a, jnp.full((pad_b,), fill, a.dtype)]))

    bcols = [padc(bd.pos[:, k], 1e9) for k in range(3)]
    bvels = [padc(bd.vel[:, k], 0.0) for k in range(3)]
    bpsi = padc(bd.psi, 0.0)
    q_b = jnp.stack(bcols + bvels
                    + [bpsi, jnp.zeros_like(bpsi)], axis=0).T
    b_active = jnp.arange(cb_b) < mb
    b_coords = gridlib.cell_coords_cols(grid, *bcols)
    pk16_f = anchors_pack16(padded_len(c, win), win)
    anchors_r, miss_r = plan_windows(
        ctx.sorted_hash, b_coords, gsize, block, padded_len(c, win),
        active_mask=b_active, win=win, pack16=pk16_f,
        rows_local=ctx.rows_local)
    f_rev = PS.generic_sweep(cfg, PS.fluid_reaction_pair, q_b, src_f,
                             anchors_r, pvec, gsize, out_width=4,
                             n_rows=ctx.rows_local, interpret=interp)
    f_rev_sorted = f_rev[:mb, :3]
    f_react = jnp.zeros_like(f_rev_sorted).at[perm].set(f_rev_sorted)
    ovf = ctx.miss + miss_b + miss_r

    dt = params.dt
    g = params.gravity

    def integ(v, p, f, gk):
        nv = v + (dt / pm) * (f + pm * gk)
        return jnp.where(active, nv, v), jnp.where(active, p + dt * nv, p)

    nvx, npx = integ(ctx.vx, ctx.px, fx, g[0])
    nvy, npy = integ(ctx.vy, ctx.py, fy, g[1])
    nvz, npz = integ(ctx.vz, ctx.pz, fz, g[2])
    new_state = FluidState(
        pos=jnp.stack([npx[:c], npy[:c], npz[:c]], axis=1),
        vel=jnp.stack([nvx[:c], nvy[:c], nvz[:c]], axis=1),
        pressure=jnp.where(active, pres, 0.0)[:c],
        num_active=state.num_active)
    return new_state, f_react, ovf, dens, pres, active
