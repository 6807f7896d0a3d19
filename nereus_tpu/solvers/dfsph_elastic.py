"""DFSPH with two-way fluid–ELASTIC coupling (beyond-reference).

Incompressible fluid + deformable bodies in one jitted step — the last
cell of the coupling matrix (WCSPH×rigid, DFSPH×rigid, WCSPH×elastic all
exist). The body's Akinci samples enter the DFSPH pressure SOLVER like
the rigid shells of ``solvers/dfsph_coupled.py``:

1. fluid density (Σ ψ W) and the factor α̂'s gradient sum;
2. the velocity-divergence estimate Dρ/Dt with LIVE per-sample body
   velocities;
3. every κ correction of BOTH stiffness loops — with the reaction
   distributed PER SAMPLE (a deformable body needs where the impulse
   lands, not just ΣF/Στ): each iteration runs one extra REVERSE sweep
   (body samples as queries, the iteration's packed fluid source —
   including the fresh κ/ρ row — as source). The algebra is free:
   :func:`~nereus_tpu.ops.pallas_sph.grad_pressure_force_pair`
   ``(boundary=True, boundary_sign=-1)`` is its own reverse form — swap
   roles (q field 3 = ψ_b, src slot 6 = κ_i/ρ_i) and the per-pair force
   comes out exactly antisymmetric to the forward fluid force, so
   momentum is conserved to the pair, by construction.

**Gauss–Seidel interface with a per-sample mobility diagonal.** Each
iteration's reaction impulse kicks the SAMPLE velocities (v_b ← v_b +
dt·f_b/m_b; elasticity stays frozen across the step — the material
response belongs to the substeps), and the next divergence estimate sees
the body yield. The rigid coupling measured that Gauss–Seidel alone
still diverges in the added-mass regime; its cure — fold the body's
mobility into α's denominator — has an exact per-sample analogue here:
per unit κ_i, sample b yields Δv_b = dt·(κ_i/ρ_i)·(pm/m_b)·ψ_b∇W_ib,
feeding back (pm/m_b)·Σ_b ψ_b²|∇W_ib|² into Dρ/Dt — which is EXACTLY the
``include_sq`` accumulator the α sweep already computes for fluid
sources, scaled by pm/m_b. Zero extra sweeps
(``SimConfig.dfsph_strong_coupling``, default on).

After the solve, the kicked sample velocities are written back to the
body (reaction = impulse at step start, as the rigid coupling does) and
the body advances ``substeps`` total-Lagrangian elastic substeps
(``solvers/elastic.py``) inside the same jit. The non-pressure stage
exchanges Akinci FRICTION only (forward + per-sample reverse;
incompressibility does the pushing — no Tait contact term).

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
from ..state import BoundaryData, FluidState
from . import common
from .coupled import _body_density_oracle
from .dfsph import (_EPS_DENOM, _mean_active, alpha_parts, apply_kappa,
                    compute_drho)
from .dfsph_coupled import _body_drho, _body_kappa_dv, _body_segments
from .elastic import ElasticParams, ElasticState, ElasticStatics, elastic_step
from .elastic_coupled import _body_boundary
from .wcsph import StepDiagnostics


def dfsph_elastic_step(state: FluidState, params: SimParams,
                       grid: gridlib.Grid, cfg: SimConfig,
                       estate: ElasticState, statics: ElasticStatics,
                       ep: ElasticParams, psi,
                       boundary: Optional[BoundaryData] = None,
                       substeps: int = 4,
                       tol: float = 1.0, tol_v: float = 1.0):
    """One coupled DFSPH + elastic-body step.

    ``psi``: per-sample ψ from
    :func:`~nereus_tpu.solvers.elastic_coupled.elastic_psi` (statics
    order). Returns ``(new_state, new_estate, StepDiagnostics)``;
    tolerances as :func:`~nereus_tpu.solvers.dfsph.dfsph_step`. The body
    must satisfy its own CFL at dt/substeps."""
    if state.multiphase:
        raise NotImplementedError(
            "multiphase fluid + elastic coupling is not implemented")
    if cfg.use_pallas():
        out = _destep_pallas(state, params, grid, cfg, estate, statics,
                             ep, psi, boundary, tol, tol_v)
    else:
        out = _destep_oracle(state, params, grid, cfg, estate, statics,
                             ep, psi, boundary, tol, tol_v)
    new_state, vb_unsorted, ovf, dens, active, rho_err, iters = out

    # reaction applied as an impulse at step start (sample velocities
    # were Gauss–Seidel-kicked through the solve); the substeps advance
    # the frozen-reaction elastic dynamics (gravity lives inside
    # elastic_step)
    estate1 = _dc.replace(estate, vel=vb_unsorted)  # keeps .plastic
    p_sub = _dc.replace(params, dt=params.dt / substeps)

    def body(_, carry):
        es, _d = carry
        return elastic_step(es, statics, p_sub, ep, grid, cfg)

    es0, d0 = elastic_step(estate1, statics, p_sub, ep, grid, cfg)
    new_estate, ediag = jax.lax.fori_loop(1, substeps, body, (es0, d0))

    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=rho_err / params.rest_density,
        mean_compression=rho_err / params.rest_density,
        seg_overflow=jnp.maximum(ovf, ediag.seg_overflow),
        solver_iters=iters)
    return new_state, new_estate, diag


# ---------------------------------------------------------------------------
# jnp segment oracle
# ---------------------------------------------------------------------------

def _body_alpha_parts(ctx, params, cfg, grid, bd):
    """(Σ ψ_b ∇W_ib, Σ ψ_b²|∇W_ib|²) — the body's α̂ gradient-sum and
    per-sample-mobility contributions in one reduce."""
    pos = ctx.state.pos
    ir = params.interaction_radius

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        ok = valid & (jnp.sum(rij * rij, axis=-1) < ir * ir)
        g = K.w_default_grad(cfg.kernel_set, rij, params)
        pg = j["psi"][..., None] * g
        return {"gs": masked(ok, pg),
                "sq": masked(ok, jnp.sum(pg * pg, axis=-1))}

    bs, be, _ = _body_segments(ctx, cfg, grid, bd)
    acc = neighbor_reduce(
        pair, {"gs": jnp.zeros((pos.shape[0], 3), cfg.dtype),
               "sq": jnp.zeros((pos.shape[0],), cfg.dtype)}, bs, be,
        {"pos": bd.pos, "psi": bd.psi}, {"pos": pos},
        cfg.boundary_seg_window)
    return acc["gs"], acc["sq"]


def _fluid_segments_for(ctx, cfg, grid, qpos):
    coords = gridlib.cell_coords(grid, qpos)
    fs, fe = gridlib.row_segments(grid, ctx.sorted_hash, coords)
    return fs, fe, gridlib.segment_overflow(fs, fe, cfg.seg_window)


def _rev_kappa_oracle(ctx, params, cfg, grid, bd, kd):
    """Per-sample κ-correction reaction: f_b = −pm·ψ_b·Σ_i kd_i·∇W(x_b−x_i)
    — exactly minus the per-pair fluid force of the forward boundary term
    (``grad_pressure_force_pair(boundary=True, boundary_sign=-1)``)."""
    pos = ctx.state.pos
    ir = params.interaction_radius
    pm = params.particle_mass

    def pair(b, i, valid):
        d = b["pos"][:, None, :] - i["pos"]
        ok = valid & (jnp.sum(d * d, axis=-1) < ir * ir)
        g = K.w_default_grad(cfg.kernel_set, d, params)
        c = -pm * b["psi"][:, None] * i["kd"]
        return {"f": masked(ok, c[..., None] * g)}

    fs, fe, ovf = _fluid_segments_for(ctx, cfg, grid, bd.pos)
    acc = neighbor_reduce(
        pair, {"f": jnp.zeros_like(bd.pos)}, fs, fe,
        {"pos": pos, "kd": kd}, {"pos": bd.pos, "psi": bd.psi},
        cfg.seg_window)
    return acc["f"], ovf


def _rev_friction_oracle(ctx, params, cfg, grid, bd, vb, dens):
    """Per-sample Akinci FRICTION reaction (the pressure-free slice of
    ``elastic_coupled._reaction_oracle`` — incompressibility pushes, the
    non-pressure stage only rubs)."""
    pos, vel = ctx.state.pos, ctx.state.vel
    ir = params.interaction_radius
    pm = params.particle_mass

    def pair(b, i, valid):
        d = b["pos"][:, None, :] - i["pos"]
        d2 = jnp.sum(d * d, axis=-1)
        ok = valid & (d2 < ir * ir)
        grad = K.w_default_grad(cfg.kernel_set, d, params)
        dens_i = jnp.maximum(i["dens"], 1e-12)
        nu = ((2.0 * pm * pm * params.viscosity * params.viscosity
               * ir * params.sound_speed) / (1.0 + 0.01 * ir * ir)) \
            / (dens_i * dens_i)
        vdotr = jnp.sum((b["vel"][:, None, :] - i["vel"]) * d, axis=-1)
        c = nu * jnp.maximum(vdotr, 0.0) * b["psi"][:, None]
        return {"f": masked(ok, c[..., None] * grad)}

    fs, fe, ovf = _fluid_segments_for(ctx, cfg, grid, bd.pos)
    acc = neighbor_reduce(
        pair, {"f": jnp.zeros_like(bd.pos)}, fs, fe,
        {"pos": pos, "vel": vel, "dens": dens},
        {"pos": bd.pos, "vel": vb, "psi": bd.psi},
        cfg.seg_window)
    return acc["f"], ovf


def _body_friction_fwd_oracle(ctx, params, cfg, grid, bd, vb, dens):
    """Akinci friction ON THE FLUID from the body (forward sweep, no
    pressure term — matches ``boundary_force_pair(include_pressure=False,
    moving=True, include_adhesion=False)``)."""
    pos, vel = ctx.state.pos, ctx.state.vel
    ir = params.interaction_radius
    pm = params.particle_mass

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        r2 = jnp.sum(rij * rij, axis=-1)
        ok = valid & (r2 < ir * ir)
        grad = K.w_default_grad(cfg.kernel_set, rij, params)
        dens_i = jnp.maximum(i["dens"][:, None], 1e-12)
        nu = ((2.0 * pm * pm * params.viscosity * params.viscosity
               * ir * params.sound_speed) / (1.0 + 0.01 * ir * ir)) \
            / (dens_i * dens_i)
        vdotr = jnp.sum((i["vel"][:, None, :] - j["vel"]) * rij, axis=-1)
        c = nu * jnp.maximum(vdotr, 0.0) * j["psi"]
        return {"f": masked(ok, c[..., None] * grad)}

    bs, be, _ = _body_segments(ctx, cfg, grid, bd)
    acc = neighbor_reduce(
        pair, {"f": jnp.zeros_like(pos)}, bs, be,
        {"pos": bd.pos, "vel": vb, "psi": bd.psi},
        {"pos": pos, "vel": vel, "dens": dens},
        cfg.boundary_seg_window)
    return acc["f"]


def _destep_oracle(state, params, grid, cfg, estate, statics, ep, psi,
                   boundary, tol, tol_v):
    bd, perm = _body_boundary(estate, psi, grid, cfg)
    ctx = common.build_ctx(state, grid, cfg, boundary)
    pos = ctx.state.pos
    active = ctx.active
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    dt = params.dt
    pm = params.particle_mass
    mbm = statics.mass  # per-sample mass (scalar)

    dens = common.compute_density(ctx, params, cfg, boundary)
    dens = dens + _body_density_oracle(ctx, params, cfg, grid, bd)
    ovf = jnp.maximum(ctx.overflow,
                      _body_segments(ctx, cfg, grid, bd)[2])
    dens_safe = jnp.maximum(dens, 1e-12)

    gs, sq = alpha_parts(ctx, params, cfg, boundary)
    gb, sqb = _body_alpha_parts(ctx, params, cfg, grid, bd)
    gs = gs + gb
    mob = (pm / mbm) * sqb if cfg.dfsph_strong_coupling \
        else jnp.zeros_like(dens)
    alpha = dens / jnp.maximum(jnp.sum(gs * gs, axis=-1) + sq + mob,
                               _EPS_DENOM)

    vb0 = bd.vel  # (mb, 3), sorted order

    def drho_total(vt, vb):
        return (compute_drho(ctx, params, cfg, boundary, vt)
                + _body_drho(ctx, params, cfg, grid, bd, vt, vb))

    def correct(v, kappa, vb, imp):
        """One κ correction: fluid+walls via apply_kappa, the body's
        forward term, and the per-sample reverse reaction — the sample
        velocities are kicked so the NEXT divergence estimate sees the
        body yield (Gauss–Seidel interface)."""
        vt = jnp.stack(v, axis=1)
        v = apply_kappa(ctx, params, cfg, boundary, dens, kappa, vt)
        kd = kappa / dens_safe
        dv = _body_kappa_dv(ctx, params, cfg, grid, bd, kd)
        v = tuple(v[a] - dt * dv[:, a] for a in range(3))
        fb, _ = _rev_kappa_oracle(ctx, params, cfg, grid, bd, kd)
        return v, vb + (dt / mbm) * fb, imp + dt * fb

    # --- divergence-free solve ------------------------------------------
    def vcond(carry):
        _, _, _, err, it = carry
        return (((err > tol_v) | (it < cfg.dfsph_min_iters_v))
                & (it < cfg.dfsph_max_iters_v))

    def vbody(carry):
        v, vb, imp, _, it = carry
        drho = jnp.maximum(drho_total(jnp.stack(v, axis=1), vb), 0.0)
        v, vb, imp = correct(v, drho * alpha / dt, vb, imp)
        return (v, vb, imp, dt * _mean_active(drho, active, nact), it + 1)

    v0 = tuple(ctx.state.vel[:, k] for k in range(3))
    imp0 = jnp.zeros_like(vb0)
    init_v = (v0, vb0, imp0, jnp.asarray(2.0, cfg.dtype) * tol_v,
              jnp.asarray(0, jnp.int32))
    v_df, vb, imp, err_v, iters_v = jax.lax.while_loop(vcond, vbody,
                                                       init_v)
    vel_df = jnp.stack(v_df, axis=1)

    # --- non-pressure forces + friction exchange --------------------------
    ctx_adv = _dc.replace(ctx, state=FluidState(
        pos=pos, vel=vel_df, pressure=ctx.state.pressure,
        num_active=ctx.state.num_active))
    f_adv = common.compute_nonpressure_forces(ctx_adv, params, cfg,
                                              boundary, dens)
    f_adv = f_adv + _body_friction_fwd_oracle(ctx_adv, params, cfg, grid,
                                              bd, vb, dens)
    f_fric_b, o2 = _rev_friction_oracle(ctx_adv, params, cfg, grid, bd,
                                        vb, dens)
    vb = vb + (dt / mbm) * f_fric_b
    ovf = jnp.maximum(ovf, o2)
    v_star = tuple(vel_df[:, k] + (dt / pm) * f_adv[:, k]
                   for k in range(3))

    kap0 = jnp.zeros_like(dens)
    if cfg.dfsph_warm_start:
        kap0 = 0.5 * jnp.maximum(
            jnp.where(active, ctx.state.pressure, 0.0), 0.0)
        v_star, vb, imp = correct(v_star, kap0, vb, imp)

    # --- constant-density solve -------------------------------------------
    def cond(carry):
        _, _, _, _, err, it = carry
        return (((err > tol) | (it < cfg.dfsph_min_iters))
                & (it < cfg.dfsph_max_iters))

    def body_fn(carry):
        v, vb, imp, kap, _, it = carry
        rho_star = dens + dt * drho_total(jnp.stack(v, axis=1), vb)
        comp = jnp.maximum(rho_star - params.rest_density, 0.0)
        kappa = comp * alpha / (dt * dt)
        v, vb, imp = correct(v, kappa, vb, imp)
        return (v, vb, imp, kap + kappa,
                _mean_active(comp, active, nact), it + 1)

    init = (v_star, vb, imp, kap0,
            jnp.asarray(2.0, cfg.dtype) * tol, jnp.asarray(0, jnp.int32))
    v_new, vb, imp, kappa, rho_err, iters = jax.lax.while_loop(
        cond, body_fn, init)
    vel_new = jnp.stack(v_new, axis=1)

    # --- integrate fluid; route the body velocities to statics order -----
    new_pos = pos + dt * vel_new
    actf = active[:, None]
    vel_new = jnp.where(actf, vel_new, ctx.state.vel)
    new_pos = jnp.where(actf, new_pos, pos)
    new_state = FluidState(pos=new_pos, vel=vel_new,
                           pressure=jnp.where(active, kappa, 0.0),
                           num_active=state.num_active)
    vb_unsorted = jnp.zeros_like(vb).at[perm].set(vb)
    return (new_state, vb_unsorted, ovf, dens, active, rho_err,
            iters + iters_v)


# ---------------------------------------------------------------------------
# Pallas engine
# ---------------------------------------------------------------------------

def _destep_pallas(state, params, grid, cfg, estate, statics, ep, psi,
                   boundary, tol, tol_v):
    from ..ops import pallas_sph as PS
    from ..ops.pallas_neighbors import (anchors_pack16, hash_payload,
                                        pack_source, plan_windows,
                                        round_up)
    from .pallas_common import build_pallas_ctx, padded_len

    bd, perm = _body_boundary(estate, psi, grid, cfg)
    ctx = build_pallas_ctx(state, params, grid, cfg, boundary)
    vel = (ctx.vx, ctx.vy, ctx.vz)
    c, cb = ctx.c, ctx.cb
    active = ctx.active
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    dt = params.dt
    pm = params.particle_mass
    mbm = statics.mass.astype(ctx.dtype)
    interp = ctx.interp
    pvec, gsize, n_rows = ctx.pvec, ctx.gsize, ctx.n_rows

    def mean_active(x):
        return jnp.sum(jnp.where(active, x, 0.0)) / nact

    win = ctx.win
    block = cfg.resolve_block(ctx.rows_local == 3)

    # --- forward plan: fluid queries vs the body source ------------------
    mb = bd.num_boundaries
    qcoords = gridlib.cell_coords_cols(grid, ctx.px, ctx.py, ctx.pz)
    pk16_b = anchors_pack16(padded_len(mb, win), win)
    anchors_b, miss_b = plan_windows(
        bd.sorted_hash, qcoords, gsize, block, padded_len(mb, win),
        active_mask=active, win=win, pack16=pk16_b,
        rows_local=ctx.rows_local)
    src_b0 = pack_source(
        tuple(bd.pos[:, k] for k in range(3)),
        hash_payload(bd.sorted_hash, ctx.dtype, gsize),
        vel=tuple(bd.vel[:, k] for k in range(3)),
        dens_or_psi=bd.psi, win=win)

    def body_src(vb):
        # live sample velocities (Gauss–Seidel interface) into rows 3-5
        return jax.lax.dynamic_update_slice(
            src_b0, vb.T.astype(ctx.dtype), (3, 0))

    # --- reverse plan: body queries vs the fluid source -------------------
    cb_b = round_up(mb, block)
    pad_b = cb_b - mb

    def padc(a, fill):
        return (a if pad_b == 0
                else jnp.concatenate([a, jnp.full((pad_b,), fill, a.dtype)]))

    bcols = [padc(bd.pos[:, k], 1e9) for k in range(3)]
    bpsi = padc(bd.psi, 0.0)
    b_active = jnp.arange(cb_b) < mb
    b_coords = gridlib.cell_coords_cols(grid, *bcols)
    pk16_f = anchors_pack16(padded_len(c, win), win)
    anchors_r, miss_r = plan_windows(
        ctx.sorted_hash, b_coords, gsize, block, padded_len(c, win),
        active_mask=b_active, win=win, pack16=pk16_f,
        rows_local=ctx.rows_local)
    q_b4 = jnp.stack(bcols + [bpsi], axis=0).T    # x y z ψ (reverse κ)
    miss_total = ctx.miss + miss_b + miss_r

    # --- density + α̂ ------------------------------------------------------
    q4 = ctx.queries(width=4)
    psi_fluid = jnp.full((c,), 1.0, ctx.dtype) * pm
    src_psi = ctx.pack(slot6=psi_fluid)
    dens = PS.density_sweep(cfg, q4, src_psi, ctx.anchors, pvec, gsize,
                            n_rows=n_rows, interpret=interp)
    dens = dens + PS.density_sweep(cfg, q4, src_b0, anchors_b, pvec,
                                   gsize, n_rows=ctx.rows_local,
                                   interpret=interp)
    al = PS.generic_sweep(cfg, PS.alpha_pair, q4, src_psi, ctx.anchors,
                          pvec, gsize, out_width=4, n_rows=n_rows,
                          interpret=interp, include_sq=True,
                          pair_fn_b=PS.alpha_pair,
                          pair_b_kw=dict(include_sq=False))
    # include_sq on the BODY sweep: Σψ²|∇W|² is the per-sample mobility
    # accumulator (module docstring), scaled by pm/m_b below
    alb = PS.generic_sweep(cfg, PS.alpha_pair, q4, src_b0, anchors_b,
                           pvec, gsize, out_width=4,
                           n_rows=ctx.rows_local, interpret=interp,
                           include_sq=cfg.dfsph_strong_coupling)
    dens_safe = jnp.maximum(dens, 1e-12)
    g0 = al[:, 0] + alb[:, 0]
    g1 = al[:, 1] + alb[:, 1]
    g2 = al[:, 2] + alb[:, 2]
    denom = (g0 * g0 + g1 * g1 + g2 * g2 + al[:, 3]
             + (pm / mbm) * alb[:, 3])
    alpha = dens / jnp.maximum(denom, _EPS_DENOM)

    vb0 = bd.vel.astype(ctx.dtype)

    def drho_of(v, vb):
        q8 = ctx.queries(*v, width=8)
        src = ctx.pack(vel=v, slot6=psi_fluid)
        d = PS.generic_sweep(cfg, PS.drho_pair, q8, src, ctx.anchors,
                             pvec, gsize, out_width=1, n_rows=n_rows,
                             interpret=interp,
                             pair_fn_b=PS.drho_pair)[:, 0]
        d = d + PS.generic_sweep(cfg, PS.drho_pair, q8, body_src(vb),
                                 anchors_b, pvec, gsize, out_width=1,
                                 n_rows=ctx.rows_local,
                                 interpret=interp)[:, 0]
        return d

    def correct(kappa, v, vb, imp):
        kd = kappa / dens_safe
        q_kd = ctx.queries(kd)
        src = ctx.pack(slot6=kd)   # boundary region slot6 = ψ
        f = PS.generic_sweep(
            cfg, PS.grad_pressure_force_pair, q_kd, src, ctx.anchors,
            pvec, gsize, out_width=4, n_rows=n_rows, interpret=interp,
            boundary=False, pair_fn_b=PS.grad_pressure_force_pair,
            pair_b_kw=dict(boundary=True, boundary_sign=-1.0))
        fb = PS.generic_sweep(
            cfg, PS.grad_pressure_force_pair, q_kd, src_b0, anchors_b,
            pvec, gsize, out_width=4, n_rows=ctx.rows_local,
            interpret=interp, boundary=True, boundary_sign=-1.0)
        v = tuple(v[a] + (dt / pm) * (f[:, a] + fb[:, a])
                  for a in range(3))
        # per-sample reverse reaction: same pair formula, roles swapped
        # (q field 3 = ψ_b, fluid src slot6 = kd) — exactly antisymmetric
        fbs = PS.generic_sweep(
            cfg, PS.grad_pressure_force_pair, q_b4, src, anchors_r,
            pvec, gsize, out_width=4, n_rows=ctx.rows_local,
            interpret=interp, boundary=True,
            boundary_sign=-1.0)[:mb, :3]
        return v, vb + (dt / mbm) * fbs, imp + dt * fbs

    # --- divergence-free solve ----------------------------------------------
    def vcond(carry):
        _, _, _, err, it = carry
        return (((err > tol_v) | (it < cfg.dfsph_min_iters_v))
                & (it < cfg.dfsph_max_iters_v))

    def vbody(carry):
        v, vb, imp, _, it = carry
        drho = jnp.maximum(drho_of(v, vb), 0.0)
        v, vb, imp = correct(drho * alpha / dt, v, vb, imp)
        return (v, vb, imp, dt * mean_active(drho), it + 1)

    imp0 = jnp.zeros_like(vb0)
    init_v = (vel, vb0, imp0, jnp.asarray(2.0, ctx.dtype) * tol_v,
              jnp.asarray(0, jnp.int32))
    vel_df, vb, imp, err_v, iters_v = jax.lax.while_loop(vcond, vbody,
                                                         init_v)

    # --- non-pressure forces + friction exchange ------------------------------
    q8 = ctx.queries(*vel_df, dens, jnp.zeros((cb,), ctx.dtype))
    src_f = ctx.pack(vel=vel_df, slot6=dens)
    f_adv = PS.fluid_force_sweep(cfg, q8, src_f, ctx.anchors, pvec,
                                 gsize, include_pressure=False,
                                 n_rows=n_rows,
                                 moving_boundary=ctx.moving_boundary,
                                 interpret=interp)
    fb = PS.generic_sweep(cfg, PS.boundary_force_pair, q8, body_src(vb),
                          anchors_b, pvec, gsize, out_width=4,
                          n_rows=ctx.rows_local, interpret=interp,
                          include_pressure=False, moving=True,
                          include_adhesion=False)
    fxyz = [f_adv[:, k] + fb[:, k] for k in range(3)]
    # reverse friction (pressure-free fluid_reaction_pair)
    bvels = [padc(vb[:, k], 0.0) for k in range(3)]
    q_rev = jnp.stack(bcols + bvels
                      + [bpsi, jnp.zeros_like(bpsi)], axis=0).T
    f_fric_b = PS.generic_sweep(cfg, PS.fluid_reaction_pair, q_rev,
                                src_f, anchors_r, pvec, gsize,
                                out_width=4, n_rows=ctx.rows_local,
                                interpret=interp,
                                include_pressure=False)[:mb, :3]
    vb = vb + (dt / mbm) * f_fric_b
    g = params.gravity
    v_star = tuple(vel_df[k] + (dt / pm) * (fxyz[k] + pm * g[k])
                   for k in range(3))

    kap0 = jnp.zeros_like(dens)
    if cfg.dfsph_warm_start:
        kap0 = 0.5 * jnp.maximum(
            jnp.where(active, ctx.pres_prev, 0.0), 0.0)
        v_star, vb, imp = correct(kap0, v_star, vb, imp)

    # --- constant-density solve ------------------------------------------------
    def cond(carry):
        _, _, _, _, err, it = carry
        return (((err > tol) | (it < cfg.dfsph_min_iters))
                & (it < cfg.dfsph_max_iters))

    def body_fn(carry):
        v, vb, imp, kap, _, it = carry
        rho_star = dens + dt * drho_of(v, vb)
        comp = jnp.maximum(rho_star - params.rest_density, 0.0)
        kappa = comp * alpha / (dt * dt)
        v, vb, imp = correct(kappa, v, vb, imp)
        return (v, vb, imp, kap + kappa, mean_active(comp), it + 1)

    init = (v_star, vb, imp, kap0,
            jnp.asarray(2.0, ctx.dtype) * tol, jnp.asarray(0, jnp.int32))
    v_new, vb, imp, kappa, rho_err, iters = jax.lax.while_loop(
        cond, body_fn, init)

    # --- integrate fluid; route the body velocities to statics order ------
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
    vb_unsorted = jnp.zeros_like(vb).at[perm].set(vb)
    return (new_state, vb_unsorted, miss_total, dens, active, rho_err,
            iters + iters_v)
