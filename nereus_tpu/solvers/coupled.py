"""WCSPH step with two-way rigid-body coupling (beyond-reference).

One jitted step advances fluid AND rigid state together:

1. each body's Akinci shell contributes ψ to the fluid DENSITY (so
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
   sweep per body computes f_i and serves both sides;
4. body↔wall (``wall_contact_force``) and body↔body
   (``body_body_contact``) penalty contacts over the tiny shell sample
   sets (dense jnp — no neighbor engine needed);
5. rigid semi-implicit Euler on device. Fully traced: bodies moving
   never recompile.

``body`` may be a single :class:`RigidBody` or a tuple/list of them —
the return matches (single body in, single body out).

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
from ..rigid import (RigidBody, body_boundary, body_body_contact,
                     integrate_rigid, wall_contact_force)
from ..state import BoundaryData, FluidState
from . import common
from .wcsph import StepDiagnostics, density_errors, tait_pressure


def _rigid_extras(bodies, boundary, params, cfg):
    """Wall- and body-body-contact force/torque increments per body."""
    n = len(bodies)
    F = [jnp.zeros(3, cfg.dtype) for _ in range(n)]
    T = [jnp.zeros(3, cfg.dtype) for _ in range(n)]
    if boundary is not None and boundary.num_boundaries > 0:
        for k, b in enumerate(bodies):
            fw, tw = wall_contact_force(b, boundary, params,
                                        kernel_set=cfg.kernel_set)
            F[k] = F[k] + fw
            T[k] = T[k] + tw
    for i in range(n):
        for j in range(i + 1, n):
            fa, ta, fb, tb = body_body_contact(bodies[i], bodies[j],
                                               params,
                                               kernel_set=cfg.kernel_set)
            F[i], T[i] = F[i] + fa, T[i] + ta
            F[j], T[j] = F[j] + fb, T[j] + tb
    return F, T


def wcsph_coupled_step(state: FluidState, params: SimParams,
                       grid: gridlib.Grid, cfg: SimConfig,
                       body,
                       boundary: Optional[BoundaryData] = None):
    """One coupled WCSPH + rigid-body step.

    Returns ``(new_state, new_body_or_bodies, StepDiagnostics)``;
    dispatches between the Pallas engine (TPU) and the jnp oracle by
    ``SimConfig.engine`` like every other solver.
    """
    single = isinstance(body, RigidBody)
    bodies = (body,) if single else tuple(body)
    if state.multiphase:
        if cfg.use_pallas():
            out = _coupled_mp_pallas(state, params, grid, cfg, bodies,
                                     boundary)
        else:
            out = _coupled_mp_oracle(state, params, grid, cfg, bodies,
                                     boundary)
    elif cfg.use_pallas():
        out = _coupled_step_pallas(state, params, grid, cfg, bodies,
                                   boundary)
    else:
        out = _coupled_step_oracle(state, params, grid, cfg, bodies,
                                   boundary)
    new_state, new_bodies, diag = out
    return new_state, (new_bodies[0] if single else new_bodies), diag


def _body_reduce_oracle(ctx, params, cfg, grid, bd_body, dens, pd2):
    """Per-fluid density contribution AND contact force from ONE body
    shell (jnp oracle): Akinci pressure + friction, no Becker penalty."""
    pos, vel = ctx.state.pos, ctx.state.vel
    n = pos.shape[0]
    ir = params.interaction_radius
    pm = params.particle_mass

    def pair(i, j, valid):
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
        # Akinci repulsive sign at the CONSISTENT m·ψ·pd2 scale (see
        # boundary_force_pair's pressure_sign/consistent_pressure notes —
        # the reference's m² scale yields ~8.5% of analytic buoyancy)
        fp = -(pm * j["psi"]
               * jnp.maximum(i["pd2"], 0.0)[:, None])[..., None] * grad
        return {"fb": masked(
            ok, (2.0 * pm * params.viscosity) * ffric + fp)}

    coords = gridlib.cell_coords(grid, pos)
    bs, be = gridlib.row_segments(grid, bd_body.sorted_hash, coords)
    ovf = gridlib.segment_overflow(bs, be, cfg.boundary_seg_window)
    acc = neighbor_reduce(
        pair, {"fb": jnp.zeros((n, 3), cfg.dtype)}, bs, be,
        {"pos": bd_body.pos, "psi": bd_body.psi, "vel": bd_body.vel},
        {"pos": pos, "vel": vel, "dens": dens, "pd2": pd2},
        cfg.boundary_seg_window)
    return acc["fb"], ovf


def _body_density_oracle(ctx, params, cfg, grid, bd_body):
    """Σ_b ψ_b W(r_ib) — one body shell's density contribution."""
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
    acc = neighbor_reduce(
        pair, {"d": jnp.zeros((pos.shape[0],), cfg.dtype)}, bs, be,
        {"pos": bd_body.pos, "psi": bd_body.psi}, {"pos": pos},
        cfg.boundary_seg_window)
    return acc["d"]


def _reaction(pos_like, f_body, active, com):
    actf = active[:, None]
    F = -jnp.sum(jnp.where(actf, f_body, 0.0), axis=0)
    tau = -jnp.sum(jnp.where(
        actf, jnp.cross(pos_like - com[None, :], f_body), 0.0), axis=0)
    return F, tau


def _coupled_step_oracle(state, params, grid, cfg, bodies, boundary):
    bds = [body_boundary(b, grid) for b in bodies]
    ctx = common.build_ctx(state, grid, cfg, boundary)
    pos, vel = ctx.state.pos, ctx.state.vel
    active = ctx.active
    pm = params.particle_mass

    dens = common.compute_density(ctx, params, cfg, boundary)
    for bd in bds:
        dens = dens + _body_density_oracle(ctx, params, cfg, grid, bd)
    pres = tait_pressure(dens, params)
    dens_safe = jnp.maximum(dens, 1e-12)
    pd2 = pres / (dens_safe * dens_safe)

    from .wcsph import compute_pressure_force
    f_np = common.compute_nonpressure_forces(ctx, params, cfg, boundary,
                                             dens)
    f_p = compute_pressure_force(ctx, params, cfg, boundary, dens, pres)
    force = f_np + f_p

    Fs, Ts = _rigid_extras(bodies, boundary, params, cfg)
    ovf = ctx.overflow
    for k, bd in enumerate(bds):
        f_body, o = _body_reduce_oracle(ctx, params, cfg, grid, bd,
                                        dens, pd2)
        force = force + f_body
        Fk, Tk = _reaction(pos, f_body, active, bodies[k].com)
        Fs[k], Ts[k] = Fs[k] + Fk, Ts[k] + Tk
        ovf = jnp.maximum(ovf, o)

    dt = params.dt
    actf = active[:, None]
    new_vel = vel + (dt / pm) * force
    new_pos = pos + dt * new_vel
    new_vel = jnp.where(actf, new_vel, vel)
    new_pos = jnp.where(actf, new_pos, pos)
    new_bodies = tuple(
        integrate_rigid(b, Fs[k], Ts[k], dt, params.gravity)
        for k, b in enumerate(bodies))

    new_state = FluidState(pos=new_pos, vel=new_vel,
                           pressure=jnp.where(active, pres, 0.0),
                           num_active=state.num_active)
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    mae, mc = density_errors(dens, active, nact, params.rest_density)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=mae, mean_compression=mc,
        seg_overflow=ovf,
        solver_iters=jnp.asarray(0, jnp.int32))
    return new_state, new_bodies, diag


def _mp_gate(cfg):
    from ..params import SurfaceTensionModel
    if cfg.viscosity_model == "implicit":
        raise NotImplementedError("implicit viscosity is single-phase-only")
    if cfg.surface_tension_model == SurfaceTensionModel.AKINCI:
        raise NotImplementedError(
            "AKINCI surface tension is single-phase-only (its curvature "
            "correction has no per-phase meaning); multiphase supports "
            "NONE or BECKER (phase-pair cohesion, SimConfig.st_cross)")


def _body_accel_mp_oracle(ctx, params, cfg, grid, bd_body, bp, fr):
    """One body shell's contact ACCELERATION on multiphase fluid (jnp
    oracle of ``pallas_sph.multiphase_body_pair``): Akinci repulsive
    pressure at the consistent scale, per-query-phase ψ rescale folded
    into ``bp``, plus friction against the sample velocities."""
    pos, vel = ctx.state.pos, ctx.state.vel
    n = pos.shape[0]
    ir = params.interaction_radius
    kf = (2.0 * params.viscosity * params.viscosity * ir
          * params.sound_speed) / (1.0 + 0.01 * ir * ir)

    def pair(i, j, valid):
        rij = i["pos"][:, None, :] - j["pos"]
        dist2 = jnp.sum(rij * rij, axis=-1)
        ok = valid & (dist2 < ir * ir)
        grad = K.w_default_grad(cfg.kernel_set, rij, params)
        cpress = -(j["psi"] * i["bp"][:, None])
        dv = i["vel"][:, None, :] - j["vel"]
        vdotr = jnp.maximum(jnp.sum(dv * rij, axis=-1), 0.0)
        cfric = (kf * i["fr"][:, None]) * vdotr * j["psi"]
        return {"ab": masked(ok, (cpress + cfric)[..., None] * grad)}

    coords = gridlib.cell_coords(grid, pos)
    bs, be = gridlib.row_segments(grid, bd_body.sorted_hash, coords)
    ovf = gridlib.segment_overflow(bs, be, cfg.boundary_seg_window)
    acc = neighbor_reduce(
        pair, {"ab": jnp.zeros((n, 3), cfg.dtype)}, bs, be,
        {"pos": bd_body.pos, "psi": bd_body.psi, "vel": bd_body.vel},
        {"pos": pos, "vel": vel, "bp": bp, "fr": fr},
        cfg.boundary_seg_window)
    return acc["ab"], ovf


def _coupled_mp_oracle(state, params, grid, cfg, bodies, boundary):
    """Multiphase (per-particle mass/ρ₀) WCSPH + rigid coupling, jnp
    oracle: the adapted-density volume form of ``_wcsph_step_multiphase``
    with each body shell in the density (per-query-phase ψ rescale, like
    walls) and the consistent Akinci pressure+friction contact."""
    _mp_gate(cfg)
    from .wcsph import multiphase_accels
    bds = [body_boundary(b, grid) for b in bodies]
    ctx = common.build_ctx(state, grid, cfg, boundary)
    st = ctx.state
    pos, vel = st.pos, st.vel
    active = ctx.active
    mass, rho0 = st.mass, st.rho0
    s_phase = rho0 / params.rest_density

    dens, delta = common.compute_density_multiphase(ctx, params, cfg,
                                                    boundary)
    for bd in bds:
        dens = dens + s_phase * _body_density_oracle(ctx, params, cfg,
                                                     grid, bd)
    pres = tait_pressure(dens, params, rho0)
    accel = multiphase_accels(ctx, params, cfg, boundary, dens, delta,
                              pres)

    inv_r2 = 1.0 / jnp.maximum(dens, 1e-12) ** 2
    bp = s_phase * jnp.maximum(pres, 0.0) * inv_r2
    fr = mass * inv_r2

    Fs, Ts = _rigid_extras(bodies, boundary, params, cfg)
    ovf = ctx.overflow
    for k, bd in enumerate(bds):
        a_body, o = _body_accel_mp_oracle(ctx, params, cfg, grid, bd,
                                          bp, fr)
        accel = accel + a_body
        Fk, Tk = _reaction(pos, mass[:, None] * a_body, active,
                           bodies[k].com)
        Fs[k], Ts[k] = Fs[k] + Fk, Ts[k] + Tk
        ovf = jnp.maximum(ovf, o)

    dt = params.dt
    g = jnp.asarray(params.gravity, cfg.dtype)
    new_vel = vel + dt * (accel + g[None, :])
    new_pos = pos + dt * new_vel
    new_vel = jnp.where(active[:, None], new_vel, vel)
    new_pos = jnp.where(active[:, None], new_pos, pos)
    new_bodies = tuple(
        integrate_rigid(b, Fs[k], Ts[k], dt, params.gravity)
        for k, b in enumerate(bodies))

    new_state = FluidState(pos=new_pos, vel=new_vel,
                           pressure=jnp.where(active, pres, 0.0),
                           num_active=state.num_active,
                           mass=mass, rho0=rho0)
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    mae, mc = density_errors(dens, active, nact, rho0)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=mae, mean_compression=mc,
        seg_overflow=ovf,
        solver_iters=jnp.asarray(0, jnp.int32))
    return new_state, new_bodies, diag


def _coupled_mp_pallas(state, params, grid, cfg, bodies, boundary):
    """Multiphase coupled step, Pallas engine: the multiphase WCSPH
    sweeps (adapted density, 16-row volume-form force) plus per body a
    ψ-density sweep and one ``multiphase_body_pair`` contact sweep that
    serves fluid acceleration AND (×m_i) the Newton-third-law reaction."""
    _mp_gate(cfg)
    from ..ops import pallas_sph as PS
    from ..ops.pallas_neighbors import (anchors_pack16, hash_payload,
                                        pack_source, plan_windows)
    from ..params import SurfaceTensionModel
    from .pallas_common import build_pallas_ctx, padded_len

    st_becker = cfg.surface_tension_model == SurfaceTensionModel.BECKER
    bds = [body_boundary(b, grid) for b in bodies]
    ctx = build_pallas_ctx(state, params, grid, cfg, boundary)
    vel = (ctx.vx, ctx.vy, ctx.vz)
    c = ctx.c
    active = ctx.active
    interp = ctx.interp
    pvec, gsize, n_rows = ctx.pvec, ctx.gsize, ctx.n_rows
    mass, rho0 = ctx.mass, ctx.rho0

    # --- per-body plan + packed source (shared by both body sweeps) -----
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

    # --- adapted density: fluid δ + walls col + body shells -------------
    q4 = ctx.queries(width=4)
    src_d = ctx.pack(vel=vel)
    dout = PS.generic_sweep(
        cfg, PS.multiphase_density_pair, q4, src_d, ctx.anchors, pvec,
        gsize, out_width=4, pair_fn_b=PS.multiphase_density_bpair,
        n_rows=n_rows, interpret=interp)
    delta = dout[:, 0]
    bsum = dout[:, 1]
    for anchors_b, src_b in plans:
        bsum = bsum + PS.density_sweep(cfg, q4, src_b, anchors_b, pvec,
                                       gsize, n_rows=ctx.rows_local,
                                       interpret=interp)
    from .wcsph import density_errors, tait_pressure
    dens = mass * delta + (rho0 / params.rest_density) * bsum
    pres = tait_pressure(dens, params, rho0)

    # --- fluid + wall forces (acceleration; 16-row volume form) ---------
    inv_rho = 1.0 / jnp.maximum(dens, 1e-12)
    vol = 1.0 / jnp.maximum(delta, 1e-12)
    pv2 = pres * vol * vol
    qcols = [*vel, pv2, 1.0 / mass, mass, inv_rho]
    wcols = [vel[0], vel[1], vel[2], vol, pv2]
    if st_becker:
        qcols.append(rho0)
        wcols.append(rho0)
    q10 = ctx.queries(*qcols)
    src_f = ctx.pack_wide(wcols, rows=16)
    acc4 = PS.generic_sweep(
        cfg, PS.multiphase_force_pair, q10, src_f, ctx.anchors, pvec,
        gsize, out_width=4, pair_fn_b=PS.multiphase_boundary_pair,
        pair_b_kw={"moving": ctx.moving_boundary},
        st_becker=st_becker,
        n_rows=n_rows, interpret=interp)
    ax, ay, az = acc4[:, 0], acc4[:, 1], acc4[:, 2]

    # --- per-body contact sweeps (accel; ×m_i = reaction) ---------------
    inv_r2 = inv_rho * inv_rho
    bp = (rho0 / params.rest_density) * jnp.maximum(pres, 0.0) * inv_r2
    fr = mass * inv_r2
    q8b = ctx.queries(*vel, bp, fr)
    Fs, Ts = _rigid_extras(bodies, boundary, params, cfg)
    rel_base = jnp.stack([ctx.px, ctx.py, ctx.pz], axis=1)
    for k, (anchors_b, src_b) in enumerate(plans):
        ab = PS.generic_sweep(cfg, PS.multiphase_body_pair, q8b, src_b,
                              anchors_b, pvec, gsize, out_width=4,
                              n_rows=ctx.rows_local, interpret=interp)
        ax = ax + ab[:, 0]
        ay = ay + ab[:, 1]
        az = az + ab[:, 2]
        Fk, Tk = _reaction(rel_base, mass[:, None] * ab[:, :3], active,
                           bodies[k].com)
        Fs[k], Ts[k] = Fs[k] + Fk, Ts[k] + Tk

    dt = params.dt
    g = params.gravity

    def integ(v, p, a, gk):
        nv = v + dt * (a + gk)
        return jnp.where(active, nv, v), jnp.where(active, p + dt * nv, p)

    nvx, npx = integ(ctx.vx, ctx.px, ax, g[0])
    nvy, npy = integ(ctx.vy, ctx.py, ay, g[1])
    nvz, npz = integ(ctx.vz, ctx.pz, az, g[2])
    new_bodies = tuple(
        integrate_rigid(b, Fs[k], Ts[k], dt, g)
        for k, b in enumerate(bodies))

    new_state = FluidState(
        pos=jnp.stack([npx[:c], npy[:c], npz[:c]], axis=1),
        vel=jnp.stack([nvx[:c], nvy[:c], nvz[:c]], axis=1),
        pressure=jnp.where(active, pres, 0.0)[:c],
        num_active=state.num_active,
        mass=mass[:c], rho0=rho0[:c])
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    mae, mc = density_errors(dens, active, nact, rho0)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=mae, mean_compression=mc,
        seg_overflow=miss_total,
        solver_iters=jnp.asarray(0, jnp.int32))
    return new_state, new_bodies, diag


def _coupled_step_pallas(state, params, grid, cfg, bodies, boundary):
    """Pallas engine: the WCSPH step over walls, plus per body a density
    sweep and ONE contact sweep that serves fluid force AND reaction."""
    from ..ops import pallas_sph as PS
    from ..ops.pallas_neighbors import (anchors_pack16, hash_payload,
                                        pack_source, plan_windows)
    from .pallas_common import build_pallas_ctx, padded_len

    bds = [body_boundary(b, grid) for b in bodies]
    ctx = build_pallas_ctx(state, params, grid, cfg, boundary)
    vel = (ctx.vx, ctx.vy, ctx.vz)
    c = ctx.c
    active = ctx.active
    interp = ctx.interp
    pvec, gsize, n_rows = ctx.pvec, ctx.gsize, ctx.n_rows
    pm = params.particle_mass

    # --- per-body plan + packed source (shared by both body sweeps) -----
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

    # --- density: fluid+walls (fused) + each body shell ------------------
    q4 = ctx.queries(width=4)
    psi_fluid = jnp.full((c,), 1.0, ctx.dtype) * pm
    src_d = ctx.pack(vel=vel, slot6=psi_fluid)
    dens = PS.density_sweep(cfg, q4, src_d, ctx.anchors, pvec, gsize,
                            n_rows=n_rows, interpret=interp)
    for anchors_b, src_b in plans:
        dens = dens + PS.density_sweep(cfg, q4, src_b, anchors_b, pvec,
                                       gsize, n_rows=ctx.rows_local,
                                       interpret=interp)
    pres = tait_pressure(dens, params)
    dens_safe = jnp.maximum(dens, 1e-12)
    pd2 = pres / (dens_safe * dens_safe)

    # --- forces: fluid+walls (fused) + per-body contact -------------------
    q8 = ctx.queries(*vel, dens, pd2)
    src_f = ctx.update_rows(src_d, 6, [dens])
    force = PS.fluid_force_sweep(cfg, q8, src_f, ctx.anchors, pvec, gsize,
                                 n_rows=n_rows,
                                 moving_boundary=ctx.moving_boundary,
                                 interpret=interp)
    fx, fy, fz = force[:, 0], force[:, 1], force[:, 2]

    Fs, Ts = _rigid_extras(bodies, boundary, params, cfg)
    rel_base = jnp.stack([ctx.px, ctx.py, ctx.pz], axis=1)
    for k, (anchors_b, src_b) in enumerate(plans):
        fb = PS.generic_sweep(cfg, PS.boundary_force_pair, q8, src_b,
                              anchors_b, pvec, gsize, out_width=4,
                              n_rows=ctx.rows_local, interpret=interp,
                              include_pressure=True, moving=True,
                              include_adhesion=False, pressure_sign=-1.0,
                              consistent_pressure=True)
        f_body = fb[:, :3]
        fx = fx + f_body[:, 0]
        fy = fy + f_body[:, 1]
        fz = fz + f_body[:, 2]
        Fk, Tk = _reaction(rel_base, f_body, active, bodies[k].com)
        Fs[k], Ts[k] = Fs[k] + Fk, Ts[k] + Tk

    dt = params.dt
    g = params.gravity

    def integ(v, p, f, gk):
        nv = v + (dt / pm) * (f + pm * gk)
        return jnp.where(active, nv, v), jnp.where(active, p + dt * nv, p)

    nvx, npx = integ(ctx.vx, ctx.px, fx, g[0])
    nvy, npy = integ(ctx.vy, ctx.py, fy, g[1])
    nvz, npz = integ(ctx.vz, ctx.pz, fz, g[2])
    new_bodies = tuple(
        integrate_rigid(b, Fs[k], Ts[k], dt, g)
        for k, b in enumerate(bodies))

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
        seg_overflow=miss_total,
        solver_iters=jnp.asarray(0, jnp.int32))
    return new_state, new_bodies, diag
