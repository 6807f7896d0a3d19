"""WCSPH step on the Pallas neighbor engine (TPU hot path).

Same physics and integration as :func:`nereus_tpu.solvers.wcsph.wcsph_step`
— the jnp segment path remains the oracle — but the three 27-cell gather
sweeps become two gather-free Pallas window sweeps (density; fused
viscosity+surface-tension+pressure forces), plus the boundary sweeps when a
boundary set is present. No per-particle ``searchsorted`` exists here: the
window plan does ~(N/96)·9·4 block-level binary searches and pair validity
is decided in-kernel from cell hashes. See ``ops/pallas_neighbors.py``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .. import grid as gridlib
from .. import kernels as K
from ..ops import pallas_sph as PS
from ..ops.pallas_neighbors import pack_source
from ..params import SimConfig, SimParams
from ..state import BoundaryData, FluidState
from .pallas_common import build_pallas_ctx
from .wcsph import StepDiagnostics, tait_pressure


def wcsph_step_pallas(state: FluidState, params: SimParams,
                      grid: gridlib.Grid, cfg: SimConfig,
                      boundary: Optional[BoundaryData] = None):
    """One WCSPH step; returns ``(new_state, StepDiagnostics)``.

    ``seg_overflow`` in the diagnostics reports Pallas window-coverage
    misses (0 in healthy runs) rather than segment-window truncation.
    """
    ctx = build_pallas_ctx(state, params, grid, cfg, boundary)
    pos, vel = ctx.pos, ctx.vel
    c, cb = ctx.c, ctx.cb
    active = ctx.active
    interp = ctx.interp
    pvec, gsize = ctx.pvec, ctx.gsize

    if boundary is not None and boundary.num_boundaries > 0:
        bsrc = pack_source(boundary.pos,
                           boundary.sorted_hash.astype(pos.dtype),
                           dens_or_psi=boundary.psi)
    else:
        bsrc = None

    # -- density -----------------------------------------------------------
    q4 = jnp.concatenate([pos, jnp.zeros((cb, 1), pos.dtype)], axis=1)
    psi_fluid = jnp.full((c,), 1.0, pos.dtype) * params.particle_mass
    src_d = pack_source(pos[:c], ctx.hash_f32, dens_or_psi=psi_fluid)
    dens = PS.density_sweep(cfg, q4, src_d, ctx.anchors, pvec, gsize,
                            self_excl=True, interpret=interp)
    if bsrc is not None:
        dens = dens + PS.density_sweep(cfg, q4, bsrc, ctx.b_anchors, pvec,
                                       gsize, self_excl=False,
                                       interpret=interp)
    zero = jnp.zeros((1, 3), dtype=cfg.dtype)
    dens = dens + params.particle_mass * K.w_value(
        cfg.kernel_set, zero, params)[0]
    pres = tait_pressure(dens, params)

    # -- forces (fused viscosity + surface tension + pressure) -------------
    dens_safe = jnp.maximum(dens, 1e-12)
    pd2 = pres / (dens_safe * dens_safe)
    q8 = jnp.concatenate(
        [pos, vel, dens[:, None], pd2[:, None]], axis=1)
    src_f = pack_source(pos[:c], ctx.hash_f32, vel[:c], dens[:c])
    force = PS.fluid_force_sweep(cfg, q8, src_f, ctx.anchors, pvec, gsize,
                                 interpret=interp)
    if bsrc is not None:
        force = force + PS.boundary_force_sweep(
            cfg, q8, bsrc, ctx.b_anchors, pvec, gsize, interpret=interp)
    force = force + params.particle_mass * params.gravity

    # -- symplectic Euler (``integrate_functor``) --------------------------
    dt = params.dt
    new_vel = vel + (dt / params.particle_mass) * force
    new_pos = pos + dt * new_vel
    new_vel = jnp.where(active[:, None], new_vel, vel)
    new_pos = jnp.where(active[:, None], new_pos, pos)

    new_state = FluidState(pos=new_pos[:c], vel=new_vel[:c],
                           pressure=jnp.where(active, pres, 0.0)[:c],
                           num_active=state.num_active)
    nact = jnp.maximum(state.num_active.astype(cfg.dtype), 1.0)
    diag = StepDiagnostics(
        max_density=jnp.max(jnp.where(active, dens, 0.0)),
        mean_density_error=jnp.sum(
            jnp.where(active, jnp.abs(dens - params.rest_density), 0.0)
        ) / (nact * params.rest_density),
        seg_overflow=ctx.miss,
        solver_iters=jnp.asarray(0, jnp.int32),
    )
    return new_state, diag
