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

import jax
import jax.numpy as jnp

from .. import grid as gridlib
from .. import kernels as K
from ..ops import pallas_sph as PS
from ..ops.pallas_neighbors import (ALIGN, DEF_BLOCK, WIN, pack_source,
                                    plan_windows, round_up)


def _padded_len(m: int) -> int:
    """Matches pack_source's column padding."""
    return round_up(m, ALIGN) + WIN
from ..params import SimConfig, SimParams
from ..state import BoundaryData, FluidState
from .wcsph import StepDiagnostics, tait_pressure


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def wcsph_step_pallas(state: FluidState, params: SimParams,
                      grid: gridlib.Grid, cfg: SimConfig,
                      boundary: Optional[BoundaryData] = None):
    """One WCSPH step; returns ``(new_state, StepDiagnostics)``.

    ``seg_overflow`` in the diagnostics reports Pallas window-coverage
    misses (0 in healthy runs) rather than segment-window truncation.
    """
    interp = _interpret()
    gsize = grid.size
    c = state.capacity
    cb = round_up(c, DEF_BLOCK)
    mask = state.active_mask()
    h = gridlib.hash_positions(grid, state.pos, mask)
    sorted_hash, _, (pos, vel, _pres_prev) = gridlib.sort_by_hash(
        h, state.pos, state.vel, state.pressure)
    if cb != c:
        pad = cb - c
        pos = jnp.concatenate([pos, jnp.full((pad, 3), 1e9, pos.dtype)])
        vel = jnp.concatenate([vel, jnp.zeros((pad, 3), vel.dtype)])
    active = jnp.arange(cb, dtype=jnp.int32) < state.num_active

    coords = gridlib.cell_coords(grid, pos)
    pvec = PS.build_pvec(params, cfg, grid)
    hash_f32 = sorted_hash.astype(pos.dtype)

    anchors, miss = plan_windows(sorted_hash, coords, gsize, DEF_BLOCK,
                                 _padded_len(c), active_mask=active)

    # -- density -----------------------------------------------------------
    q4 = jnp.concatenate([pos, jnp.zeros((cb, 1), pos.dtype)], axis=1)
    psi_fluid = jnp.full((c,), 1.0, pos.dtype) * params.particle_mass
    src_d = pack_source(pos[:c], hash_f32, dens_or_psi=psi_fluid)
    dens = PS.density_sweep(cfg, q4, src_d, anchors, pvec, gsize,
                            self_excl=True, interpret=interp)
    if boundary is not None and boundary.num_boundaries > 0:
        b_anchors, b_miss = plan_windows(
            boundary.sorted_hash, coords, gsize, DEF_BLOCK,
            _padded_len(boundary.num_boundaries), active_mask=active)
        bsrc = pack_source(boundary.pos,
                           boundary.sorted_hash.astype(pos.dtype),
                           dens_or_psi=boundary.psi)
        dens = dens + PS.density_sweep(cfg, q4, bsrc, b_anchors, pvec,
                                       gsize, self_excl=False,
                                       interpret=interp)
        miss = miss + b_miss
    else:
        b_anchors = bsrc = None

    zero = jnp.zeros((1, 3), dtype=cfg.dtype)
    dens = dens + params.particle_mass * K.w_value(
        cfg.kernel_set, zero, params)[0]
    pres = tait_pressure(dens, params)

    # -- forces (fused viscosity + surface tension + pressure) -------------
    dens_safe = jnp.maximum(dens, 1e-12)
    pd2 = pres / (dens_safe * dens_safe)
    q8 = jnp.concatenate(
        [pos, vel, dens[:, None], pd2[:, None]], axis=1)
    src_f = pack_source(pos[:c], hash_f32, vel[:c], dens[:c])
    force = PS.fluid_force_sweep(cfg, q8, src_f, anchors, pvec, gsize,
                                 interpret=interp)
    if bsrc is not None:
        force = force + PS.boundary_force_sweep(
            cfg, q8, bsrc, b_anchors, pvec, gsize, interpret=interp)
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
        seg_overflow=miss,
        solver_iters=jnp.asarray(0, jnp.int32),
    )
    return new_state, diag
