"""Shared scaffolding for the Pallas solver steps (WCSPH/IISPH/PCISPH).

One :class:`PallasCtx` per step: hash-sort, block padding, window plans for
the fluid set and (optionally) the static boundary set, and the packed
parameter vector. The solver steps then run their sweeps against it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .. import grid as gridlib
from ..ops import pallas_sph as PS
from ..ops.pallas_neighbors import (ALIGN, DEF_BLOCK, WIN, plan_windows,
                                    round_up)
from ..params import SimConfig, SimParams
from ..state import BoundaryData, FluidState


def interpret_mode() -> bool:
    return jax.default_backend() != "tpu"


def padded_len(m: int) -> int:
    """Matches pack_source's column padding."""
    return round_up(m, ALIGN) + WIN


@dataclasses.dataclass
class PallasCtx:
    """Per-step sorted state + window plans (plain container, built inside
    the jitted step; not a pytree)."""

    pos: jax.Array          # (cb, 3) sorted, padded (parked tail)
    vel: jax.Array          # (cb, 3)
    pres_prev: jax.Array    # (cb,)
    active: jax.Array       # (cb,) bool
    sorted_hash: jax.Array  # (c,) int32
    hash_f32: jax.Array     # (c,) f32
    anchors: jax.Array      # fluid window plan
    b_anchors: Optional[jax.Array]
    pvec: jax.Array
    miss: jax.Array         # () int32 plan-coverage misses (fluid+boundary)
    c: int                  # capacity (source length)
    cb: int                 # block-padded query length
    gsize: tuple
    interp: bool


def build_pallas_ctx(state: FluidState, params: SimParams,
                     grid: gridlib.Grid, cfg: SimConfig,
                     boundary: Optional[BoundaryData]) -> PallasCtx:
    interp = interpret_mode()
    c = state.capacity
    cb = round_up(c, DEF_BLOCK)
    mask = state.active_mask()
    h = gridlib.hash_positions(grid, state.pos, mask)
    sorted_hash, _, (pos, vel, pres_prev) = gridlib.sort_by_hash(
        h, state.pos, state.vel, state.pressure)
    if cb != c:
        pad = cb - c
        pos = jnp.concatenate([pos, jnp.full((pad, 3), 1e9, pos.dtype)])
        vel = jnp.concatenate([vel, jnp.zeros((pad, 3), vel.dtype)])
        pres_prev = jnp.concatenate(
            [pres_prev, jnp.zeros((pad,), pres_prev.dtype)])
    active = jnp.arange(cb, dtype=jnp.int32) < state.num_active
    coords = gridlib.cell_coords(grid, pos)
    anchors, miss = plan_windows(sorted_hash, coords, grid.size, DEF_BLOCK,
                                 padded_len(c), active_mask=active)
    if boundary is not None and boundary.num_boundaries > 0:
        b_anchors, b_miss = plan_windows(
            boundary.sorted_hash, coords, grid.size, DEF_BLOCK,
            padded_len(boundary.num_boundaries), active_mask=active)
        miss = miss + b_miss
    else:
        b_anchors = None
    return PallasCtx(
        pos=pos, vel=vel, pres_prev=pres_prev, active=active,
        sorted_hash=sorted_hash, hash_f32=sorted_hash.astype(pos.dtype),
        anchors=anchors, b_anchors=b_anchors,
        pvec=PS.build_pvec(params, cfg, grid), miss=miss,
        c=c, cb=cb, gsize=grid.size, interp=interp)
