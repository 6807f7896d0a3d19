"""Shared scaffolding for the Pallas solver steps (WCSPH/IISPH/PCISPH).

One :class:`PallasCtx` per step: hash-sort, block padding, a window plan,
and the packed parameter vector. With a boundary set present the plan is
*fused*: rows 0-8 sweep the fluid region of a single concatenated source
matrix, rows 9-17 the boundary region — one kernel launch covers both
particle sets (the reference's fluid and boundary neighbor loops).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .. import grid as gridlib
from ..ops import pallas_sph as PS
from ..ops.pallas_neighbors import (ALIGN, DEF_BLOCK, N_ROWS, WIN,
                                    fuse_plans, hash_payload, pack_source,
                                    pack_source_fused, pack_source_wide,
                                    plan_windows, round_up, rows3_supported)
from ..params import SimConfig, SimParams
from ..state import BoundaryData, FluidState


def interpret_mode() -> bool:
    return jax.default_backend() != "tpu"


def padded_len(m: int, win: int = WIN) -> int:
    """Region width in the (fused) source matrix for m source particles."""
    return round_up(m, ALIGN) + win


@dataclasses.dataclass
class PallasCtx:
    """Per-step sorted state + window plan (plain container, built inside
    the jitted step; not a pytree).

    Positions/velocities live as SoA *columns* ((cb,) arrays), not (cb, 3)
    matrices: on TPU a row-major (N, 3) f32 array is tiled (8, 128), so 3
    of every 128 lanes are real — every elementwise pass over it physically
    moves ~42× the logical bytes (measured ~1.7 ms per op at 1M where the
    column form costs ~0.05 ms). Columns enter the variadic sort, the
    plan, and the field-major source packing directly; only the (N, fq)
    query operands of the sweeps (built by :meth:`queries`) materialize a
    lane-padded matrix, once per sweep.
    """

    px: jax.Array           # (cb,) sorted, padded (parked tail)
    py: jax.Array
    pz: jax.Array
    vx: jax.Array           # (cb,)
    vy: jax.Array
    vz: jax.Array
    pres_prev: jax.Array    # (cb,)
    active: jax.Array       # (cb,) bool
    sorted_hash: jax.Array  # (c,) int32
    hash_f32: jax.Array     # (c,) f32
    anchors: jax.Array      # window plan (fused when boundary present)
    pvec: jax.Array
    miss: jax.Array         # () int32 plan-coverage misses
    c: int                  # capacity (fluid source length)
    cb: int                 # block-padded query length
    gsize: tuple
    n_rows: int             # rows_local (fluid only) or 2x (fused
                            # boundary); rows_local = 3 (fused 3-row
                            # windows) or 9
    win: int                # window width (cfg.sweep_win)
    interp: bool
    b_pos: Optional[tuple] = None          # boundary columns
    b_hash_f32: Optional[jax.Array] = None
    b_psi: Optional[jax.Array] = None
    b_vel: Optional[tuple] = None          # prescribed boundary velocity
                                           # columns (moving boundaries);
                                           # None = static fast path
    anchors_f: Optional[jax.Array] = None  # fluid-only plan
    mass: Optional[jax.Array] = None       # (cb,) multiphase per-particle
    rho0: Optional[jax.Array] = None       # mass / rest density columns

    @property
    def dtype(self):
        return self.px.dtype

    @property
    def rows_local(self):
        """Window rows per group: 3 (fused 3-row windows) or 9."""
        return 3 if self.n_rows in (3, 6) else 9

    def queries(self, *cols, width: int | None = None):
        """Build the (cb, fq) query operand from columns; positions first.

        ``width`` pads with zero columns up to the requested field count.
        This is the ONE place a lane-padded row-major matrix gets built
        per sweep — everything upstream stays columns."""
        cols = [self.px, self.py, self.pz, *cols]
        if width is not None:
            assert width >= len(cols), (width, len(cols))
            z = jnp.zeros((self.cb,), self.dtype)
            cols += [z] * (width - len(cols))
        # stack along axis 0 (compact (fq, N) concat) + one tiled
        # transpose — measured cheaper than stacking along axis 1, which
        # concatenates fq lane-padded (N, 1) pieces (~6.9 ms at 1M vs
        # ~1 ms for the transpose)
        return jnp.stack(cols, axis=0).T

    @property
    def moving_boundary(self) -> bool:
        """Static trace-time switch: prescribed boundary velocities present."""
        return self.b_vel is not None

    # -- fused source packing -------------------------------------------
    def _bcols(self, slot6_b):
        # rows 3-5 of the boundary region carry the prescribed rigid-motion
        # velocities when present (they enter drho/ρ_adv/friction pair math
        # through the same src slots the fluid velocities use); zeros keep
        # the static-boundary semantics bit-identical
        zeros = jnp.zeros_like(self.b_psi)
        v = self.b_vel if self.b_vel is not None else (zeros, zeros, zeros)
        return [v[0], v[1], v[2],
                self.b_psi if slot6_b is None else slot6_b]

    def pack(self, vel=None, slot6=None, slot6_b=None, pos_override=None):
        """8-row source: fluid cols (vel = (vx, vy, vz) columns, slot6) +
        boundary region (vel 0, slot6 = ψ unless overridden).
        ``pos_override`` substitutes the fluid position columns (PCISPH
        predicted positions) while keeping the hash row — the
        frozen-neighborhood semantics."""
        c = self.c
        posf = ((self.px, self.py, self.pz) if pos_override is None
                else pos_override)
        posf = tuple(p[:c] for p in posf)
        zeros = jnp.zeros((c,), self.dtype)
        cols_f = [vel[0][:c] if vel is not None else zeros,
                  vel[1][:c] if vel is not None else zeros,
                  vel[2][:c] if vel is not None else zeros,
                  slot6[:c] if slot6 is not None else zeros]
        if self.b_pos is None:
            return pack_source_wide(posf, self.hash_f32, cols_f, rows=8,
                                    win=self.win)
        return pack_source_fused(posf, self.hash_f32, cols_f,
                                 self.b_pos, self.b_hash_f32,
                                 self._bcols(slot6_b), rows=8,
                                 win=self.win)

    def update_rows(self, src, row_start: int, new_rows):
        """Replace rows [row_start, row_start+len(new_rows)) of the FLUID
        region of a packed source matrix with fresh (c,) columns.

        Packing transposes (M, 3)-major state into the field-major source
        matrix — measurably expensive at 1M. When consecutive sweeps (or
        solver-loop iterations) differ only in a few scalar field rows,
        build the matrix once and splice the changed rows in; boundary
        region and padding stay untouched."""
        block = jnp.stack([r[:self.c].astype(src.dtype) for r in new_rows])
        return jax.lax.dynamic_update_slice(src, block, (row_start, 0))

    def pack_wide(self, cols_f, rows=16):
        """Wide source; boundary region carries ψ in slot 6 (boundary pair
        functions read it there regardless of the fluid slot meanings)."""
        cols_f = [col[:self.c] for col in cols_f]
        posf = (self.px[:self.c], self.py[:self.c], self.pz[:self.c])
        if self.b_pos is None:
            return pack_source_wide(posf, self.hash_f32,
                                    cols_f, rows=rows, win=self.win)
        return pack_source_fused(posf, self.hash_f32, cols_f,
                                 self.b_pos, self.b_hash_f32,
                                 self._bcols(None), rows=rows,
                                 win=self.win)


def check_pallas_dtype(cfg: SimConfig, grid: gridlib.Grid):
    """Pallas-engine dtype constraints.

    Cell hashes ride the source matrix as floats: exact below 2²⁴ cells in
    float32 and 2⁵³ in float64; past 2²⁴ the float32 engine automatically
    switches to bitcast-int32 hashes (``pallas_neighbors.hash_payload`` /
    the kernel's wide mode), exact to the plan's 2²⁹-cell cap. float64
    itself only
    exists in interpret mode (CPU) — Mosaic has no f64 vector type on real
    TPUs — which matches the reference's own guidance that
    DOUBLE_PRECISION is a debug/validation build with "poor performances"
    (README.md:46-59, common.h:23-43).
    """
    if grid.num_cells + 2 * grid.size[0] + 3 >= 2 ** 29:
        # 2^29 is already the window plan's sort-merge key cap
        # (pallas_neighbors._KEY_CAP) and the wide-mode sentinel clamp
        # headroom (_WIDE_CLAMP) — enforce it visibly rather than
        # corrupting plans past it
        raise ValueError(
            f"grid has {grid.num_cells} cells; the Pallas window plan "
            "addresses at most 2^29 cells (~5.4e8). Use a coarser grid "
            "or shard the domain.")
    from ..ops import pallas_neighbors as _pn
    gx, gy, _gz = grid.size
    if (cfg.dtype == jnp.float32 and _pn.wide_hash_needed(grid.size)
            and _pn.WIDE_MODE == "mod"
            and 2 * gx * gy + 5 * gx + 6 > _pn.WIDE_MOD):
        # the mod wide payload is alias-safe only while every close
        # pair's h − lo is reproduced verbatim — a bound on the xy
        # PLANE, not on total cells (hash = (z·gy + y)·gx + x is
        # z-major, so z is the free axis)
        raise ValueError(
            f"grid plane {gx}x{gy} exceeds the wide-hash mod bound "
            "(2*gx*gy + 5*gx + 6 <= 2^24). Orient the domain so its "
            "largest extent is the z axis (the hash-major axis), use a "
            "coarser grid, or shard the domain.")
    if cfg.dtype == jnp.float64 and not interpret_mode():
        raise ValueError(
            "float64 Pallas runs only in interpret mode (CPU): TPUs have "
            "no f64 vector unit. Use SimConfig(engine='segments') for the "
            "jnp f64 path, or run on CPU.")


def build_pallas_ctx(state: FluidState, params: SimParams,
                     grid: gridlib.Grid, cfg: SimConfig,
                     boundary: Optional[BoundaryData]) -> PallasCtx:
    check_pallas_dtype(cfg, grid)
    interp = interpret_mode()
    c = state.capacity
    rows_local = (3 if cfg.sweep_fused_rows and rows3_supported(grid.size)
                  else N_ROWS)
    block = cfg.resolve_block(rows_local == 3)
    cb = round_up(c, block)
    mask = state.active_mask()
    # ONE lane-padded read of the (N, 3) carry arrays, splitting them into
    # columns; everything downstream (sort, plan, packing) stays columns.
    px, py, pz = (state.pos[:, k] for k in range(3))
    vx, vy, vz = (state.vel[:, k] for k in range(3))
    h = gridlib.hash_positions(grid, state.pos, mask)
    phase_cols = (state.mass, state.rho0) if state.multiphase else ()
    sorted_hash, _, (px, py, pz, vx, vy, vz, pres_prev, *phase_s) = \
        gridlib.sort_by_hash(h, px, py, pz, vx, vy, vz, state.pressure,
                             *phase_cols)
    mass_s = phase_s[0] if phase_s else None
    rho0_s = phase_s[1] if phase_s else None
    if cb != c:
        pad = cb - c
        dt_ = px.dtype

        def padc(a, v):
            return jnp.concatenate([a, jnp.full((pad,), v, dt_)])

        px, py, pz = padc(px, 1e9), padc(py, 1e9), padc(pz, 1e9)
        vx, vy, vz = padc(vx, 0.0), padc(vy, 0.0), padc(vz, 0.0)
        pres_prev = padc(pres_prev, 0.0)
        if mass_s is not None:
            # finite phase values in pad slots keep pair math NaN-free
            # (pads are parked at 1e9 and never pass the r² cutoff)
            mass_s, rho0_s = padc(mass_s, 1.0), padc(rho0_s, 1.0)
    active = jnp.arange(cb, dtype=jnp.int32) < state.num_active
    coords = gridlib.cell_coords_cols(grid, px, py, pz)
    win = cfg.resolve_win(rows_local == 3)
    # ONE anchor format for the whole (possibly fused) address space —
    # fused fluid+boundary plans must agree (anchors_pack16)
    from ..ops.pallas_neighbors import anchors_pack16
    total_len = padded_len(c, win)
    if boundary is not None and boundary.num_boundaries > 0:
        total_len += padded_len(boundary.num_boundaries, win)
    pack16 = anchors_pack16(total_len, win)
    anchors, miss = plan_windows(sorted_hash, coords, grid.size,
                                 block, padded_len(c, win),
                                 active_mask=active, win=win,
                                 pack16=pack16, rows_local=rows_local)
    kwargs = {"anchors_f": anchors}
    n_rows = rows_local
    if boundary is not None and boundary.num_boundaries > 0:
        mb = boundary.num_boundaries
        b_anchors, b_miss = plan_windows(
            boundary.sorted_hash, coords, grid.size, block,
            padded_len(c, win) + padded_len(mb, win), active_mask=active,
            pos_offset=padded_len(c, win), win=win, pack16=pack16,
            rows_local=rows_local)
        anchors = fuse_plans(anchors, b_anchors, pack16=pack16,
                             rows_local=rows_local)
        miss = miss + b_miss
        n_rows = 2 * rows_local
        kwargs.update(b_pos=tuple(boundary.pos[:, k] for k in range(3)),
                      b_hash_f32=hash_payload(boundary.sorted_hash, px.dtype,
                                             grid.size),
                      b_psi=boundary.psi)
        if boundary.vel is not None:
            kwargs["b_vel"] = tuple(boundary.vel[:, k] for k in range(3))
    return PallasCtx(
        px=px, py=py, pz=pz, vx=vx, vy=vy, vz=vz, pres_prev=pres_prev,
        active=active,
        sorted_hash=sorted_hash,
        hash_f32=hash_payload(sorted_hash, px.dtype, grid.size),
        anchors=anchors, pvec=PS.build_pvec(params, cfg, grid), miss=miss,
        c=c, cb=cb, gsize=grid.size, n_rows=n_rows, win=win,
        interp=interp, mass=mass_s, rho0=rho0_s, **kwargs)
