"""Slab domain decomposition over a TPU mesh with ghost-particle halos.

The reference is a single-GPU program (SURVEY §2.3): its only parallelism is
one CUDA thread per particle and its only "communication" is PCIe memcpys.
This module is the part the reference never had — scaling the same physics
across chips, designed TPU-first:

* The world grid is cut into ``n_shards`` **slabs along z** — the
  slowest-varying axis of the cell hash (``(z·gy + y)·gx + x``,
  ``sph_kernel_impl.cuh:118-125`` ordering), so a slab is one contiguous
  range of cell hashes and every shard's particle set stays a contiguous,
  locally-sorted block of the global hash order.
* Each shard owns a fixed-capacity particle array (static shapes). Per step,
  inside one ``shard_map`` region compiled over the mesh:
    1. local hash + sort;
    2. **migration**: particles whose cell moved to the neighbor slab are
       packed into fixed-capacity buffers and exchanged with
       ``lax.ppermute`` (one hop left, one hop right — a particle can cross
       at most one slab per step under any sane CFL number);
    3. **halo exchange**: each shard ships its edge cell-rows (z = slab
       top / bottom) to its neighbors, giving every shard the ghost
       particles its 3×3×3 gathers need — the SPH analogue of ring
       attention's block rotation, riding ICI;
    4. physics on ``[left_halo | owned | right_halo]``, which is sorted by
       *global* hash by construction, so the 9-segment engine
       (``nereus_tpu.grid``) runs unchanged;
    5. a second lightweight halo exchange ships computed per-particle fields
       (density, pressure) for the same ghost slots.

All capacities (local particles, migration, halo) are static; overflow is
counted on-device and surfaced in :class:`ShardedDiagnostics` rather than
silently corrupting the simulation.
"""

from __future__ import annotations

import dataclasses

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import grid as gridlib
from ..params import SimConfig, SimParams
from ..state import BoundaryData, FluidState
from ..solvers import common
from ..solvers import wcsph as wcsph_mod

I32_MAX = jnp.iinfo(jnp.int32).max
I32_MIN = jnp.iinfo(jnp.int32).min
PARK = 1e9  # parked position for invalid slots (outside any cutoff)


@dataclasses.dataclass(frozen=True)
class ShardConfig:
    """Static sharding capacities. Hashable; closed over by jit."""

    n_shards: int
    local_capacity: int        # owned particles per shard (static)
    halo_capacity: int = 4096  # ghost particles per edge row
    migration_capacity: int = 1024  # particles crossing a slab edge per step
    axis_name: str = "shards"

    def __hash__(self):
        return hash((self.n_shards, self.local_capacity, self.halo_capacity,
                     self.migration_capacity, self.axis_name))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedDiagnostics:
    """Global (psum/pmax-reduced) per-step diagnostics."""

    max_density: jax.Array
    mean_density_error: jax.Array
    mean_compression: jax.Array    # mean max(ρ−ρ₀,0)/ρ₀ (see StepDiagnostics)
    seg_overflow: jax.Array        # neighbor-window truncation (max)
    halo_overflow: jax.Array       # edge-row count beyond halo_capacity (max)
    migration_overflow: jax.Array  # leavers beyond migration_capacity (max)
    capacity_overflow: jax.Array   # owned beyond local_capacity (max)
    migration_violation: jax.Array # particles that jumped >1 slab (count)
    num_active: jax.Array          # global live particle count
    solver_iters: jax.Array        # pressure-solver iterations (IISPH)


def _fused_pack16(src_len: int, boundary, win: int) -> bool:
    """One anchor format for a slab's whole fused address space (fluid
    region + optional boundary region) — fused plans must agree."""
    from ..ops.pallas_neighbors import anchors_pack16
    from ..solvers.pallas_common import padded_len
    total = padded_len(src_len, win)
    if boundary is not None and boundary.num_boundaries > 0:
        total += padded_len(boundary.num_boundaries, win)
    return anchors_pack16(total, win)


def _slab_cells(grid: gridlib.Grid, n_shards: int):
    """Cells per slab along z (ceil). Traced-value friendly."""
    return (grid.size[2] + n_shards - 1) // n_shards


def _row_hashes(grid: gridlib.Grid, z):
    """[start, end) hash range of the full cell-plane at height z."""
    plane = grid.size[0] * grid.size[1]
    return z * plane, (z + 1) * plane


def _ppermute_shift(x, axis_name: str, n: int, shift: int):
    """Non-wrapping neighbor shift: shard s receives shard s-shift's value.

    Shards with no sender receive zeros (``lax.ppermute`` semantics) — the
    caller must mask them (we overwrite received hashes at the mesh edges).
    """
    perm = [(i, i + shift) for i in range(n)
            if 0 <= i + shift < n]
    return jax.lax.ppermute(x, axis_name, perm)


def _extract_edge(sorted_hash, fields, lo, hi, k: int, pad_front: bool):
    """Pack the particles with hash in [lo, hi) into a (k,)-capacity buffer.

    Returns ``(buf_hash, buf_fields, src_idx, valid, overflow)``. The buffer
    is sorted ascending with padding hashes I32_MIN (if ``pad_front``) or
    I32_MAX, so a receiver can concatenate it before/after its own sorted
    block without re-sorting. ``src_idx`` (clamped gather indices into the
    owned arrays, -1 where invalid) lets later phases ship *other* fields of
    the same particles slot-aligned (see :func:`_exchange_saved`).
    """
    c = sorted_hash.shape[0]
    t0 = jnp.searchsorted(sorted_hash, lo, side="left").astype(jnp.int32)
    t1 = jnp.searchsorted(sorted_hash, hi, side="left").astype(jnp.int32)
    count = t1 - t0
    if pad_front:
        # valid entries packed at the back, padding (I32_MIN) in front
        off = jnp.maximum(t1 - k, 0)
        pad_val = I32_MIN
    else:
        off = jnp.minimum(t0, jnp.maximum(c - k, 0))
        pad_val = I32_MAX
    idx = off + jnp.arange(k, dtype=jnp.int32)
    valid = (idx >= t0) & (idx < t1)
    idx_c = jnp.clip(idx, 0, c - 1)
    h = jnp.where(valid, sorted_hash[idx_c], pad_val)
    # One tiny sort so padding lands on the correct side even when the slice
    # was clamped at an array end.
    order = jnp.argsort(h)
    h = h[order]
    idx_c = idx_c[order]
    valid = valid[order]
    buf = _mask_buffer(valid, {k: f[idx_c] for k, f in fields.items()})
    src_idx = jnp.where(valid, idx_c, -1)
    overflow = jnp.maximum(count - k, 0)
    return h, buf, src_idx, valid, overflow


def _bmask(valid, x):
    v = valid
    while v.ndim < x.ndim:
        v = v[..., None]
    return jnp.broadcast_to(v, x.shape)


def _mask_buffer(valid, fields):
    """Park positions / zero other fields where invalid."""
    out = {}
    for k, f in fields.items():
        if k == "pos":
            out[k] = jnp.where(_bmask(valid, f), f, jnp.full_like(f, PARK))
        else:
            out[k] = jnp.where(_bmask(valid, f), f, jnp.zeros_like(f))
    return out


def _splice_right_halo(left, owned, right, n_own, k: int):
    """Build [left | owned | I32_MAX/0 tail] then splice the right-halo block
    in at offset ``k + n_own`` (just past the last live owned particle),
    keeping hashes ascending despite the owned block's inactive sentinels.
    """
    out = []
    for lf, of, rf in zip(left, owned, right):
        tail = jnp.full((k,) + of.shape[1:], PARK, of.dtype) \
            if of.dtype.kind == "f" and of.ndim > 1 else \
            jnp.full((k,) + of.shape[1:],
                     I32_MAX if of.dtype.kind == "i" else 0, of.dtype)
        base = jnp.concatenate([lf, of, tail])
        start = (k + n_own,) + (0,) * (of.ndim - 1)
        out.append(jax.lax.dynamic_update_slice(base, rf, start))
    return tuple(out)


def _exchange_saved(fields, src_idx, valid, axis_name, n, shift):
    """Ship ``fields`` gathered at previously-saved edge indices to the
    ``shift`` neighbor, slot-aligned with the first halo exchange."""
    idx_c = jnp.maximum(src_idx, 0)
    buf = {k: jnp.where(_bmask(valid, f[idx_c]), f[idx_c],
                        jnp.zeros_like(f[idx_c]))
           for k, f in fields.items()}
    return jax.tree_util.tree_map(
        lambda x: _ppermute_shift(x, axis_name, n, shift), buf)


# ---------------------------------------------------------------------------
# Host-side distribution
# ---------------------------------------------------------------------------

def slab_counts(state: FluidState, grid: gridlib.Grid,
                n_shards: int) -> np.ndarray:
    """Host-side per-slab particle counts for capacity planning.

    Slabs are equal z-cell ranges, so a concentrated scene (e.g. the demo
    cube inside a much larger boundary box) can land almost entirely in one
    slab — size ``ShardConfig.local_capacity`` from this, with headroom for
    the fluid spreading during the run.
    """
    pos = np.asarray(state.pos)
    n = int(np.asarray(state.num_active))
    origin = np.asarray(grid.origin)
    cell = np.asarray(grid.cell)
    gz = int(np.asarray(grid.size)[2])
    slab = -(-gz // n_shards)
    zc = np.clip(np.floor((pos[:n, 2] - origin[2]) / cell[2]).astype(np.int64),
                 0, gz - 1)
    owner = np.minimum(zc // slab, n_shards - 1)
    return np.bincount(owner, minlength=n_shards).astype(np.int64)


def shard_state(state: FluidState, grid: gridlib.Grid, scfg: ShardConfig,
                mesh: Mesh) -> FluidState:
    """Distribute a host FluidState into per-slab blocks of a (D·Cl) global
    array laid out shard-major, and device_put it with the slab sharding."""
    d, cl = scfg.n_shards, scfg.local_capacity
    pos = np.asarray(state.pos)
    vel = np.asarray(state.vel)
    pres = np.asarray(state.pressure)
    n = int(state.num_active)
    origin = np.asarray(grid.origin)
    cell = np.asarray(grid.cell)
    gz = int(np.asarray(grid.size)[2])
    slab = -(-gz // d)

    zc = np.clip(np.floor((pos[:n, 2] - origin[2]) / cell[2]).astype(np.int64),
                 0, gz - 1)
    owner = np.minimum(zc // slab, d - 1)

    gpos = np.full((d * cl, 3), PARK, dtype=pos.dtype)
    gvel = np.zeros((d * cl, 3), dtype=vel.dtype)
    gpres = np.zeros((d * cl,), dtype=pres.dtype)
    gmass = grho0 = None
    if state.multiphase:
        mass = np.asarray(state.mass)
        rho0 = np.asarray(state.rho0)
        # inactive slots carry finite phase values (1.0) — they never
        # enter any pair sum, but the Pallas engine's finite-by-
        # construction pair math needs every source field NaN-free
        gmass = np.full((d * cl,), 1.0, dtype=mass.dtype)
        grho0 = np.full((d * cl,), 1.0, dtype=rho0.dtype)
    counts = np.zeros((d,), dtype=np.int32)
    for s in range(d):
        sel = np.nonzero(owner == s)[0]
        if len(sel) > cl:
            raise ValueError(
                f"shard {s} needs {len(sel)} slots > local_capacity {cl}")
        gpos[s * cl: s * cl + len(sel)] = pos[sel]
        gvel[s * cl: s * cl + len(sel)] = vel[sel]
        gpres[s * cl: s * cl + len(sel)] = pres[sel]
        if gmass is not None:
            gmass[s * cl: s * cl + len(sel)] = mass[sel]
            grho0[s * cl: s * cl + len(sel)] = rho0[sel]
        counts[s] = len(sel)

    sh = NamedSharding(mesh, P(scfg.axis_name))
    return FluidState(
        pos=jax.device_put(jnp.asarray(gpos), sh),
        vel=jax.device_put(jnp.asarray(gvel), sh),
        pressure=jax.device_put(jnp.asarray(gpres), sh),
        num_active=jax.device_put(jnp.asarray(counts), sh),
        mass=(jax.device_put(jnp.asarray(gmass), sh)
              if gmass is not None else None),
        rho0=(jax.device_put(jnp.asarray(grho0), sh)
              if grho0 is not None else None),
    )


def unshard_state(state: FluidState) -> FluidState:
    """Gather a sharded state to host, compacting live particles."""
    pos = np.asarray(state.pos)
    vel = np.asarray(state.vel)
    pres = np.asarray(state.pressure)
    counts = np.asarray(state.num_active)
    d = counts.shape[0]
    cl = pos.shape[0] // d
    keep = np.concatenate(
        [np.arange(s * cl, s * cl + counts[s]) for s in range(d)])
    return FluidState(
        pos=jnp.asarray(pos[keep]), vel=jnp.asarray(vel[keep]),
        pressure=jnp.asarray(pres[keep]),
        num_active=jnp.asarray(len(keep), jnp.int32),
        mass=(jnp.asarray(np.asarray(state.mass)[keep])
              if state.multiphase else None),
        rho0=(jnp.asarray(np.asarray(state.rho0)[keep])
              if state.multiphase else None))


# ---------------------------------------------------------------------------
# The sharded step
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _ShardCtx:
    """Per-shard post-migration, post-halo state (inside shard_map)."""

    h: jax.Array            # (cl,) owned sorted hashes (I32_MAX tail)
    pos: jax.Array
    vel: jax.Array
    pres: jax.Array
    n_own: jax.Array
    own_active: jax.Array
    src_hash: jax.Array     # (cl+2kh,) spliced [lhalo | owned | rhalo]
    src_pos: jax.Array
    src_vel: jax.Array
    t_idx: jax.Array        # saved halo-slot indices for later field hops
    t_valid: jax.Array
    b_idx: jax.Array
    b_valid: jax.Array
    mig_violation: jax.Array
    mig_overflow: jax.Array
    halo_overflow: jax.Array
    cap_overflow: jax.Array
    # extra per-particle (cl,) columns that migrated with the particles
    # (multiphase mass/rho0); same keys as the ``extra`` input
    extra: dict = dataclasses.field(default_factory=dict)


def _migrate_and_halo(pos, vel, pres, n_loc, *, grid, scfg,
                      extra=None) -> _ShardCtx:
    """Local sort → neighbor-slab migration → ghost-halo exchange.

    Runs inside ``shard_map``; see the module docstring for the scheme.
    ``extra`` (optional) is a dict of additional per-particle (cl,)
    columns (multiphase mass/rho0) that ride the migration sorts and
    buffers with the particles; they come back in ``_ShardCtx.extra``.
    They do NOT enter the ghost-halo exchange — halo slots only ever
    need fields the force sweeps read from the source pack, and the
    multiphase sweeps ship derived (V, p·V²) ghosts via the second hop.
    """
    extra = dict(extra or {})
    ekeys = list(extra)
    ax, d = scfg.axis_name, scfg.n_shards
    cl, kh, km = (scfg.local_capacity, scfg.halo_capacity,
                  scfg.migration_capacity)
    s = jax.lax.axis_index(ax)
    slab = _slab_cells(grid, d)
    plane = grid.size[0] * grid.size[1]
    slab_lo_h = (s * slab) * plane
    slab_hi_h = jnp.minimum((s + 1) * slab, grid.size[2]) * plane

    n0 = n_loc[0]
    active = jnp.arange(cl, dtype=jnp.int32) < n0
    h = gridlib.hash_positions(grid, pos, active)
    # variadic sort carrying all fields — no permutation gathers (see
    # gridlib.sort_by_hash; ~100x below HBM bandwidth on TPU)
    h, _, (pos, vel, pres, *ecols) = gridlib.sort_by_hash(
        h, pos, vel, pres, *(extra[k] for k in ekeys))
    extra = dict(zip(ekeys, ecols))

    # -- migration accounting ------------------------------------------
    coords = gridlib.cell_coords(grid, pos)
    owner = jnp.minimum(coords[..., 2] // slab, d - 1)
    act = h < I32_MAX
    mig_violation = jnp.sum(
        jnp.where(act & (jnp.abs(owner - s) > 1), 1, 0))

    start_own = jnp.searchsorted(h, slab_lo_h, side="left").astype(jnp.int32)
    end_own = jnp.searchsorted(h, slab_hi_h, side="left").astype(jnp.int32)
    n_act = jnp.searchsorted(h, I32_MAX, side="left").astype(jnp.int32)

    fields = {"pos": pos, "vel": vel, "pres": pres, **extra}

    # leavers → left neighbor: indices [0, start_own)
    lh, lbuf, _, lvalid, lover = _extract_edge(
        h, fields, I32_MIN + 1, slab_lo_h, km, pad_front=False)
    # leavers → right neighbor: [end_own, n_act)
    rh, rbuf, _, rvalid, rover = _extract_edge(
        h, fields, slab_hi_h, I32_MAX, km, pad_front=False)
    mig_overflow = jnp.maximum(lover, rover)

    recv_from_right = jax.tree_util.tree_map(
        lambda x: _ppermute_shift(x, ax, d, -1), (lh, lbuf))
    recv_from_left = jax.tree_util.tree_map(
        lambda x: _ppermute_shift(x, ax, d, +1), (rh, rbuf))
    rr_h, rr_buf = recv_from_right
    rl_h, rl_buf = recv_from_left
    # mesh edges received zeros → invalidate
    rr_h = jnp.where(s == d - 1, I32_MAX, rr_h)
    rl_h = jnp.where(s == 0, I32_MAX, rl_h)
    rr_buf = _mask_buffer(rr_h < I32_MAX, rr_buf)
    rl_buf = _mask_buffer(rl_h < I32_MAX, rl_buf)

    # keepers: drop leavers + inactive
    keep = (jnp.arange(cl, dtype=jnp.int32) >= start_own) \
        & (jnp.arange(cl, dtype=jnp.int32) < end_own)
    kh_hash = jnp.where(keep, h, I32_MAX)
    kfields = _mask_buffer(keep, fields)

    mh = jnp.concatenate([kh_hash, rl_h, rr_h])
    mfields = {k: jnp.concatenate([kfields[k], rl_buf[k], rr_buf[k]])
               for k in fields}
    mh_sorted, _, (pos_s, vel_s, pres_s, *ecols_s) = gridlib.sort_by_hash(
        mh, mfields["pos"], mfields["vel"], mfields["pres"],
        *(mfields[k] for k in ekeys))
    h = mh_sorted[:cl]
    pos = pos_s[:cl]
    vel = vel_s[:cl]
    pres = pres_s[:cl]
    extra = {k: c[:cl] for k, c in zip(ekeys, ecols_s)}
    total_valid = jnp.searchsorted(mh_sorted, I32_MAX,
                                   side="left").astype(jnp.int32)
    cap_overflow = jnp.maximum(total_valid - cl, 0)
    n_own = jnp.minimum(total_valid, cl)

    # -- halo exchange (pos/vel) ---------------------------------------
    fields = {"pos": pos, "vel": vel}
    top_lo, top_hi = _row_hashes(grid, jnp.minimum(
        (s + 1) * slab, grid.size[2]) - 1)
    bot_lo, bot_hi = _row_hashes(grid, s * slab)
    # top row → right neighbor (their left halo: padding in front)
    th, tbuf, t_idx, t_valid, t_over = _extract_edge(
        h, fields, top_lo, top_hi, kh, pad_front=True)
    # bottom row → left neighbor (their right halo: padding behind)
    bh, bbuf, b_idx, b_valid, b_over = _extract_edge(
        h, fields, bot_lo, bot_hi, kh, pad_front=False)
    halo_overflow = jnp.maximum(t_over, b_over)

    lhalo_h, lhalo = jax.tree_util.tree_map(
        lambda x: _ppermute_shift(x, ax, d, +1), (th, tbuf))
    rhalo_h, rhalo = jax.tree_util.tree_map(
        lambda x: _ppermute_shift(x, ax, d, -1), (bh, bbuf))
    lhalo_h = jnp.where(s == 0, I32_MIN, lhalo_h)
    rhalo_h = jnp.where(s == d - 1, I32_MAX, rhalo_h)
    lhalo = _mask_buffer((s > 0) & jnp.ones((kh,), bool), lhalo)
    rhalo = _mask_buffer((s < d - 1) & jnp.ones((kh,), bool), rhalo)

    # Source layout: [left_halo | owned | tail]. The owned block carries
    # I32_MAX sentinels in its inactive slots [n_own, cl), so the right
    # halo cannot simply be appended (it would sit *after* those
    # sentinels, breaking the ascending hash order searchsorted needs).
    # Instead it is spliced in directly after the last live owned
    # particle with a dynamic_update_slice; everything beyond stays at
    # the I32_MAX sentinel. Queries' own indices (kh + i, i < n_own)
    # always land in the owned block, so self-exclusion is unaffected.
    src_hash, src_pos, src_vel = _splice_right_halo(
        (lhalo_h, lhalo["pos"], lhalo["vel"]),
        (h, pos, vel),
        (rhalo_h, rhalo["pos"], rhalo["vel"]),
        n_own, kh)

    return _ShardCtx(
        h=h, pos=pos, vel=vel, pres=pres, n_own=n_own,
        own_active=jnp.arange(cl, dtype=jnp.int32) < n_own,
        src_hash=src_hash, src_pos=src_pos, src_vel=src_vel,
        t_idx=t_idx, t_valid=t_valid, b_idx=b_idx, b_valid=b_valid,
        mig_violation=mig_violation, mig_overflow=mig_overflow,
        halo_overflow=halo_overflow, cap_overflow=cap_overflow,
        extra=extra)


def _halo_hop(fields: dict, sctx: _ShardCtx, scfg: ShardConfig, n_own):
    """Ship computed per-particle fields for the step's ghost slots and
    splice them into source order; returns a tuple in ``fields`` order."""
    ax, d, kh = scfg.axis_name, scfg.n_shards, scfg.halo_capacity
    l = _exchange_saved(fields, sctx.t_idx, sctx.t_valid, ax, d, +1)
    r = _exchange_saved(fields, sctx.b_idx, sctx.b_valid, ax, d, -1)
    keys = list(fields)
    return _splice_right_halo(
        tuple(l[k] for k in keys), tuple(fields[k] for k in keys),
        tuple(r[k] for k in keys), n_own, kh)


def _adapt_dt(params: SimParams, vel, own_active, ax, lam):
    """Global CFL dt inside a sharded step: λ·h/|v|_max, pmax-reduced over
    the mesh so every shard steps with the same dt, capped at the
    configured dt (the reference's disabled block, ``sph.cpp:217-231``)."""
    vmax = jnp.max(jnp.where(own_active,
                             jnp.linalg.norm(vel, axis=-1), 0.0))
    vmax = jax.lax.pmax(vmax, ax)
    dt = jnp.where(vmax > 0.0,
                   lam * params.interaction_radius
                   / jnp.maximum(vmax, 1e-12), params.dt)
    return dataclasses.replace(params, dt=jnp.minimum(dt, params.dt))


def make_sharded_wcsph_step(mesh: Mesh, params: SimParams,
                            grid: gridlib.Grid, cfg: SimConfig,
                            scfg: ShardConfig,
                            boundary: Optional[BoundaryData] = None,
                            adaptive_dt_lambda: Optional[float] = None,
                            multiphase: bool = False):
    """Build the jitted multi-chip WCSPH step.

    Returns ``step(state) -> (state, ShardedDiagnostics)`` where ``state``
    arrays are (D·Cl, ...) sharded over ``scfg.axis_name`` and
    ``state.num_active`` is the (D,) per-shard live count.
    ``adaptive_dt_lambda`` enables the global CFL dt (:func:`_adapt_dt`).

    ``multiphase=True`` builds the per-particle mass/ρ₀ step (adapted
    densities + volume-form forces, the single-chip
    ``wcsph.multiphase_accels`` discretization): the phase columns ride
    the migration sorts/buffers, and the second halo hop ships the
    derived (V_j, p_j·V_j²) source scalars the force sweep needs — ghost
    phase state itself never crosses ICI. States from
    :func:`shard_state` keep their phase columns; surface tension /
    XSPH / implicit viscosity are single-phase-only (build-time error).
    """
    ax = scfg.axis_name
    d = scfg.n_shards
    if mesh.shape[ax] != d:
        raise ValueError(
            f"mesh axis {ax!r} has {mesh.shape[ax]} devices but "
            f"ShardConfig.n_shards={d}")
    if cfg.use_pallas():
        from ..solvers.pallas_common import check_pallas_dtype
        check_pallas_dtype(cfg, grid)
    if multiphase:
        from ..solvers.dfsph import _check_multiphase_cfg
        _check_multiphase_cfg(cfg)
    from ..params import SurfaceTensionModel
    mp_st = (multiphase and
             cfg.surface_tension_model == SurfaceTensionModel.BECKER)
    cl = scfg.local_capacity
    kh = scfg.halo_capacity

    def local_step(pos, vel, pres, *rest, params=params):
        if multiphase:
            mass0, rho00, n_loc = rest
            phase_in = {"mass": mass0, "rho0": rho00}
        else:
            (n_loc,) = rest
            phase_in = {}
        sctx = _migrate_and_halo(pos, vel, pres, n_loc, grid=grid,
                                 scfg=scfg, extra=phase_in)
        h, pos, vel, pres = sctx.h, sctx.pos, sctx.vel, sctx.pres
        n_own = sctx.n_own
        if adaptive_dt_lambda is not None:
            params = _adapt_dt(params, vel, sctx.own_active, ax,
                               adaptive_dt_lambda)
        src_hash, src_pos, src_vel = (sctx.src_hash, sctx.src_pos,
                                      sctx.src_vel)
        t_idx, t_valid = sctx.t_idx, sctx.t_valid
        b_idx, b_valid = sctx.b_idx, sctx.b_valid
        mig_violation, mig_overflow = sctx.mig_violation, sctx.mig_overflow
        halo_overflow, cap_overflow = sctx.halo_overflow, sctx.cap_overflow

        own_active = sctx.own_active
        if multiphase:
            # re-finite the inactive slots: the migration buffers zero
            # invalid fields, and 1/mass / tait(·, rho0=0) would mint the
            # NaNs the finite-by-construction pair math cannot mask
            mass = jnp.where(own_active, sctx.extra["mass"], 1.0)
            rho0 = jnp.where(own_active, sctx.extra["rho0"], 1.0)
        if cfg.use_pallas():
            # ---- Pallas window-sweep physics over the spliced source ----
            from ..ops import pallas_sph as PSs
            from ..ops.pallas_neighbors import (DEF_BLOCK, fuse_plans,
                                                hash_payload, pack_source,
                                                pack_source_fused,
                                                pack_source_wide,
                                                plan_windows, round_up,
                                                rows3_supported)
            from ..solvers.pallas_common import interpret_mode, padded_len
            interp = interpret_mode()
            rows3 = (cfg.sweep_fused_rows
                     and rows3_supported(grid.size))
            rloc = 3 if rows3 else 9
            swin = cfg.resolve_win(rows3)
            sblock = cfg.resolve_block(rows3)
            clb = round_up(cl, sblock)
            qpad = clb - cl

            def padq(a, fillv):
                if qpad == 0:
                    return a
                fill = jnp.full((qpad,) + a.shape[1:], fillv, a.dtype)
                return jnp.concatenate([a, fill])

            # SoA columns for everything query-side: row-major (N, 3)
            # arrays tile (8, 128) and pad 42x (CLAUDE.md) — same
            # treatment as the single-chip ctx
            pq = tuple(padq(pos[:, k], PARK) for k in range(3))
            vq = tuple(padq(vel[:, k], 0.0) for k in range(3))
            act_q = padq(own_active, False)
            qcoords = gridlib.cell_coords_cols(grid, *pq)
            src_len = cl + 2 * kh
            pk16 = _fused_pack16(src_len, boundary, swin)
            anchors, miss = plan_windows(src_hash, qcoords, grid.size,
                                         sblock,
                                         padded_len(src_len, swin),
                                         active_mask=act_q,
                                         win=swin, pack16=pk16,
                rows_local=rloc)
            pvec = PSs.build_pvec(params, cfg, grid)
            hash_f32 = hash_payload(src_hash, pos.dtype, grid.size)
            pm = params.particle_mass
            psi_fluid = jnp.full((src_len,), 1.0, pos.dtype) * pm
            zsrc = jnp.zeros((src_len,), pos.dtype)

            has_b = boundary is not None and boundary.num_boundaries > 0
            if has_b:
                b_anchors, b_miss = plan_windows(
                    boundary.sorted_hash, qcoords, grid.size,
                    sblock, padded_len(src_len, swin)
                    + padded_len(boundary.num_boundaries, swin),
                    active_mask=act_q,
                    pos_offset=padded_len(src_len, swin),
                    win=swin, pack16=pk16,
                rows_local=rloc)
                anchors = fuse_plans(anchors, b_anchors, pack16=pk16,
                rows_local=rloc)
                miss = miss + b_miss
                b_hash_f32 = hash_payload(boundary.sorted_hash, pos.dtype,
                                      grid.size)
                bzero = jnp.zeros_like(boundary.psi)
                bvel = ([boundary.vel[:, k] for k in range(3)]
                        if boundary.vel is not None
                        else [bzero, bzero, bzero])
                n_rows = 2 * rloc

                def pack(vel_cols, slot6):
                    return pack_source_fused(
                        src_pos, hash_f32,
                        [*vel_cols, slot6],
                        boundary.pos, b_hash_f32,
                        [*bvel, boundary.psi], rows=8,
                        win=swin)

            else:
                n_rows = rloc

                def pack(vel_cols, slot6):
                    return pack_source(src_pos, hash_f32, vel_cols, slot6,
                                       win=swin)

            def queries(*cols, width):
                cols = [*pq, *cols]
                z = jnp.zeros((clb,), pos.dtype)
                return jnp.stack(cols + [z] * (width - len(cols)),
                                 axis=0).T

            src_vel_cols = tuple(src_vel[:, k] for k in range(3))
            q4 = queries(width=4)
            zc = jnp.zeros((src_len,), pos.dtype)
            if multiphase:
                # adapted density: fluid δ = Σ W (col 0), boundary Σ ψW
                # (col 1, rescaled per query phase) — same sweeps as the
                # single-chip _wcsph_pallas_multiphase
                dout = PSs.generic_sweep(
                    cfg, PSs.multiphase_density_pair, q4,
                    pack((zc, zc, zc), zc), anchors, pvec, grid.size,
                    out_width=4, pair_fn_b=PSs.multiphase_density_bpair,
                    n_rows=n_rows, interpret=interp)
                delta = dout[:cl, 0]
                dens = mass * delta \
                    + (rho0 / params.rest_density) * dout[:cl, 1]
                prs = wcsph_mod.tait_pressure(dens, params, rho0)
                vol = 1.0 / jnp.maximum(delta, 1e-12)
                pv2 = prs * vol * vol

                # second halo hop: the DERIVED source scalars (V, p·V²)
                # for the ghost slots — ghost mass never ships (with
                # BECKER phase-pair cohesion the ρ₀ phase key rides
                # this same hop as the pair-equality operand)
                vp = {"vol": vol, "pv2": pv2}
                if mp_st:
                    vp["rho0"] = rho0
                l_vp = _exchange_saved(vp, t_idx, t_valid, ax, d, +1)
                r_vp = _exchange_saved(vp, b_idx, b_valid, ax, d, -1)
                keys = list(vp)
                spliced = _splice_right_halo(
                    tuple(l_vp[k] for k in keys),
                    tuple(vp[k] for k in keys),
                    tuple(r_vp[k] for k in keys), n_own, kh)
                src_vol, src_pv2 = spliced[0], spliced[1]

                inv_rho = 1.0 / jnp.maximum(dens, 1e-12)
                inv_m = jnp.where(own_active,
                                  1.0 / jnp.maximum(mass, 1e-30), 0.0)
                qcols = [*vq, padq(pv2, 0.0), padq(inv_m, 0.0),
                         padq(mass, 1.0), padq(inv_rho, 0.0)]
                # two per-source scalars need the wide 16-row source
                # (row 7 of the 8-row pack is the hash row)
                wide_cols = [*src_vel_cols, src_vol, src_pv2]
                if mp_st:
                    qcols.append(padq(rho0, 1.0))
                    wide_cols.append(spliced[2])
                q10 = queries(*qcols, width=len(qcols) + 3)
                if has_b:
                    src_w = pack_source_fused(
                        src_pos, hash_f32, wide_cols,
                        boundary.pos, b_hash_f32, [*bvel, boundary.psi],
                        rows=16, win=swin)
                else:
                    src_w = pack_source_wide(src_pos, hash_f32, wide_cols,
                                             rows=16, win=swin)
                acc4 = PSs.generic_sweep(
                    cfg, PSs.multiphase_force_pair, q10, src_w, anchors,
                    pvec, grid.size, out_width=4,
                    pair_fn_b=PSs.multiphase_boundary_pair,
                    pair_b_kw={"moving": _moving_b(boundary)},
                    st_becker=mp_st,
                    n_rows=n_rows, interpret=interp)
                accel = acc4[:cl, :3]
            else:
                # self term ψ·W(0) included by the sweep (no
                # self-exclusion)
                dens = PSs.density_sweep(
                    cfg, q4, pack((zc, zc, zc), psi_fluid),
                    anchors, pvec, grid.size,
                    n_rows=n_rows, interpret=interp)
                dens = dens[:cl]
                prs = wcsph_mod.tait_pressure(dens, params)

                # second halo hop: neighbor densities for the ghost slots
                l_d = _exchange_saved({"dens": dens}, t_idx, t_valid,
                                      ax, d, +1)
                r_d = _exchange_saved({"dens": dens}, b_idx, b_valid,
                                      ax, d, -1)
                (src_dens,) = _splice_right_halo(
                    (l_d["dens"],), (dens,), (r_d["dens"],), n_own, kh)

                dens_safe = jnp.maximum(dens, 1e-12)
                pd2 = prs / (dens_safe * dens_safe)
                q8 = queries(*vq, padq(dens, 0.0), padq(pd2, 0.0), width=8)
                force = PSs.fluid_force_sweep(
                    cfg, q8, pack(src_vel_cols, src_dens), anchors,
                    pvec, grid.size, n_rows=n_rows,
                    moving_boundary=_moving_b(boundary),
                    interpret=interp)
                force = force[:cl] + pm * params.gravity
            seg_overflow = miss
        else:
            # ---- jnp segment-engine physics ------------------------------
            qcoords = gridlib.cell_coords(grid, pos)
            fs, fe = gridlib.row_segments(grid, src_hash, qcoords)
            seg_overflow = gridlib.segment_overflow(fs, fe, cfg.seg_window)
            if boundary is not None and boundary.num_boundaries > 0:
                bs, be = gridlib.row_segments(grid, boundary.sorted_hash,
                                              qcoords)
                seg_overflow = jnp.maximum(
                    seg_overflow, gridlib.segment_overflow(
                        bs, be, cfg.boundary_seg_window))
            else:
                bs = be = None

            qstate = FluidState(pos=pos, vel=vel, pressure=pres,
                                num_active=n_own,
                                mass=mass if multiphase else None,
                                rho0=rho0 if multiphase else None)
            ctx = common.NeighborCtx(
                state=qstate, sorted_hash=src_hash,
                self_idx=kh + jnp.arange(cl, dtype=jnp.int32),
                fluid_start=fs, fluid_end=fe, bnd_start=bs, bnd_end=be,
                active=own_active, overflow=seg_overflow,
                src_pos=src_pos, src_vel=src_vel)

            if multiphase:
                dens, delta = common.compute_density_multiphase(
                    ctx, params, cfg, boundary)
                prs = wcsph_mod.tait_pressure(dens, params, rho0)
                vol = 1.0 / jnp.maximum(delta, 1e-12)
                pv2 = prs * vol * vol

                # second halo hop: derived (V, p·V²) for the ghost slots
                # (+ the ρ₀ phase key under BECKER phase-pair cohesion)
                vp = {"vol": vol, "pv2": pv2}
                if mp_st:
                    vp["rho0"] = rho0
                l_vp = _exchange_saved(vp, t_idx, t_valid, ax, d, +1)
                r_vp = _exchange_saved(vp, b_idx, b_valid, ax, d, -1)
                keys = list(vp)
                spliced = _splice_right_halo(
                    tuple(l_vp[k] for k in keys),
                    tuple(vp[k] for k in keys),
                    tuple(r_vp[k] for k in keys), n_own, kh)

                accel = wcsph_mod.multiphase_accels(
                    ctx, params, cfg, boundary, dens, delta, prs,
                    src_vol=spliced[0], src_pv2=spliced[1],
                    src_rho0=spliced[2] if mp_st else None)
            else:
                dens = common.compute_density(ctx, params, cfg, boundary)
                prs = wcsph_mod.tait_pressure(dens, params)

                # second halo hop: density+pressure of the same ghost
                # slots
                dp = {"dens": dens, "pres": prs}
                l_dp = _exchange_saved(dp, t_idx, t_valid, ax, d, +1)
                r_dp = _exchange_saved(dp, b_idx, b_valid, ax, d, -1)
                src_dens, src_pres = _splice_right_halo(
                    (l_dp["dens"], l_dp["pres"]),
                    (dens, prs),
                    (r_dp["dens"], r_dp["pres"]),
                    n_own, kh)

                f_np = common.compute_nonpressure_forces(
                    ctx, params, cfg, boundary, dens, src_dens=src_dens)
                f_p = wcsph_mod.compute_pressure_force(
                    ctx, params, cfg, boundary, dens, prs,
                    src_dens=src_dens, src_pres=src_pres)
                force = f_np + f_p

        dt = params.dt
        if multiphase:
            g = jnp.asarray(params.gravity, pos.dtype)
            new_vel = vel + dt * (accel + g[None, :])
        else:
            new_vel = vel + (dt / params.particle_mass) * force
        new_pos = pos + dt * new_vel
        new_vel = jnp.where(own_active[:, None], new_vel, jnp.zeros_like(vel))
        new_pos = jnp.where(own_active[:, None], new_pos,
                            jnp.full_like(pos, PARK))
        new_pres = jnp.where(own_active, prs, 0.0)

        # -- global diagnostics --------------------------------------------
        nact_f = jnp.maximum(
            jax.lax.psum(n_own.astype(cfg.dtype), ax), 1.0)
        if multiphase:
            # per-particle rest densities: normalize each deviation by
            # the particle's OWN rho0 (wcsph.density_errors convention)
            relerr = jnp.where(own_active, (dens - rho0) / rho0, 0.0)
        else:
            relerr = jnp.where(
                own_active,
                (dens - params.rest_density) / params.rest_density, 0.0)
        diag = ShardedDiagnostics(
            max_density=jax.lax.pmax(
                jnp.max(jnp.where(own_active, dens, 0.0)), ax),
            mean_density_error=jax.lax.psum(
                jnp.sum(jnp.abs(relerr)), ax) / nact_f,
            mean_compression=jax.lax.psum(
                jnp.sum(jnp.maximum(relerr, 0.0)), ax) / nact_f,
            seg_overflow=jax.lax.pmax(seg_overflow, ax),
            halo_overflow=jax.lax.pmax(halo_overflow, ax),
            migration_overflow=jax.lax.pmax(mig_overflow, ax),
            capacity_overflow=jax.lax.pmax(cap_overflow, ax),
            migration_violation=jax.lax.psum(mig_violation, ax),
            num_active=jax.lax.psum(n_own, ax),
            solver_iters=jnp.asarray(0, jnp.int32),
        )
        outs = (new_pos, new_vel, new_pres)
        if multiphase:
            outs += (mass, rho0)
        return (*outs, n_own[None], diag)

    pspec = P(ax)
    rep = P()
    nargs = 6 if multiphase else 4
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(pspec,) * nargs,
        out_specs=(pspec,) * nargs
        + (jax.tree_util.tree_map(lambda _: rep, _diag_struct()),),
        check_vma=False)

    @jax.jit
    def step(state: FluidState):
        if multiphase:
            if not state.multiphase:
                raise ValueError(
                    "multiphase sharded step needs state.mass/rho0 "
                    "(build the host state with make_fluid_state(..., "
                    "masses=, rest_densities=) before shard_state)")
            pos, vel, pres, mass, rho0, n_loc, diag = sharded(
                state.pos, state.vel, state.pressure,
                state.mass, state.rho0, state.num_active)
            return FluidState(pos=pos, vel=vel, pressure=pres,
                              num_active=n_loc, mass=mass,
                              rho0=rho0), diag
        if state.multiphase:
            raise ValueError(
                "state carries multiphase mass/rho0 columns but the "
                "step was built single-phase — pass multiphase=True to "
                "make_sharded_wcsph_step")
        pos, vel, pres, n_loc, diag = sharded(
            state.pos, state.vel, state.pressure, state.num_active)
        return FluidState(pos=pos, vel=vel, pressure=pres,
                          num_active=n_loc), diag

    return step


def _refuse_multiphase(state: FluidState, what: str):
    if state.multiphase:
        raise NotImplementedError(
            f"multiphase (per-particle mass/rho0) is WCSPH/DFSPH-only; "
            f"the sharded {what} step refuses rather than silently "
            f"dropping the phase columns")


def _moving_b(boundary) -> bool:
    """Constant prescribed boundary velocities (BoundaryData.vel —
    conveyors, a drum spinning in place) are supported sharded: the packs
    carry them in the boundary vel rows and the WCSPH friction compiles
    the relative-velocity form. TIME-DEPENDENT motion (positions changing
    per step) needs the step rebuilt per boundary snapshot — same cadence
    mechanism as the CLI's --refit-every, impractical per step; use the
    single-chip solvers for wavemakers."""
    return (boundary is not None and boundary.num_boundaries > 0
            and boundary.vel is not None)


def _check_pallas_only(cfg: SimConfig, grid: gridlib.Grid, what: str):
    """The sharded IISPH/PCISPH bodies run Pallas window sweeps
    unconditionally (no jnp segment fallback exists for them), so the
    float32 cell-hash limit applies regardless of ``cfg.engine`` — and
    ``engine='segments'`` cannot be honored at all."""
    if cfg.engine == "segments":
        raise ValueError(
            f"{what} only has a Pallas implementation; "
            "SimConfig(engine='segments') is not supported here "
            "(off-TPU it runs the same kernels in interpret mode)")
    from ..solvers.pallas_common import check_pallas_dtype
    check_pallas_dtype(cfg, grid)


def _diag_struct():
    z = 0
    return ShardedDiagnostics(
        max_density=z, mean_density_error=z, mean_compression=z,
        seg_overflow=z,
        halo_overflow=z, migration_overflow=z, capacity_overflow=z,
        migration_violation=z, num_active=z, solver_iters=z)


def make_sharded_iisph_step(mesh: Mesh, params: SimParams,
                            grid: gridlib.Grid, cfg: SimConfig,
                            scfg: ShardConfig,
                            boundary: Optional[BoundaryData] = None,
                            tol: float = 1.0, omega: float = 0.5,
                            adaptive_dt_lambda: Optional[float] = None):
    """Build the jitted multi-chip IISPH step (Pallas window sweeps;
    interpret mode off-TPU).

    Same slab-decomposition scheme as the WCSPH step; boundary terms run
    fused (rows 9-17 of each sweep). The relaxed-Jacobi solve runs as one
    ``lax.while_loop`` whose body performs two extra ghost-field hops per
    iteration (pressure-dependent source slots, then the fresh Σd_ij·p_j
    sums); the convergence check is a global ``psum`` mean — identical on
    every shard, so all shards iterate in lockstep.
    """
    from ..ops import pallas_sph as PSs
    from ..ops.pallas_neighbors import (DEF_BLOCK, fuse_plans, hash_payload,
                                        pack_source, pack_source_fused,
                                        pack_source_wide, plan_windows,
                                        round_up, rows3_supported)
    from ..solvers.pallas_common import interpret_mode, padded_len

    ax = scfg.axis_name
    d = scfg.n_shards
    if mesh.shape[ax] != d:
        raise ValueError(
            f"mesh axis {ax!r} has {mesh.shape[ax]} devices but "
            f"ShardConfig.n_shards={d}")
    _check_pallas_only(cfg, grid, "sharded IISPH")
    cl = scfg.local_capacity
    kh = scfg.halo_capacity
    interp = interpret_mode()
    rows3 = cfg.sweep_fused_rows and rows3_supported(grid.size)
    rloc = 3 if rows3 else 9
    swin = cfg.resolve_win(rows3)
    sblock = cfg.resolve_block(rows3)
    clb = round_up(cl, sblock)
    qpad = clb - cl
    src_len = cl + 2 * kh
    has_b = boundary is not None and boundary.num_boundaries > 0
    n_rows = 2 * rloc if has_b else rloc

    def padq(a, fillv):
        if qpad == 0:
            return a
        fill = jnp.full((qpad,) + a.shape[1:], fillv, a.dtype)
        return jnp.concatenate([a, fill])

    def local_step(pos0, vel0, pres0, n_loc, params=params):
        sctx = _migrate_and_halo(pos0, vel0, pres0, n_loc,
                                 grid=grid, scfg=scfg)
        pos, vel, pres = sctx.pos, sctx.vel, sctx.pres
        n_own, own_active = sctx.n_own, sctx.own_active
        src_pos, src_vel = sctx.src_pos, sctx.src_vel
        hash_f32 = hash_payload(sctx.src_hash, pos.dtype, grid.size)
        if adaptive_dt_lambda is not None:
            params = _adapt_dt(params, vel, own_active, ax,
                               adaptive_dt_lambda)
        dt = params.dt
        pm = params.particle_mass

        # SoA columns for the query side (lane-padding, see CLAUDE.md)
        pq = tuple(padq(pos[:, k], PARK) for k in range(3))
        vq = tuple(padq(vel[:, k], 0.0) for k in range(3))
        act_q = padq(own_active, False)
        qcoords = gridlib.cell_coords_cols(grid, *pq)

        def queries(*cols, width):
            cols = [*pq, *cols]
            z = jnp.zeros((clb,), pos.dtype)
            return jnp.stack(list(cols) + [z] * (width - len(cols)),
                             axis=0).T
        pk16 = _fused_pack16(src_len, boundary, swin)
        anchors_f, miss = plan_windows(sctx.src_hash, qcoords, grid.size,
                                       sblock,
                                       padded_len(src_len, swin),
                                       active_mask=act_q,
                                       win=swin, pack16=pk16,
                rows_local=rloc)
        anchors = anchors_f
        pvec = PSs.build_pvec(params, cfg, grid)
        psi_fluid = jnp.full((src_len,), 1.0, pos.dtype) * pm
        zsrc = jnp.zeros((src_len,), pos.dtype)

        if has_b:
            b_anchors, b_miss = plan_windows(
                boundary.sorted_hash, qcoords, grid.size, sblock,
                padded_len(src_len, swin)
                + padded_len(boundary.num_boundaries, swin),
                active_mask=act_q,
                pos_offset=padded_len(src_len, swin),
                win=swin, pack16=pk16,
                rows_local=rloc)
            anchors = fuse_plans(anchors_f, b_anchors, pack16=pk16,
                rows_local=rloc)
            miss = miss + b_miss
            b_hash_f32 = hash_payload(boundary.sorted_hash, pos.dtype,
                                      grid.size)
            bzero = jnp.zeros_like(boundary.psi)
            bvel = ([boundary.vel[:, k] for k in range(3)]
                    if boundary.vel is not None else [bzero, bzero, bzero])

            def pack(cols_f, rows=8):
                return pack_source_fused(
                    src_pos, hash_f32, cols_f, boundary.pos, b_hash_f32,
                    [*bvel, boundary.psi], rows=rows,
                    win=swin)
        else:
            def pack(cols_f, rows=8):
                return pack_source_wide(src_pos, hash_f32, cols_f,
                                        rows=rows, win=swin)

        def pack8(vel3=None, slot6=None):
            v = vel3 if vel3 is not None else jnp.zeros((src_len, 3),
                                                        pos.dtype)
            s6 = slot6 if slot6 is not None else zsrc
            return pack([v[:, 0], v[:, 1], v[:, 2], s6], rows=8)

        def hop(fields):
            return _halo_hop(fields, sctx, scfg, n_own)

        # --- density ------------------------------------------------------
        q4 = queries(width=4)
        # self term ψ·W(0) included by the sweep (no self-exclusion)
        dens = PSs.density_sweep(cfg, q4, pack8(slot6=psi_fluid), anchors,
                                 pvec, grid.size, n_rows=n_rows,
                                 interpret=interp)[:cl]
        dens_safe = jnp.maximum(dens, 1e-12)
        inv_d2 = 1.0 / (dens_safe * dens_safe)
        (src_dens,) = hop({"dens": dens})

        # --- non-pressure forces → vel_adv ---------------------------------
        q8 = queries(*vq, padq(dens, 0.0), width=8)
        f_adv = PSs.fluid_force_sweep(cfg, q8, pack8(src_vel, src_dens),
                                      anchors, pvec, grid.size,
                                      include_pressure=False,
                                      n_rows=n_rows,
                                      moving_boundary=_moving_b(boundary),
                                      interpret=interp)
        f_adv = f_adv[:cl] + pm * params.gravity
        vel_adv = vel + (dt / pm) * f_adv
        (src_vel_adv,) = hop({"va": vel_adv})

        # --- dii + rho_adv (fused), then aii --------------------------------
        q12 = queries(*(padq(vel_adv[:, k], 0.0) for k in range(3)),
                      *vq, padq(inv_d2, 0.0), width=12)
        src_pred = pack8(src_vel_adv, psi_fluid)
        pr = PSs.generic_sweep(cfg, PSs.dii_rhoadv_pair, q12, src_pred,
                               anchors, pvec, grid.size, out_width=4,
                               n_rows=n_rows, interpret=interp,
                               vel_q_offset=3,
                               pair_fn_b=(PSs.dii_rhoadv_pair if has_b
                                          else None),
                               pair_b_kw=dict(vel_q_offset=6))
        dii = pr[:cl, :3]
        rho_adv = dens + pr[:cl, 3]

        dpi = pm * inv_d2
        q_aii = queries(*(padq(dii[:, k], 0.0) for k in range(3)),
                        padq(dpi, 0.0), width=8)
        aii = PSs.generic_sweep(cfg, PSs.aii_pair, q_aii, src_pred,
                                anchors, pvec, grid.size, out_width=1,
                                n_rows=n_rows, interpret=interp)[:cl, 0]

        (src_dii,) = hop({"dii": dii})
        p0 = 0.5 * pres
        nact_f = jnp.maximum(jax.lax.psum(n_own.astype(cfg.dtype), ax), 1.0)

        # --- relaxed-Jacobi solve -------------------------------------------
        # Clamped-positive mean density error (see solvers/iisph.py — the
        # reference's signed test is a documented free-surface defect).
        def cond(carry):
            p, rho_err, it = carry
            return (((rho_err > tol) | (it < cfg.iisph_min_iters))
                    & (it < cfg.iisph_max_iters))

        def body(carry):
            p, _, it = carry
            pd2 = p * inv_d2
            (src_pd2,) = hop({"pd2": pd2})
            # Σd_ij·p_j: fluid region only (9-row plan, same fused matrix)
            sum_dij = PSs.generic_sweep(
                cfg, PSs.sum_dij_pair, q4, pack8(slot6=src_pd2), anchors_f,
                pvec, grid.size, out_width=4,
                n_rows=rloc, interpret=interp)[:cl, :3]

            src_sd3, src_p = hop({"sd": sum_dij, "p": p})
            src16 = pack(
                [src_dii[:, 0], src_dii[:, 1], src_dii[:, 2], src_p,
                 src_sd3[:, 0], src_sd3[:, 1], src_sd3[:, 2]], rows=16)
            qj = queries(*(padq(sum_dij[:, k], 0.0) for k in range(3)),
                         padq(dpi * p, 0.0), width=8)
            fb = PSs.generic_sweep(
                cfg, PSs.jacobi_fluid_pair, qj, src16, anchors, pvec,
                grid.size, out_width=1,
                n_rows=n_rows, interpret=interp,
                pair_fn_b=(PSs.jacobi_boundary_pair if has_b
                           else None))[:cl, 0]

            dt2 = dt * dt
            denom = aii * dt2
            b = params.rest_density - rho_adv
            p_new = jnp.where(
                jnp.abs(denom) > 1e-12,
                (1.0 - omega) * p
                + (omega / denom) * (b - dt2 * fb),
                0.0)
            p_new = jnp.maximum(p_new, 0.0)
            rho_corr = rho_adv + dt2 * (fb + aii * p)
            err = jnp.maximum(rho_corr - params.rest_density, 0.0)
            rho_err = jax.lax.psum(
                jnp.sum(jnp.where(own_active, err, 0.0)), ax) / nact_f
            return (p_new, rho_err, it + 1)

        init = (p0, jnp.asarray(2.0, cfg.dtype) * tol,
                jnp.asarray(0, jnp.int32))
        p, rho_err, iters = jax.lax.while_loop(cond, body, init)

        # --- pressure force + integration -----------------------------------
        pd2 = p * inv_d2
        (src_pd2,) = hop({"pd2": pd2})
        q_pf = queries(padq(pd2, 0.0), width=4)
        f_p = PSs.generic_sweep(
            cfg, PSs.grad_pressure_force_pair, q_pf, pack8(slot6=src_pd2),
            anchors, pvec, grid.size, out_width=4,
            n_rows=n_rows, interpret=interp, boundary=False,
            pair_fn_b=(PSs.grad_pressure_force_pair if has_b else None),
            pair_b_kw=dict(boundary=True, boundary_sign=-1.0))[:cl, :3]

        new_vel = vel_adv + (dt / pm) * f_p
        new_pos = pos + dt * new_vel
        new_vel = jnp.where(own_active[:, None], new_vel,
                            jnp.zeros_like(vel))
        new_pos = jnp.where(own_active[:, None], new_pos,
                            jnp.full_like(pos, PARK))
        new_pres = jnp.where(own_active, p, 0.0)

        diag = ShardedDiagnostics(
            max_density=jax.lax.pmax(
                jnp.max(jnp.where(own_active, dens, 0.0)), ax),
            mean_density_error=rho_err / params.rest_density,
            mean_compression=rho_err / params.rest_density,
            seg_overflow=jax.lax.pmax(miss, ax),
            halo_overflow=jax.lax.pmax(sctx.halo_overflow, ax),
            migration_overflow=jax.lax.pmax(sctx.mig_overflow, ax),
            capacity_overflow=jax.lax.pmax(sctx.cap_overflow, ax),
            migration_violation=jax.lax.psum(sctx.mig_violation, ax),
            num_active=jax.lax.psum(n_own, ax),
            solver_iters=iters,
        )
        return new_pos, new_vel, new_pres, n_own[None], diag

    pspec = P(ax)
    rep = P()
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(pspec, pspec, pspec, pspec),
        out_specs=(pspec, pspec, pspec, pspec,
                   jax.tree_util.tree_map(lambda _: rep, _diag_struct())),
        check_vma=False)

    @jax.jit
    def step(state: FluidState):
        _refuse_multiphase(state, "solver")
        pos, vel, pres, n_loc, diag = sharded(
            state.pos, state.vel, state.pressure, state.num_active)
        return FluidState(pos=pos, vel=vel, pressure=pres,
                          num_active=n_loc), diag

    return step


def make_sharded_pcisph_step(mesh: Mesh, params: SimParams,
                             grid: gridlib.Grid, cfg: SimConfig,
                             scfg: ShardConfig,
                             boundary: Optional[BoundaryData] = None,
                             delta=None, tol_frac: float = 0.01,
                             adaptive_dt_lambda: Optional[float] = None):
    """Build the jitted multi-chip PCISPH step (Pallas window sweeps).

    The predictive-corrective ``lax.while_loop`` hops the *predicted* ghost
    positions each iteration (the frozen-neighborhood structure and window
    plans stay fixed), then the corrected-pressure pd2 ghosts for the force
    sweep. Convergence uses a global ``pmax`` so shards iterate in lockstep.
    With ``adaptive_dt_lambda`` the stiffness δ is recomputed per step from
    the traced CFL dt (its lattice term is dt-independent).
    """
    from ..ops import pallas_sph as PSs
    from ..ops.pallas_neighbors import (DEF_BLOCK, fuse_plans, hash_payload,
                                        pack_source, pack_source_fused,
                                        pack_source_wide, plan_windows,
                                        round_up, rows3_supported)
    from ..solvers.pallas_common import interpret_mode, padded_len
    from ..solvers.pcisph import (pcisph_delta, pcisph_delta_from_denom,
                                  pcisph_grad_denom)

    grad_denom = None
    if adaptive_dt_lambda is not None:
        grad_denom = pcisph_grad_denom(params, cfg)
    if delta is None:
        delta = pcisph_delta(params, cfg)

    ax = scfg.axis_name
    d = scfg.n_shards
    if mesh.shape[ax] != d:
        raise ValueError(
            f"mesh axis {ax!r} has {mesh.shape[ax]} devices but "
            f"ShardConfig.n_shards={d}")
    _check_pallas_only(cfg, grid, "sharded PCISPH")
    cl = scfg.local_capacity
    kh = scfg.halo_capacity
    interp = interpret_mode()
    rows3 = cfg.sweep_fused_rows and rows3_supported(grid.size)
    rloc = 3 if rows3 else 9
    swin = cfg.resolve_win(rows3)
    sblock = cfg.resolve_block(rows3)
    clb = round_up(cl, sblock)
    qpad = clb - cl
    src_len = cl + 2 * kh
    has_b = boundary is not None and boundary.num_boundaries > 0
    n_rows = 2 * rloc if has_b else rloc
    delta_c = jnp.asarray(delta, cfg.dtype)

    def padq(a, fillv):
        if qpad == 0:
            return a
        fill = jnp.full((qpad,) + a.shape[1:], fillv, a.dtype)
        return jnp.concatenate([a, fill])

    def local_step(pos0, vel0, pres0, n_loc, params=params,
                   delta_c=delta_c):
        sctx = _migrate_and_halo(pos0, vel0, pres0, n_loc,
                                 grid=grid, scfg=scfg)
        pos, vel = sctx.pos, sctx.vel
        n_own, own_active = sctx.n_own, sctx.own_active
        src_pos, src_vel = sctx.src_pos, sctx.src_vel
        hash_f32 = hash_payload(sctx.src_hash, pos.dtype, grid.size)
        if adaptive_dt_lambda is not None:
            params = _adapt_dt(params, vel, own_active, ax,
                               adaptive_dt_lambda)
            delta_c = pcisph_delta_from_denom(
                params, grad_denom).astype(cfg.dtype)
        dt = params.dt
        pm = params.particle_mass

        # SoA columns for the query side (lane-padding, see CLAUDE.md)
        pq = tuple(padq(pos[:, k], PARK) for k in range(3))
        vq = tuple(padq(vel[:, k], 0.0) for k in range(3))
        act_q = padq(own_active, False)
        qcoords = gridlib.cell_coords_cols(grid, *pq)

        def queries(*cols, width):
            cols = [*pq, *cols]
            z = jnp.zeros((clb,), pos.dtype)
            return jnp.stack(list(cols) + [z] * (width - len(cols)),
                             axis=0).T
        pk16 = _fused_pack16(src_len, boundary, swin)
        anchors, miss = plan_windows(sctx.src_hash, qcoords, grid.size,
                                     sblock,
                                     padded_len(src_len, swin),
                                     active_mask=act_q, win=swin,
                                     pack16=pk16,
                rows_local=rloc)
        pvec = PSs.build_pvec(params, cfg, grid)
        psi_fluid = jnp.full((src_len,), 1.0, pos.dtype) * pm

        if has_b:
            b_anchors, b_miss = plan_windows(
                boundary.sorted_hash, qcoords, grid.size, sblock,
                padded_len(src_len, swin)
                + padded_len(boundary.num_boundaries, swin),
                active_mask=act_q,
                pos_offset=padded_len(src_len, swin),
                win=swin, pack16=pk16,
                rows_local=rloc)
            anchors = fuse_plans(anchors, b_anchors, pack16=pk16,
                rows_local=rloc)
            miss = miss + b_miss
            b_hash_f32 = hash_payload(boundary.sorted_hash, pos.dtype,
                                      grid.size)
            bzero = jnp.zeros_like(boundary.psi)
            bvel = ([boundary.vel[:, k] for k in range(3)]
                    if boundary.vel is not None else [bzero, bzero, bzero])

            def pack8(vel3=None, slot6=None, posf=None):
                v = vel3 if vel3 is not None else jnp.zeros(
                    (src_len, 3), pos.dtype)
                s6 = slot6 if slot6 is not None else jnp.zeros(
                    (src_len,), pos.dtype)
                return pack_source_fused(
                    posf if posf is not None else src_pos, hash_f32,
                    [v[:, 0], v[:, 1], v[:, 2], s6],
                    boundary.pos, b_hash_f32,
                    [*bvel, boundary.psi], rows=8,
                    win=swin)
        else:
            def pack8(vel3=None, slot6=None, posf=None):
                v = vel3 if vel3 is not None else jnp.zeros(
                    (src_len, 3), pos.dtype)
                s6 = slot6 if slot6 is not None else jnp.zeros(
                    (src_len,), pos.dtype)
                return pack_source(posf if posf is not None else src_pos,
                                   hash_f32, v, s6, win=swin)

        def hop(fields):
            return _halo_hop(fields, sctx, scfg, n_own)

        # --- density + advection forces ------------------------------------
        q4 = queries(width=4)
        # self term ψ·W(0) included by the sweeps (no self-exclusion)
        dens = PSs.density_sweep(cfg, q4, pack8(slot6=psi_fluid), anchors,
                                 pvec, grid.size, n_rows=n_rows,
                                 interpret=interp)[:cl]
        dens_safe = jnp.maximum(dens, 1e-12)
        inv_d2 = 1.0 / (dens_safe * dens_safe)
        (src_dens,) = hop({"dens": dens})

        q8 = queries(*vq, padq(dens, 0.0), width=8)
        f_adv = PSs.fluid_force_sweep(cfg, q8, pack8(src_vel, src_dens),
                                      anchors, pvec, grid.size,
                                      include_pressure=False,
                                      n_rows=n_rows,
                                      moving_boundary=_moving_b(boundary),
                                      interpret=interp)
        f_adv = f_adv[:cl] + pm * params.gravity

        tol = tol_frac * params.rest_density

        # --- predictive-corrective loop -------------------------------------
        def cond(carry):
            p, f_p, err, it = carry
            return ((err > tol) | (it < cfg.pcisph_min_iters)) & \
                (it < cfg.pcisph_max_iters)

        def body(carry):
            p, f_p, _, it = carry
            vel_pred = vel + (dt / pm) * (f_adv + f_p)
            pos_pred = pos + dt * vel_pred
            (src_pos_pred,) = hop({"pp": pos_pred})
            # columns 0-2 = start-of-step positions (mask matches the frozen
            # plan), 3-5 = predicted positions for distances (geom_offset=3)
            q6p = queries(*(padq(pos_pred[:, k], PARK)
                            for k in range(3)), width=8)
            rho_pred = PSs.density_sweep(
                cfg, q6p, pack8(slot6=psi_fluid, posf=src_pos_pred),
                anchors, pvec, grid.size,
                n_rows=n_rows, geom_offset=3, interpret=interp)[:cl]
            rho_err = jnp.maximum(rho_pred - params.rest_density, 0.0)
            rho_err = jnp.where(own_active, rho_err, 0.0)
            p_new = p + delta_c * rho_err

            pd2 = p_new * inv_d2
            (src_pd2,) = hop({"pd2": pd2})
            q_pf = queries(padq(pd2, 0.0), width=4)
            f_p_new = PSs.generic_sweep(
                cfg, PSs.grad_pressure_force_pair, q_pf,
                pack8(slot6=src_pd2), anchors, pvec, grid.size, out_width=4,
                n_rows=n_rows, interpret=interp, boundary=False,
                pair_fn_b=(PSs.grad_pressure_force_pair if has_b else None),
                pair_b_kw=dict(boundary=True,
                               boundary_sign=-1.0))[:cl, :3]
            err = jax.lax.pmax(jnp.max(rho_err), ax)
            return (p_new, f_p_new, err, it + 1)

        # warm start: half the previous step's converged pressure (carried
        # through migration in sctx.pres) + one pressure-force sweep with
        # hopped pd2 ghosts; see solvers/pcisph.py for the rationale
        p0 = jnp.zeros((cl,), cfg.dtype)
        f_p0 = jnp.zeros((cl, 3), cfg.dtype)
        if cfg.pcisph_warm_start:
            p0 = cfg.pcisph_warm_frac * jnp.maximum(
                jnp.where(own_active, sctx.pres, 0.0), 0.0)

            def _warm_sweep():
                pd2_0 = p0 * inv_d2
                (src_pd2_0,) = hop({"pd2": pd2_0})
                q_p0 = queries(padq(pd2_0, 0.0), width=4)
                return PSs.generic_sweep(
                    cfg, PSs.grad_pressure_force_pair, q_p0,
                    pack8(slot6=src_pd2_0), anchors, pvec, grid.size,
                    out_width=4, n_rows=n_rows, interpret=interp,
                    boundary=False,
                    pair_fn_b=(PSs.grad_pressure_force_pair if has_b
                               else None),
                    pair_b_kw=dict(boundary=True,
                                   boundary_sign=-1.0))[:cl, :3]

            # cond-skip when the carried pressure is all-zero (ballistic
            # phases); predicate pmax'd so every shard takes the SAME
            # branch — a divergent cond around the hop's ppermute
            # would deadlock the mesh
            warm_any = jax.lax.pmax(jnp.max(p0), ax) > 0.0
            f_p0 = jax.lax.cond(warm_any, _warm_sweep,
                                lambda: jnp.zeros((cl, 3), cfg.dtype))
        init = (p0, f_p0,
                jnp.asarray(jnp.inf, cfg.dtype), jnp.asarray(0, jnp.int32))
        p, f_p, err, iters = jax.lax.while_loop(cond, body, init)

        new_vel = vel + (dt / pm) * (f_adv + f_p)
        new_pos = pos + dt * new_vel
        new_vel = jnp.where(own_active[:, None], new_vel,
                            jnp.zeros_like(vel))
        new_pos = jnp.where(own_active[:, None], new_pos,
                            jnp.full_like(pos, PARK))
        new_pres = jnp.where(own_active, p, 0.0)

        diag = ShardedDiagnostics(
            max_density=jax.lax.pmax(
                jnp.max(jnp.where(own_active, dens, 0.0)), ax),
            mean_density_error=err / params.rest_density,
            mean_compression=err / params.rest_density,
            seg_overflow=jax.lax.pmax(miss, ax),
            halo_overflow=jax.lax.pmax(sctx.halo_overflow, ax),
            migration_overflow=jax.lax.pmax(sctx.mig_overflow, ax),
            capacity_overflow=jax.lax.pmax(sctx.cap_overflow, ax),
            migration_violation=jax.lax.psum(sctx.mig_violation, ax),
            num_active=jax.lax.psum(n_own, ax),
            solver_iters=iters,
        )
        return new_pos, new_vel, new_pres, n_own[None], diag

    pspec = P(ax)
    rep = P()
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(pspec, pspec, pspec, pspec),
        out_specs=(pspec, pspec, pspec, pspec,
                   jax.tree_util.tree_map(lambda _: rep, _diag_struct())),
        check_vma=False)

    @jax.jit
    def step(state: FluidState):
        _refuse_multiphase(state, "solver")
        pos, vel, pres, n_loc, diag = sharded(
            state.pos, state.vel, state.pressure, state.num_active)
        return FluidState(pos=pos, vel=vel, pressure=pres,
                          num_active=n_loc), diag

    return step


def make_sharded_dfsph_step(mesh: Mesh, params: SimParams,
                            grid: gridlib.Grid, cfg: SimConfig,
                            scfg: ShardConfig,
                            boundary: Optional[BoundaryData] = None,
                            tol: float = 1.0, tol_v: float = 1.0,
                            adaptive_dt_lambda: Optional[float] = None,
                            multiphase: bool = False):
    """Build the jitted multi-chip DFSPH step (Pallas window sweeps;
    interpret mode off-TPU).

    Same slab scheme as the other sharded solvers. Both stiffness
    ``lax.while_loop``s hop two ghost fields per iteration (the current
    velocity field for the divergence sweep, then the fresh κ/ρ stiffness
    column for the symmetric correction sweep); convergence checks are
    global ``psum`` means, so all shards iterate in lockstep — matching
    the single-chip :func:`nereus_tpu.solvers.dfsph.dfsph_step` exactly.

    ``multiphase=True`` builds the adapted number-density formulation
    (single-chip ``solvers.dfsph._dfsph_step_multiphase`` /
    ``dfsph_multiphase_pallas``): the per-particle mass/ρ₀ columns ride
    the migration sorts; ghost slots ship only DERIVED scalars — 1/m_j
    once for the α̂ factor, (V_j, v_j) once for the non-pressure sweep,
    and per iteration the same two hops as single-phase (v for dδ̂/dt,
    κ_jV̂_j² for the correction). Raw ghost mass/ρ₀ never cross ICI.
    """
    from ..ops import pallas_sph as PSs
    from ..ops.pallas_neighbors import (fuse_plans, hash_payload,
                                        pack_source, pack_source_fused,
                                        pack_source_wide,
                                        plan_windows, round_up,
                                        rows3_supported)
    from ..solvers.pallas_common import interpret_mode, padded_len

    ax = scfg.axis_name
    d = scfg.n_shards
    if mesh.shape[ax] != d:
        raise ValueError(
            f"mesh axis {ax!r} has {mesh.shape[ax]} devices but "
            f"ShardConfig.n_shards={d}")
    _check_pallas_only(cfg, grid, "sharded DFSPH")
    if multiphase:
        from ..solvers.dfsph import _check_multiphase_cfg
        _check_multiphase_cfg(cfg)
    from ..params import SurfaceTensionModel
    mp_st = (multiphase and
             cfg.surface_tension_model == SurfaceTensionModel.BECKER)
    cl = scfg.local_capacity
    kh = scfg.halo_capacity
    interp = interpret_mode()
    rows3 = cfg.sweep_fused_rows and rows3_supported(grid.size)
    rloc = 3 if rows3 else 9
    swin = cfg.resolve_win(rows3)
    sblock = cfg.resolve_block(rows3)
    clb = round_up(cl, sblock)
    qpad = clb - cl
    src_len = cl + 2 * kh
    has_b = boundary is not None and boundary.num_boundaries > 0
    n_rows = 2 * rloc if has_b else rloc
    _EPS_DENOM = 1e-6

    def padq(a, fillv):
        if qpad == 0:
            return a
        fill = jnp.full((qpad,) + a.shape[1:], fillv, a.dtype)
        return jnp.concatenate([a, fill])

    def local_step(pos0, vel0, pres0, *rest, params=params):
        if multiphase:
            mass0, rho00, n_loc = rest
            phase_in = {"mass": mass0, "rho0": rho00}
        else:
            (n_loc,) = rest
            phase_in = {}
        sctx = _migrate_and_halo(pos0, vel0, pres0, n_loc,
                                 grid=grid, scfg=scfg, extra=phase_in)
        pos, vel = sctx.pos, sctx.vel
        n_own, own_active = sctx.n_own, sctx.own_active
        src_pos, src_vel = sctx.src_pos, sctx.src_vel
        if multiphase:
            # re-finite inactive slots: 1/mass and rho0-divides would mint
            # NaNs the finite-by-construction pair math cannot mask
            mp_mass = jnp.where(own_active, sctx.extra["mass"], 1.0)
            mp_rho0 = jnp.where(own_active, sctx.extra["rho0"], 1.0)
        hash_f32 = hash_payload(sctx.src_hash, pos.dtype, grid.size)
        if adaptive_dt_lambda is not None:
            params = _adapt_dt(params, vel, own_active, ax,
                               adaptive_dt_lambda)
        dt = params.dt
        pm = params.particle_mass

        # SoA columns for the query side (lane-padding, see CLAUDE.md)
        pq = tuple(padq(pos[:, k], PARK) for k in range(3))
        act_q = padq(own_active, False)
        qcoords = gridlib.cell_coords_cols(grid, *pq)

        def queries(*cols, width):
            cols = [*pq, *cols]
            z = jnp.zeros((clb,), pos.dtype)
            return jnp.stack(list(cols) + [z] * (width - len(cols)),
                             axis=0).T
        pk16 = _fused_pack16(src_len, boundary, swin)
        anchors, miss = plan_windows(sctx.src_hash, qcoords, grid.size,
                                     sblock,
                                     padded_len(src_len, swin),
                                     active_mask=act_q, win=swin,
                                     pack16=pk16, rows_local=rloc)
        pvec = PSs.build_pvec(params, cfg, grid)
        psi_fluid = jnp.full((src_len,), 1.0, pos.dtype) * pm

        if has_b:
            b_anchors, b_miss = plan_windows(
                boundary.sorted_hash, qcoords, grid.size, sblock,
                padded_len(src_len, swin)
                + padded_len(boundary.num_boundaries, swin),
                active_mask=act_q,
                pos_offset=padded_len(src_len, swin),
                win=swin, pack16=pk16, rows_local=rloc)
            anchors = fuse_plans(anchors, b_anchors, pack16=pk16,
                                 rows_local=rloc)
            miss = miss + b_miss
            b_hash_f32 = hash_payload(boundary.sorted_hash, pos.dtype,
                                      grid.size)
            bzero = jnp.zeros_like(boundary.psi)
            bvel = ([boundary.vel[:, k] for k in range(3)]
                    if boundary.vel is not None else [bzero, bzero, bzero])

            def pack8(vel3=None, slot6=None):
                v = vel3 if vel3 is not None else jnp.zeros(
                    (src_len, 3), pos.dtype)
                s6 = slot6 if slot6 is not None else jnp.zeros(
                    (src_len,), pos.dtype)
                return pack_source_fused(
                    src_pos, hash_f32, [v[:, 0], v[:, 1], v[:, 2], s6],
                    boundary.pos, b_hash_f32,
                    [*bvel, boundary.psi], rows=8,
                    win=swin)
        else:
            def pack8(vel3=None, slot6=None):
                v = vel3 if vel3 is not None else jnp.zeros(
                    (src_len, 3), pos.dtype)
                s6 = slot6 if slot6 is not None else jnp.zeros(
                    (src_len,), pos.dtype)
                return pack_source(src_pos, hash_f32, v, s6, win=swin)

        def hop(fields):
            return _halo_hop(fields, sctx, scfg, n_own)

        nact_f = jnp.maximum(jax.lax.psum(n_own.astype(cfg.dtype), ax), 1.0)

        def mean_active(x):
            return jax.lax.psum(
                jnp.sum(jnp.where(own_active, x, 0.0)), ax) / nact_f

        if multiphase:
            # === adapted number-density DFSPH (single-chip:
            # solvers.dfsph._dfsph_step_multiphase / the Pallas twin in
            # solvers.dfsph_pallas.dfsph_multiphase_pallas) =============
            rd = params.rest_density
            q4 = queries(width=4)
            dout = PSs.generic_sweep(
                cfg, PSs.multiphase_density_pair, q4, pack8(), anchors,
                pvec, grid.size, out_width=4, n_rows=n_rows,
                interpret=interp,
                pair_fn_b=(PSs.multiphase_density_bpair if has_b
                           else None))
            delta = dout[:cl, 0]
            dens = mp_mass * delta + (mp_rho0 / rd) * dout[:cl, 1]
            delta_hat = dens / mp_mass
            delta0 = mp_rho0 / mp_mass
            vhat2 = 1.0 / jnp.maximum(delta_hat * delta_hat, 1e-24)
            sm = (mp_rho0 / rd) / mp_mass
            to_kg = mp_mass * (rd / mp_rho0)
            im_own = 1.0 / mp_mass

            # α̂ needs the ghost 1/m_j source scalar — ONE derived hop,
            # loop-invariant (raw ghost mass never ships)
            (src_im,) = hop({"im": im_own})
            al = PSs.generic_sweep(
                cfg, PSs.multiphase_alpha_pair, q4, pack8(slot6=src_im),
                anchors, pvec, grid.size, out_width=8, n_rows=n_rows,
                interpret=interp,
                pair_fn_b=(PSs.multiphase_alpha_bpair if has_b
                           else None))
            ghx = al[:cl, 0] + sm * al[:cl, 4]
            ghy = al[:cl, 1] + sm * al[:cl, 5]
            ghz = al[:cl, 2] + sm * al[:cl, 6]
            denom = (ghx * ghx + ghy * ghy + ghz * ghz
                     + mp_mass * al[:cl, 3])
            alpha = (mp_mass * delta_hat * delta_hat
                     / jnp.maximum(denom, _EPS_DENOM))

            def drho_of(v):
                """dδ̂/dt sweep; hops the current ghost velocities."""
                (src_v,) = hop({"v": jnp.stack(v, axis=1)})
                q8 = queries(*(padq(vk, 0.0) for vk in v), width=8)
                dd = PSs.generic_sweep(
                    cfg, PSs.multiphase_drho_pair, q8,
                    pack8(vel3=src_v), anchors, pvec, grid.size,
                    out_width=4, n_rows=n_rows, interpret=interp,
                    pair_fn_b=(PSs.multiphase_drho_bpair if has_b
                               else None))
                return dd[:cl, 0] + sm * dd[:cl, 1]

            def apply_kappa(kappa, v):
                """v ← v − (dt/m)[Σ(κV̂²_i+κV̂²_j)∇W + qc_i Σψ∇W];
                hops the fresh κ_jV̂_j² source scalar."""
                kv2 = kappa * vhat2
                (src_kv2,) = hop({"k": kv2})
                qk = queries(padq(kv2, 0.0), padq(sm * kv2, 0.0),
                             width=8)
                f = PSs.generic_sweep(
                    cfg, PSs.multiphase_kappa_pair, qk,
                    pack8(slot6=src_kv2), anchors, pvec, grid.size,
                    out_width=4, n_rows=n_rows, interpret=interp,
                    pair_fn_b=(PSs.multiphase_kappa_bpair if has_b
                               else None))
                return tuple(v[k] - dt * im_own * f[:cl, k]
                             for k in range(3))

            # --- divergence-free solve --------------------------------
            def vcond(carry):
                v, err, it = carry
                return (((err > tol_v) | (it < cfg.dfsph_min_iters_v))
                        & (it < cfg.dfsph_max_iters_v))

            def vbody(carry):
                v, _, it = carry
                dhat = jnp.maximum(drho_of(v), 0.0)
                v = apply_kappa(dhat * alpha / dt, v)
                return (v, dt * mean_active(dhat * to_kg), it + 1)

            v0 = tuple(vel[:, k] for k in range(3))
            init_v = (v0, jnp.asarray(2.0, cfg.dtype) * tol_v,
                      jnp.asarray(0, jnp.int32))
            vel_df, err_v, iters_v = jax.lax.while_loop(vcond, vbody,
                                                        init_v)

            # --- non-pressure forces: multiphase force sweep with
            # pv2 = 0 (volume-form viscosity + β walls + friction) ------
            vol = 1.0 / jnp.maximum(delta, 1e-12)
            inv_rho = 1.0 / jnp.maximum(dens, 1e-12)
            adv_hop = {"v": jnp.stack(vel_df, axis=1), "vol": vol}
            if mp_st:
                adv_hop["r0"] = mp_rho0
            hopped = hop(adv_hop)
            src_vdf, src_vol = hopped[0], hopped[1]
            zq = jnp.zeros((clb,), pos.dtype)
            qcols = [*(padq(vk, 0.0) for vk in vel_df), zq,
                     padq(im_own, 0.0), padq(mp_mass, 1.0),
                     padq(inv_rho, 0.0)]
            wide_cols = [src_vdf[:, 0], src_vdf[:, 1], src_vdf[:, 2],
                         src_vol, jnp.zeros_like(src_vol)]
            if mp_st:
                qcols.append(padq(mp_rho0, 1.0))
                wide_cols.append(hopped[2])
            q10 = queries(*qcols, width=len(qcols) + 3)
            if has_b:
                src_w = pack_source_fused(
                    src_pos, hash_f32, wide_cols,
                    boundary.pos, b_hash_f32, [*bvel, boundary.psi],
                    rows=16, win=swin)
            else:
                src_w = pack_source_wide(src_pos, hash_f32, wide_cols,
                                         rows=16, win=swin)
            acc4 = PSs.generic_sweep(
                cfg, PSs.multiphase_force_pair, q10, src_w, anchors,
                pvec, grid.size, out_width=4, n_rows=n_rows,
                interpret=interp, st_becker=mp_st,
                pair_fn_b=(PSs.multiphase_boundary_pair if has_b
                           else None),
                pair_b_kw={"moving": _moving_b(boundary)})
            gvec = jnp.asarray(params.gravity, pos.dtype)
            v_star = tuple(vel_df[k] + dt * (acc4[:cl, k] + gvec[k])
                           for k in range(3))

            # warm start: half the previous accumulated κ̂ (rides the
            # migrated pressure column) — single-chip contract
            kap0 = jnp.zeros_like(dens)
            if cfg.dfsph_warm_start:
                kap0 = 0.5 * jnp.maximum(
                    jnp.where(own_active, sctx.pres, 0.0), 0.0)
                v_star = apply_kappa(kap0, v_star)

            # --- constant-density solve on v* -------------------------
            def cond(carry):
                v, kap, err, it = carry
                return (((err > tol) | (it < cfg.dfsph_min_iters))
                        & (it < cfg.dfsph_max_iters))

            def body(carry):
                v, kap, _, it = carry
                dstar = delta_hat + dt * drho_of(v)
                comp = jnp.maximum(dstar - delta0, 0.0)
                kappa = comp * alpha / (dt * dt)
                v = apply_kappa(kappa, v)
                return (v, kap + kappa, mean_active(comp * to_kg),
                        it + 1)

            init = (v_star, kap0,
                    jnp.asarray(2.0, cfg.dtype) * tol,
                    jnp.asarray(0, jnp.int32))
            v_new, kappa, rho_err, iters = jax.lax.while_loop(
                cond, body, init)
            vel_new = jnp.stack(v_new, axis=1)

            new_pos = pos + dt * vel_new
            new_vel = jnp.where(own_active[:, None], vel_new,
                                jnp.zeros_like(vel))
            new_pos = jnp.where(own_active[:, None], new_pos,
                                jnp.full_like(pos, PARK))
            new_pres = jnp.where(own_active, kappa, 0.0)
            diag = ShardedDiagnostics(
                max_density=jax.lax.pmax(
                    jnp.max(jnp.where(own_active, dens, 0.0)), ax),
                mean_density_error=rho_err / rd,
                mean_compression=rho_err / rd,
                seg_overflow=jax.lax.pmax(miss, ax),
                halo_overflow=jax.lax.pmax(sctx.halo_overflow, ax),
                migration_overflow=jax.lax.pmax(sctx.mig_overflow, ax),
                capacity_overflow=jax.lax.pmax(sctx.cap_overflow, ax),
                migration_violation=jax.lax.psum(sctx.mig_violation, ax),
                num_active=jax.lax.psum(n_own, ax),
                solver_iters=iters + iters_v,
            )
            return (new_pos, new_vel, new_pres, mp_mass, mp_rho0,
                    n_own[None], diag)

        # --- density + DFSPH factor α ---------------------------------------
        q4 = queries(width=4)
        src_psi = pack8(slot6=psi_fluid)
        # self term ψ·W(0) included by the sweep (no self-exclusion)
        dens = PSs.density_sweep(cfg, q4, src_psi, anchors, pvec,
                                 grid.size, n_rows=n_rows,
                                 interpret=interp)[:cl]
        dens_safe = jnp.maximum(dens, 1e-12)
        al = PSs.generic_sweep(cfg, PSs.alpha_pair, q4, src_psi, anchors,
                               pvec, grid.size, out_width=4, n_rows=n_rows,
                               interpret=interp, include_sq=True,
                               pair_fn_b=(PSs.alpha_pair if has_b else None),
                               pair_b_kw=dict(include_sq=False))[:cl]
        denom = al[:, 0] ** 2 + al[:, 1] ** 2 + al[:, 2] ** 2 + al[:, 3]
        alpha = dens / jnp.maximum(denom, _EPS_DENOM)

        def drho_of(v):
            """Velocity-divergence sweep; hops the current ghost
            velocities (boundary source vel slots are packed zero)."""
            (src_v,) = hop({"v": jnp.stack(v, axis=1)})
            q8 = queries(*(padq(vk, 0.0) for vk in v), width=8)
            src = pack8(vel3=src_v, slot6=psi_fluid)
            return PSs.generic_sweep(
                cfg, PSs.drho_pair, q8, src, anchors, pvec, grid.size,
                out_width=1, n_rows=n_rows, interpret=interp,
                pair_fn_b=(PSs.drho_pair if has_b else None))[:cl, 0]

        def apply_kappa(kappa, v):
            """v ← v − dt·Σ ψ(κ_i/ρ_i + κ_j/ρ_j)∇W; hops the fresh κ/ρ."""
            kd = kappa / dens_safe
            (src_kd,) = hop({"kd": kd})
            q_kd = queries(padq(kd, 0.0), width=4)
            f = PSs.generic_sweep(
                cfg, PSs.grad_pressure_force_pair, q_kd,
                pack8(slot6=src_kd), anchors, pvec, grid.size,
                out_width=4, n_rows=n_rows, interpret=interp,
                boundary=False,
                pair_fn_b=(PSs.grad_pressure_force_pair if has_b else None),
                pair_b_kw=dict(boundary=True, boundary_sign=-1.0))
            return tuple(v[k] + (dt / pm) * f[:cl, k] for k in range(3))

        # --- divergence-free solve on the incoming velocity field ------------
        def vcond(carry):
            v, err, it = carry
            return (((err > tol_v) | (it < cfg.dfsph_min_iters_v))
                    & (it < cfg.dfsph_max_iters_v))

        def vbody(carry):
            v, _, it = carry
            drho = jnp.maximum(drho_of(v), 0.0)
            v = apply_kappa(drho * alpha / dt, v)
            return (v, dt * mean_active(drho), it + 1)

        v0 = tuple(vel[:, k] for k in range(3))
        init_v = (v0, jnp.asarray(2.0, cfg.dtype) * tol_v,
                  jnp.asarray(0, jnp.int32))
        vel_df, err_v, iters_v = jax.lax.while_loop(vcond, vbody, init_v)

        # --- non-pressure forces ----------------------------------------------
        implicit_visc = cfg.viscosity_model == "implicit"
        vel_df_t = jnp.stack(vel_df, axis=1)
        src_vdf, src_dens = hop({"v": vel_df_t, "d": dens})
        q8 = queries(*(padq(vk, 0.0) for vk in vel_df),
                     padq(dens, 0.0), width=8)
        f_adv = PSs.fluid_force_sweep(cfg, q8, pack8(src_vdf, src_dens),
                                      anchors, pvec, grid.size,
                                      include_pressure=False,
                                      n_rows=n_rows,
                                      moving_boundary=_moving_b(boundary),
                                      include_viscosity=not implicit_visc,
                                      interpret=interp)
        f_adv = f_adv[:cl] + pm * params.gravity
        v_star = tuple(vel_df[k] + (dt / pm) * f_adv[:, k]
                       for k in range(3))

        if implicit_visc:
            # Weiler-2018 backward-Euler viscosity (solvers/viscosity.py):
            # one fused sweep per CG matvec; ghost velocities of the CG
            # iterate hop per matvec (m/ρ is frozen — hopped once); dots
            # are ownership-masked psums so all shards run the same
            # global CG scalars in lockstep
            from ..solvers.viscosity import cg_solve
            nu_dt = params.viscosity * dt
            mrho = pm / dens_safe
            (src_mrho,) = hop({"m": mrho})
            q_dens = padq(dens, 0.0)

            def vdot(u, w):
                s = sum(jnp.sum(jnp.where(own_active, ui * wi, 0.0))
                        for ui, wi in zip(u, w))
                return jax.lax.psum(s, ax)

            def vmatvec(v):
                (src_v,) = hop({"v": jnp.stack(v, axis=1)})
                q8v = queries(*(padq(vk, 0.0) for vk in v), q_dens,
                              width=8)
                out = PSs.generic_sweep(
                    cfg, PSs.visc_laplacian_pair, q8v,
                    pack8(vel3=src_v, slot6=src_mrho), anchors, pvec,
                    grid.size, out_width=4, n_rows=n_rows,
                    interpret=interp, boundary=False,
                    pair_fn_b=(PSs.visc_laplacian_pair if has_b
                               else None),
                    pair_b_kw=dict(boundary=True))
                return tuple(v[k] - nu_dt * out[:cl, k]
                             for k in range(3))

            v_sol, _, _ = cg_solve(vmatvec, v_star, cfg, dot=vdot)
            v_star = tuple(jnp.where(own_active, v_sol[k], v_star[k])
                           for k in range(3))

        # warm start — must mirror the single-chip step exactly
        # (solvers/dfsph.py): half the previous step's accumulated κ
        kap0 = jnp.zeros_like(dens)
        if cfg.dfsph_warm_start:
            kap0 = 0.5 * jnp.maximum(
                jnp.where(own_active, sctx.pres, 0.0), 0.0)
            v_star = apply_kappa(kap0, v_star)

        # --- constant-density solve on v* -------------------------------------
        def cond(carry):
            v, kap, err, it = carry
            return (((err > tol) | (it < cfg.dfsph_min_iters))
                    & (it < cfg.dfsph_max_iters))

        def body(carry):
            v, kap, _, it = carry
            rho_star = dens + dt * drho_of(v)
            comp = jnp.maximum(rho_star - params.rest_density, 0.0)
            kappa = comp * alpha / (dt * dt)
            v = apply_kappa(kappa, v)
            return (v, kap + kappa, mean_active(comp), it + 1)

        init = (v_star, kap0,
                jnp.asarray(2.0, cfg.dtype) * tol,
                jnp.asarray(0, jnp.int32))
        v_new, kappa, rho_err, iters = jax.lax.while_loop(cond, body, init)
        vel_new = jnp.stack(v_new, axis=1)

        new_pos = pos + dt * vel_new
        new_vel = jnp.where(own_active[:, None], vel_new,
                            jnp.zeros_like(vel))
        new_pos = jnp.where(own_active[:, None], new_pos,
                            jnp.full_like(pos, PARK))
        new_pres = jnp.where(own_active, kappa, 0.0)

        diag = ShardedDiagnostics(
            max_density=jax.lax.pmax(
                jnp.max(jnp.where(own_active, dens, 0.0)), ax),
            mean_density_error=rho_err / params.rest_density,
            mean_compression=rho_err / params.rest_density,
            seg_overflow=jax.lax.pmax(miss, ax),
            halo_overflow=jax.lax.pmax(sctx.halo_overflow, ax),
            migration_overflow=jax.lax.pmax(sctx.mig_overflow, ax),
            capacity_overflow=jax.lax.pmax(sctx.cap_overflow, ax),
            migration_violation=jax.lax.psum(sctx.mig_violation, ax),
            num_active=jax.lax.psum(n_own, ax),
            solver_iters=iters + iters_v,
        )
        return new_pos, new_vel, new_pres, n_own[None], diag

    pspec = P(ax)
    rep = P()
    nargs = 6 if multiphase else 4
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(pspec,) * nargs,
        out_specs=(pspec,) * nargs
        + (jax.tree_util.tree_map(lambda _: rep, _diag_struct()),),
        check_vma=False)

    @jax.jit
    def step(state: FluidState):
        if multiphase:
            if not state.multiphase:
                raise ValueError(
                    "multiphase sharded DFSPH step needs state.mass/rho0 "
                    "(build the host state with make_fluid_state(..., "
                    "masses=, rest_densities=) before shard_state)")
            pos, vel, pres, mass, rho0, n_loc, diag = sharded(
                state.pos, state.vel, state.pressure,
                state.mass, state.rho0, state.num_active)
            return FluidState(pos=pos, vel=vel, pressure=pres,
                              num_active=n_loc, mass=mass,
                              rho0=rho0), diag
        _refuse_multiphase(state, "solver")
        pos, vel, pres, n_loc, diag = sharded(
            state.pos, state.vel, state.pressure, state.num_active)
        return FluidState(pos=pos, vel=vel, pressure=pres,
                          num_active=n_loc), diag

    return step


def make_sharded_dfsph_coupled_step(mesh: Mesh, params: SimParams,
                                    grid: gridlib.Grid, cfg: SimConfig,
                                    scfg: ShardConfig,
                                    boundary: Optional[BoundaryData] = None,
                                    tol: float = 1.0, tol_v: float = 1.0):
    """Build the jitted multi-chip DFSPH step with two-way rigid-body
    coupling (floating bodies at pod scale; beyond-reference — upstream
    is single-GPU with immovable scenery, ``sph/sph.cpp:391-432``).

    Bodies are REPLICATED: every shard carries identical body state,
    plans its own windows over the body's Akinci shell (like the walls),
    and computes the fluid-side reaction for the particles it OWNS; the
    per-iteration reaction impulses are ``psum``-reduced so every shard
    applies the same kick to its body copy inside the while_loop carry
    (deterministic lockstep — the Gauss–Seidel interface of
    :func:`nereus_tpu.solvers.dfsph_coupled.dfsph_coupled_step`, whose
    single-chip Pallas path this matches exactly). The strong-coupling
    body-mobility diagonal (``SimConfig.dfsph_strong_coupling``) is
    per-particle-local and needs no collective.

    Returns ``step(state, bodies) -> (state, bodies, diag)`` where
    ``bodies`` is a tuple of :class:`~nereus_tpu.rigid.RigidBody` (or a
    single body, returned in kind).
    """
    from ..ops import pallas_sph as PSs
    from ..ops.pallas_neighbors import (anchors_pack16, fuse_plans,
                                        hash_payload, pack_source,
                                        pack_source_fused, plan_windows,
                                        round_up, rows3_supported)
    from ..rigid import RigidBody, body_boundary, integrate_rigid
    from ..solvers.coupled import _reaction, _rigid_extras
    from ..solvers.dfsph_coupled import _body_inertia_world, _kick
    from ..solvers.pallas_common import interpret_mode, padded_len

    ax = scfg.axis_name
    d = scfg.n_shards
    if mesh.shape[ax] != d:
        raise ValueError(
            f"mesh axis {ax!r} has {mesh.shape[ax]} devices but "
            f"ShardConfig.n_shards={d}")
    _check_pallas_only(cfg, grid, "sharded coupled DFSPH")
    cl = scfg.local_capacity
    kh = scfg.halo_capacity
    interp = interpret_mode()
    rows3 = cfg.sweep_fused_rows and rows3_supported(grid.size)
    rloc = 3 if rows3 else 9
    swin = cfg.resolve_win(rows3)
    sblock = cfg.resolve_block(rows3)
    clb = round_up(cl, sblock)
    qpad = clb - cl
    src_len = cl + 2 * kh
    has_b = boundary is not None and boundary.num_boundaries > 0
    n_rows = 2 * rloc if has_b else rloc
    _EPS_DENOM = 1e-6

    def padq(a, fillv):
        if qpad == 0:
            return a
        fill = jnp.full((qpad,) + a.shape[1:], fillv, a.dtype)
        return jnp.concatenate([a, fill])

    def local_step(pos0, vel0, pres0, n_loc, bodies):
        sctx = _migrate_and_halo(pos0, vel0, pres0, n_loc,
                                 grid=grid, scfg=scfg)
        pos, vel = sctx.pos, sctx.vel
        n_own, own_active = sctx.n_own, sctx.own_active
        src_pos = sctx.src_pos
        hash_f32 = hash_payload(sctx.src_hash, pos.dtype, grid.size)
        dt = params.dt
        pm = params.particle_mass

        bds = [body_boundary(b, grid) for b in bodies]
        coms = [b.com.astype(pos.dtype) for b in bodies]
        relbs = [bd.pos - b.com[None, :] for bd, b in zip(bds, bodies)]
        masses = [b.mass.astype(pos.dtype) for b in bodies]
        Iws = [_body_inertia_world(b).astype(pos.dtype) for b in bodies]

        pq = tuple(padq(pos[:, k], PARK) for k in range(3))
        act_q = padq(own_active, False)
        qcoords = gridlib.cell_coords_cols(grid, *pq)

        def queries(*cols, width):
            cols = [*pq, *cols]
            z = jnp.zeros((clb,), pos.dtype)
            return jnp.stack(list(cols) + [z] * (width - len(cols)),
                             axis=0).T
        pk16 = _fused_pack16(src_len, boundary, swin)
        anchors, miss = plan_windows(sctx.src_hash, qcoords, grid.size,
                                     sblock,
                                     padded_len(src_len, swin),
                                     active_mask=act_q, win=swin,
                                     pack16=pk16, rows_local=rloc)
        pvec = PSs.build_pvec(params, cfg, grid)
        psi_fluid = jnp.full((src_len,), 1.0, pos.dtype) * pm

        if has_b:
            b_anchors, b_miss = plan_windows(
                boundary.sorted_hash, qcoords, grid.size, sblock,
                padded_len(src_len, swin)
                + padded_len(boundary.num_boundaries, swin),
                active_mask=act_q,
                pos_offset=padded_len(src_len, swin),
                win=swin, pack16=pk16, rows_local=rloc)
            anchors = fuse_plans(anchors, b_anchors, pack16=pk16,
                                 rows_local=rloc)
            miss = miss + b_miss
            b_hash_f32 = hash_payload(boundary.sorted_hash, pos.dtype,
                                      grid.size)
            bzero = jnp.zeros_like(boundary.psi)
            bvel = ([boundary.vel[:, k] for k in range(3)]
                    if boundary.vel is not None
                    else [bzero, bzero, bzero])

            def pack8(vel3=None, slot6=None):
                v = vel3 if vel3 is not None else jnp.zeros(
                    (src_len, 3), pos.dtype)
                s6 = slot6 if slot6 is not None else jnp.zeros(
                    (src_len,), pos.dtype)
                return pack_source_fused(
                    src_pos, hash_f32, [v[:, 0], v[:, 1], v[:, 2], s6],
                    boundary.pos, b_hash_f32,
                    [*bvel, boundary.psi], rows=8, win=swin)
        else:
            def pack8(vel3=None, slot6=None):
                v = vel3 if vel3 is not None else jnp.zeros(
                    (src_len, 3), pos.dtype)
                s6 = slot6 if slot6 is not None else jnp.zeros(
                    (src_len,), pos.dtype)
                return pack_source(src_pos, hash_f32, v, s6, win=swin)

        # one plan + packed source per body (slot 6 = ψ); body velocity
        # rows respliced per iteration (Gauss–Seidel interface)
        plans = []
        for k, bd in enumerate(bds):
            mb = bd.num_boundaries
            pk16_b = anchors_pack16(padded_len(mb, swin), swin)
            anchors_b, miss_b = plan_windows(
                bd.sorted_hash, qcoords, grid.size, sblock,
                padded_len(mb, swin), active_mask=act_q, win=swin,
                pack16=pk16_b, rows_local=rloc)
            src_b = pack_source(
                tuple(bd.pos[:, a] for a in range(3)),
                hash_payload(bd.sorted_hash, pos.dtype, grid.size),
                vel=tuple(bd.vel[:, a] for a in range(3)),
                dens_or_psi=bd.psi, win=swin)
            plans.append((anchors_b, src_b))
            miss = miss + miss_b

        bv0 = tuple((b.vel.astype(pos.dtype), b.omega.astype(pos.dtype))
                    for b in bodies)

        def body_srcs(bv):
            out = []
            for k, (anchors_b, src_b) in enumerate(plans):
                vk, wk = bv[k]
                velb = vk[None, :] + jnp.cross(
                    jnp.broadcast_to(wk, relbs[k].shape), relbs[k])
                rows = velb.T.astype(pos.dtype)
                out.append(jax.lax.dynamic_update_slice(src_b, rows,
                                                        (3, 0)))
            return out

        def hop(fields):
            return _halo_hop(fields, sctx, scfg, n_own)

        nact_f = jnp.maximum(jax.lax.psum(n_own.astype(cfg.dtype), ax),
                             1.0)

        def mean_active(x):
            return jax.lax.psum(
                jnp.sum(jnp.where(own_active, x, 0.0)), ax) / nact_f

        def kick_psum(bv_k, F, T, k):
            """psum the local fluid-side reaction so all shards apply
            the identical kick to their body copy."""
            return _kick(bv_k, jax.lax.psum(F, ax), jax.lax.psum(T, ax),
                         dt, masses[k], Iws[k])

        # --- density + α (body shells in both; mobility diagonal) ------
        q4 = queries(width=4)
        src_psi = pack8(slot6=psi_fluid)
        dens = PSs.density_sweep(cfg, q4, src_psi, anchors, pvec,
                                 grid.size, n_rows=n_rows,
                                 interpret=interp)[:cl]
        al = PSs.generic_sweep(cfg, PSs.alpha_pair, q4, src_psi, anchors,
                               pvec, grid.size, out_width=4,
                               n_rows=n_rows, interpret=interp,
                               include_sq=True,
                               pair_fn_b=(PSs.alpha_pair if has_b
                                          else None),
                               pair_b_kw=dict(include_sq=False))[:cl]
        mob = jnp.zeros_like(dens)
        for k, (anchors_b, src_b) in enumerate(plans):
            dens = dens + PSs.density_sweep(
                cfg, q4, src_b, anchors_b, pvec, grid.size,
                n_rows=rloc, interpret=interp)[:cl]
            alb = PSs.generic_sweep(
                cfg, PSs.alpha_pair, q4, src_b, anchors_b, pvec,
                grid.size, out_width=4, n_rows=rloc, interpret=interp,
                include_sq=False)[:cl]
            al = al + alb
            if cfg.dfsph_strong_coupling:
                gk = alb[:, :3]
                tk = jnp.cross(pos - coms[k][None, :], gk)
                mob = mob + pm * (
                    jnp.sum(gk * gk, axis=-1) / masses[k]
                    + jnp.einsum("ni,ij,nj->n", tk,
                                 jnp.linalg.inv(Iws[k]), tk))
        dens_safe = jnp.maximum(dens, 1e-12)
        denom = (al[:, 0] ** 2 + al[:, 1] ** 2 + al[:, 2] ** 2
                 + al[:, 3] + mob)
        alpha = dens / jnp.maximum(denom, _EPS_DENOM)

        def drho_of(v, src_bs):
            (src_v,) = hop({"v": jnp.stack(v, axis=1)})
            q8 = queries(*(padq(vk, 0.0) for vk in v), width=8)
            src = pack8(vel3=src_v, slot6=psi_fluid)
            dr = PSs.generic_sweep(
                cfg, PSs.drho_pair, q8, src, anchors, pvec, grid.size,
                out_width=1, n_rows=n_rows, interpret=interp,
                pair_fn_b=(PSs.drho_pair if has_b else None))[:cl, 0]
            for k, (anchors_b, _) in enumerate(plans):
                dr = dr + PSs.generic_sweep(
                    cfg, PSs.drho_pair, q8, src_bs[k], anchors_b, pvec,
                    grid.size, out_width=1, n_rows=rloc,
                    interpret=interp)[:cl, 0]
            return dr

        def correct(kappa, v, bv):
            kd = kappa / dens_safe
            (src_kd,) = hop({"kd": kd})
            q_kd = queries(padq(kd, 0.0), width=4)
            f = PSs.generic_sweep(
                cfg, PSs.grad_pressure_force_pair, q_kd,
                pack8(slot6=src_kd), anchors, pvec, grid.size,
                out_width=4, n_rows=n_rows, interpret=interp,
                boundary=False,
                pair_fn_b=(PSs.grad_pressure_force_pair if has_b
                           else None),
                pair_b_kw=dict(boundary=True, boundary_sign=-1.0))
            v = tuple(v[k] + (dt / pm) * f[:cl, k] for k in range(3))
            bv = list(bv)
            for k, (anchors_b, _) in enumerate(plans):
                fb = PSs.generic_sweep(
                    cfg, PSs.grad_pressure_force_pair, q_kd,
                    body_srcs(bv)[k], anchors_b, pvec, grid.size,
                    out_width=4, n_rows=rloc, interpret=interp,
                    boundary=True, boundary_sign=-1.0)
                v = tuple(v[a] + (dt / pm) * fb[:cl, a]
                          for a in range(3))
                Fk, Tk = _reaction(pos, fb[:cl, :3], own_active,
                                   coms[k])
                bv[k] = kick_psum(bv[k], Fk, Tk, k)
            return v, tuple(bv)

        # --- divergence-free solve --------------------------------------
        def vcond(carry):
            _, _, err, it = carry
            return (((err > tol_v) | (it < cfg.dfsph_min_iters_v))
                    & (it < cfg.dfsph_max_iters_v))

        def vbody(carry):
            v, bv, _, it = carry
            drho = jnp.maximum(drho_of(v, body_srcs(bv)), 0.0)
            v, bv = correct(drho * alpha / dt, v, bv)
            return (v, bv, dt * mean_active(drho), it + 1)

        v0 = tuple(vel[:, k] for k in range(3))
        init_v = (v0, bv0, jnp.asarray(2.0, cfg.dtype) * tol_v,
                  jnp.asarray(0, jnp.int32))
        vel_df, bv, err_v, iters_v = jax.lax.while_loop(vcond, vbody,
                                                        init_v)

        # --- non-pressure forces + body friction -------------------------
        vel_df_t = jnp.stack(vel_df, axis=1)
        src_vdf, src_dens = hop({"v": vel_df_t, "d": dens})
        q8 = queries(*(padq(vk, 0.0) for vk in vel_df),
                     padq(dens, 0.0), width=8)
        f_adv = PSs.fluid_force_sweep(cfg, q8, pack8(src_vdf, src_dens),
                                      anchors, pvec, grid.size,
                                      include_pressure=False,
                                      n_rows=n_rows,
                                      moving_boundary=_moving_b(boundary),
                                      interpret=interp)
        fxyz = [f_adv[:cl, k] for k in range(3)]
        bv = list(bv)
        for k, (anchors_b, _) in enumerate(plans):
            fb = PSs.generic_sweep(
                cfg, PSs.boundary_force_pair, q8, body_srcs(bv)[k],
                anchors_b, pvec, grid.size, out_width=4, n_rows=rloc,
                interpret=interp, include_pressure=False, moving=True,
                include_adhesion=False)
            for a in range(3):
                fxyz[a] = fxyz[a] + fb[:cl, a]
            Fk, Tk = _reaction(pos, fb[:cl, :3], own_active, coms[k])
            bv[k] = kick_psum(bv[k], Fk, Tk, k)
        bv = tuple(bv)
        g = params.gravity
        v_star = tuple(vel_df[k] + (dt / pm) * (fxyz[k] + pm * g[k])
                       for k in range(3))

        # warm start: half the previous step's accumulated κ
        kap0 = jnp.zeros_like(dens)
        if cfg.dfsph_warm_start:
            kap0 = 0.5 * jnp.maximum(
                jnp.where(own_active, sctx.pres, 0.0), 0.0)
            v_star, bv = correct(kap0, v_star, bv)

        # --- constant-density solve on v* --------------------------------
        def cond(carry):
            _, _, _, err, it = carry
            return (((err > tol) | (it < cfg.dfsph_min_iters))
                    & (it < cfg.dfsph_max_iters))

        def body_fn(carry):
            v, bv, kap, _, it = carry
            rho_star = dens + dt * drho_of(v, body_srcs(bv))
            comp = jnp.maximum(rho_star - params.rest_density, 0.0)
            kappa = comp * alpha / (dt * dt)
            v, bv = correct(kappa, v, bv)
            return (v, bv, kap + kappa, mean_active(comp), it + 1)

        init = (v_star, bv, kap0,
                jnp.asarray(2.0, cfg.dtype) * tol,
                jnp.asarray(0, jnp.int32))
        v_new, bv, kappa, rho_err, iters = jax.lax.while_loop(
            cond, body_fn, init)
        vel_new = jnp.stack(v_new, axis=1)

        # --- integrate (bodies replicated: identical on every shard) -----
        Fx, Tx = _rigid_extras(bodies, boundary, params, cfg)
        new_bodies = tuple(
            integrate_rigid(dataclasses.replace(b, vel=bv[k][0],
                                                omega=bv[k][1]),
                            Fx[k], Tx[k], dt, g)
            for k, b in enumerate(bodies))

        new_pos = pos + dt * vel_new
        new_vel = jnp.where(own_active[:, None], vel_new,
                            jnp.zeros_like(vel))
        new_pos = jnp.where(own_active[:, None], new_pos,
                            jnp.full_like(pos, PARK))
        new_pres = jnp.where(own_active, kappa, 0.0)

        diag = ShardedDiagnostics(
            max_density=jax.lax.pmax(
                jnp.max(jnp.where(own_active, dens, 0.0)), ax),
            mean_density_error=rho_err / params.rest_density,
            mean_compression=rho_err / params.rest_density,
            seg_overflow=jax.lax.pmax(miss, ax),
            halo_overflow=jax.lax.pmax(sctx.halo_overflow, ax),
            migration_overflow=jax.lax.pmax(sctx.mig_overflow, ax),
            capacity_overflow=jax.lax.pmax(sctx.cap_overflow, ax),
            migration_violation=jax.lax.psum(sctx.mig_violation, ax),
            num_active=jax.lax.psum(n_own, ax),
            solver_iters=iters + iters_v,
        )
        return new_pos, new_vel, new_pres, n_own[None], new_bodies, diag

    pspec = P(ax)
    rep = P()
    # prefix specs: `rep` broadcasts over the whole bodies pytree
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(pspec, pspec, pspec, pspec, rep),
        out_specs=(pspec, pspec, pspec, pspec, rep,
                   jax.tree_util.tree_map(lambda _: rep,
                                          _diag_struct())),
        check_vma=False)

    @jax.jit
    def step(state: FluidState, body):
        _refuse_multiphase(state, "rigid-coupled")
        single = isinstance(body, RigidBody)
        bodies = (body,) if single else tuple(body)
        pos, vel, pres, n_loc, new_bodies, diag = sharded(
            state.pos, state.vel, state.pressure, state.num_active,
            bodies)
        new_state = FluidState(pos=pos, vel=vel, pressure=pres,
                               num_active=n_loc)
        return new_state, (new_bodies[0] if single else new_bodies), diag

    return step


def make_sharded_wcsph_coupled_step(mesh: Mesh, params: SimParams,
                                    grid: gridlib.Grid, cfg: SimConfig,
                                    scfg: ShardConfig,
                                    boundary: Optional[BoundaryData] = None,
                                    multiphase: bool = False):
    """Build the jitted multi-chip WCSPH step with two-way rigid-body
    coupling (explicit coupling — no stiffness loops, so unlike the
    DFSPH variant the body needs exactly ONE psum'd reaction per step).

    Bodies are REPLICATED like :func:`make_sharded_dfsph_coupled_step`:
    every shard plans windows over each body's Akinci shell, sweeps the
    contact force for the fluid it OWNS, and the psum of the per-shard
    reactions integrates an identical body copy everywhere (lockstep).

    ``multiphase=True`` runs the adapted-density volume form (the
    single-chip ``coupled._coupled_mp_pallas`` discretization): body
    shells join the walls in the per-query-phase-rescaled density sum
    and the contact runs ``multiphase_body_pair`` (consistent Akinci
    pressure + friction as ACCELERATION; reaction = −Σ m_i a_i).

    Returns ``step(state, bodies) -> (state, bodies, diag)``.
    """
    from ..ops import pallas_sph as PSs
    from ..ops.pallas_neighbors import (anchors_pack16, fuse_plans,
                                        hash_payload, pack_source,
                                        pack_source_fused,
                                        pack_source_wide, plan_windows,
                                        round_up, rows3_supported)
    from ..rigid import RigidBody, body_boundary, integrate_rigid
    from ..solvers.coupled import _reaction, _rigid_extras
    from ..solvers.pallas_common import interpret_mode, padded_len

    ax = scfg.axis_name
    d = scfg.n_shards
    if mesh.shape[ax] != d:
        raise ValueError(
            f"mesh axis {ax!r} has {mesh.shape[ax]} devices but "
            f"ShardConfig.n_shards={d}")
    _check_pallas_only(cfg, grid, "sharded coupled WCSPH")
    if multiphase:
        from ..solvers.dfsph import _check_multiphase_cfg
        _check_multiphase_cfg(cfg)
    from ..params import SurfaceTensionModel
    mp_st = (multiphase and
             cfg.surface_tension_model == SurfaceTensionModel.BECKER)
    cl = scfg.local_capacity
    kh = scfg.halo_capacity
    interp = interpret_mode()
    rows3 = cfg.sweep_fused_rows and rows3_supported(grid.size)
    rloc = 3 if rows3 else 9
    swin = cfg.resolve_win(rows3)
    sblock = cfg.resolve_block(rows3)
    clb = round_up(cl, sblock)
    qpad = clb - cl
    src_len = cl + 2 * kh
    has_b = boundary is not None and boundary.num_boundaries > 0
    n_rows = 2 * rloc if has_b else rloc

    def padq(a, fillv):
        if qpad == 0:
            return a
        fill = jnp.full((qpad,) + a.shape[1:], fillv, a.dtype)
        return jnp.concatenate([a, fill])

    def local_step(pos0, vel0, pres0, *rest):
        *phase0, n_loc, bodies = rest
        if multiphase:
            phase_in = {"mass": phase0[0], "rho0": phase0[1]}
        else:
            phase_in = {}
        sctx = _migrate_and_halo(pos0, vel0, pres0, n_loc, grid=grid,
                                 scfg=scfg, extra=phase_in)
        pos, vel = sctx.pos, sctx.vel
        n_own, own_active = sctx.n_own, sctx.own_active
        src_pos, src_vel = sctx.src_pos, sctx.src_vel
        hash_f32 = hash_payload(sctx.src_hash, pos.dtype, grid.size)
        dt = params.dt
        pm = params.particle_mass
        if multiphase:
            # re-finite inactive slots (1/mass, tait(·, rho0=0) mint NaNs)
            mass = jnp.where(own_active, sctx.extra["mass"], 1.0)
            rho0 = jnp.where(own_active, sctx.extra["rho0"], 1.0)

        bds = [body_boundary(b, grid) for b in bodies]
        coms = [b.com.astype(pos.dtype) for b in bodies]

        pq = tuple(padq(pos[:, k], PARK) for k in range(3))
        vq = tuple(padq(vel[:, k], 0.0) for k in range(3))
        act_q = padq(own_active, False)
        qcoords = gridlib.cell_coords_cols(grid, *pq)

        def queries(*cols, width):
            cols = [*pq, *cols]
            z = jnp.zeros((clb,), pos.dtype)
            return jnp.stack(list(cols) + [z] * (width - len(cols)),
                             axis=0).T

        pk16 = _fused_pack16(src_len, boundary, swin)
        anchors, miss = plan_windows(sctx.src_hash, qcoords, grid.size,
                                     sblock, padded_len(src_len, swin),
                                     active_mask=act_q, win=swin,
                                     pack16=pk16, rows_local=rloc)
        pvec = PSs.build_pvec(params, cfg, grid)
        psi_fluid = jnp.full((src_len,), 1.0, pos.dtype) * pm
        zsrc = jnp.zeros((src_len,), pos.dtype)

        if has_b:
            b_anchors, b_miss = plan_windows(
                boundary.sorted_hash, qcoords, grid.size, sblock,
                padded_len(src_len, swin)
                + padded_len(boundary.num_boundaries, swin),
                active_mask=act_q,
                pos_offset=padded_len(src_len, swin),
                win=swin, pack16=pk16, rows_local=rloc)
            anchors = fuse_plans(anchors, b_anchors, pack16=pk16,
                                 rows_local=rloc)
            miss = miss + b_miss
            b_hash_f32 = hash_payload(boundary.sorted_hash, pos.dtype,
                                      grid.size)
            bzero = jnp.zeros_like(boundary.psi)
            bvel = ([boundary.vel[:, k] for k in range(3)]
                    if boundary.vel is not None
                    else [bzero, bzero, bzero])

            def pack8(vel_cols, slot6):
                return pack_source_fused(
                    src_pos, hash_f32, [*vel_cols, slot6],
                    boundary.pos, b_hash_f32,
                    [*bvel, boundary.psi], rows=8, win=swin)

            def pack16w(wide_cols):
                return pack_source_fused(
                    src_pos, hash_f32, wide_cols,
                    boundary.pos, b_hash_f32,
                    [*bvel, boundary.psi], rows=16, win=swin)
        else:
            def pack8(vel_cols, slot6):
                return pack_source(src_pos, hash_f32, vel_cols, slot6,
                                   win=swin)

            def pack16w(wide_cols):
                return pack_source_wide(src_pos, hash_f32, wide_cols,
                                        rows=16, win=swin)

        # per-body plan + packed source (sample velocities are fixed
        # within the explicit step — packed once)
        plans = []
        for bd in bds:
            mb = bd.num_boundaries
            pk16_b = anchors_pack16(padded_len(mb, swin), swin)
            anchors_b, miss_b = plan_windows(
                bd.sorted_hash, qcoords, grid.size, sblock,
                padded_len(mb, swin), active_mask=act_q, win=swin,
                pack16=pk16_b, rows_local=rloc)
            src_b = pack_source(
                tuple(bd.pos[:, a] for a in range(3)),
                hash_payload(bd.sorted_hash, pos.dtype, grid.size),
                vel=tuple(bd.vel[:, a] for a in range(3)),
                dens_or_psi=bd.psi, win=swin)
            plans.append((anchors_b, src_b))
            miss = miss + miss_b

        def hop(fields):
            return _halo_hop(fields, sctx, scfg, n_own)

        src_vel_cols = tuple(src_vel[:, k] for k in range(3))
        q4 = queries(width=4)
        if multiphase:
            dout = PSs.generic_sweep(
                cfg, PSs.multiphase_density_pair, q4,
                pack8((zsrc, zsrc, zsrc), zsrc), anchors, pvec,
                grid.size, out_width=4,
                pair_fn_b=PSs.multiphase_density_bpair,
                n_rows=n_rows, interpret=interp)
            delta = dout[:cl, 0]
            bsum = dout[:cl, 1]
            for anchors_b, src_b in plans:
                bsum = bsum + PSs.density_sweep(
                    cfg, q4, src_b, anchors_b, pvec, grid.size,
                    n_rows=rloc, interpret=interp)[:cl]
            dens = mass * delta + (rho0 / params.rest_density) * bsum
            prs = wcsph_mod.tait_pressure(dens, params, rho0)
            vol = 1.0 / jnp.maximum(delta, 1e-12)
            pv2 = prs * vol * vol

            vp = {"vol": vol, "pv2": pv2}
            if mp_st:
                vp["rho0"] = rho0
            spliced = hop(vp)

            inv_rho = 1.0 / jnp.maximum(dens, 1e-12)
            inv_m = jnp.where(own_active,
                              1.0 / jnp.maximum(mass, 1e-30), 0.0)
            qcols = [*vq, padq(pv2, 0.0), padq(inv_m, 0.0),
                     padq(mass, 1.0), padq(inv_rho, 0.0)]
            wide_cols = [*src_vel_cols, spliced[0], spliced[1]]
            if mp_st:
                qcols.append(padq(rho0, 1.0))
                wide_cols.append(spliced[2])
            q10 = queries(*qcols, width=len(qcols) + 3)
            acc4 = PSs.generic_sweep(
                cfg, PSs.multiphase_force_pair, q10, pack16w(wide_cols),
                anchors, pvec, grid.size, out_width=4,
                pair_fn_b=PSs.multiphase_boundary_pair,
                pair_b_kw={"moving": _moving_b(boundary)},
                st_becker=mp_st,
                n_rows=n_rows, interpret=interp)
            accel = [acc4[:cl, k] for k in range(3)]

            inv_r2 = inv_rho * inv_rho
            bp = (rho0 / params.rest_density) * jnp.maximum(prs, 0.0) \
                * inv_r2
            fr = mass * inv_r2
            q8b = queries(*vq, padq(bp, 0.0), padq(fr, 0.0), width=8)
            Freact, Treact = [], []
            for k, (anchors_b, src_b) in enumerate(plans):
                ab = PSs.generic_sweep(
                    cfg, PSs.multiphase_body_pair, q8b, src_b, anchors_b,
                    pvec, grid.size, out_width=4, n_rows=rloc,
                    interpret=interp)
                for a in range(3):
                    accel[a] = accel[a] + ab[:cl, a]
                Fk, Tk = _reaction(pos, mass[:, None] * ab[:cl, :3],
                                   own_active, coms[k])
                Freact.append(Fk)
                Treact.append(Tk)
            g = jnp.asarray(params.gravity, pos.dtype)
            new_vel = jnp.stack(
                [vel[:, k] + dt * (accel[k] + g[k]) for k in range(3)],
                axis=1)
        else:
            dens = PSs.density_sweep(
                cfg, q4, pack8((zsrc, zsrc, zsrc), psi_fluid),
                anchors, pvec, grid.size,
                n_rows=n_rows, interpret=interp)[:cl]
            for anchors_b, src_b in plans:
                dens = dens + PSs.density_sweep(
                    cfg, q4, src_b, anchors_b, pvec, grid.size,
                    n_rows=rloc, interpret=interp)[:cl]
            prs = wcsph_mod.tait_pressure(dens, params)

            (src_dens,) = hop({"dens": dens})
            dens_safe = jnp.maximum(dens, 1e-12)
            pd2 = prs / (dens_safe * dens_safe)
            q8 = queries(*vq, padq(dens, 0.0), padq(pd2, 0.0), width=8)
            force = PSs.fluid_force_sweep(
                cfg, q8, pack8(src_vel_cols, src_dens), anchors,
                pvec, grid.size, n_rows=n_rows,
                moving_boundary=_moving_b(boundary),
                interpret=interp)
            fxyz = [force[:cl, k] for k in range(3)]
            Freact, Treact = [], []
            for k, (anchors_b, src_b) in enumerate(plans):
                fb = PSs.generic_sweep(
                    cfg, PSs.boundary_force_pair, q8, src_b, anchors_b,
                    pvec, grid.size, out_width=4, n_rows=rloc,
                    interpret=interp, include_pressure=True, moving=True,
                    include_adhesion=False, pressure_sign=-1.0,
                    consistent_pressure=True)
                for a in range(3):
                    fxyz[a] = fxyz[a] + fb[:cl, a]
                Fk, Tk = _reaction(pos, fb[:cl, :3], own_active, coms[k])
                Freact.append(Fk)
                Treact.append(Tk)
            g = params.gravity
            new_vel = jnp.stack(
                [vel[:, k] + (dt / pm) * (fxyz[k] + pm * g[k])
                 for k in range(3)], axis=1)

        new_pos = pos + dt * new_vel
        new_vel = jnp.where(own_active[:, None], new_vel,
                            jnp.zeros_like(vel))
        new_pos = jnp.where(own_active[:, None], new_pos,
                            jnp.full_like(pos, PARK))
        new_pres = jnp.where(own_active, prs, 0.0)

        # replicated body integration: psum'd fluid reaction + the
        # (deterministic, shard-identical) wall/body-body contacts
        Fx, Tx = _rigid_extras(bodies, boundary, params, cfg)
        new_bodies = tuple(
            integrate_rigid(b,
                            Fx[k] + jax.lax.psum(Freact[k], ax),
                            Tx[k] + jax.lax.psum(Treact[k], ax),
                            dt, params.gravity)
            for k, b in enumerate(bodies))

        nact_f = jnp.maximum(
            jax.lax.psum(n_own.astype(cfg.dtype), ax), 1.0)
        if multiphase:
            relerr = jnp.where(own_active, (dens - rho0) / rho0, 0.0)
        else:
            relerr = jnp.where(
                own_active,
                (dens - params.rest_density) / params.rest_density, 0.0)
        diag = ShardedDiagnostics(
            max_density=jax.lax.pmax(
                jnp.max(jnp.where(own_active, dens, 0.0)), ax),
            mean_density_error=jax.lax.psum(
                jnp.sum(jnp.abs(relerr)), ax) / nact_f,
            mean_compression=jax.lax.psum(
                jnp.sum(jnp.maximum(relerr, 0.0)), ax) / nact_f,
            seg_overflow=jax.lax.pmax(miss, ax),
            halo_overflow=jax.lax.pmax(sctx.halo_overflow, ax),
            migration_overflow=jax.lax.pmax(sctx.mig_overflow, ax),
            capacity_overflow=jax.lax.pmax(sctx.cap_overflow, ax),
            migration_violation=jax.lax.psum(sctx.mig_violation, ax),
            num_active=jax.lax.psum(n_own, ax),
            solver_iters=jnp.asarray(0, jnp.int32),
        )
        outs = (new_pos, new_vel, new_pres)
        if multiphase:
            outs += (mass, rho0)
        return (*outs, n_own[None], new_bodies, diag)

    pspec = P(ax)
    rep = P()
    nargs = 6 if multiphase else 4
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(pspec,) * nargs + (rep,),
        out_specs=(pspec,) * nargs
        + (rep, jax.tree_util.tree_map(lambda _: rep, _diag_struct())),
        check_vma=False)

    @jax.jit
    def step(state: FluidState, body):
        single = isinstance(body, RigidBody)
        bodies = (body,) if single else tuple(body)
        if multiphase:
            if not state.multiphase:
                raise ValueError(
                    "multiphase sharded coupled step needs "
                    "state.mass/rho0 (make_fluid_state(..., masses=, "
                    "rest_densities=) before shard_state)")
            pos, vel, pres, mass, rho0, n_loc, new_bodies, diag = sharded(
                state.pos, state.vel, state.pressure,
                state.mass, state.rho0, state.num_active, bodies)
            new_state = FluidState(pos=pos, vel=vel, pressure=pres,
                                   num_active=n_loc, mass=mass,
                                   rho0=rho0)
        else:
            _refuse_multiphase(state, "rigid-coupled WCSPH")
            pos, vel, pres, n_loc, new_bodies, diag = sharded(
                state.pos, state.vel, state.pressure, state.num_active,
                bodies)
            new_state = FluidState(pos=pos, vel=vel, pressure=pres,
                                   num_active=n_loc)
        return new_state, (new_bodies[0] if single else new_bodies), diag

    return step


def make_sharded_pbf_step(mesh: Mesh, params: SimParams,
                          grid: gridlib.Grid, cfg: SimConfig,
                          scfg: ShardConfig,
                          boundary: Optional[BoundaryData] = None,
                          adaptive_dt_lambda: Optional[float] = None):
    """Build the jitted multi-chip PBF step (Pallas window sweeps;
    interpret mode off-TPU).

    Same slab scheme as the other sharded solvers; advection to x*
    happens BEFORE migration so slab ownership reflects the advected
    positions. The fixed ``cfg.pbf_iters`` Jacobi projections hop two
    ghost fields per iteration (the current iterate positions for both
    sweeps, then the fresh λ column for the correction) over the frozen
    window plan — the PCISPH frozen-neighborhood contract in its sharded
    form (sharded PCISPH already hops predicted positions the same way).
    The iteration count is static, so shards are in lockstep by
    construction. Matches the single-chip
    :func:`nereus_tpu.solvers.pbf.pbf_step` (without XSPH).
    """
    from ..ops import pallas_sph as PSs
    from ..ops.pallas_neighbors import (fuse_plans, hash_payload,
                                        pack_source, pack_source_fused,
                                        plan_windows, round_up,
                                        rows3_supported)
    from ..solvers.pallas_common import interpret_mode, padded_len

    ax = scfg.axis_name
    d = scfg.n_shards
    if mesh.shape[ax] != d:
        raise ValueError(
            f"mesh axis {ax!r} has {mesh.shape[ax]} devices but "
            f"ShardConfig.n_shards={d}")
    _check_pallas_only(cfg, grid, "sharded PBF")
    cl = scfg.local_capacity
    kh = scfg.halo_capacity
    interp = interpret_mode()
    rows3 = cfg.sweep_fused_rows and rows3_supported(grid.size)
    rloc = 3 if rows3 else 9
    swin = cfg.resolve_win(rows3)
    sblock = cfg.resolve_block(rows3)
    clb = round_up(cl, sblock)
    qpad = clb - cl
    src_len = cl + 2 * kh
    has_b = boundary is not None and boundary.num_boundaries > 0
    n_rows = 2 * rloc if has_b else rloc
    rd = float(params.rest_density)

    def padq(a, fillv):
        if qpad == 0:
            return a
        fill = jnp.full((qpad,) + a.shape[1:], fillv, a.dtype)
        return jnp.concatenate([a, fill])

    def local_step(pos0, vel0, pres0, n_loc, params=params):
        act0 = jnp.arange(cl, dtype=jnp.int32) < n_loc[0]
        if adaptive_dt_lambda is not None:
            params = _adapt_dt(params, vel0, act0, ax, adaptive_dt_lambda)
        dt = params.dt
        pm = params.particle_mass
        g = jnp.asarray(params.gravity, pos0.dtype)
        # external-force advection to x* BEFORE migration/halos: the
        # frozen plan and the slab ownership are both built on x*
        v_star0 = jnp.where(act0[:, None], vel0 + dt * g[None, :], vel0)
        x_star0 = jnp.where(act0[:, None], pos0 + dt * v_star0, pos0)
        sctx = _migrate_and_halo(x_star0, v_star0, pres0, n_loc,
                                 grid=grid, scfg=scfg)
        pos, vel = sctx.pos, sctx.vel
        n_own, own_active = sctx.n_own, sctx.own_active
        src_pos = sctx.src_pos
        hash_f32 = hash_payload(sctx.src_hash, pos.dtype, grid.size)

        pq = tuple(padq(pos[:, k], PARK) for k in range(3))
        act_q = padq(own_active, False)
        qcoords = gridlib.cell_coords_cols(grid, *pq)

        def queries(*cols, width):
            cols = [*pq, *cols]
            z = jnp.zeros((clb,), pos.dtype)
            return jnp.stack(list(cols) + [z] * (width - len(cols)),
                             axis=0).T

        pk16 = _fused_pack16(src_len, boundary, swin)
        anchors, miss = plan_windows(sctx.src_hash, qcoords, grid.size,
                                     sblock, padded_len(src_len, swin),
                                     active_mask=act_q, win=swin,
                                     pack16=pk16, rows_local=rloc)
        pvec = PSs.build_pvec(params, cfg, grid)
        psi_fluid = jnp.full((src_len,), 1.0, pos.dtype) * pm

        if has_b:
            b_anchors, b_miss = plan_windows(
                boundary.sorted_hash, qcoords, grid.size, sblock,
                padded_len(src_len, swin)
                + padded_len(boundary.num_boundaries, swin),
                active_mask=act_q,
                pos_offset=padded_len(src_len, swin),
                win=swin, pack16=pk16, rows_local=rloc)
            anchors = fuse_plans(anchors, b_anchors, pack16=pk16,
                                 rows_local=rloc)
            miss = miss + b_miss
            b_hash_f32 = hash_payload(boundary.sorted_hash, pos.dtype,
                                      grid.size)
            bzero = jnp.zeros_like(boundary.psi)
            bvel = ([boundary.vel[:, k] for k in range(3)]
                    if boundary.vel is not None else [bzero, bzero, bzero])

            def pack8(slot6, posf):
                z = jnp.zeros((src_len,), pos.dtype)
                return pack_source_fused(
                    posf, hash_f32, [z, z, z, slot6],
                    boundary.pos, b_hash_f32,
                    [*bvel, boundary.psi], rows=8, win=swin)
        else:
            def pack8(slot6, posf):
                return pack_source(posf, hash_f32,
                                   jnp.zeros((src_len, 3), pos.dtype),
                                   slot6, win=swin)

        def hop(fields):
            return _halo_hop(fields, sctx, scfg, n_own)

        def body(_, carry):
            x, _, _ = carry
            (src_x,) = hop({"x": x})
            xq = tuple(padq(x[:, k], PARK) for k in range(3))
            zq = jnp.zeros((clb,), pos.dtype)
            q_l = queries(zq, *xq, width=8)
            al = PSs.generic_sweep(
                cfg, PSs.pbf_lambda_pair, q_l,
                pack8(psi_fluid, src_x), anchors, pvec, grid.size,
                out_width=8, n_rows=n_rows, interpret=interp,
                include_sq=True,
                pair_fn_b=(PSs.pbf_lambda_pair if has_b else None),
                pair_b_kw=dict(include_sq=False))[:cl]
            dens = al[:, 0]
            comp = jnp.where(own_active,
                             jnp.maximum(dens / rd - 1.0, 0.0), 0.0)
            denom = (al[:, 1] ** 2 + al[:, 2] ** 2 + al[:, 3] ** 2
                     + al[:, 4]) / (rd * rd)
            lam = -comp / (denom + cfg.pbf_eps)
            (src_lam,) = hop({"lam": lam})
            q_dp = queries(padq(lam, 0.0), *xq, width=8)
            dp = PSs.generic_sweep(
                cfg, PSs.pbf_dp_pair, q_dp,
                pack8(src_lam, src_x), anchors, pvec, grid.size,
                out_width=4, n_rows=n_rows, interpret=interp,
                boundary=False,
                pair_fn_b=(PSs.pbf_dp_pair if has_b else None),
                pair_b_kw=dict(boundary=True))[:cl, :3]
            x = jnp.where(own_active[:, None], x + dp / rd, x)
            return (x, lam, dens)

        init = (pos, jnp.zeros((cl,), cfg.dtype),
                jnp.zeros((cl,), cfg.dtype))
        x_new, lam, dens = jax.lax.fori_loop(0, cfg.pbf_iters, body, init)

        new_vel = vel + (x_new - pos) / dt
        new_vel = jnp.where(own_active[:, None], new_vel,
                            jnp.zeros_like(vel))
        new_pos = jnp.where(own_active[:, None], x_new,
                            jnp.full_like(pos, PARK))
        new_pres = jnp.where(own_active, lam, 0.0)

        nact_g = jnp.maximum(
            jax.lax.psum(n_own, ax).astype(cfg.dtype), 1.0)

        def gmean(v):
            return jax.lax.psum(
                jnp.sum(jnp.where(own_active, v, 0.0)), ax) / nact_g

        comp_last = jnp.maximum(dens / rd - 1.0, 0.0)
        diag = ShardedDiagnostics(
            max_density=jax.lax.pmax(
                jnp.max(jnp.where(own_active, dens, 0.0)), ax),
            mean_density_error=gmean(jnp.abs(dens / rd - 1.0)),
            mean_compression=gmean(comp_last),
            seg_overflow=jax.lax.pmax(miss, ax),
            halo_overflow=jax.lax.pmax(sctx.halo_overflow, ax),
            migration_overflow=jax.lax.pmax(sctx.mig_overflow, ax),
            capacity_overflow=jax.lax.pmax(sctx.cap_overflow, ax),
            migration_violation=jax.lax.psum(sctx.mig_violation, ax),
            num_active=jax.lax.psum(n_own, ax),
            solver_iters=jnp.asarray(cfg.pbf_iters, jnp.int32),
        )
        return new_pos, new_vel, new_pres, n_own[None], diag

    pspec = P(ax)
    rep = P()
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(pspec, pspec, pspec, pspec),
        out_specs=(pspec, pspec, pspec, pspec,
                   jax.tree_util.tree_map(lambda _: rep, _diag_struct())),
        check_vma=False)

    @jax.jit
    def step(state: FluidState):
        _refuse_multiphase(state, "solver")
        pos, vel, pres, n_loc, diag = sharded(
            state.pos, state.vel, state.pressure, state.num_active)
        return FluidState(pos=pos, vel=vel, pressure=pres,
                          num_active=n_loc), diag

    return step


def make_sharded_wcsph_elastic_step(mesh: Mesh, params: SimParams,
                                    grid: gridlib.Grid, cfg: SimConfig,
                                    scfg: ShardConfig,
                                    statics, ep, psi,
                                    boundary: Optional[BoundaryData] = None,
                                    substeps: int = 4):
    """Build the jitted multi-chip WCSPH step with two-way fluid–ELASTIC
    coupling (deformable bodies at pod scale; beyond-reference — upstream
    has neither elastic bodies nor multi-GPU, ``sph/sph.cpp:391-432``).

    The body is REPLICATED like the rigid bodies of
    :func:`make_sharded_dfsph_coupled_step`: every shard carries an
    identical :class:`~nereus_tpu.solvers.elastic.ElasticState`, hash-sorts
    it into a moving Akinci boundary, and plans its own fluid↔body windows.
    Unlike a rigid body, a deformable one needs the reaction PER SAMPLE
    (not just ΣF/Στ), so each shard runs the reverse sweep
    (:func:`~nereus_tpu.ops.pallas_sph.fluid_reaction_pair`) of body
    queries against its local fluid source — with the HALO GHOST rows'
    positions parked in a reverse-only source pack so each fluid particle
    contributes from exactly one shard (ghosts would double-count after
    the reduction; parked rows fail the r² < h² cutoff, an exact zero) —
    and the per-sample reactions are ``psum``-reduced. Every shard then
    advances the same ``substeps`` total-Lagrangian substeps under the
    identical psum'd reaction (deterministic lockstep, no broadcast).

    ``statics``/``ep``/``psi`` as in
    :func:`~nereus_tpu.solvers.elastic_coupled.wcsph_elastic_step`, whose
    single-chip Pallas path this matches.
    Returns ``step(state, estate) -> (state, estate, diag)``.
    """
    from ..ops import pallas_sph as PSs
    from ..ops.pallas_neighbors import (anchors_pack16, fuse_plans,
                                        hash_payload, pack_source,
                                        pack_source_fused, plan_windows,
                                        round_up, rows3_supported)
    from ..solvers.elastic import elastic_step
    from ..solvers.elastic_coupled import _body_boundary
    from ..solvers.pallas_common import interpret_mode, padded_len

    ax = scfg.axis_name
    d = scfg.n_shards
    if mesh.shape[ax] != d:
        raise ValueError(
            f"mesh axis {ax!r} has {mesh.shape[ax]} devices but "
            f"ShardConfig.n_shards={d}")
    _check_pallas_only(cfg, grid, "sharded coupled elastic")
    cl = scfg.local_capacity
    kh = scfg.halo_capacity
    interp = interpret_mode()
    rows3 = cfg.sweep_fused_rows and rows3_supported(grid.size)
    rloc = 3 if rows3 else 9
    swin = cfg.resolve_win(rows3)
    sblock = cfg.resolve_block(rows3)
    clb = round_up(cl, sblock)
    qpad = clb - cl
    src_len = cl + 2 * kh
    has_b = boundary is not None and boundary.num_boundaries > 0
    n_rows = 2 * rloc if has_b else rloc
    psi = jnp.asarray(psi, cfg.dtype)
    mb = statics.x0.shape[0]
    cb_b = round_up(mb, sblock)
    pad_b = cb_b - mb
    p_sub = dataclasses.replace(params, dt=params.dt / substeps)

    def padq(a, fillv):
        if qpad == 0:
            return a
        fill = jnp.full((qpad,) + a.shape[1:], fillv, a.dtype)
        return jnp.concatenate([a, fill])

    def padc(a, fill):
        return (a if pad_b == 0
                else jnp.concatenate([a, jnp.full((pad_b,), fill, a.dtype)]))

    def local_step(pos0, vel0, pres0, n_loc, estate):
        sctx = _migrate_and_halo(pos0, vel0, pres0, n_loc,
                                 grid=grid, scfg=scfg)
        pos, vel = sctx.pos, sctx.vel
        n_own, own_active = sctx.n_own, sctx.own_active
        src_pos, src_vel = sctx.src_pos, sctx.src_vel
        hash_f32 = hash_payload(sctx.src_hash, pos.dtype, grid.size)
        dt = params.dt
        pm = params.particle_mass

        # body as a hash-sorted moving boundary — identical on every
        # shard (replicated inputs, deterministic ops)
        bd, perm = _body_boundary(estate, psi, grid, cfg)

        pq = tuple(padq(pos[:, k], PARK) for k in range(3))
        vq = tuple(padq(vel[:, k], 0.0) for k in range(3))
        act_q = padq(own_active, False)
        qcoords = gridlib.cell_coords_cols(grid, *pq)

        def queries(*cols, width):
            cols = [*pq, *cols]
            z = jnp.zeros((clb,), pos.dtype)
            return jnp.stack(list(cols) + [z] * (width - len(cols)),
                             axis=0).T

        pk16 = _fused_pack16(src_len, boundary, swin)
        anchors, miss = plan_windows(sctx.src_hash, qcoords, grid.size,
                                     sblock, padded_len(src_len, swin),
                                     active_mask=act_q, win=swin,
                                     pack16=pk16, rows_local=rloc)
        pvec = PSs.build_pvec(params, cfg, grid)
        psi_fluid = jnp.full((src_len,), 1.0, pos.dtype) * pm
        src_vel_cols = tuple(src_vel[:, k] for k in range(3))

        if has_b:
            b_anchors, b_miss = plan_windows(
                boundary.sorted_hash, qcoords, grid.size, sblock,
                padded_len(src_len, swin)
                + padded_len(boundary.num_boundaries, swin),
                active_mask=act_q,
                pos_offset=padded_len(src_len, swin),
                win=swin, pack16=pk16, rows_local=rloc)
            anchors = fuse_plans(anchors, b_anchors, pack16=pk16,
                                 rows_local=rloc)
            miss = miss + b_miss
            b_hash_f32 = hash_payload(boundary.sorted_hash, pos.dtype,
                                      grid.size)
            bzero = jnp.zeros_like(boundary.psi)
            bvel = ([boundary.vel[:, k] for k in range(3)]
                    if boundary.vel is not None
                    else [bzero, bzero, bzero])

            def pack(vel_cols, slot6):
                return pack_source_fused(
                    src_pos, hash_f32, [*vel_cols, slot6],
                    boundary.pos, b_hash_f32,
                    [*bvel, boundary.psi], rows=8, win=swin)
        else:
            def pack(vel_cols, slot6):
                return pack_source(src_pos, hash_f32, vel_cols, slot6,
                                   win=swin)

        # body plan + packed source (slot 6 = per-sample ψ)
        pk16_b = anchors_pack16(padded_len(mb, swin), swin)
        anchors_b, miss_b = plan_windows(
            bd.sorted_hash, qcoords, grid.size, sblock,
            padded_len(mb, swin), active_mask=act_q, win=swin,
            pack16=pk16_b, rows_local=rloc)
        src_b = pack_source(
            tuple(bd.pos[:, a] for a in range(3)),
            hash_payload(bd.sorted_hash, pos.dtype, grid.size),
            vel=tuple(bd.vel[:, a] for a in range(3)),
            dens_or_psi=bd.psi, win=swin)

        # --- density: walls (fused) + body shell ------------------------
        q4 = queries(width=4)
        zc = jnp.zeros((src_len,), pos.dtype)
        dens = PSs.density_sweep(cfg, q4, pack((zc, zc, zc), psi_fluid),
                                 anchors, pvec, grid.size,
                                 n_rows=n_rows, interpret=interp)[:cl]
        dens = dens + PSs.density_sweep(cfg, q4, src_b, anchors_b, pvec,
                                        grid.size, n_rows=rloc,
                                        interpret=interp)[:cl]
        prs = wcsph_mod.tait_pressure(dens, params)
        dens_safe = jnp.maximum(dens, 1e-12)
        pd2 = prs / (dens_safe * dens_safe)

        # second halo hop: ghost densities for the force sweeps
        (src_dens,) = _halo_hop({"dens": dens}, sctx, scfg, n_own)

        # --- forces: walls (fused) + body contact ------------------------
        q8 = queries(*vq, padq(dens, 0.0), padq(pd2, 0.0), width=8)
        force = PSs.fluid_force_sweep(
            cfg, q8, pack(src_vel_cols, src_dens), anchors, pvec,
            grid.size, n_rows=n_rows,
            moving_boundary=_moving_b(boundary), interpret=interp)
        fb = PSs.generic_sweep(cfg, PSs.boundary_force_pair, q8, src_b,
                               anchors_b, pvec, grid.size, out_width=4,
                               n_rows=rloc, interpret=interp,
                               include_pressure=True, moving=True,
                               include_adhesion=False, pressure_sign=-1.0,
                               consistent_pressure=True)
        force = force[:cl] + fb[:cl, :3] + pm * params.gravity

        # --- reverse sweep: reaction per body sample ----------------------
        # ghost rows' POSITIONS are parked in this reverse-only source so
        # each owned fluid particle contributes from exactly ONE shard
        # (the psum below would double-count halo copies; parked rows fail
        # r² < h² — an exact zero, same mechanism as inactive slots)
        i_src = jnp.arange(src_len, dtype=jnp.int32)
        own_src = (i_src >= kh) & (i_src < kh + n_own)
        rev_pos = tuple(jnp.where(own_src, src_pos[:, k], PARK)
                        for k in range(3))
        rev_src = pack_source(rev_pos, hash_f32, vel=src_vel_cols,
                              dens_or_psi=src_dens, win=swin)
        bcols = [padc(bd.pos[:, k], PARK) for k in range(3)]
        bvels = [padc(bd.vel[:, k], 0.0) for k in range(3)]
        bpsi = padc(bd.psi, 0.0)
        q_b = jnp.stack(bcols + bvels
                        + [bpsi, jnp.zeros_like(bpsi)], axis=0).T
        b_active = jnp.arange(cb_b) < mb
        b_coords = gridlib.cell_coords_cols(grid, *bcols)
        pk16_r = anchors_pack16(padded_len(src_len, swin), swin)
        anchors_r, miss_r = plan_windows(
            sctx.src_hash, b_coords, grid.size, sblock,
            padded_len(src_len, swin), active_mask=b_active, win=swin,
            pack16=pk16_r, rows_local=rloc)
        f_rev = PSs.generic_sweep(cfg, PSs.fluid_reaction_pair, q_b,
                                  rev_src, anchors_r, pvec, grid.size,
                                  out_width=4, n_rows=rloc,
                                  interpret=interp)[:mb, :3]
        f_react = jnp.zeros_like(f_rev).at[perm].set(f_rev)
        f_react = jax.lax.psum(f_react, ax)
        miss = miss + miss_b + miss_r

        # --- elastic substeps under the frozen psum'd reaction ------------
        # replicated compute: identical inputs → identical body on every
        # shard, no broadcast needed
        def sub(_, carry):
            es, _d = carry
            return elastic_step(es, statics, p_sub, ep, grid, cfg,
                                f_ext=f_react)

        es0, d0 = elastic_step(estate, statics, p_sub, ep, grid, cfg,
                               f_ext=f_react)
        new_estate, ediag = jax.lax.fori_loop(1, substeps, sub, (es0, d0))

        # --- integrate fluid ----------------------------------------------
        new_vel = vel + (dt / pm) * force
        new_pos = pos + dt * new_vel
        new_vel = jnp.where(own_active[:, None], new_vel,
                            jnp.zeros_like(vel))
        new_pos = jnp.where(own_active[:, None], new_pos,
                            jnp.full_like(pos, PARK))
        new_pres = jnp.where(own_active, prs, 0.0)

        nact_f = jnp.maximum(
            jax.lax.psum(n_own.astype(cfg.dtype), ax), 1.0)
        relerr = jnp.where(
            own_active,
            (dens - params.rest_density) / params.rest_density, 0.0)
        diag = ShardedDiagnostics(
            max_density=jax.lax.pmax(
                jnp.max(jnp.where(own_active, dens, 0.0)), ax),
            mean_density_error=jax.lax.psum(
                jnp.sum(jnp.abs(relerr)), ax) / nact_f,
            mean_compression=jax.lax.psum(
                jnp.sum(jnp.maximum(relerr, 0.0)), ax) / nact_f,
            seg_overflow=jax.lax.pmax(
                jnp.maximum(miss, ediag.seg_overflow), ax),
            halo_overflow=jax.lax.pmax(sctx.halo_overflow, ax),
            migration_overflow=jax.lax.pmax(sctx.mig_overflow, ax),
            capacity_overflow=jax.lax.pmax(sctx.cap_overflow, ax),
            migration_violation=jax.lax.psum(sctx.mig_violation, ax),
            num_active=jax.lax.psum(n_own, ax),
            solver_iters=jnp.asarray(0, jnp.int32),
        )
        return new_pos, new_vel, new_pres, n_own[None], new_estate, diag

    pspec = P(ax)
    rep = P()
    # prefix specs: `rep` broadcasts over the whole ElasticState pytree
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(pspec, pspec, pspec, pspec, rep),
        out_specs=(pspec, pspec, pspec, pspec, rep,
                   jax.tree_util.tree_map(lambda _: rep,
                                          _diag_struct())),
        check_vma=False)

    @jax.jit
    def step(state: FluidState, estate):
        _refuse_multiphase(state, "elastic-coupled")
        pos, vel, pres, n_loc, new_estate, diag = sharded(
            state.pos, state.vel, state.pressure, state.num_active,
            estate)
        return (FluidState(pos=pos, vel=vel, pressure=pres,
                           num_active=n_loc), new_estate, diag)

    return step
