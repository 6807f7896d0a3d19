"""Uniform-grid spatial hashing and the sorted 9-segment neighbor structure.

TPU-native rebuild of the reference's neighbor engine
(``calcHashD`` → thrust radix ``sort_by_key`` → ``reorderDataAndFindCellStartD``,
``sph/sph_kernel_impl.cuh:105-281`` / ``sph/sph_cuda.cu:58-63``), redesigned
for XLA's static-shape compilation model:

* Cell coordinates are **clamped** to the grid, not wrapped — the reference's
  ``& (gridSize-1)`` wrap (``sph_kernel_impl.cuh:118-125``) aliases distant
  cells and forces power-of-two grids; clamping needs neither.
* The hash is row-major with **x fastest** (same ordering as the reference:
  ``(z·gy + y)·gx + x``). Consequently the 27-cell neighborhood of a particle
  is exactly **9 contiguous runs** of the hash-sorted particle array (one per
  (dy, dz) offset, spanning x−1..x+1). All SPH gathers become windowed reads
  of 9 contiguous segments — contiguous, static-shape, DMA-friendly.
* There are **no cellStart/cellEnd tables**: segment bounds are found by
  binary search (``jnp.searchsorted``) of the sorted hash array directly with
  the 9 per-particle row queries. This removes the numCells-sized allocations
  (``sph/sph.cpp:166-170``) and the grid-capacity coupling entirely, and it
  is a pure O(N·9·log N) data-parallel operation with no scatters.

Everything here is dynamic-value / static-shape: grid origin, size and cell
size are traced scalars, so the domain can be refit (``SPH::updateGrid``,
``sph/sph.cpp:300-337``) without recompilation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# The 9 (dy, dz) row offsets of the 3×3×3 neighborhood; x is handled as a
# contiguous 3-cell run inside each row. Static python constant.
ROW_OFFSETS = tuple((dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grid:
    """Uniform grid: analogue of the grid block in ``SphSimParams``
    (``common/sph_kernel.cuh:16-24``).

    ``origin`` and ``cell`` are traced (the domain can shift/scale without
    recompilation); ``size`` is *static* — cell counts determine array
    shapes in the Pallas neighbor engine, and a resize (``SPH::updateGrid``
    refits, ``sph/sph.cpp:300-337``) recompiles, exactly like the
    reference's grid reallocation."""

    origin: jax.Array                       # (3,) world origin (sph.cpp:65)
    size: tuple = dataclasses.field(metadata=dict(static=True),
                                    default=(1, 1, 1))  # cells per axis
    cell: jax.Array = None                  # (3,) cell edge len (sph.cpp:67)

    @property
    def num_cells(self):
        return self.size[0] * self.size[1] * self.size[2]

    @property
    def size_arr(self):
        return jnp.asarray(self.size, dtype=jnp.int32)


def make_grid(origin, size, cell_size, dtype=jnp.float32) -> Grid:
    origin = jnp.asarray(origin, dtype=dtype)
    size = tuple(int(s) for s in np.asarray(size).reshape(-1))
    cell = jnp.broadcast_to(jnp.asarray(cell_size, dtype=dtype), (3,))
    return Grid(origin=origin, size=size, cell=cell)


def fit_grid(lo, hi, cell_size, margin: float = 0.1, dtype=jnp.float32) -> Grid:
    """Fit a grid around an AABB, host-side.

    Mirrors ``SPH::updateGrid`` (``sph/sph.cpp:313-337``): origin is the AABB
    min shifted by ``margin``; the extent is padded by ``margin`` on *both*
    faces of every axis (so a particle up to ``margin`` beyond ``hi`` still
    lands in an interior cell) and divided by the cell size. The reference then rounds to powers of two
    (``nextPower2``, sph.cpp:300-311) because its hash wraps with a bitmask —
    our clamped hash needs no such rounding, so the grid is exact-size.
    """
    lo = np.asarray(lo, dtype=np.float64)
    hi = np.asarray(hi, dtype=np.float64)
    origin = lo - margin
    size = np.ceil((hi - lo + 2.0 * margin) / cell_size).astype(np.int32)
    size = np.maximum(size, 1)
    return make_grid(origin.astype(dtype), size, cell_size, dtype=dtype)


def refit_grid(state, cell_size, boundary=None, margin: float = 0.1,
               dtype=jnp.float32) -> Grid:
    """Refit the grid to the AABB of the live particles (and boundary set).

    The reference's ``SPH::updateGrid`` flow (``sph/sph.cpp:290-337``):
    thrust min/max over positions → origin/extent → grid realloc. Here it
    is a host-side helper; since :class:`Grid.size` is static, stepping
    with the refit grid recompiles — the analogue of the reference's
    ``_initializeGrid`` reallocation. Call it between runs or when
    particles approach the current grid's edges.
    """
    # AABB on DEVICE (masked min/max over active rows) — only 6 floats
    # cross to host, not the full state (~120 MB at 10M particles).
    @jax.jit
    def _aabb(pos, num_active):
        act = (jnp.arange(pos.shape[0]) < num_active)[:, None]
        big = jnp.asarray(jnp.finfo(pos.dtype).max, pos.dtype)
        lo = jnp.min(jnp.where(act, pos, big), axis=0)
        hi = jnp.max(jnp.where(act, pos, -big), axis=0)
        return lo, hi

    lo, hi = (np.asarray(a) for a in
              _aabb(state.pos, jnp.asarray(state.num_active).sum()))
    if boundary is not None and boundary.num_boundaries > 0:
        blo, bhi = (np.asarray(a) for a in
                    _aabb(boundary.pos, boundary.pos.shape[0]))
        lo = np.minimum(lo, blo)
        hi = np.maximum(hi, bhi)
    return fit_grid(lo, hi, cell_size, margin=margin, dtype=dtype)


def cell_coords(grid: Grid, pos):
    """Integer cell coordinates, clamped to the grid.

    Reference: ``calcGridPos`` (``sph_kernel_impl.cuh:105-113``) without the
    subsequent power-of-two wrap.

    Computed as ``floor((pos − origin) · (1/cell))`` — multiply by the
    reciprocal, NOT division — so the host-side window plan and the Pallas
    kernels' in-kernel recomputation (``_sweep_kernel``, which ships
    ``1/cell`` in the parameter vector) round identically for positions at
    representable cell edges. A divide here with a multiply in-kernel can
    disagree by one ULP and shift a row bound a full cell row outside the
    planned windows, bypassing the miss counter.
    """
    c = jnp.floor((pos - grid.origin) * (1.0 / grid.cell)).astype(jnp.int32)
    return jnp.clip(c, 0, grid.size_arr - 1)


def cell_coords_cols(grid: Grid, x, y, z):
    """Column form of :func:`cell_coords`: three (N,) coordinate arrays in,
    a tuple of three (N,) int32 cell-coordinate columns out. Same
    multiply-by-reciprocal rounding (see above). Columns avoid the ~42×
    lane-padding cost of (N, 3) row-major arrays on TPU."""
    out = []
    for v, o, cell, g in zip((x, y, z), grid.origin, grid.cell, grid.size):
        c = jnp.floor((v - o) * (1.0 / cell)).astype(jnp.int32)
        out.append(jnp.clip(c, 0, g - 1))
    return tuple(out)


def cell_hash(grid: Grid, coords):
    """Row-major linear cell id, x fastest (``calcGridHash`` ordering,
    ``sph_kernel_impl.cuh:118-125``)."""
    gx = grid.size[0]
    gy = grid.size[1]
    return (coords[..., 2] * gy + coords[..., 1]) * gx + coords[..., 0]


def hash_positions(grid: Grid, pos, active_mask=None):
    """Per-particle cell hash; inactive slots hash to +inf-like sentinel so a
    sort pushes them to the tail (the static-capacity analogue of
    ``m_numParticles`` < ``MAX_PARTICLE_NUMBER``, ``sph/sph.h:19``)."""
    h = cell_hash(grid, cell_coords(grid, pos))
    if active_mask is not None:
        h = jnp.where(active_mask, h, jnp.iinfo(jnp.int32).max)
    return h


def sort_by_hash(hashes, *arrays, return_perm=False):
    """Sort particles by cell hash; returns (sorted_hash, perm, sorted_arrays).

    ``perm`` is None unless ``return_perm=True``: carrying the arange
    payload through the sort's merge passes costs real bandwidth and no
    production caller uses it.

    The XLA analogue of thrust ``sort_by_key`` + the reorder kernel
    (``sph_cuda.cu:58-63``, ``sph_kernel_impl.cuh:210-281``): ONE variadic
    stable sort carrying every field column as a payload operand.
    Applying an argsort permutation with ``a[perm]`` lowers to element
    gathers that run ~100× below HBM bandwidth on TPU (measured ~35 ms/step
    at 1M for pos+vel+pressure+hash); the variadic sort moves the payloads
    through the sort's merge passes instead and needs no gathers at all.
    Downstream physics runs entirely in sorted space (the reference mixes
    sorted and original index spaces — SURVEY §5).
    """
    n = hashes.shape[0]
    ops = [hashes]
    if return_perm:
        ops.append(jnp.arange(n, dtype=jnp.int32))
    widths = []
    for a in arrays:
        if a.ndim == 1:
            ops.append(a)
            widths.append(None)
        else:
            ops.extend(a[:, j] for j in range(a.shape[1]))
            widths.append(a.shape[1])
    out = jax.lax.sort(tuple(ops), num_keys=1, is_stable=True)
    res = []
    i = 2 if return_perm else 1
    for a, k in zip(arrays, widths):
        if k is None:
            res.append(out[i])
            i += 1
        else:
            # stack(axis=0).T: axis=1 concatenates lane-padded (N,1)
            # pieces (~7x slower at 1M — CLAUDE.md SoA note)
            res.append(jnp.stack(out[i:i + k], axis=0).T)
            i += k
    return out[0], out[1] if return_perm else None, tuple(res)


def row_segments(grid: Grid, sorted_hash, coords):
    """Segment bounds of the 9 contiguous neighbor runs per query particle.

    For each query cell coordinate and each (dy, dz) in the 3×3 row stencil,
    the run covers cells (x−1..x+1, y+dy, z+dz) clamped in x; rows that fall
    outside the grid in y/z are empty. Returns ``(seg_start, seg_end)`` each
    of shape ``(9, N)`` int32, indices into the hash-sorted array.

    ``sorted_hash`` may be any sorted int array (fluid per step, or the static
    boundary set built once — ``SPH::updateGpuBoundaries``, sph.cpp:391-432).
    """
    gx = grid.size[0]
    gy = grid.size[1]
    gz = grid.size[2]
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]

    starts = []
    ends = []
    for dy, dz in ROW_OFFSETS:
        yy = y + dy
        zz = z + dz
        valid = (yy >= 0) & (yy < gy) & (zz >= 0) & (zz < gz)
        yy = jnp.clip(yy, 0, gy - 1)
        zz = jnp.clip(zz, 0, gz - 1)
        xlo = jnp.maximum(x - 1, 0)
        xhi = jnp.minimum(x + 1, gx - 1)
        lo_hash = (zz * gy + yy) * gx + xlo
        hi_hash = (zz * gy + yy) * gx + xhi
        s = jnp.searchsorted(sorted_hash, lo_hash, side="left").astype(jnp.int32)
        e = jnp.searchsorted(sorted_hash, hi_hash, side="right").astype(jnp.int32)
        starts.append(jnp.where(valid, s, 0))
        ends.append(jnp.where(valid, e, 0))
    return jnp.stack(starts), jnp.stack(ends)


def segment_overflow(seg_start, seg_end, window: int):
    """Max excess of any segment beyond the static candidate window.

    > 0 means ``SimConfig.seg_window`` is too small for the current particle
    distribution and neighbor sums silently truncate — surfaced as a
    diagnostic (the reference's unused ``maxParticlesPerCell``,
    ``common/sph_kernel.cuh:24``, made real).
    """
    return jnp.maximum(jnp.max(seg_end - seg_start) - window, 0)
