"""Akinci-2012 boundary particle sampling and per-particle volumes.

Native rebuild of the reference's external ``sph_boundary_particles``
submodule (not checked out there; API known from its call sites,
``main.cpp:25-26,545-546``):

* :func:`sample_box` ≈ ``sample_spheres::ss::sampleBox(bi, min, max, radius)``
  — sample the *surface* of an axis-aligned box with spheres of the given
  radius (here: a regular lattice of spacing 2·radius over the six faces,
  edges/corners deduplicated).
* :func:`compute_vbi` ≈ ``boundary_forces::getVbi(vbi, bi, ir)`` — the Akinci
  per-boundary-particle volume V_bi = 1 / Σ_k W(b_i − b_k) over boundary
  neighbors within the interaction radius; the solvers then use
  ψ_bi = ρ₀ · V_bi (use sites ``sph_kernel_impl.cuh:349,573``).

These are one-time host-side precomputations (the reference builds boundary
structures once, ``sph/sph.cpp:391-432``); a C++ implementation with the same
semantics lives in ``native/`` for large boundary sets, with this NumPy/JAX
path as the always-available reference.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import grid as gridlib

from .params import KernelSet, SimParams
from .state import BoundaryData


def _face_lattice(lo, hi, spacing):
    """Points of a regular lattice covering [lo, hi]² ... per-axis ranges."""
    axes = []
    for a, b in zip(lo, hi):
        n = max(int(np.floor((b - a) / spacing + 1e-9)) + 1, 2)
        axes.append(np.linspace(a, b, n))
    return axes


def sample_box(box_min, box_max, radius):
    """Sample the surface of an AABB with boundary spheres.

    Returns (M, 3) float64 positions on a lattice of spacing 2·radius over
    all six faces (the demo call: ``ss::sampleBox(bi, (-1,-1,-1), (3,3,3),
    0.02)``, ``main.cpp:545``).
    """
    box_min = np.asarray(box_min, dtype=np.float64)
    box_max = np.asarray(box_max, dtype=np.float64)
    spacing = 2.0 * float(radius)
    ax = _face_lattice(box_min, box_max, spacing)
    pts = []
    for axis in range(3):
        u, v = [i for i in range(3) if i != axis]
        uu, vv = np.meshgrid(ax[u], ax[v], indexing="ij")
        for side_val in (box_min[axis], box_max[axis]):
            face = np.empty(uu.shape + (3,))
            face[..., axis] = side_val
            face[..., u] = uu
            face[..., v] = vv
            pts.append(face.reshape(-1, 3))
    pts = np.concatenate(pts, axis=0)
    # Deduplicate edge/corner points shared between faces.
    pts = np.unique(np.round(pts / (spacing * 1e-6)).astype(np.int64), axis=0) \
        * (spacing * 1e-6)
    return pts


def compute_vbi(positions, interaction_radius,
                kernel_set: KernelSet = KernelSet.MULLER):
    """Akinci boundary volumes V_bi = 1 / Σ_k W(b_i − b_k), |b_i − b_k| < h.

    Host-side precompute over the static boundary set (one-time cost): the
    C++ cell-binned pass in ``native/`` when available, else an equivalent
    O(M·27·occupancy) NumPy pass.
    """
    pos = np.asarray(positions, dtype=np.float64)
    h = float(interaction_radius)
    m = pos.shape[0]
    if m == 0:
        return np.zeros((0,), dtype=np.float64)

    from . import native
    nat = native.compute_vbi(pos, h, kernel_set.value)
    if nat is not None:
        return nat

    if kernel_set == KernelSet.MULLER:
        kpoly = 315.0 / (64.0 * np.pi * h**9)

        def w(r2):
            d = np.maximum(h * h - r2, 0.0)
            return kpoly * d**3
    else:
        sigma = 1.0 / (4.0 * np.pi * h**3)

        def w(r2):
            q = np.sqrt(r2) / h
            a = np.maximum(2.0 - q, 0.0)
            b = np.maximum(1.0 - q, 0.0)
            return sigma * (a**3 - 4.0 * b**3)

    # Cell-bin at spacing h, then sum over the 27-cell neighborhood.
    coords = np.floor((pos - pos.min(axis=0)) / h).astype(np.int64)
    from collections import defaultdict
    cells = defaultdict(list)
    for i, c in enumerate(map(tuple, coords)):
        cells[c].append(i)
    wsum = np.zeros(m)
    for c, idx in cells.items():
        idx = np.asarray(idx)
        neigh = []
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    neigh.extend(cells.get((c[0] + dx, c[1] + dy, c[2] + dz), ()))
        neigh = np.asarray(neigh)
        d = pos[idx][:, None, :] - pos[neigh][None, :, :]
        r2 = np.sum(d * d, axis=-1)
        contrib = np.where(r2 < h * h, w(r2), 0.0)
        wsum[idx] = contrib.sum(axis=1)
    return 1.0 / np.maximum(wsum, 1e-12)


def build_boundary(grid, positions, vbi, rest_density,
                   dtype=jnp.float32) -> BoundaryData:
    """Hash-sort the static boundary set once (``updateGpuBoundaries``,
    ``sph/sph.cpp:391-432``) and bake ψ = ρ₀ · V_bi."""
    pos = jnp.asarray(np.asarray(positions), dtype=dtype)
    psi = jnp.asarray(float(rest_density) * np.asarray(vbi), dtype=dtype)
    h = gridlib.hash_positions(grid, pos)
    sorted_hash, _, (pos_s, psi_s) = gridlib.sort_by_hash(h, pos, psi)
    return BoundaryData(pos=pos_s, psi=psi_s, sorted_hash=sorted_hash)


def rotation_matrix(axis, angle):
    """Rodrigues rotation matrix (jnp; ``axis``/``angle`` may be traced)."""
    a = jnp.asarray(axis, jnp.float32)
    a = a / jnp.sqrt(jnp.sum(a * a))
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(a[0])
    K = jnp.stack([jnp.stack([z, -a[2], a[1]]),
                   jnp.stack([a[2], z, -a[0]]),
                   jnp.stack([-a[1], a[0], z])])
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def move_boundary(boundary: BoundaryData, grid, offset=None,
                  velocity=None, rotation=None, omega=None,
                  center=None) -> BoundaryData:
    """Prescribed rigid motion for a boundary set (beyond-reference;
    the upstream framework only supports static boundaries).

    Jit-friendly and fully on-device — call it INSIDE the jitted step with
    traced motion parameters (e.g. a wavemaker's ``A·sin(ωt)`` offset /
    ``Aω·cos(ωt)`` velocity, or a drum's ``θ(t)`` rotation): positions
    transform, cell hashes are recomputed, and ONE variadic sort re-orders
    every column (grid.sort_by_hash — applying an argsort permutation
    would cost element gathers). Parameters changing per step do NOT
    recompile: shapes are static.

    New position: ``p' = center + R·(p₀ − center) + offset``; velocities
    packed into the solvers' boundary terms: ``v_b = velocity +
    ω × (p' − center)``.

    ``offset``  — (3,) rigid translation (None: no translation).
    ``velocity``— (3,) uniform rigid velocity, or (M, 3) per-particle.
    ``rotation``— (3, 3) rotation matrix (see :func:`rotation_matrix`)
                  applied about ``center`` — rotating drum / stirrer.
    ``omega``   — (3,) angular velocity; adds the per-particle ω×r term.
    ``center``  — (3,) rotation center (default: origin).
    ``None`` everywhere velocity-like drops to the static zero-velocity
    fast path.

    Pass the ORIGINAL (t = 0) boundary with absolute motion parameters
    each step (θ(t), offset(t)) — compounding small increments would
    accumulate error. The caller's grid must cover the swept region
    (``fit_grid`` with margin); ψ is rigid-motion invariant (geometry).
    """
    pos = boundary.pos
    if center is not None:
        center = jnp.asarray(center, pos.dtype)
    if rotation is not None:
        c = 0.0 if center is None else center
        pos = (pos - c) @ jnp.asarray(rotation, pos.dtype).T + c
    vel = None
    if velocity is not None:
        vel = jnp.broadcast_to(
            jnp.asarray(velocity, pos.dtype), pos.shape)
    if omega is not None:
        c = 0.0 if center is None else center
        w = jnp.asarray(omega, pos.dtype)
        spin = jnp.cross(jnp.broadcast_to(w, pos.shape), pos - c)
        vel = spin if vel is None else vel + spin
    if offset is None and rotation is None:
        return BoundaryData(pos=pos, psi=boundary.psi,
                            sorted_hash=boundary.sorted_hash, vel=vel)
    if offset is not None:
        pos = pos + jnp.asarray(offset, pos.dtype)[None, :]
    h = gridlib.hash_positions(grid, pos)
    cols = [pos[:, k] for k in range(3)] + [boundary.psi]
    if vel is not None:
        cols += [vel[:, k] for k in range(3)]
    sorted_hash, _, out = gridlib.sort_by_hash(h, *cols)
    pos_s = jnp.stack(out[0:3], axis=0).T
    vel_s = jnp.stack(out[4:7], axis=0).T if vel is not None else None
    return BoundaryData(pos=pos_s, psi=out[3], sorted_hash=sorted_hash,
                        vel=vel_s)


def rehash_boundary(boundary: BoundaryData, grid) -> BoundaryData:
    """Re-sort an existing boundary set against a refit grid.

    ψ = ρ₀·V_bi is pure geometry (unchanged by the grid); only the cell
    hashes and their sort order move. The analogue of the reference
    re-running ``updateGpuBoundaries`` after ``updateGrid``
    (``sph/sph.cpp:408``)."""
    h = gridlib.hash_positions(grid, boundary.pos)
    sorted_hash, _, (pos_s, psi_s) = gridlib.sort_by_hash(
        h, boundary.pos, boundary.psi)
    return BoundaryData(pos=pos_s, psi=psi_s, sorted_hash=sorted_hash)


def box_boundary(grid_or_none, box_min, box_max, radius, params: SimParams,
                 kernel_set: KernelSet = KernelSet.MULLER,
                 grid=None, dtype=jnp.float32) -> BoundaryData:
    """Convenience: sample an AABB shell and build BoundaryData (demo scene,
    ``main.cpp:541-553``)."""
    g = grid if grid is not None else grid_or_none
    pts = sample_box(box_min, box_max, radius)
    vbi = compute_vbi(pts, float(params.interaction_radius), kernel_set)
    return build_boundary(g, pts, vbi, float(params.rest_density), dtype=dtype)
