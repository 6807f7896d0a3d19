"""Surface reconstruction: SPH scalar field → marching-tetrahedra mesh.

Beyond-reference: the reference renders raw particle sprites only
(``main.cpp`` GL point viewer); production fluid pipelines need a
triangle mesh. This module reconstructs an isosurface of the classic
metaball field

  φ(x) = Σ_j (1 − |x − x_j|²/R²)³        (poly6 shape, W(0) = 1)

on a uniform vertex grid and polygonises it with **marching
tetrahedra** (6-tet cube decomposition sharing the main diagonal):
small exact case table, no cracks, watertight for closed surfaces.

This is an EXPORT path (host-side numpy at ``--export-mesh`` cadence),
not the TPU hot path: the field evaluation is a linear-time splat —
each particle adds its kernel to the (2s+1)³ surrounding grid vertices
via per-offset ``np.bincount`` — so it needs no KD tree and no
quadratic memory. Default iso places the surface ~one particle radius
outside an isolated particle.
"""

from __future__ import annotations

import itertools

import numpy as np

__all__ = ["scalar_field", "marching_tetrahedra", "reconstruct_surface",
           "write_obj", "default_iso"]


def default_iso(support_radius: float, particle_radius: float) -> float:
    """φ of an isolated particle at one particle radius from its center."""
    q2 = (particle_radius / support_radius) ** 2
    return float((1.0 - q2) ** 3)


def scalar_field(pos: np.ndarray, support_radius: float,
                 spacing: float, pad: float | None = None):
    """Splat the metaball field onto a uniform vertex grid.

    Returns ``(phi, origin)`` with ``phi`` of shape (nx, ny, nz); vertex
    ``(i,j,k)`` sits at ``origin + spacing·(i,j,k)``. Linear in N: one
    vectorised ``np.bincount`` per neighbourhood offset ((2s+1)³ total,
    s = ceil(R/spacing)).
    """
    pos = np.asarray(pos, np.float64)
    if pos.ndim != 2 or pos.shape[1] != 3 or pos.shape[0] == 0:
        raise ValueError("pos must be a non-empty (n, 3) array")
    R = float(support_radius)
    if pad is None:
        pad = R
    origin = pos.min(0) - pad
    hi = pos.max(0) + pad
    dims = np.maximum(np.ceil((hi - origin) / spacing).astype(int) + 1, 2)
    nx, ny, nz = (int(d) for d in dims)

    base = np.floor((pos - origin) / spacing).astype(np.int64)
    frac = pos - (origin + base * spacing)          # in [0, spacing)
    s = int(np.ceil(R / spacing))
    phi = np.zeros(nx * ny * nz)
    r2max = R * R
    for dx, dy, dz in itertools.product(range(-s + 1, s + 1), repeat=3):
        off = np.array((dx, dy, dz), np.float64) * spacing
        d2 = np.sum((off - frac) ** 2, axis=1)
        q2 = d2 / r2max
        w = np.where(q2 < 1.0, (1.0 - np.minimum(q2, 1.0)) ** 3, 0.0)
        v = base + np.array((dx, dy, dz), np.int64)
        ok = (w > 0.0) & np.all((v >= 0) & (v < dims), axis=1)
        if not ok.any():
            continue
        lin = (v[ok, 0] * ny + v[ok, 1]) * nz + v[ok, 2]
        phi += np.bincount(lin, weights=w[ok], minlength=phi.size)
    return phi.reshape(nx, ny, nz), origin


# 6-tet decomposition of the unit cube, every tet containing the main
# diagonal v0–v6 (vertex k of a cube = offset _CUBE[k]); no cracks
# between neighbouring cubes because all cut edges lie on cube faces
# shared with the SAME decomposition next door.
_CUBE = np.array([(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                  (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)], np.int64)
_TETS = np.array([(0, 5, 1, 6), (0, 1, 2, 6), (0, 2, 3, 6),
                  (0, 3, 7, 6), (0, 7, 4, 6), (0, 4, 5, 6)], np.int64)

# Marching-tetrahedra case table: key = inside bitmask (bit k ⇔ φ(vk) >
# iso); each triangle is 3 cut edges, an edge is a (tet-vertex,
# tet-vertex) pair crossing the surface. Two-inside cases cut a quad
# whose corners are listed cyclically (adjacent corners share a tet
# vertex), split (a,b,c)+(a,c,d). Winding is repaired afterwards
# against the field gradient, so only the cyclic order matters here.
_MT_CASES = {
    1:  [[(0, 1), (0, 2), (0, 3)]],
    2:  [[(1, 0), (1, 2), (1, 3)]],
    4:  [[(2, 0), (2, 1), (2, 3)]],
    8:  [[(3, 0), (3, 1), (3, 2)]],
    3:  [[(0, 2), (0, 3), (1, 3)], [(0, 2), (1, 3), (1, 2)]],
    5:  [[(0, 1), (0, 3), (2, 3)], [(0, 1), (2, 3), (2, 1)]],
    9:  [[(0, 1), (0, 2), (3, 2)], [(0, 1), (3, 2), (3, 1)]],
    6:  [[(1, 0), (1, 3), (2, 3)], [(1, 0), (2, 3), (2, 0)]],
    10: [[(1, 0), (1, 2), (3, 2)], [(1, 0), (3, 2), (3, 0)]],
    12: [[(2, 0), (2, 1), (3, 1)], [(2, 0), (3, 1), (3, 0)]],
    7:  [[(3, 0), (3, 1), (3, 2)]],
    11: [[(2, 0), (2, 1), (2, 3)]],
    13: [[(1, 0), (1, 2), (1, 3)]],
    14: [[(0, 1), (0, 2), (0, 3)]],
}


def marching_tetrahedra(phi: np.ndarray, iso: float, origin, spacing: float):
    """Polygonise ``phi > iso``. Returns ``(verts (V,3) float, faces
    (F,3) int)`` with welded vertices (one per cut grid edge) and
    triangle winding oriented outward (against ∇φ)."""
    phi = np.asarray(phi, np.float64)
    nx, ny, nz = phi.shape
    origin = np.asarray(origin, np.float64)
    flat = phi.ravel()

    ii, jj, kk = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                             np.arange(nz - 1), indexing="ij")
    corner0 = np.stack([ii.ravel(), jj.ravel(), kk.ravel()], 1)  # (C,3)
    # (C, 8) linear grid index of each cube corner
    cidx = ((corner0[:, None, 0] + _CUBE[None, :, 0]) * ny
            + (corner0[:, None, 1] + _CUBE[None, :, 1])) * nz \
        + (corner0[:, None, 2] + _CUBE[None, :, 2])
    tets = cidx[:, _TETS].reshape(-1, 4)                 # (C·6, 4)
    phit = flat[tets]
    inside = phit > iso
    case = (inside * np.array([1, 2, 4, 8])).sum(1)
    keep = (case > 0) & (case < 15)
    tets, phit, case = tets[keep], phit[keep], case[keep]

    # emit triangles as (3 × edge) where an edge is (gridA, gridB)
    tri_a, tri_b = [], []
    for c, tris in _MT_CASES.items():
        m = case == c
        if not m.any():
            continue
        tc, pc = tets[m], phit[m]
        for tri in tris:
            a = np.stack([tc[:, e[0]] for e in tri], 1)   # inside end
            b = np.stack([tc[:, e[1]] for e in tri], 1)   # outside end
            tri_a.append(a)
            tri_b.append(b)
    if not tri_a:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    A = np.concatenate(tri_a)                            # (F, 3)
    B = np.concatenate(tri_b)

    # weld: one mesh vertex per undirected cut grid edge
    lo, hi_ = np.minimum(A, B), np.maximum(A, B)
    key = lo.astype(np.int64) * flat.size + hi_
    ukey, faces = np.unique(key, return_inverse=True)
    faces = faces.reshape(A.shape)
    ga, gb = ukey // flat.size, ukey % flat.size

    def vpos(g):
        g = np.asarray(g)
        k = g % nz
        j = (g // nz) % ny
        i = g // (nz * ny)
        return origin + spacing * np.stack([i, j, k], 1).astype(np.float64)

    fa, fb = flat[ga], flat[gb]
    t = np.clip((iso - fa) / np.where(fb == fa, 1.0, fb - fa), 0.0, 1.0)
    verts = vpos(ga) + t[:, None] * (vpos(gb) - vpos(ga))

    # outward winding: flip triangles whose normal points along ∇φ
    # (φ decreases outward). Gradient sampled at the nearest grid vertex
    # of the face centroid.
    gx, gy, gz = np.gradient(phi, spacing)
    cent = verts[faces].mean(1)
    cij = np.clip(np.rint((cent - origin) / spacing).astype(np.int64),
                  0, np.array([nx - 1, ny - 1, nz - 1]))
    grad = np.stack([g[cij[:, 0], cij[:, 1], cij[:, 2]]
                     for g in (gx, gy, gz)], 1)
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    n = np.cross(e1, e2)
    flip = np.sum(n * grad, 1) > 0.0
    faces[flip] = faces[flip][:, ::-1]
    return verts, faces


def reconstruct_surface(pos, support_radius: float,
                        particle_radius: float | None = None,
                        spacing: float | None = None,
                        iso: float | None = None):
    """Particles → ``(verts, faces)``. Defaults: grid spacing = R/2,
    iso = :func:`default_iso` (R/4 particle radius if not given)."""
    R = float(support_radius)
    if spacing is None:
        spacing = R / 2.0
    if iso is None:
        pr = R / 4.0 if particle_radius is None else float(particle_radius)
        iso = default_iso(R, pr)
    phi, origin = scalar_field(pos, R, spacing)
    return marching_tetrahedra(phi, iso, origin, spacing)


def write_obj(path: str, verts: np.ndarray, faces: np.ndarray):
    """Write a Wavefront OBJ (1-based face indices)."""
    with open(path, "w") as f:
        f.write(f"# nereus_tpu surface: {len(verts)} verts, "
                f"{len(faces)} faces\n")
        np.savetxt(f, verts, fmt="v %.6f %.6f %.6f")
        np.savetxt(f, np.asarray(faces) + 1, fmt="f %d %d %d")
