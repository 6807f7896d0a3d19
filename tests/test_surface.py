"""Surface reconstruction (app/surface.py — beyond-reference: upstream
renders raw GL point sprites only, ``main.cpp`` viewer)."""

import numpy as np

from nereus_tpu.app.surface import (default_iso, marching_tetrahedra,
                                    reconstruct_surface, scalar_field,
                                    write_obj)


def _ball(radius=0.1, spacing=0.02):
    g = np.arange(-radius, radius + spacing / 2, spacing)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    p = np.stack([x.ravel(), y.ravel(), z.ravel()], 1)
    return p[np.sum(p * p, 1) <= radius * radius]


def _edge_counts(faces):
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                        faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    return counts


def _signed_volume(verts, faces):
    t = verts[faces]
    return float(np.sum(np.einsum("ij,ij->i", t[:, 0],
                                  np.cross(t[:, 1], t[:, 2])))) / 6.0


def test_sphere_mesh_closed_oriented_and_sized():
    """A particle ball reconstructs to a closed, outward-oriented mesh
    enclosing roughly the ball's volume."""
    R = 0.05
    pos = _ball(radius=0.1, spacing=0.02)
    verts, faces = reconstruct_surface(pos, R, particle_radius=0.01)
    assert len(faces) > 100
    # watertight: every edge shared by exactly 2 triangles
    assert (_edge_counts(faces) == 2).all()
    # outward winding (gradient repair): signed volume is positive and
    # close to the particle ball's
    vol = _signed_volume(verts, faces)
    ball = 4.0 / 3.0 * np.pi * 0.1 ** 3
    assert 0.7 * ball < vol < 1.8 * ball, (vol, ball)
    # the surface hugs the particles: every mesh vertex within R of one
    from scipy.spatial import cKDTree
    d, _ = cKDTree(pos).query(verts)
    assert d.max() < R


def test_torus_topology_and_closedness():
    """A ring of particles (genus-1) still closes up — marching tets
    emit no cracks on any case combination."""
    th = np.linspace(0.0, 2 * np.pi, 200, endpoint=False)
    ring = np.stack([0.2 * np.cos(th), 0.2 * np.sin(th),
                     np.zeros_like(th)], 1)
    rng = np.random.RandomState(0)
    pos = np.concatenate([ring + rng.uniform(-0.01, 0.01, (200, 3))
                          for _ in range(5)])
    verts, faces = reconstruct_surface(pos, 0.05, particle_radius=0.012)
    assert len(faces) > 100
    assert (_edge_counts(faces) == 2).all()
    # genus from Euler characteristic V - E + F = 2 - 2g: expect g >= 1
    V, F = len(verts), len(faces)
    E = 3 * F // 2
    genus = (2 - (V - E + F)) // 2
    assert genus >= 1, (V, E, F)


def test_field_splat_matches_direct_sum():
    """The per-offset bincount splat equals the brute-force field."""
    rng = np.random.RandomState(3)
    pos = rng.uniform(0.0, 0.2, (40, 3))
    R, sp = 0.05, 0.02
    phi, origin = scalar_field(pos, R, sp)
    nx, ny, nz = phi.shape
    sample = [(0, 0, 0), (nx // 2, ny // 2, nz // 2),
              (nx - 1, ny - 1, nz - 1), (nx // 3, ny // 2, nz // 4)]
    for ijk in sample:
        x = origin + sp * np.asarray(ijk, float)
        d2 = np.sum((pos - x) ** 2, 1)
        q2 = d2 / (R * R)
        want = float(np.sum(np.where(q2 < 1.0, (1 - np.minimum(q2, 1)) ** 3,
                                     0.0)))
        np.testing.assert_allclose(phi[ijk], want, rtol=1e-10, atol=1e-12)


def test_iso_above_field_gives_empty_mesh():
    pos = _ball(0.05, 0.02)
    phi, origin = scalar_field(pos, 0.05, 0.025)
    verts, faces = marching_tetrahedra(phi, float(phi.max()) * 2.0,
                                       origin, 0.025)
    assert len(verts) == 0 and len(faces) == 0


def test_obj_write(tmp_path):
    pos = _ball(0.06, 0.02)
    verts, faces = reconstruct_surface(pos, 0.05)
    path = str(tmp_path / "m.obj")
    write_obj(path, verts, faces)
    lines = open(path).read().splitlines()
    assert sum(l.startswith("v ") for l in lines) == len(verts)
    assert sum(l.startswith("f ") for l in lines) == len(faces)
    # 1-based indices in range
    fidx = np.array([l.split()[1:] for l in lines if l.startswith("f ")],
                    int)
    assert fidx.min() >= 1 and fidx.max() <= len(verts)


def test_default_iso_places_surface_at_particle_radius():
    """An isolated particle's reconstructed blob has radius ≈ the
    particle radius (the default-iso contract)."""
    R, pr = 0.05, 0.0125
    pos = np.zeros((1, 3))
    sp = R / 8.0  # fine grid so the blob is resolved
    phi, origin = scalar_field(pos, R, sp)
    verts, faces = marching_tetrahedra(phi, default_iso(R, pr), origin, sp)
    assert len(faces) > 0
    r = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r.mean(), pr, rtol=0.15)
