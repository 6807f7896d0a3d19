"""Arbitrary triangle-mesh geometry (mesh.py): OBJ parsing, exact
polyhedral mass properties, Akinci surface sampling, mesh boundaries
holding fluid, and mesh rigid bodies (beyond-reference — upstream only
samples axis-aligned boxes, ``main.cpp:545-546``)."""

import numpy as np
import pytest

import nereus_tpu as nt


def box_mesh(lo, hi):
    """A closed, outward-wound 12-triangle box."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    v = np.array([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
                  [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
                  [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
                  [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]]])
    f = np.array([[0, 2, 1], [0, 3, 2],    # z = lo (−z out)
                  [4, 5, 6], [4, 6, 7],    # z = hi
                  [0, 1, 5], [0, 5, 4],    # y = lo
                  [3, 6, 2], [3, 7, 6],    # y = hi
                  [0, 4, 7], [0, 7, 3],    # x = lo
                  [1, 2, 6], [1, 6, 5]])   # x = hi
    return v, f


def test_load_obj(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text("""# comment
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vn 0 0 1
f 1 2 3 4
f 1/1 2/1 3/1
f -4//1 -3//1 -2//1
""")
    v, f = nt.load_obj(str(p))
    assert v.shape == (4, 3)
    # quad fan-triangulates to 2, plus the two explicit triangles
    assert f.shape == (4, 3)
    np.testing.assert_array_equal(f[0], [0, 1, 2])
    np.testing.assert_array_equal(f[1], [0, 2, 3])
    np.testing.assert_array_equal(f[2], [0, 1, 2])   # 1/1 2/1 3/1
    np.testing.assert_array_equal(f[3], [0, 1, 2])   # negative indices


def test_mesh_mass_properties_box():
    """Signed-tet integrals reproduce the analytic box exactly, for both
    windings (a globally inverted mesh is sign-corrected), at any offset
    from the origin (the origin-tets cancel correctly)."""
    lo, hi = np.array([1.0, -2.0, 3.0]), np.array([1.5, -0.8, 3.7])
    size = hi - lo
    v, f = box_mesh(lo, hi)
    rho = 250.0
    m, com, inertia = nt.mesh_mass_properties(v, f, rho)
    m_ref = rho * size.prod()
    i_ref = (m_ref / 12.0) * np.diag([size[1]**2 + size[2]**2,
                                      size[0]**2 + size[2]**2,
                                      size[0]**2 + size[1]**2])
    assert m == pytest.approx(m_ref, rel=1e-12)
    np.testing.assert_allclose(com, (lo + hi) / 2, rtol=0, atol=1e-12)
    np.testing.assert_allclose(inertia, i_ref, rtol=1e-10,
                               atol=1e-12 * np.abs(i_ref).max())
    # inward winding → identical result
    m2, com2, i2 = nt.mesh_mass_properties(v, f[:, ::-1], rho)
    assert m2 == pytest.approx(m, rel=1e-12)
    np.testing.assert_allclose(i2, inertia, rtol=1e-12,
                               atol=1e-12 * np.abs(inertia).max())


def test_mesh_mass_properties_compound():
    """Two disjoint boxes in one mesh: masses add, com is mass-weighted —
    the divergence-theorem accounting handles multi-component (and by the
    same argument concave) solids exactly."""
    v1, f1 = box_mesh((0, 0, 0), (1, 1, 1))
    v2, f2 = box_mesh((3, 0, 0), (4, 2, 1))
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + len(v1)])
    m, com, _ = nt.mesh_mass_properties(v, f, 1.0)
    assert m == pytest.approx(1.0 + 2.0, rel=1e-12)
    np.testing.assert_allclose(
        com, (1.0 * np.array([0.5, 0.5, 0.5])
              + 2.0 * np.array([3.5, 1.0, 0.5])) / 3.0, atol=1e-12)


def test_sample_surface_box():
    radius = 0.02
    s = 2 * radius
    lo, hi = np.zeros(3), np.array([0.4, 0.3, 0.5])
    v, f = box_mesh(lo, hi)
    pts = nt.sample_surface(v, f, radius)
    # every sample lies exactly on the box surface
    d_face = np.minimum(np.abs(pts - lo), np.abs(pts - hi)).min(axis=1)
    assert d_face.max() < 1e-9
    inside = ((pts > lo - 1e-9) & (pts < hi + 1e-9)).all()
    assert inside
    # dedup: no two samples closer than ~half the lattice spacing
    dd = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=-1)
    np.fill_diagonal(dd, 1e9)
    assert dd.min() > 0.3 * s
    # coverage: sample count on the order of area / s² and no face empty
    area = 2 * ((hi - lo)[[0, 1]].prod() + (hi - lo)[[1, 2]].prod()
                + (hi - lo)[[0, 2]].prod())
    assert 0.5 * area / s**2 < len(pts) < 2.5 * area / s**2
    for axis in range(3):
        for val in (lo[axis], hi[axis]):
            assert (np.abs(pts[:, axis] - val) < 1e-9).sum() > 10
    # coverage: max gap — every lattice cell of a fine surface probe has
    # a sample within 1.2·s (no holes an SPH particle could slip through)
    probe = nt.sample_surface(v, f, radius / 3)
    dmin = np.array([np.linalg.norm(pts - q, axis=1).min() for q in probe])
    assert dmin.max() < 1.2 * s


def write_obj(path, v, f):
    path.write_text("\n".join(
        [f"v {x} {y} {z}" for x, y, z in v]
        + [f"f {a + 1} {b + 1} {c + 1}" for a, b, c in f]))


def test_cli_mesh_flags(tmp_path, capsys):
    """--obstacle-obj merges a mesh obstacle into the walls;
    --rigid-obj drives a coupled mesh body; both refuse together with
    --rigid-box."""
    import json

    from nereus_tpu.app.cli import main as cli_main

    pillar = tmp_path / "pillar.obj"
    write_obj(pillar, *box_mesh((0.3, 0.02, 0.2), (0.4, 0.25, 0.3)))
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "5",
                   "--neighbor-engine", "pallas",
                   "--obstacle-obj", str(pillar)])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0

    cube = tmp_path / "cube.obj"
    write_obj(cube, *box_mesh((-0.04, -0.04, -0.04), (0.04, 0.04, 0.04)))
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "4",
                   "--neighbor-engine", "pallas",
                   "--rigid-obj", f"{cube}:200:1.0:0.25,0.45,0.25"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0

    assert cli_main(["run", "--rigid-obj", f"{cube}:200",
                     "--rigid-box", "0.2,0.2,0.2:0.1,0.1,0.1:200"]) == 2
    capsys.readouterr()


def test_mesh_boundary_holds_fluid():
    """Physics: a tank sampled from a triangle MESH holds a settling
    fluid block exactly like the lattice-sampled box (WCSPH, Pallas
    engine in interpret mode)."""
    import jax

    from nereus_tpu.params import calibrate_mass
    from nereus_tpu.scene import particle_cube

    cfg = nt.SimConfig(engine="pallas")
    params = calibrate_mass(nt.make_params(), cfg)
    h = float(params.interaction_radius)
    r = float(params.particle_radius)
    lo, hi = np.zeros(3), np.array([0.5, 0.8, 0.5])
    v, f = box_mesh(lo, hi)
    grid = nt.fit_grid(lo - h, hi + h, h)
    boundary = nt.mesh_boundary(grid, v, f, r, params)
    assert boundary.num_boundaries > 1000
    # small block just above the floor, moving down — the mesh floor
    # must actually take the impact within the stepped window
    pos = particle_cube((0.25, 0.12, 0.25), (0.16, 0.16, 0.16), 2 * r)
    state = nt.make_fluid_state(
        pos, velocities=np.tile([0.0, -1.0, 0.0], (len(pos), 1)))
    step = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg, boundary))
    for i in range(150):
        state, diag = step(state)
        assert int(diag.seg_overflow) == 0, i
    p = np.asarray(state.pos)
    assert np.isfinite(p).all()
    assert p[:, 1].min() > 0.0, "fluid fell through the mesh floor"
    assert (p > lo - 2 * r).all() and (p < hi + 2 * r).all()


def test_make_rigid_mesh_matches_box():
    """A rigid body built from a box MESH carries the same exact mass
    properties as the analytic make_rigid_box, a comparable Akinci
    shell, and drives the coupled step to finite states."""
    import jax

    from nereus_tpu.params import calibrate_mass
    from nereus_tpu.scene import particle_cube

    cfg = nt.SimConfig(engine="pallas")
    params = calibrate_mass(nt.make_params(), cfg)
    r = float(params.particle_radius)
    center, size, rho = np.array([0.25, 0.4, 0.25]), 0.08, 200.0
    v, f = box_mesh(center - size / 2, center + size / 2)
    mb = nt.make_rigid_mesh(v, f, r, rho, params)
    bb = nt.make_rigid_box(center, (size,) * 3, r, rho, params)
    assert float(mb.mass) == pytest.approx(float(bb.mass), rel=1e-5)
    np.testing.assert_allclose(np.asarray(mb.com), center, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mb.inertia_body), np.asarray(bb.inertia_body),
        rtol=1e-4, atol=1e-6 * float(np.abs(np.asarray(bb.inertia_body)).max()))
    assert 0.5 * bb.num_samples < mb.num_samples < 2.0 * bb.num_samples
    # the coupled step only sees the RigidBody pytree — drive a few steps
    h = float(params.interaction_radius)
    lo, hi = np.zeros(3), np.array([0.5, 0.8, 0.5])
    grid = nt.fit_grid(lo - h, hi + h, h)
    from nereus_tpu.boundary import box_boundary
    walls = box_boundary(grid, lo, hi, r, params)
    state = nt.make_fluid_state(
        particle_cube((0.25, 0.15, 0.25), (0.2, 0.2, 0.2), 2 * r))
    step = jax.jit(lambda s, b: nt.wcsph_coupled_step(
        s, params, grid, cfg, b, walls))
    body = mb
    for _ in range(5):
        state, body, diag = step(state, body)
        assert int(diag.seg_overflow) == 0
    assert np.isfinite(np.asarray(state.pos)).all()
    assert np.isfinite(np.asarray(body.com)).all()
    assert np.isfinite(np.asarray(body.vel)).all()
