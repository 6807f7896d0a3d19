"""Moving (prescribed rigid-motion) boundaries — beyond-reference feature.

The upstream framework only supports static boundary sets (built once by
``SPH::updateGpuBoundaries``, ``sph/sph.cpp:391-432``). Here
``BoundaryData.vel`` + :func:`nereus_tpu.boundary.move_boundary` add
wavemaker/piston-style prescribed motion: positions shift + re-sort on
device inside the jitted step, and the velocity enters every
velocity-dependent boundary term (WCSPH friction, IISPH ρ_adv, DFSPH Δρ)
in BOTH engines.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nereus_tpu as nt
from nereus_tpu import boundary as B
from nereus_tpu import scene
from nereus_tpu.params import calibrate_mass


def _dam(params, cfg, with_boundary=True):
    return scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=with_boundary, boundary_radius=0.04)


def test_move_boundary_matches_rebuild():
    """move_boundary == build_boundary on host-shifted positions (same
    multiset of (pos, ψ) and identical ascending hash array)."""
    cfg = nt.SimConfig()
    params = nt.make_params()
    _, grid, bd = _dam(params, cfg)
    off = jnp.asarray([0.03, -0.02, 0.05], jnp.float32)

    moved = jax.jit(lambda b, o: B.move_boundary(b, grid, o))(bd, off)
    # reference: rebuild from the shifted positions with the same ψ/vbi
    rebuilt = B.build_boundary(
        grid, np.asarray(bd.pos) + np.asarray(off),
        np.asarray(bd.psi) / float(params.rest_density),
        float(params.rest_density))

    np.testing.assert_array_equal(np.asarray(moved.sorted_hash),
                                  np.asarray(rebuilt.sorted_hash))

    def key(b):
        p = np.asarray(b.pos)
        return np.lexsort((p[:, 2], p[:, 1], p[:, 0]))

    km, kr = key(moved), key(rebuilt)
    np.testing.assert_allclose(np.asarray(moved.pos)[km],
                               np.asarray(rebuilt.pos)[kr], atol=1e-6)
    np.testing.assert_allclose(np.asarray(moved.psi)[km],
                               np.asarray(rebuilt.psi)[kr], rtol=1e-6)
    assert moved.vel is None


def test_zero_velocity_matches_static():
    """vel = zeros compiles the moving path but must reproduce the static
    step (v_b = 0 ⇒ identical physics) on both engines."""
    for engine in ("segments", "pallas"):
        cfg = nt.SimConfig(engine=engine)
        params = nt.make_params()
        state, grid, bd = _dam(params, cfg)
        bd_mov = B.move_boundary(bd, grid,
                                 velocity=jnp.zeros(3, jnp.float32))
        assert bd_mov.vel is not None

        s1, d1 = jax.jit(
            lambda s: nt.wcsph_step(s, params, grid, cfg, bd))(state)
        s2, d2 = jax.jit(
            lambda s: nt.wcsph_step(s, params, grid, cfg, bd_mov))(state)
        np.testing.assert_allclose(np.asarray(s1.pos), np.asarray(s2.pos),
                                   atol=1e-7, err_msg=engine)
        np.testing.assert_allclose(np.asarray(s1.vel), np.asarray(s2.vel),
                                   atol=1e-6, err_msg=engine)


@pytest.mark.parametrize("solver", ["wcsph", "iisph", "dfsph"])
def test_moving_boundary_engine_equivalence(solver):
    """Oracle (segments) vs Pallas with a nonzero boundary velocity: the
    velocity-dependent boundary terms must agree between engines."""
    params = {"wcsph": nt.make_params,
              "iisph": nt.iisph_params,
              "dfsph": nt.dfsph_params}[solver]()
    step_fn = {"wcsph": nt.wcsph_step, "iisph": nt.iisph_step,
               "dfsph": nt.dfsph_step}[solver]

    cfg_o = nt.SimConfig(engine="segments")
    cfg_p = nt.SimConfig(engine="pallas")
    state, grid, bd = _dam(params, cfg_o)
    bvel = jnp.asarray([0.8, 0.0, -0.4], jnp.float32)
    bd = B.move_boundary(bd, grid, velocity=bvel)

    s_o, s_p = state, state
    for it in range(2):
        s_o, d_o = jax.jit(
            lambda s: step_fn(s, params, grid, cfg_o, bd))(s_o)
        s_p, d_p = jax.jit(
            lambda s: step_fn(s, params, grid, cfg_p, bd))(s_p)
        assert int(d_p.seg_overflow) == 0
        np.testing.assert_allclose(
            np.asarray(s_o.pos), np.asarray(s_p.pos), atol=2e-5,
            err_msg=f"{solver} step {it}")
        np.testing.assert_allclose(
            np.asarray(s_o.vel), np.asarray(s_p.vel), atol=2e-3,
            err_msg=f"{solver} step {it}")


def test_piston_pushes_fluid():
    """A wall translating into the fluid must transfer momentum along the
    push direction (the whole move+step pipeline jitted; offset traced —
    no recompile across steps)."""
    cfg = nt.SimConfig(engine="pallas")
    # zero gravity: the static control then stays exactly at rest and the
    # only momentum source is the advancing wall
    params = nt.dfsph_params(dt=5e-4, gravity=(0.0, 0.0, 0.0))
    h = float(params.interaction_radius)
    # seed lattice spacing MUST match the mass calibration (an
    # incompressible solver violently ejects an over-dense seed — see
    # .claude/skills/verify and scene.resting_block)
    spacing = 0.8 * h
    params = calibrate_mass(params, cfg, spacing=spacing)
    from nereus_tpu.scene import particle_cube
    # fluid block floating clear (> h) of every wall; the left (x=0) wall
    # advances +x at 3 m/s and plows into it after ~0.06/3 s
    pos = particle_cube((0.2, 0.3, 0.25), (0.2, 0.3, 0.3), spacing)
    lo, hi = np.zeros(3), np.array((0.5, 0.6, 0.5))
    # margin covers the piston's sweep (+0.2 in x)
    grid = nt.fit_grid(lo - h - 0.25, hi + h + 0.25, h)
    bd0 = B.box_boundary(grid, lo, hi, float(params.particle_radius),
                         params)
    state = nt.make_fluid_state(pos)
    vpush = 3.0

    @jax.jit
    def step(s, t):
        off = jnp.array([vpush, 0.0, 0.0], jnp.float32) * t
        vel = jnp.array([vpush, 0.0, 0.0], jnp.float32)
        bd = B.move_boundary(bd0, grid, offset=off, velocity=vel)
        return nt.dfsph_step(s, params, grid, cfg, bd)

    t = 0.0
    for i in range(60):
        state, diag = step(state, jnp.float32(t))
        t += float(params.dt)
        assert int(diag.seg_overflow) == 0, i

    p = np.asarray(state.pos)
    v = np.asarray(state.vel)
    assert np.isfinite(p).all() and np.isfinite(v).all()
    # momentum transferred along +x by the advancing left wall (the wall
    # has swept 0.09 by now, well past the initial 0.054 gap)
    assert float(v[:, 0].mean()) > 0.05, float(v[:, 0].mean())


def test_rotation_matrix_basics():
    R = np.asarray(B.rotation_matrix((0.0, 0.0, 1.0), jnp.float32(np.pi / 2)))
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]),
                               np.array([0.0, 1.0, 0.0]), atol=1e-6)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_move_boundary_rotation_matches_rebuild():
    """Rotating about the box center == rebuilding from host-rotated
    positions (ψ is rotation-invariant)."""
    cfg = nt.SimConfig()
    params = nt.make_params()
    _, grid, bd = _dam(params, cfg)
    center = np.asarray(bd.pos).mean(axis=0)
    ang = 0.35
    R = B.rotation_matrix((0.0, 1.0, 0.0), jnp.float32(ang))

    moved = jax.jit(lambda b: B.move_boundary(
        b, grid, rotation=R, center=center))(bd)
    host_rot = (np.asarray(bd.pos) - center) @ np.asarray(R).T + center
    rebuilt = B.build_boundary(
        grid, host_rot, np.asarray(bd.psi) / float(params.rest_density),
        float(params.rest_density))
    np.testing.assert_array_equal(np.asarray(moved.sorted_hash),
                                  np.asarray(rebuilt.sorted_hash))

    def key(b):
        p = np.asarray(b.pos)
        return np.lexsort((p[:, 2], p[:, 1], p[:, 0]))

    np.testing.assert_allclose(np.asarray(moved.pos)[key(moved)],
                               np.asarray(rebuilt.pos)[key(rebuilt)],
                               atol=1e-5)


def test_omega_spin_velocities():
    """omega packs v_b = ω × (p − c) per particle (checked post-sort by
    matching on positions)."""
    cfg = nt.SimConfig()
    params = nt.make_params()
    _, grid, bd = _dam(params, cfg)
    c = np.array([0.1, 0.2, 0.5], np.float32)
    w = np.array([0.0, 0.0, 3.0], np.float32)
    moved = B.move_boundary(bd, grid, omega=w, center=c)
    p = np.asarray(moved.pos)
    v = np.asarray(moved.vel)
    np.testing.assert_allclose(v, np.cross(np.broadcast_to(w, p.shape),
                                           p - c), atol=1e-5)


def test_rotating_boundary_engine_equivalence():
    """Per-particle boundary velocities (spin) agree between engines."""
    params = nt.dfsph_params()
    cfg_o = nt.SimConfig(engine="segments")
    cfg_p = nt.SimConfig(engine="pallas")
    state, grid, bd0 = _dam(params, cfg_o)
    center = np.asarray(bd0.pos).mean(axis=0)
    R = B.rotation_matrix((0.0, 1.0, 0.0), jnp.float32(0.12))
    bd = B.move_boundary(bd0, grid, rotation=R, center=center,
                         omega=jnp.asarray([0.0, 2.0, 0.0]))

    s_o, _ = jax.jit(lambda s: nt.dfsph_step(s, params, grid, cfg_o,
                                             bd))(state)
    s_p, d_p = jax.jit(lambda s: nt.dfsph_step(s, params, grid, cfg_p,
                                               bd))(state)
    assert int(d_p.seg_overflow) == 0
    np.testing.assert_allclose(np.asarray(s_o.pos), np.asarray(s_p.pos),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_o.vel), np.asarray(s_p.vel),
                               atol=2e-3)


def test_concat_boundaries_merges_sets():
    """concat_boundaries: walls + a moved gate become ONE hash-sorted set
    usable by any solver (same step result as a monolithic rebuild)."""
    cfg = nt.SimConfig(engine="pallas")
    params = nt.make_params()
    state, grid, walls = _dam(params, cfg)
    # a small moving "gate": reuse a slab of boundary samples
    from nereus_tpu.rigid import concat_boundaries
    gate = B.build_boundary(
        grid, np.asarray(walls.pos[:200]) + np.array([0.0, 0.3, 0.0]),
        np.asarray(walls.psi[:200]) / float(params.rest_density),
        float(params.rest_density))
    gate = B.move_boundary(gate, grid, velocity=jnp.asarray([0.2, 0., 0.]))
    merged = concat_boundaries(grid, walls, gate)
    assert merged.num_boundaries == walls.num_boundaries + 200
    assert (np.diff(np.asarray(merged.sorted_hash)) >= 0).all()
    assert merged.vel is not None
    # walls' rows carry zero velocity, the gate's carry the belt velocity
    v = np.asarray(merged.vel)
    assert np.isclose(np.abs(v[:, 0]).max(), 0.2, atol=1e-6)
    # the merged set steps cleanly
    s, d = jax.jit(lambda st: nt.wcsph_step(st, params, grid, cfg,
                                            merged))(state)
    assert int(d.seg_overflow) == 0
    assert np.isfinite(np.asarray(s.pos)).all()
