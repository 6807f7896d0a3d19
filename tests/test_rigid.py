"""Two-way rigid-body coupling (beyond-reference; upstream boundaries are
immovable scenery, sph/sph.cpp:391-432)."""

import jax
import jax.numpy as jnp
import numpy as np

import nereus_tpu as nt
from nereus_tpu.boundary import box_boundary
from nereus_tpu.params import calibrate_mass
from nereus_tpu.scene import particle_cube


def test_make_rigid_box_basics():
    params = nt.make_params()
    body = nt.make_rigid_box((0.2, 0.2, 0.2), (0.1, 0.08, 0.12), 0.02,
                             500.0, params)
    assert body.num_samples > 20
    assert float(body.mass) == np.float32(500.0 * 0.1 * 0.08 * 0.12)
    I = np.asarray(body.inertia_body)
    assert (np.diag(I) > 0).all() and np.allclose(I, I.T)
    assert (np.asarray(body.psi) > 0).all()
    pos, vel = nt.body_boundary(body, nt.fit_grid(
        np.zeros(3), np.ones(3), 0.0457)).pos, None
    # shell stays within the box bounds (+ lattice rounding)
    p = np.asarray(pos)
    assert p.min() > 0.2 - 0.07 and p.max() < 0.2 + 0.07


def test_integrate_rigid_freefall_and_spin():
    params = nt.make_params()
    body = nt.make_rigid_box((0.0, 0.0, 0.0), (0.1, 0.1, 0.1), 0.02,
                             1000.0, params)
    dt = 1e-2
    b = nt.integrate_rigid(body, jnp.zeros(3), jnp.zeros(3), dt,
                           (0.0, -9.81, 0.0))
    np.testing.assert_allclose(float(b.vel[1]), -9.81 * dt, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b.com),
                               [0.0, -9.81 * dt * dt, 0.0], atol=1e-7)
    # pure torque about z spins it up; R stays orthonormal
    b2 = body
    for _ in range(50):
        b2 = nt.integrate_rigid(b2, jnp.zeros(3),
                                jnp.asarray([0.0, 0.0, 1e-3]), dt,
                                (0.0, 0.0, 0.0))
    assert float(b2.omega[2]) > 0
    R = np.asarray(b2.R)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_coupled_momentum_conservation():
    """Zero gravity, no walls, viscosity 0, ST none: every remaining pair
    force is central and internally balanced (fluid↔fluid antisymmetric;
    fluid↔body exact Newton-3rd reaction), so TOTAL linear momentum is
    conserved while a moving fluid blob collides with the body."""
    cfg = nt.SimConfig(engine="pallas",
                       surface_tension_model=nt.SurfaceTensionModel.NONE)
    params = nt.make_params(viscosity=0.0, gravity=(0.0, 0.0, 0.0),
                            dt=2e-4)
    h = float(params.interaction_radius)
    spacing = 0.8 * h
    params = calibrate_mass(params, cfg, spacing=spacing)
    pm = float(params.particle_mass)

    # blob's +x face ~1 cm from the body shell: contact within a few steps
    fluid = particle_cube((0.22, 0.25, 0.25), (0.12, 0.12, 0.12), spacing)
    state = nt.make_fluid_state(fluid, velocities=(1.0, 0.0, 0.0))
    body = nt.make_rigid_box((0.33, 0.25, 0.25), (0.08, 0.08, 0.08),
                             float(params.particle_radius), 400.0, params)
    grid = nt.fit_grid(np.zeros(3) - 0.2, np.ones(3) * 0.7, h)

    def total_p(s, b):
        n = int(s.num_active)
        return (pm * np.asarray(s.vel[:n]).sum(axis=0)
                + float(b.mass) * np.asarray(b.vel))

    p0 = total_p(state, body)
    step = jax.jit(lambda s, b: nt.wcsph_coupled_step(
        s, params, grid, cfg, b))
    for i in range(25):
        state, body, d = step(state, body)
        assert int(d.seg_overflow) == 0, i
    p1 = total_p(state, body)
    # the body must actually have been touched (some momentum exchanged;
    # the Akinci pressure contact is soft, and the approach phase sucks —
    # unclamped negative Tait pressure at the blob's free surface)
    assert float(body.mass) * np.linalg.norm(np.asarray(body.vel)) \
        > 1e-3 * abs(p0[0])
    np.testing.assert_allclose(p1, p0, rtol=2e-3, atol=2e-4)


def test_coupled_engine_equivalence():
    cfg_o = nt.SimConfig(engine="segments")
    cfg_p = nt.SimConfig(engine="pallas")
    params = nt.make_params(dt=2e-4)
    h = float(params.interaction_radius)
    fluid = particle_cube((0.2, 0.3, 0.2), (0.15, 0.15, 0.15),
                          2 * float(params.particle_radius))
    lo, hi = np.zeros(3), np.array((0.4, 0.6, 0.4))
    grid = nt.fit_grid(lo - h, hi + h, h)
    walls = box_boundary(grid, lo, hi, float(params.particle_radius),
                         params)
    body = nt.make_rigid_box((0.2, 0.12, 0.2), (0.08, 0.08, 0.08),
                             float(params.particle_radius), 300.0, params)
    state = nt.make_fluid_state(fluid)

    s_o, b_o = state, body
    s_p, b_p = state, body
    for it in range(2):
        s_o, b_o, _ = jax.jit(lambda s, b: nt.wcsph_coupled_step(
            s, params, grid, cfg_o, b, walls))(s_o, b_o)
        s_p, b_p, d = jax.jit(lambda s, b: nt.wcsph_coupled_step(
            s, params, grid, cfg_p, b, walls))(s_p, b_p)
        assert int(d.seg_overflow) == 0
        np.testing.assert_allclose(np.asarray(s_o.pos),
                                   np.asarray(s_p.pos), atol=2e-5,
                                   err_msg=f"step {it}")
        np.testing.assert_allclose(np.asarray(b_o.com),
                                   np.asarray(b_p.com), atol=1e-6)
        np.testing.assert_allclose(np.asarray(b_o.vel),
                                   np.asarray(b_p.vel), atol=1e-4)
        np.testing.assert_allclose(np.asarray(b_o.omega),
                                   np.asarray(b_p.omega), atol=1e-3)


def test_buoyancy_light_rises_heavy_sinks():
    """A submerged box of density 100 gains upward velocity; density 5000
    gains downward — hydrostatic pressure acting through the reaction."""
    cfg = nt.SimConfig(engine="pallas")
    base = nt.make_params(dt=5e-4)
    h = float(base.interaction_radius)
    spacing = 0.8 * h
    params = calibrate_mass(base, cfg, spacing=spacing)
    lo, hi = np.zeros(3), np.array((0.4, 0.5, 0.4))
    grid = nt.fit_grid(lo - h, hi + h, h)
    walls = box_boundary(grid, lo, hi, float(params.particle_radius),
                         params)
    water = particle_cube((0.2, 0.15, 0.2), (0.38, 0.28, 0.38), spacing)

    def run(rho_body, settle=200, steps=150):
        body = nt.make_rigid_box((0.2, 0.15, 0.2), (0.08, 0.08, 0.08),
                                 float(params.particle_radius), rho_body,
                                 params)
        # carve the water out of the body's volume (+ shell clearance)
        keep = np.abs(water - np.array([0.2, 0.15, 0.2])).max(axis=1) \
            > 0.04 + 0.5 * spacing
        state = nt.make_fluid_state(water[keep])
        step = jax.jit(lambda s, b: nt.wcsph_coupled_step(
            s, params, grid, cfg, b, walls))
        # pre-settle the water around the FROZEN body (hydrostatic
        # pressure must develop before buoyancy means anything)
        for i in range(settle):
            state, _, d = step(state, body)
            assert int(d.seg_overflow) == 0, i
        y0 = float(body.com[1])
        for i in range(steps):
            state, body, d = step(state, body)
            assert int(d.seg_overflow) == 0, i
        assert np.isfinite(np.asarray(state.pos)).all()
        # positional outcome: with the consistent (correct-scale) contact
        # a light body surfaces within the window and BOBS, so the final
        # instantaneous velocity is sign-noisy — displacement is not
        return float(body.com[1]) - y0

    dy_light = run(100.0)
    dy_heavy = run(5000.0)
    assert dy_light > 0.01, dy_light
    assert dy_heavy < -0.005, dy_heavy
    assert dy_light > dy_heavy


def test_body_rests_on_dry_floor():
    """Body ↔ static-wall contact: dropped in a DRY box, the body must
    land, damp out, and rest above the floor (no fall-through, no
    perpetual bounce)."""
    cfg = nt.SimConfig(engine="pallas")
    params = nt.make_params(dt=5e-4)
    h = float(params.interaction_radius)
    lo, hi = np.zeros(3), np.array((0.4, 0.5, 0.4))
    grid = nt.fit_grid(lo - h, hi + h, h)
    walls = box_boundary(grid, lo, hi, float(params.particle_radius),
                         params)
    body = nt.make_rigid_box((0.2, 0.25, 0.2), (0.08, 0.08, 0.08),
                             float(params.particle_radius), 400.0, params)
    state = nt.make_fluid_state(np.array([[0.35, 0.35, 0.35]]))
    step = jax.jit(lambda s, b: nt.wcsph_coupled_step(
        s, params, grid, cfg, b, walls))
    tail = []
    for i in range(1200):
        state, body, d = step(state, body)
        if i >= 1150:
            tail.append(abs(float(body.vel[1])))
    assert 0.02 < float(body.com[1]) < 0.12, float(body.com[1])
    # "rests" = bounded residual rocking on the stiff penalty contact
    # (the corner-alternating mode never fully damps — ±0.3-0.5 m/s at
    # this mass/stiffness, A/B-verified identical before/after the
    # consistent-pressure change); the com staying in band is the
    # physical assertion, the velocity bound guards against re-launch
    assert np.mean(tail) < 0.5, np.mean(tail)
    assert abs(float(body.com[0]) - 0.2) < 0.05


def test_two_bodies_light_over_heavy():
    """Two boxes in one tank: the light one ends ABOVE the heavy one, and
    the body-body contact keeps them from interpenetrating."""
    cfg = nt.SimConfig(engine="pallas")
    base = nt.make_params(dt=5e-4)
    h = float(base.interaction_radius)
    spacing = 0.8 * h
    params = calibrate_mass(base, cfg, spacing=spacing)
    lo, hi = np.zeros(3), np.array((0.4, 0.5, 0.4))
    grid = nt.fit_grid(lo - h, hi + h, h)
    walls = box_boundary(grid, lo, hi, float(params.particle_radius),
                         params)
    water = particle_cube((0.2, 0.15, 0.2), (0.38, 0.28, 0.38), spacing)
    c_light, c_heavy = np.array([0.13, 0.15, 0.2]), np.array(
        [0.27, 0.15, 0.2])
    # rho 250: displaced/body mass ratio ~4 — inside the EXPLICIT
    # coupling's added-mass stability envelope (ratios ~10+ need the
    # DFSPH strong coupling's body-mobility diagonal; at the corrected
    # contact scale a rho-80 box is ejected, measured)
    light = nt.make_rigid_box(c_light, (0.07, 0.07, 0.07),
                              float(params.particle_radius), 250.0, params)
    heavy = nt.make_rigid_box(c_heavy, (0.07, 0.07, 0.07),
                              float(params.particle_radius), 4000.0,
                              params)
    keep = ((np.abs(water - c_light).max(axis=1) > 0.035 + 0.5 * spacing)
            & (np.abs(water - c_heavy).max(axis=1) > 0.035 + 0.5 * spacing))
    state = nt.make_fluid_state(water[keep])
    bodies = (light, heavy)
    step = jax.jit(lambda s, b: nt.wcsph_coupled_step(
        s, params, grid, cfg, b, walls))
    for i in range(150):          # frozen pre-settle
        state, _, d = step(state, bodies)
        assert int(d.seg_overflow) == 0, i
    for i in range(250):
        state, bodies, d = step(state, bodies)
        assert int(d.seg_overflow) == 0, i
    light2, heavy2 = bodies
    assert np.isfinite(np.asarray(light2.com)).all()
    y_l, y_h = float(light2.com[1]), float(heavy2.com[1])
    # the heavy box sinks; the light one stays clearly above it
    assert y_h < 0.12, y_h
    assert y_l > y_h + 0.02, (y_l, y_h)
    # neither escaped the tank
    for b in bodies:
        c = np.asarray(b.com)
        assert -0.05 < c[0] < 0.45 and -0.05 < c[2] < 0.45, c
