"""DFSPH + rigid-body two-way coupling (beyond-reference: upstream has
neither DFSPH — its PCISPH is an empty stub, sph/pcisph/sph_cuda.cu:944-952
— nor body dynamics, sph/sph.cpp:391-432)."""

import jax
import jax.numpy as jnp
import numpy as np

import nereus_tpu as nt
from nereus_tpu.boundary import box_boundary
from nereus_tpu.params import calibrate_mass
from nereus_tpu.scene import particle_cube


def test_dfsph_coupled_engine_equivalence():
    cfg_o = nt.SimConfig(engine="segments")
    cfg_p = nt.SimConfig(engine="pallas")
    params = calibrate_mass(nt.dfsph_params(dt=2e-4), cfg_o)
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
        s_o, b_o, d_o = jax.jit(lambda s, b: nt.dfsph_coupled_step(
            s, params, grid, cfg_o, b, walls))(s_o, b_o)
        s_p, b_p, d_p = jax.jit(lambda s, b: nt.dfsph_coupled_step(
            s, params, grid, cfg_p, b, walls))(s_p, b_p)
        assert int(d_p.seg_overflow) == 0
        # both engines must do real solver work on the same iteration count
        assert int(d_o.solver_iters) == int(d_p.solver_iters)
        np.testing.assert_allclose(np.asarray(s_o.pos),
                                   np.asarray(s_p.pos), atol=2e-5,
                                   err_msg=f"step {it}")
        np.testing.assert_allclose(np.asarray(s_o.vel),
                                   np.asarray(s_p.vel), atol=2e-4)
        np.testing.assert_allclose(np.asarray(b_o.com),
                                   np.asarray(b_p.com), atol=1e-6)
        np.testing.assert_allclose(np.asarray(b_o.vel),
                                   np.asarray(b_p.vel), atol=2e-4)
        np.testing.assert_allclose(np.asarray(b_o.omega),
                                   np.asarray(b_p.omega), atol=2e-3)


def test_dfsph_coupled_momentum_conservation():
    """Zero gravity, no walls, viscosity 0: fluid↔fluid κ corrections are
    antisymmetric and every fluid↔body κ impulse is mirrored onto the body
    by the loop-carried reaction, so TOTAL linear momentum is conserved
    while a moving fluid blob collides with the body through the pressure
    solver itself."""
    cfg = nt.SimConfig(engine="pallas",
                       surface_tension_model=nt.SurfaceTensionModel.NONE)
    params = nt.dfsph_params(viscosity=0.0, gravity=(0.0, 0.0, 0.0),
                             dt=2e-4)
    h = float(params.interaction_radius)
    spacing = 0.8 * h
    params = calibrate_mass(params, cfg, spacing=spacing)
    pm = float(params.particle_mass)

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
    step = jax.jit(lambda s, b: nt.dfsph_coupled_step(
        s, params, grid, cfg, b))
    for i in range(20):
        state, body, d = step(state, body)
        assert int(d.seg_overflow) == 0, i
    p1 = total_p(state, body)
    assert not np.isnan(np.asarray(state.pos)).any()
    # the body must actually have received momentum through the solver
    assert float(body.mass) * np.linalg.norm(np.asarray(body.vel)) \
        > 1e-3 * abs(p0[0])
    np.testing.assert_allclose(p1, p0, rtol=2e-3, atol=2e-4)


def test_dfsph_coupled_light_floater_strong_coupling():
    """ρ=100 box — added/body mass ≈ 10, the regime where the static-α
    partitioned coupling measurably DIVERGED at every dt tried (see
    test_dfsph_coupled_float's docstring): the body-mobility diagonal
    (``SimConfig.dfsph_strong_coupling``, Gissler-2019-flavoured) keeps
    the solve stable and the box floating high, at the unchanged
    dt=5e-4."""
    from nereus_tpu.scene import resting_block

    cfg = nt.SimConfig(engine="pallas")   # dfsph_strong_coupling default
    base = nt.dfsph_params(dt=5e-4)
    spacing = 0.8 * float(base.interaction_radius)
    params = calibrate_mass(base, cfg, spacing=spacing)
    n_target = 343
    state, grid, walls = resting_block(params, cfg, n_target=n_target,
                                       spacing=spacing)
    sp_c = spacing * 1.003 ** (-1.0 / 3.0)
    side = sp_c * n_target ** (1.0 / 3.0)
    gap = 2 * sp_c
    water_top = gap + side
    cx = gap + side / 2.0
    body = nt.make_rigid_box((cx, water_top + 0.05, cx),
                             (0.08, 0.08, 0.08),
                             float(params.particle_radius), 100.0, params)
    step = jax.jit(lambda s, b: nt.dfsph_coupled_step(
        s, params, grid, cfg, b, walls))
    for i in range(60):         # settle the water (body frozen in air)
        state, _, d = step(state, body)
        assert int(d.seg_overflow) == 0, i
    for i in range(200):        # release: fall, splash, float
        state, body, d = step(state, body)
        assert int(d.seg_overflow) == 0, i
        # the old failure mode was a 100+ m/s ejection within a few steps
        speed = float(jnp.linalg.norm(body.vel))
        assert speed < 5.0, (i, speed)
    p = np.asarray(state.pos[:int(state.num_active)])
    assert np.isfinite(p).all()
    assert p[:, 1].min() > 0.0, "fluid blew through the floor"
    com_y = float(body.com[1])
    # a ρ=100 floater rides high (draft ≈ 0.1·side): com stays around
    # the free surface, never en route to the floor
    assert com_y > water_top - 0.06, (com_y, water_top)
    assert com_y < water_top + 0.10, (com_y, water_top)


def test_dfsph_coupled_float():
    """A density-400 box dropped onto settled water FLOATS near the
    surface instead of sinking — hydrostatic κ acting through the exact
    per-iteration reaction (Gauss–Seidel interface); incompressibility
    is enforced by the κ loops, no Tait EOS anywhere. Seeded from
    ``scene.resting_block`` (DFSPH needs its two-spacing wall standoff,
    see the resting_block docstring); the FLUID integrity is asserted
    too, so a silent blow-up can't masquerade as flotation.

    Density 400, not 100: the partitioned Akinci coupling is unstable
    once the displaced (added) mass far exceeds the body mass — measured
    here to diverge at ρ=100 for every dt tried, the classic added-mass
    limit (Gissler et al. 2019 solve it by putting rigid unknowns INSIDE
    the pressure system). Very light floaters belong to
    ``wcsph_coupled_step`` (tested at ρ=100 in test_rigid.py)."""
    from nereus_tpu.scene import resting_block

    cfg = nt.SimConfig(engine="pallas")
    base = nt.dfsph_params(dt=5e-4)
    spacing = 0.8 * float(base.interaction_radius)
    params = calibrate_mass(base, cfg, spacing=spacing)
    n_target = 343
    state, grid, walls = resting_block(params, cfg, n_target=n_target,
                                       spacing=spacing)
    # resting_block geometry: block top and horizontal center
    sp_c = spacing * 1.003 ** (-1.0 / 3.0)
    side = sp_c * n_target ** (1.0 / 3.0)
    gap = 2 * sp_c
    water_top = gap + side
    cx = gap + side / 2.0
    body = nt.make_rigid_box((cx, water_top + 0.05, cx),
                             (0.08, 0.08, 0.08),
                             float(params.particle_radius), 400.0, params)
    step = jax.jit(lambda s, b: nt.dfsph_coupled_step(
        s, params, grid, cfg, b, walls))
    for i in range(60):         # settle the water (body frozen in air)
        state, _, d = step(state, body)
        assert int(d.seg_overflow) == 0, i
    for i in range(200):        # release: fall, splash, float
        state, body, d = step(state, body)
        assert int(d.seg_overflow) == 0, i
    p = np.asarray(state.pos[:int(state.num_active)])
    assert np.isfinite(p).all()
    assert p[:, 1].min() > 0.0, "fluid blew through the floor"
    com_y = float(body.com[1])
    # a floater stays near the surface; a sinker would approach the floor
    assert com_y > water_top - 0.12, (com_y, water_top)
    assert com_y < water_top + 0.10, (com_y, water_top)
