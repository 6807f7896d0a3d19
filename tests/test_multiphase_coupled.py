"""Multiphase (per-particle mass/ρ₀) × rigid-body coupling
(beyond-reference): oracle↔Pallas lockstep, exact single-phase reduction
of the body contact, and the canonical physics demo — a body of
intermediate density floats AT THE INTERFACE of a settled two-phase tank
while a heavy body sinks through it.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import nereus_tpu as nt
from nereus_tpu.params import SimConfig, SurfaceTensionModel

from test_multiphase import ST_NONE, canon, two_layer


def _body(params, center, density, size=0.06):
    return nt.make_rigid_box(center, (size, size, size),
                             float(params.particle_radius), density,
                             params)


def _settle(state, params, grid, walls, cfg, steps):
    step = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg, walls))
    for _ in range(steps):
        state, d = step(state)
        assert int(d.seg_overflow) == 0
    return state


def test_mp_coupled_engines_match():
    """Oracle ↔ Pallas lockstep of the multiphase coupled step: same
    fluid update AND same rigid reaction from the same wall-contacting
    two-phase state with a body inside the fluid."""
    state, params, grid, walls, pm = two_layer(vel_y=-1.0)
    n = int(state.num_active)
    cfg_o = nt.SimConfig(engine="segments", **ST_NONE)
    cfg_p = nt.SimConfig(engine="pallas", **ST_NONE)
    state = _settle(state, params, grid, walls, cfg_o, 40)
    # park the body in the fluid mid-column so contact pairs exist
    p = np.asarray(state.pos)[:n]
    center = (float(p[:, 0].mean()), float(np.quantile(p[:, 1], 0.6)),
              float(p[:, 2].mean()))
    body = _body(params, center, 400.0)

    so, bo, do = jax.jit(lambda s, b: nt.wcsph_coupled_step(
        s, params, grid, cfg_o, b, walls))(state, body)
    sp, bp, dp = jax.jit(lambda s, b: nt.wcsph_coupled_step(
        s, params, grid, cfg_p, b, walls))(state, body)
    po, vo, mo = canon(so, n)
    pp, vp, mp = canon(sp, n)
    np.testing.assert_allclose(po, pp, atol=1e-6)
    np.testing.assert_allclose(vo, vp, atol=1e-4)
    np.testing.assert_array_equal(mo, mp)
    np.testing.assert_allclose(np.asarray(bo.vel), np.asarray(bp.vel),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(bo.omega), np.asarray(bp.omega),
                               atol=1e-4)
    assert int(do.seg_overflow) == 0 and int(dp.seg_overflow) == 0
    # the body actually felt the fluid (non-trivial reaction)
    assert float(jnp.linalg.norm(bo.vel)) > 0.0


def test_mp_body_contact_reduces_to_single_phase():
    """At uniform phase (mass = m, ρ₀ = ρ₀_ref everywhere) the multiphase
    adapted density equals the single-phase density (m·ΣW + Σψ W), so the
    body contact — pressure at the consistent scale + friction — must
    produce the SAME rigid reaction as the single-phase coupled step.
    (The fluid field itself evolves under the volume-form viscosity and
    is only close, not bitwise.)"""
    state, params, grid, walls, pm = two_layer(ratio_top=1.0, vel_y=-1.0)
    n = int(state.num_active)
    cfg = nt.SimConfig(engine="segments", **ST_NONE)
    state = _settle(state, params, grid, walls, cfg, 40)
    p = np.asarray(state.pos)[:n]
    center = (float(p[:, 0].mean()), float(np.quantile(p[:, 1], 0.6)),
              float(p[:, 2].mean()))
    body = _body(params, center, 400.0)

    s_mp, b_mp, d_mp = jax.jit(lambda s, b: nt.wcsph_coupled_step(
        s, params, grid, cfg, b, walls))(state, body)
    # strip the phase columns -> the plain single-phase coupled step
    s_single = nt.FluidState(pos=state.pos, vel=state.vel,
                             pressure=state.pressure,
                             num_active=state.num_active)
    s_sp, b_sp, d_sp = jax.jit(lambda s, b: nt.wcsph_coupled_step(
        s, params, grid, cfg, b, walls))(s_single, body)
    np.testing.assert_allclose(np.asarray(b_mp.vel),
                               np.asarray(b_sp.vel), rtol=1e-4,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(b_mp.omega),
                               np.asarray(b_sp.omega), rtol=1e-3,
                               atol=1e-6)
    np.testing.assert_allclose(float(d_mp.max_density),
                               float(d_sp.max_density), rtol=1e-5)


def test_body_floats_at_two_phase_interface():
    """The canonical multiphase-coupling demo: over a settled two-phase
    tank (heavy below, light above), a body of density between the two
    phases sinks through the light phase and FLOATS at the interface; a
    much heavier body sinks through both. Displacement asserted, not
    final-instant velocity (floaters bob)."""
    cfg = nt.SimConfig(engine="segments", **ST_NONE)

    def run(body_density, steps=250):
        state, params, grid, walls, pm = two_layer(ratio_top=0.3,
                                                   side_cells=6)
        n = int(state.num_active)
        state = _settle(state, params, grid, walls, cfg, 300)
        p = np.asarray(state.pos)[:n]
        m = np.asarray(state.mass)[:n]
        heavy = m > 0.5 * float(pm)
        interface = float(p[heavy, 1].max())
        light_top = float(p[~heavy, 1].max())
        cx = float(p[:, 0].mean())
        cz = float(p[:, 2].mean())
        body = _body(params, (cx, light_top + 0.05, cz), body_density)
        step = jax.jit(lambda s, b: nt.wcsph_coupled_step(
            s, params, grid, cfg, b, walls))
        # frozen-body hydrostatic pre-settle: let pressure develop around
        # the shell before releasing (CLAUDE.md buoyancy recipe)
        for _ in range(50):
            state, _b, d = step(state, body)
            assert int(d.seg_overflow) == 0
        for _ in range(steps):
            state, body, d = step(state, body)
            assert int(d.seg_overflow) == 0
            assert np.isfinite(np.asarray(body.com)).all()
        pf = np.asarray(state.pos)[:n]
        assert np.isfinite(pf).all()
        assert pf[:, 1].min() > 0.0, "fluid blew through the floor"
        return float(body.com[1]), interface, light_top

    y_mid, interface, light_top = run(600.0)
    y_heavy, _, _ = run(3000.0)
    # the heavy body ends well below the intermediate one
    assert y_heavy < y_mid - 0.03, (y_mid, y_heavy)
    # the intermediate body straddles the interface region: below the
    # light phase's free surface, at/above the heavy phase
    assert y_mid < light_top + 0.02, (y_mid, light_top)
    assert y_mid > interface - 0.06, (y_mid, interface)


def test_mp_coupled_gates():
    """Composition refusals stay explicit: AKINCI surface tension and
    implicit viscosity refuse multiphase coupling with clear messages
    (for BOTH solvers — the WCSPH and DFSPH couplings are implemented)."""
    import pytest

    state, params, grid, walls, pm = two_layer()
    body = _body(params, (0.2, 0.5, 0.2), 400.0)
    cfg_ak = nt.SimConfig(
        engine="segments",
        surface_tension_model=SurfaceTensionModel.AKINCI)
    with pytest.raises(NotImplementedError, match="single-phase-only"):
        nt.wcsph_coupled_step(state, params, grid, cfg_ak, body, walls)
    with pytest.raises(NotImplementedError, match="single-phase-only"):
        nt.dfsph_coupled_step(state, params, grid, cfg_ak, body, walls)
    cfg_iv = nt.SimConfig(engine="segments", viscosity_model="implicit")
    with pytest.raises(NotImplementedError, match="single-phase-only"):
        nt.dfsph_coupled_step(state, params, grid, cfg_iv, body, walls)


# ---------------------------------------------------------------------------
# Multiphase x DFSPH rigid coupling (adapted-domain Gauss–Seidel interface)
# ---------------------------------------------------------------------------

def _dfsph_two_layer(ratio_top=0.4, vel_y=0.0, jitter=0.05):
    # dt 5e-4: the single-phase-coupled-validated regime — at the
    # dfsph_params default 1e-3 a body released at the free surface is
    # ejected at 300 m/s by the 1/dt^2 kappa response to its shell's
    # density footprint (single-phase AND multiphase identically;
    # measured while building this file)
    from test_multiphase import two_layer
    return two_layer(base_params=nt.dfsph_params(dt=5e-4),
                     ratio_top=ratio_top, vel_y=vel_y, jitter=jitter)


def test_dfsph_mp_coupled_reduces_to_single_phase():
    """At uniform phase the multiphase coupled step must reproduce the
    single-phase coupled step: identical iteration counts, identical
    fluid and body trajectories (the κ̂ = ρ·κ correspondence carries
    over — every body term is the single-phase one divided by m_i on
    the acceleration side)."""
    from nereus_tpu.params import calibrate_mass
    from nereus_tpu.boundary import box_boundary
    from nereus_tpu.scene import particle_cube

    base = nt.dfsph_params(dt=5e-4)
    sp = 0.8 * float(base.interaction_radius)
    cfg = nt.SimConfig(engine="segments", **ST_NONE)
    params = calibrate_mass(base, cfg, spacing=sp)
    pm = float(params.particle_mass)
    rd = float(params.rest_density)
    h = float(params.interaction_radius)
    side = 6 * sp
    pos = particle_cube((side / 2 + 2 * sp,) * 3, (side,) * 3, sp)
    n = len(pos)
    lo = np.zeros(3)
    hi = np.array([side + 4 * sp, 2.5 * side, side + 4 * sp])
    grid = nt.fit_grid(lo - h, hi + h, h)
    walls = box_boundary(grid, lo, hi, float(params.particle_radius),
                         params)
    # body SUBMERGED mid-block with nonzero (v, ω), fluid with random
    # velocities: one step engages every term (div-free loop, friction,
    # κ loop, Gauss–Seidel kicks). ONE step, because over several steps
    # the discrete h-cutoff near contact chaotically amplifies f32
    # op-order noise into O(κ) per-pair kicks (measured: identical
    # formulations diverge m/s by step 2 through a single flipped pair
    # — the comparison, not the physics, is what breaks).
    center = (side / 2 + 2 * sp, side / 2 + 2 * sp, side / 2 + 2 * sp)
    body = dataclasses.replace(
        nt.make_rigid_box(center, (0.06, 0.06, 0.06),
                          float(params.particle_radius), 400.0, params),
        vel=jnp.asarray([0.05, -0.1, 0.02], np.float32),
        omega=jnp.asarray([0.2, -0.1, 0.3], np.float32))
    rng = np.random.default_rng(11)
    vels = rng.normal(scale=0.05, size=pos.shape).astype(np.float32)
    s1 = nt.make_fluid_state(pos, velocities=vels)
    s2 = nt.make_fluid_state(pos, velocities=vels, masses=pm,
                             rest_densities=rd)
    step = jax.jit(lambda s, b: nt.dfsph_coupled_step(
        s, params, grid, cfg, b, walls))
    s1, b1, d1 = step(s1, body)
    s2, b2, d2 = step(s2, body)
    assert int(d1.solver_iters) == int(d2.solver_iters)
    assert int(d1.solver_iters) > cfg.dfsph_min_iters  # real work
    np.testing.assert_allclose(np.asarray(s2.pos)[:n],
                               np.asarray(s1.pos)[:n], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.vel)[:n],
                               np.asarray(s1.vel)[:n], atol=2e-4)
    # cross-formulation f32 noise: the reaction is a sum of ~1e3
    # kappa-scale cancelling terms accumulated in different orders
    np.testing.assert_allclose(np.asarray(b2.vel), np.asarray(b1.vel),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(b2.omega), np.asarray(b1.omega),
                               atol=5e-3)


def test_dfsph_mp_coupled_engines_match():
    """Oracle ↔ Pallas lockstep of the multiphase DFSPH coupled step:
    same fluid, same body, same iteration counts from a wall-contacting
    two-phase state with a body parked in the fluid."""
    state, params, grid, walls, pm = _dfsph_two_layer(vel_y=-0.5)
    n = int(state.num_active)
    cfg_o = nt.SimConfig(engine="segments", **ST_NONE)
    cfg_p = nt.SimConfig(engine="pallas", **ST_NONE)
    # settle into wall contact with the uncoupled multiphase DFSPH step
    settle = jax.jit(lambda s: nt.dfsph_step(s, params, grid, cfg_o,
                                             walls))
    for _ in range(20):
        state, d = settle(state)
        assert int(d.seg_overflow) == 0
    p = np.asarray(state.pos)[:n]
    center = (float(p[:, 0].mean()), float(np.quantile(p[:, 1], 0.6)),
              float(p[:, 2].mean()))
    body = _body(params, center, 400.0)

    so, bo, do = jax.jit(lambda s, b: nt.dfsph_coupled_step(
        s, params, grid, cfg_o, b, walls))(state, body)
    sp_, bp, dp = jax.jit(lambda s, b: nt.dfsph_coupled_step(
        s, params, grid, cfg_p, b, walls))(state, body)
    assert int(do.solver_iters) == int(dp.solver_iters)
    po, vo, mo = canon(so, n)
    pp, vp, mp = canon(sp_, n)
    np.testing.assert_allclose(po, pp, atol=1e-6)
    np.testing.assert_allclose(vo, vp, atol=2e-4)
    np.testing.assert_array_equal(mo, mp)
    np.testing.assert_allclose(np.asarray(bo.vel), np.asarray(bp.vel),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(bo.omega), np.asarray(bp.omega),
                               atol=1e-3)
    assert int(do.seg_overflow) == 0 and int(dp.seg_overflow) == 0


def test_dfsph_mp_coupled_two_phase_drop_stays_healthy():
    """Physics smoke: a body dropped onto a settling two-phase DFSPH
    tank stays finite, the fluid stays in the tank, and the body ends
    below its drop height (coupled, not ballistic)."""
    # jitter 0: an incompressible solver reads a jittered seed as real
    # density disorder and boils off 5 m/s ejecta for hundreds of steps
    # (measured) — any ejecta crossing the body shell fakes a huge
    # contact reaction
    state, params, grid, walls, pm = _dfsph_two_layer(ratio_top=0.4,
                                                      jitter=0.0)
    n = int(state.num_active)
    cfg = nt.SimConfig(engine="pallas", **ST_NONE)
    settle = jax.jit(lambda s: nt.dfsph_step(s, params, grid, cfg, walls))
    for _ in range(200):
        state, d = settle(state)
    p = np.asarray(state.pos)[:n]
    top = float(p[:, 1].max())
    cx, cz = float(p[:, 0].mean()), float(p[:, 2].mean())
    y0 = top + 0.04
    body = _body(params, (cx, y0, cz), 600.0)
    step = jax.jit(lambda s, b: nt.dfsph_coupled_step(
        s, params, grid, cfg, b, walls))
    # frozen-body hydrostatic pre-settle (CLAUDE.md buoyancy recipe):
    # the shell's ψ must blend into the density field before release or
    # the 1/dt² κ correction reads the sudden overlap as an impact
    # (measured 300 m/s ejection — single-phase AND multiphase alike)
    for _ in range(60):
        state, _b, d = step(state, body)
        assert int(d.seg_overflow) == 0
    for i in range(80):
        state, body, d = step(state, body)
        assert int(d.seg_overflow) == 0, i
        assert float(jnp.linalg.norm(body.vel)) < 5.0, i
    pf = np.asarray(state.pos)[:n]
    assert np.isfinite(pf).all()
    assert pf[:, 1].min() > 0.0
    assert np.isfinite(np.asarray(body.com)).all()
    assert float(body.com[1]) < y0
