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
    """Composition refusals stay explicit: DFSPH multiphase coupling and
    AKINCI surface tension refuse with clear messages."""
    import pytest

    state, params, grid, walls, pm = two_layer()
    body = _body(params, (0.2, 0.5, 0.2), 400.0)
    with pytest.raises(NotImplementedError, match="WCSPH-only"):
        nt.dfsph_coupled_step(state, params, grid,
                              nt.SimConfig(engine="segments"), body, walls)
    cfg_ak = nt.SimConfig(
        engine="segments",
        surface_tension_model=SurfaceTensionModel.AKINCI)
    with pytest.raises(NotImplementedError, match="single-phase-only"):
        nt.wcsph_coupled_step(state, params, grid, cfg_ak, body, walls)
