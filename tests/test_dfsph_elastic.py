"""DFSPH + two-way fluid–elastic coupling (beyond-reference): the
per-sample Gauss–Seidel interface conserves momentum exactly (forward and
reverse κ sweeps are the same pair formula on swapped roles), the
incompressible tank floats a light soft cube, and the jnp oracle and the
Pallas engine run in lockstep (equal solver iterations included)."""

import jax
import jax.numpy as jnp
import numpy as np

import nereus_tpu as nt
from nereus_tpu.params import SimConfig
from test_elastic_coupled import _free_space_scene, _momentum, _tank_scene

CFG = SimConfig(engine="segments", seg_window=64)


def test_total_momentum_conserved_across_contact():
    """Zero gravity, no walls: fluid↔fluid κ forces are symmetric and the
    body's forward/reverse sweeps are exactly antisymmetric per pair, so
    total momentum is conserved THROUGH the stiffness solver."""
    params, grid, state, estate, statics, ep, psi = _free_space_scene(CFG)
    step = jax.jit(lambda s, e: nt.dfsph_elastic_step(
        s, params, grid, CFG, e, statics, ep, psi, None, substeps=2))
    p0 = _momentum(state, estate, statics, params)
    hit = False
    for _ in range(40):
        state, estate, diag = step(state, estate)
        assert np.isfinite(np.asarray(state.pos)).all()
        assert np.isfinite(np.asarray(estate.pos)).all()
        if float(jnp.max(jnp.abs(estate.vel))) > 1e-4:
            hit = True
    assert hit, "the blob never touched the body"
    p1 = _momentum(state, estate, statics, params)
    scale = max(float(np.abs(p0).max()), 1e-6)
    assert np.abs(p1 - p0).max() < 2e-3 * scale, (p0, p1)
    # the body picked up momentum from the impact (+x push), through the
    # pressure solver itself
    assert float(estate.vel[:, 0].mean()) > 0.0


def test_oracle_pallas_lockstep():
    cfg_p = SimConfig(engine="pallas", seg_window=64)
    params, grid, state, estate, statics, ep, psi = _free_space_scene(CFG)
    _, _, state_p, estate_p, statics_p, _, psi_p = _free_space_scene(cfg_p)
    for _ in range(2):
        state, estate, do = nt.dfsph_elastic_step(
            state, params, grid, CFG, estate, statics, ep, psi, None,
            substeps=2)
        state_p, estate_p, dp = nt.dfsph_elastic_step(
            state_p, params, grid, cfg_p, estate_p, statics_p, ep, psi_p,
            None, substeps=2)
        # the engines must agree on the stiffness iteration counts too —
        # a mismatched per-sample mobility or reverse sweep shows up here
        # before it shows up in trajectories
        assert int(do.solver_iters) == int(dp.solver_iters)
    np.testing.assert_allclose(np.asarray(state_p.pos),
                               np.asarray(state.pos), atol=2e-6)
    np.testing.assert_allclose(np.asarray(estate_p.pos),
                               np.asarray(estate.pos), atol=2e-6)
    np.testing.assert_allclose(np.asarray(estate_p.vel),
                               np.asarray(estate.vel), atol=1e-3)


def test_light_body_floats_on_incompressible_tank():
    """A 0.2ρ₀ soft cube dropped onto DFSPH-settled water stays near the
    surface (displacement assert — surfaced bodies bob) while the fluid
    column holds its rest density."""
    params, grid, walls, state, estate, statics, ep, psi, surf = \
        _tank_scene(CFG, density=200.0)
    # re-settle briefly under DFSPH so the pressure field is the
    # incompressible one (the WCSPH-settled pool carries Tait pressures)
    settle = jax.jit(lambda s: nt.dfsph_step(s, params, grid, CFG, walls))
    for _ in range(40):
        state, _d = settle(state)
    step = jax.jit(lambda s, e: nt.dfsph_elastic_step(
        s, params, grid, CFG, e, statics, ep, psi, walls, substeps=4))
    y0 = float(estate.pos[:, 1].mean())
    for _ in range(180):
        state, estate, diag = step(state, estate)
        assert np.isfinite(np.asarray(estate.pos)).all()
        assert np.isfinite(np.asarray(state.pos)).all()
    y1 = float(estate.pos[:, 1].mean())
    # floated: still riding near the surface, not on the floor
    assert y1 > 0.6 * surf, (y0, y1, surf)
    # and the incompressible solve kept compression at the sub-percent
    # level despite the body load
    assert float(diag.mean_compression) < 0.01
    y = np.asarray(estate.pos)[:, 1]
    assert y.min() > -0.01 and y.max() < 0.6
