"""Golden-physics tests (SURVEY §4 level 2): the cell-list pipeline must match
an independent O(N²) all-pairs float64 oracle on density, pressure, and every
force term, with and without boundary particles."""

import jax.numpy as jnp
import numpy as np

from nereus_tpu import boundary as bnd
from nereus_tpu import grid as G
from nereus_tpu.params import SimConfig, make_params
from nereus_tpu.solvers import common
from nereus_tpu.solvers.wcsph import compute_pressure_force, tait_pressure, wcsph_step
from nereus_tpu.state import make_fluid_state

from reference_np import Oracle

CFG = SimConfig()


def _setup(n=600, seed=0, with_boundary=False):
    params = make_params()
    h = float(params.interaction_radius)
    rng = np.random.RandomState(seed)
    # ~2 particles per cell on average, mimicking fluid spacing
    side = h * (n / 2.0) ** (1 / 3)
    pos = rng.uniform(0.0, side, (n, 3))
    vel = rng.uniform(-1.0, 1.0, (n, 3))
    grid = G.fit_grid(pos.min(0), pos.max(0), h)
    state = make_fluid_state(pos, vel)
    boundary = None
    bpos = psi = None
    if with_boundary:
        boundary = bnd.box_boundary(grid, (-0.05, -0.05, -0.05),
                                    (side + 0.05,) * 3, 0.02, params)
        bpos = np.asarray(boundary.pos, dtype=np.float64)
        psi = np.asarray(boundary.psi, dtype=np.float64)
    oracle = Oracle(h, float(params.particle_mass), float(params.rest_density),
                    float(params.gas_stiffness), float(params.viscosity),
                    float(params.surface_tension), float(params.particle_radius),
                    float(params.beta), float(params.sound_speed))
    return params, grid, state, boundary, oracle, bpos, psi


def test_density_matches_oracle():
    params, grid, state, _, oracle, _, _ = _setup()
    ctx = common.build_ctx(state, grid, CFG, None)
    assert int(ctx.overflow) == 0
    dens = np.asarray(common.compute_density(ctx, params, CFG, None))
    spos = np.asarray(ctx.state.pos, dtype=np.float64)
    want = oracle.density(spos)
    np.testing.assert_allclose(dens, want, rtol=2e-5)


def test_density_with_boundary_matches_oracle():
    params, grid, state, boundary, oracle, bpos, psi = _setup(with_boundary=True)
    ctx = common.build_ctx(state, grid, CFG, boundary)
    assert int(ctx.overflow) == 0
    dens = np.asarray(common.compute_density(ctx, params, CFG, boundary))
    spos = np.asarray(ctx.state.pos, dtype=np.float64)
    want = oracle.density(spos, bpos, psi)
    np.testing.assert_allclose(dens, want, rtol=2e-5)


def test_total_force_matches_oracle():
    params, grid, state, _, oracle, _, _ = _setup(seed=1)
    ctx = common.build_ctx(state, grid, CFG, None)
    dens = common.compute_density(ctx, params, CFG, None)
    pres = tait_pressure(dens, params)
    f = np.asarray(common.compute_nonpressure_forces(ctx, params, CFG, None, dens)
                   + compute_pressure_force(ctx, params, CFG, None, dens, pres))
    spos = np.asarray(ctx.state.pos, dtype=np.float64)
    svel = np.asarray(ctx.state.vel, dtype=np.float64)
    d64 = oracle.density(spos)
    p64 = oracle.tait(d64)
    want = oracle.forces(spos, svel, d64, p64)
    scale = np.maximum(np.linalg.norm(want, axis=-1, keepdims=True), 1e-3)
    np.testing.assert_allclose(f / scale, want / scale, atol=2e-3)


def test_total_force_with_boundary_matches_oracle():
    params, grid, state, boundary, oracle, bpos, psi = _setup(
        seed=2, with_boundary=True)
    ctx = common.build_ctx(state, grid, CFG, boundary)
    dens = common.compute_density(ctx, params, CFG, boundary)
    pres = tait_pressure(dens, params)
    f = np.asarray(
        common.compute_nonpressure_forces(ctx, params, CFG, boundary, dens)
        + compute_pressure_force(ctx, params, CFG, boundary, dens, pres))
    spos = np.asarray(ctx.state.pos, dtype=np.float64)
    svel = np.asarray(ctx.state.vel, dtype=np.float64)
    d64 = oracle.density(spos, bpos, psi)
    p64 = oracle.tait(d64)
    want = oracle.forces(spos, svel, d64, p64, bpos, psi)
    scale = np.maximum(np.linalg.norm(want, axis=-1, keepdims=True), 1e-3)
    np.testing.assert_allclose(f / scale, want / scale, atol=2e-3)


def test_step_runs_and_is_finite():
    params, grid, state, boundary, _, _, _ = _setup(seed=3, with_boundary=True)
    s = state
    for _ in range(3):
        s, diag = wcsph_step(s, params, grid, CFG, boundary)
    assert np.all(np.isfinite(np.asarray(s.pos)))
    assert np.all(np.isfinite(np.asarray(s.vel)))
    assert int(diag.seg_overflow) == 0
    assert float(diag.max_density) > 0.0


def test_inactive_particles_stay_parked():
    params, grid, state, _, _, _, _ = _setup(seed=4)
    n = state.capacity
    padded = make_fluid_state(np.asarray(state.pos), np.asarray(state.vel),
                              capacity=n + 64)
    s = padded
    for _ in range(2):
        s, _ = wcsph_step(s, params, grid, CFG, None)
    pos = np.asarray(s.pos)
    # the 64 pad slots must remain at the parking position
    assert np.sum(np.all(pos > 1e8, axis=1)) == 64
