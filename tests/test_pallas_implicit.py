"""IISPH/PCISPH Pallas steps vs their jnp oracles (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nereus_tpu as nt
from nereus_tpu import scene
from nereus_tpu.params import calibrate_mass
from nereus_tpu.solvers.iisph_pallas import iisph_step_pallas
from nereus_tpu.solvers.pcisph_pallas import pcisph_step_pallas


def _compare(s_ref, d_ref, s_pal, d_pal, n, atol_pos=1e-6, atol_vel=2e-5):
    assert int(d_pal.seg_overflow) == 0
    assert int(d_pal.solver_iters) == int(d_ref.solver_iters)

    def key(a):
        a = np.asarray(a)
        return np.lexsort((a[:, 2], a[:, 1], a[:, 0]))

    k_ref, k_pal = key(s_ref.pos[:n]), key(s_pal.pos[:n])
    np.testing.assert_allclose(np.asarray(s_pal.pos[:n])[k_pal],
                               np.asarray(s_ref.pos[:n])[k_ref],
                               rtol=0, atol=atol_pos)
    np.testing.assert_allclose(np.asarray(s_pal.vel[:n])[k_pal],
                               np.asarray(s_ref.vel[:n])[k_ref],
                               rtol=0, atol=atol_vel)
    np.testing.assert_allclose(float(d_pal.mean_density_error),
                               float(d_ref.mean_density_error),
                               rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize("with_boundary", [False, True])
def test_iisph_pallas_matches_oracle(with_boundary):
    cfg = nt.SimConfig(seg_window=48)
    params = nt.iisph_params(dt=5e-4)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=with_boundary, boundary_radius=0.04)
    n = int(state.num_active)

    s_ref, d_ref = jax.jit(lambda s: nt.iisph_step(
        s, params, grid, cfg, boundary))(state)
    s_pal, d_pal = jax.jit(lambda s: iisph_step_pallas(
        s, params, grid, cfg, boundary))(state)
    _compare(s_ref, d_ref, s_pal, d_pal, n)


@pytest.mark.parametrize("with_boundary", [False, True])
def test_pcisph_pallas_matches_oracle(with_boundary):
    cfg = nt.SimConfig(seg_window=48)
    params = calibrate_mass(nt.pcisph_params(dt=5e-4), cfg)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=with_boundary, boundary_radius=0.04)
    n = int(state.num_active)
    delta = nt.pcisph_delta(params, cfg)

    s_ref, d_ref = jax.jit(lambda s: nt.pcisph_step(
        s, params, grid, cfg, boundary, delta=delta))(state)
    s_pal, d_pal = jax.jit(lambda s: pcisph_step_pallas(
        s, params, grid, cfg, boundary, delta=delta))(state)
    _compare(s_ref, d_ref, s_pal, d_pal, n)


def test_iisph_pallas_multi_step():
    cfg = nt.SimConfig(seg_window=48)
    params = nt.iisph_params(dt=5e-4)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.2, 0.2, 0.2), cube_center=(-0.3, 0.0, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)
    step = jax.jit(lambda s: iisph_step_pallas(s, params, grid, cfg,
                                               boundary))
    for _ in range(10):
        state, diag = step(state)
    assert int(diag.seg_overflow) == 0
    assert not bool(jnp.isnan(diag.mean_density_error))
    n = int(state.num_active)
    assert np.isfinite(np.asarray(state.pos[:n])).all()


def test_pcisph_pallas_predicted_cell_crossing_matches_oracle():
    """Predicted positions that cross cell boundaries must not drop pairs.

    The corrective loop freezes the start-of-step neighbor structure but
    evaluates predicted densities at moved positions. Particles are seeded
    touching cell edges with a large uniform velocity so every prediction
    lands in the next cell: the Pallas sweep's in-kernel hash masks must
    keep using the frozen (start-of-step) query cells — otherwise its row
    bounds leave the planned windows and pairs vanish silently, diverging
    from the oracle's fully frozen neighborhoods (ADVICE round 1, medium).
    """
    from nereus_tpu.state import make_fluid_state

    cfg = nt.SimConfig(seg_window=64)
    params = calibrate_mass(nt.pcisph_params(dt=5e-4), cfg)
    h = float(params.interaction_radius)
    spacing = 2.0 * float(params.particle_radius)

    # lattice spanning several cells; a uniform velocity of ~0.6 cells per
    # dt pushes most particles' *predictions* across a cell edge while the
    # start-of-step structure stays put
    k = 6
    ax = np.arange(k) * spacing
    xx, yy, zz = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], -1).astype(np.float32)
    # deterministic jitter: makes every coordinate distinct so the
    # lexsort-based particle matching in _compare is unambiguous
    pts += np.random.default_rng(0).uniform(
        -0.1 * spacing, 0.1 * spacing, pts.shape).astype(np.float32)
    dt = float(params.dt)
    vel = np.full_like(pts, 0.6 * h / dt)

    state = make_fluid_state(pts, vel)
    grid = nt.fit_grid(pts.min(0) - 2 * h, pts.max(0) + 0.6 * h + 2 * h, h)
    n = int(state.num_active)
    delta = nt.pcisph_delta(params, cfg)

    s_ref, d_ref = jax.jit(lambda s: nt.pcisph_step(
        s, params, grid, cfg, None, delta=delta))(state)
    s_pal, d_pal = jax.jit(lambda s: pcisph_step_pallas(
        s, params, grid, cfg, None, delta=delta))(state)
    _compare(s_ref, d_ref, s_pal, d_pal, n, atol_pos=1e-5, atol_vel=2e-4)
