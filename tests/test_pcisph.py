"""PCISPH tests: stiffness-δ precompute sanity, convergence of the
predictive-corrective loop (the solve the reference left as an empty stub,
``sph/sph_cuda.cu:944-952``), and momentum symmetry of the pressure force."""

import jax
import jax.numpy as jnp
import numpy as np

from nereus_tpu import grid as G
from nereus_tpu.params import SimConfig, calibrate_mass, pcisph_params
from nereus_tpu.solvers import common, pcisph
from nereus_tpu.state import make_fluid_state

CFG = SimConfig()


def _calibrated(**overrides):
    """PCISPH params with density-consistent mass (see calibrate_mass: the
    reference's m = h³ρ₀ is unusable by an actual corrective solve)."""
    return calibrate_mass(pcisph_params(**overrides), CFG)


def _compressed_block(params, n_side=7, squeeze=0.99, seed=3):
    """A slightly over-compressed rest lattice (spacing = particle diameter ×
    squeeze) so the predicted density starts a bit above ρ₀ and the
    corrective loop has work inside its linear regime."""
    spacing = 2.0 * float(params.particle_radius) * squeeze
    ax = np.arange(n_side) * spacing
    xx, yy, zz = np.meshgrid(ax, ax, ax, indexing="ij")
    pos = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=-1)
    rng = np.random.RandomState(seed)
    pos = pos + rng.uniform(-0.005, 0.005, pos.shape) * spacing
    return pos


def test_delta_positive_and_scale():
    params = pcisph_params()
    delta = pcisph.pcisph_delta(params, CFG)
    assert delta > 0.0
    # δ scales as 1/dt²: halving dt quadruples δ.
    params2 = pcisph_params(dt=float(params.dt) / 2.0)
    delta2 = pcisph.pcisph_delta(params2, CFG)
    np.testing.assert_allclose(delta2 / delta, 4.0, rtol=1e-5)


def test_pcisph_converges_and_builds_pressure():
    params = _calibrated(gravity=(0.0, 0.0, 0.0), viscosity=0.0,
                         surface_tension=0.0)
    h = float(params.interaction_radius)
    pos = _compressed_block(params)
    grid = G.fit_grid(pos.min(0) - h, pos.max(0) + h, h)
    state = make_fluid_state(pos)
    delta = pcisph.pcisph_delta(params, CFG)

    new_state, diag = jax.jit(
        lambda s: pcisph.pcisph_step(s, params, grid, CFG, None, delta=delta)
    )(state)

    assert int(diag.seg_overflow) == 0
    assert int(diag.solver_iters) >= CFG.pcisph_min_iters
    assert int(diag.solver_iters) < CFG.pcisph_max_iters
    # converged: final max predicted density error ≤ 1% of ρ₀
    assert float(diag.mean_density_error) <= 0.01 + 1e-6
    # the compressed block must have produced positive corrective pressure
    assert float(jnp.max(new_state.pressure)) > 0.0
    assert bool(jnp.all(jnp.isfinite(new_state.pos)))
    assert bool(jnp.all(jnp.isfinite(new_state.vel)))


def test_pcisph_warm_start_cuts_iterations():
    """With pressure warm starting (half the previous step's converged
    pressure, on by default) a settling column needs FEWER corrective
    iterations than a cold solve of the same trajectory regime, at the
    same tolerance; physics stays finite and the fluid stays in the
    tank. Pallas interpret (the segments oracle's seg_window can
    overflow on settled lattices)."""
    import dataclasses as _dc

    from nereus_tpu.scene import resting_block

    cfg_w = SimConfig(engine="pallas")
    cfg_c = _dc.replace(cfg_w, pcisph_warm_start=False)
    spacing = 0.8 * float(pcisph_params().interaction_radius)
    steps = 30

    def run(cfg):
        params = calibrate_mass(pcisph_params(), cfg, spacing=spacing)
        # an impact in progress keeps the corrective loop above its
        # configured minimum, so warm starting has headroom to show
        state, grid, boundary = resting_block(params, cfg, n_target=343,
                                              spacing=spacing,
                                              impact_velocity=-2.0)
        delta = pcisph.pcisph_delta(params, cfg)
        step = jax.jit(lambda s: pcisph.pcisph_step(
            s, params, grid, cfg, boundary, delta=delta, tol_frac=0.001))
        total = 0
        for _ in range(steps):
            state, diag = step(state)
            total += int(np.asarray(diag.solver_iters))
        p = np.asarray(state.pos[:int(np.asarray(state.num_active))])
        assert np.isfinite(p).all()
        assert p[:, 1].min() > 0.0
        assert int(np.asarray(diag.seg_overflow)) == 0
        return total

    warm = run(cfg_w)
    cold = run(cfg_c)
    floor = steps * cfg_w.pcisph_min_iters
    assert cold > floor, (cold, floor)   # the scene must do real work
    assert warm < cold, (warm, cold)


def test_pcisph_pressure_force_momentum_symmetric():
    params = _calibrated(gravity=(0.0, 0.0, 0.0))
    h = float(params.interaction_radius)
    pos = _compressed_block(params, n_side=5)
    grid = G.fit_grid(pos.min(0) - h, pos.max(0) + h, h)
    state = make_fluid_state(pos)

    ctx = common.build_ctx(state, grid, CFG, None)
    dens = common.compute_density(ctx, params, CFG, None)
    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.uniform(0.0, 100.0, pos.shape[0]), jnp.float32)
    f = pcisph._pressure_force(ctx, params, CFG, None, dens, p)
    total = np.asarray(jnp.sum(f, axis=0))
    fscale = float(jnp.max(jnp.linalg.norm(f, axis=-1)))
    # fluid-fluid pressure forces are exactly pairwise-antisymmetric
    np.testing.assert_allclose(total, 0.0, atol=max(fscale, 1.0) * 1e-4)
