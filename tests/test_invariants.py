"""Physical invariants (SURVEY §4 item 3): with gravity off and no
boundaries, pairwise SPH forces are antisymmetric, so total momentum must
be conserved to accumulation-rounding accuracy — a strong whole-pipeline
check of force symmetry across both engines and all solvers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nereus_tpu as nt
from nereus_tpu import scene
from nereus_tpu.params import calibrate_mass


def _free_cube(params, cfg):
    state, grid, _ = scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25), cube_center=(0.0, 0.3, 0.5),
        box_min=(-0.6, -0.3, 0.0), box_max=(0.6, 0.9, 1.0),
        with_boundary=False)
    # asymmetric initial velocities so momentum is nonzero and flows mix
    n = int(state.num_active)
    rng = np.random.default_rng(0)
    vel = jnp.asarray(rng.normal(0, 0.5, (state.capacity, 3)),
                      state.vel.dtype)
    return nt.FluidState(pos=state.pos, vel=vel, pressure=state.pressure,
                         num_active=state.num_active), grid, n


@pytest.mark.parametrize("engine", ["segments", "pallas"])
@pytest.mark.parametrize("solver", ["wcsph", "iisph", "pcisph"])
def test_momentum_conserved_without_external_forces(engine, solver):
    cfg = nt.SimConfig(engine=engine,
                       surface_tension_model=nt.SurfaceTensionModel.BECKER)
    if solver == "pcisph":
        params = calibrate_mass(
            nt.pcisph_params(gravity=(0.0, 0.0, 0.0), dt=2e-4), cfg)
        delta = nt.pcisph_delta(params, cfg)
        stepf = lambda s, g: nt.pcisph_step(s, params, g, cfg, delta=delta)
    elif solver == "iisph":
        params = nt.iisph_params(gravity=(0.0, 0.0, 0.0), dt=2e-4)
        stepf = lambda s, g: nt.iisph_step(s, params, g, cfg)
    else:
        params = nt.make_params(gravity=(0.0, 0.0, 0.0), dt=2e-4)
        stepf = lambda s, g: nt.wcsph_step(s, params, g, cfg)

    state, grid, n = _free_cube(params, cfg)
    pm = float(params.particle_mass)
    p0 = pm * np.asarray(state.vel[:n]).sum(axis=0)
    step = jax.jit(lambda s: stepf(s, grid))
    for _ in range(15):
        state, diag = step(state)
    assert int(diag.seg_overflow) == 0
    p1 = pm * np.asarray(state.vel)[:n].sum(axis=0)
    # velocity scale ~0.5 m/s across ~300 particles: drift must be tiny
    scale = pm * 0.5 * n
    drift = np.abs(p1 - p0).max() / scale
    assert drift < 5e-5, (p0, p1, drift)
