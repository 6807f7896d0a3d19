"""Implicit viscosity (Weiler et al. 2018 — beyond-reference: upstream
only has the conditionally-stable explicit Müller term)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import nereus_tpu as nt
from nereus_tpu import grid as G
from nereus_tpu.params import SimConfig, calibrate_mass, dfsph_params
from nereus_tpu.solvers import common
from nereus_tpu.solvers.viscosity import implicit_viscosity_oracle
from nereus_tpu.state import make_fluid_state


def _blob(n=500, seed=2, viscosity=0.05):
    params = dfsph_params(viscosity=viscosity,
                          gravity=(0.0, 0.0, 0.0))
    h = float(params.interaction_radius)
    rng = np.random.RandomState(seed)
    side = h * (n / 2.0) ** (1 / 3)
    pos = rng.uniform(0.0, side, (n, 3))
    vel = rng.uniform(-1.0, 1.0, (n, 3))
    grid = G.fit_grid(pos.min(0) - h, pos.max(0) + h, h)
    return params, grid, make_fluid_state(pos, vel)


def test_cg_solves_the_viscous_system():
    """The returned velocity must actually satisfy
    (I − dt·ν∇²) v = v* to the configured relative residual."""
    cfg = SimConfig(engine="segments", viscosity_model="implicit")
    params, grid, state = _blob()
    ctx = common.build_ctx(state, grid, cfg, None)
    dens = common.compute_density(ctx, params, cfg, None)
    v_star = ctx.state.vel
    v_sol, iters, res = implicit_viscosity_oracle(
        ctx, params, cfg, None, dens, v_star)
    assert int(iters) > 0
    assert float(res) < cfg.visc_cg_tol
    # independent residual check through the same operator
    v2, it2, _ = implicit_viscosity_oracle(
        ctx, params, cfg, None, dens, v_sol)
    # applying the solve to an already-consistent field barely moves it
    assert float(jnp.max(jnp.abs(v2 - v_sol))) < \
        2.0 * float(jnp.max(jnp.abs(v_sol - v_star)))


def test_implicit_viscosity_engines_match():
    """Two DFSPH steps with the implicit viscosity solve: Pallas
    (interpret) vs the segments oracle."""
    from nereus_tpu.boundary import box_boundary
    from nereus_tpu.scene import particle_cube

    cfg_o = SimConfig(engine="segments", viscosity_model="implicit")
    cfg_p = dataclasses.replace(cfg_o, engine="pallas")
    # particle_radius = h/4 puts the lattice at 0.5h: ~26 in-radius
    # neighbors, so the viscous Laplacian is non-degenerate (at the
    # default 0.745h spacing only the 6 axis neighbors are in range and
    # dv.x_ij = 0 exactly for any lattice-aligned shear field)
    params = calibrate_mass(dfsph_params(viscosity=0.5, dt=5e-4,
                                         particle_radius=0.0537 / 4),
                            cfg_o)
    h = float(params.interaction_radius)
    sp = 2 * float(params.particle_radius)
    side = 9 * sp
    pos = particle_cube((0.25, 0.3, 0.25), (side,) * 3, sp)
    lo, hi = np.zeros(3), np.array((0.5, 0.8, 0.5))
    grid = G.fit_grid(lo - h, hi + h, h)
    boundary = box_boundary(grid, lo, hi, float(params.particle_radius),
                            params)
    vel = np.zeros_like(pos)
    vel[:, 0] = np.sin(2.0 * np.pi * (pos[:, 1] - 0.3) / side)
    s_o = s_p = make_fluid_state(pos, vel)
    for it in range(2):
        s_o, d_o = jax.jit(lambda s: nt.dfsph_step(
            s, params, grid, cfg_o, boundary))(s_o)
        s_p, d_p = jax.jit(lambda s: nt.dfsph_step(
            s, params, grid, cfg_p, boundary))(s_p)
        assert int(np.asarray(d_p.seg_overflow)) == 0
        np.testing.assert_allclose(np.sort(np.asarray(s_o.pos), axis=0),
                                   np.sort(np.asarray(s_p.pos), axis=0),
                                   rtol=2e-4, atol=2e-6,
                                   err_msg=f"step {it}")
        np.testing.assert_allclose(np.sort(np.asarray(s_o.vel), axis=0),
                                   np.sort(np.asarray(s_p.vel), axis=0),
                                   rtol=2e-3, atol=3e-4)


def test_sharded_implicit_viscosity_matches_single_chip():
    """8-slab CPU mesh DFSPH with the implicit viscosity CG (ghost
    velocities hop per matvec; ownership-masked psum dots) vs the
    single-chip step."""
    from jax.sharding import Mesh
    from nereus_tpu import scene
    from nereus_tpu.parallel import (ShardConfig, make_sharded_dfsph_step,
                                     shard_state, unshard_state)

    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    cfg = SimConfig(engine="pallas", viscosity_model="implicit")
    params = nt.dfsph_params(dt=5e-4, viscosity=0.5)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)
    n = int(state.num_active)
    # shear across z so the viscous CG has real work from step 1
    vel = np.zeros_like(np.asarray(state.pos))
    vel[:n, 0] = np.sin(
        4.0 * np.pi * np.asarray(state.pos[:n, 2]))
    state = dataclasses.replace(state, vel=jnp.asarray(vel))

    scfg = ShardConfig(n_shards=8, local_capacity=n, halo_capacity=512,
                       migration_capacity=256)
    sstate = shard_state(state, grid, scfg, mesh)
    sharded = make_sharded_dfsph_step(mesh, params, grid, cfg, scfg,
                                      boundary)

    @jax.jit
    def single(s):
        return nt.dfsph_step(s, params, grid, cfg, boundary)

    for it in range(2):
        state, d1 = single(state)
        sstate, dN = sharded(sstate)
        assert int(dN.num_active) == n
        assert int(dN.seg_overflow) == 0

        merged = unshard_state(sstate)

        def key(a):
            a = np.asarray(a)
            return np.lexsort((a[:, 2], a[:, 1], a[:, 0]))

        p1, pN = np.asarray(state.pos[:n]), np.asarray(merged.pos)
        k1, kN = key(p1), key(pN)
        np.testing.assert_allclose(pN[kN], p1[k1], rtol=0, atol=1e-5,
                                   err_msg=f"step {it}")
        np.testing.assert_allclose(
            np.asarray(merged.vel)[kN], np.asarray(state.vel[:n])[k1],
            rtol=0, atol=2e-4, err_msg=f"step {it}")


def test_wcsph_implicit_viscosity_engines_match_and_damp():
    """WCSPH with the implicit solve (the headline solver, not just
    DFSPH): oracle vs Pallas(interpret) agree, and ν = 100× default
    damps the shear KE at the unchanged dt (the explicit term's
    stability bound would be blown)."""
    from nereus_tpu.params import make_params
    from nereus_tpu.scene import particle_cube

    cfg_o = SimConfig(engine="segments", viscosity_model="implicit")
    cfg_p = dataclasses.replace(cfg_o, engine="pallas")
    params = calibrate_mass(
        make_params(viscosity=5.0, gravity=(0.0, 0.0, 0.0), dt=5e-4,
                    particle_radius=0.0537 / 4), cfg_o)
    h = float(params.interaction_radius)
    sp = 2 * float(params.particle_radius)
    side = 9 * sp
    pos = particle_cube((0.0, 0.0, 0.0), (side,) * 3, sp)
    vel = np.zeros_like(pos)
    vel[:, 0] = np.sin(2.0 * np.pi * pos[:, 1] / side)
    grid = G.fit_grid(pos.min(0) - h, pos.max(0) + h, h)
    s_o = s_p = make_fluid_state(pos, vel)
    step_o = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg_o, None))
    step_p = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg_p, None))
    ke0 = float(jnp.sum(s_o.vel ** 2))
    for it in range(4):
        s_o, d_o = step_o(s_o)
        s_p, d_p = step_p(s_p)
        assert int(np.asarray(d_p.seg_overflow)) == 0
        np.testing.assert_allclose(np.sort(np.asarray(s_o.pos), axis=0),
                                   np.sort(np.asarray(s_p.pos), axis=0),
                                   rtol=2e-4, atol=2e-6,
                                   err_msg=f"step {it}")
    assert np.isfinite(np.asarray(s_p.pos)).all()
    ke = float(jnp.sum(s_p.vel[:int(s_p.num_active)] ** 2))
    assert ke < 0.7 * ke0, (ke, ke0)


def test_high_viscosity_stable_and_damps():
    """ν = 100× the default on a rest-density lattice carrying a
    divergence-free shear field (the pressure solve stays quiet, so all
    dynamics is viscous): the implicit solve stays finite at the
    UNCHANGED dt and damps kinetic energy monotonically and faster than
    low ν — the honey regime the explicit term cannot integrate at this
    timestep."""
    from nereus_tpu.scene import particle_cube

    def run(viscosity, steps=12):
        cfg = SimConfig(engine="pallas", viscosity_model="implicit")
        # 0.5h lattice sampling — see test_implicit_viscosity_engines_match
        params = calibrate_mass(
            dfsph_params(viscosity=viscosity, gravity=(0.0, 0.0, 0.0),
                         dt=5e-4, particle_radius=0.0537 / 4), cfg)
        h = float(params.interaction_radius)
        sp = 2 * float(params.particle_radius)
        side = 12 * sp
        pos = particle_cube((0.0, 0.0, 0.0), (side,) * 3, sp)
        # shear: vx = sin(2π y / side) — divergence-free, so the
        # incompressibility loops have (almost) nothing to correct
        vel = np.zeros_like(pos)
        vel[:, 0] = np.sin(2.0 * np.pi * pos[:, 1] / side)
        grid = G.fit_grid(pos.min(0) - h, pos.max(0) + h, h)
        state = make_fluid_state(pos, vel)
        step = jax.jit(lambda s: nt.dfsph_step(s, params, grid, cfg,
                                               None))
        ke = [float(jnp.sum(state.vel ** 2))]
        for _ in range(steps):
            state, d = step(state)
            ke.append(float(jnp.sum(
                state.vel[:int(state.num_active)] ** 2)))
        assert np.isfinite(np.asarray(state.pos)).all()
        return ke

    ke_low = run(0.05)
    ke_high = run(5.0)
    assert ke_high[-1] < 0.2 * ke_high[0], ke_high[-1] / ke_high[0]
    assert ke_high[-1] < ke_low[-1]
    # monotone decay (viscosity only removes kinetic energy here: no
    # gravity, no walls)
    assert all(b <= a * 1.001 for a, b in zip(ke_high, ke_high[1:]))
