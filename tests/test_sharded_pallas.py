"""Sharded step with the Pallas engine (interpret mode) vs single-chip."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import nereus_tpu as nt
from nereus_tpu import scene
from nereus_tpu.parallel import (ShardConfig, make_sharded_wcsph_step,
                                 shard_state, unshard_state)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("shards",))


def test_sharded_pallas_matches_single_chip(mesh):
    cfg = nt.SimConfig(engine="pallas")
    cfg_seg = nt.SimConfig(engine="segments")
    params = nt.make_params(dt=5e-4)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.3, 0.3, 0.3), cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)
    n = int(state.num_active)

    scfg = ShardConfig(n_shards=8, local_capacity=n, halo_capacity=512,
                       migration_capacity=256)
    sstate = shard_state(state, grid, scfg, mesh)
    step_pal = make_sharded_wcsph_step(mesh, params, grid, cfg, scfg,
                                       boundary)

    @jax.jit
    def single(s):
        return nt.wcsph_step(s, params, grid, cfg_seg, boundary)

    for it in range(3):
        state, d1 = single(state)
        sstate, dN = step_pal(sstate)
        assert int(dN.num_active) == n
        assert int(dN.seg_overflow) == 0, it

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
            rtol=0, atol=1e-4, err_msg=f"step {it}")


def test_sharded_iisph_matches_single_chip(mesh):
    from nereus_tpu.parallel import make_sharded_iisph_step
    cfg = nt.SimConfig(engine="pallas")
    params = nt.iisph_params(dt=5e-4)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)
    n = int(state.num_active)

    scfg = ShardConfig(n_shards=8, local_capacity=n, halo_capacity=512,
                       migration_capacity=256)
    sstate = shard_state(state, grid, scfg, mesh)
    sharded = make_sharded_iisph_step(mesh, params, grid, cfg, scfg,
                                      boundary)

    @jax.jit
    def single(s):
        return nt.iisph_step(s, params, grid, cfg, boundary)

    for it in range(2):
        state, d1 = single(state)
        sstate, dN = sharded(sstate)
        assert int(dN.num_active) == n
        assert int(dN.seg_overflow) == 0
        assert int(dN.solver_iters) == int(d1.solver_iters), it

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
            rtol=0, atol=1e-4, err_msg=f"step {it}")
        np.testing.assert_allclose(float(dN.mean_density_error),
                                   float(d1.mean_density_error),
                                   rtol=1e-3, atol=1e-5)


def test_sharded_pcisph_matches_single_chip(mesh):
    from nereus_tpu.params import calibrate_mass
    from nereus_tpu.parallel import make_sharded_pcisph_step
    cfg = nt.SimConfig(engine="pallas")
    params = calibrate_mass(nt.pcisph_params(dt=5e-4), cfg)
    delta = nt.pcisph_delta(params, cfg)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)
    n = int(state.num_active)

    scfg = ShardConfig(n_shards=8, local_capacity=n, halo_capacity=512,
                       migration_capacity=256)
    sstate = shard_state(state, grid, scfg, mesh)
    sharded = make_sharded_pcisph_step(mesh, params, grid, cfg, scfg,
                                       boundary, delta=delta)

    @jax.jit
    def single(s):
        return nt.pcisph_step(s, params, grid, cfg, boundary, delta=delta)

    for it in range(2):
        state, d1 = single(state)
        sstate, dN = sharded(sstate)
        assert int(dN.num_active) == n
        assert int(dN.seg_overflow) == 0
        assert int(dN.solver_iters) == int(d1.solver_iters), it

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
            rtol=0, atol=1e-4, err_msg=f"step {it}")


def test_sharded_dfsph_matches_single_chip(mesh):
    from nereus_tpu.parallel import make_sharded_dfsph_step
    cfg = nt.SimConfig(engine="pallas")
    params = nt.dfsph_params(dt=5e-4)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)
    n = int(state.num_active)

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
        assert int(dN.solver_iters) == int(d1.solver_iters), it

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
            rtol=0, atol=1e-4, err_msg=f"step {it}")
        np.testing.assert_allclose(float(dN.mean_density_error),
                                   float(d1.mean_density_error),
                                   rtol=1e-3, atol=1e-5)


def test_sharded_dfsph_coupled_matches_single_chip(mesh):
    """Sharded DFSPH with a free rigid body (replicated body state,
    psum'd per-iteration reaction impulses) vs the single-chip coupled
    step — fluid AND body trajectories must agree."""
    from nereus_tpu.parallel import make_sharded_dfsph_coupled_step
    cfg = nt.SimConfig(engine="pallas")
    params = nt.dfsph_params(dt=2e-4)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)
    n = int(state.num_active)
    # body hovering just above the cube: its shell overlaps the fluid's
    # support from step 1, and it straddles several z-slabs
    body = nt.make_rigid_box((-0.3, 0.23, 0.5), (0.08, 0.08, 0.08),
                             float(params.particle_radius), 300.0, params)

    scfg = ShardConfig(n_shards=8, local_capacity=n, halo_capacity=512,
                       migration_capacity=256)
    sstate = shard_state(state, grid, scfg, mesh)
    sharded = make_sharded_dfsph_coupled_step(mesh, params, grid, cfg,
                                              scfg, boundary)

    @jax.jit
    def single(s, b):
        return nt.dfsph_coupled_step(s, params, grid, cfg, b, boundary)

    body1 = bodyN = body
    for it in range(2):
        state, body1, d1 = single(state, body1)
        sstate, bodyN, dN = sharded(sstate, bodyN)
        assert int(dN.num_active) == n
        assert int(dN.seg_overflow) == 0
        assert int(dN.solver_iters) == int(d1.solver_iters), it

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
        np.testing.assert_allclose(np.asarray(bodyN.com),
                                   np.asarray(body1.com), atol=1e-6)
        np.testing.assert_allclose(np.asarray(bodyN.vel),
                                   np.asarray(body1.vel), atol=2e-4)
        np.testing.assert_allclose(np.asarray(bodyN.omega),
                                   np.asarray(body1.omega), atol=2e-3)
    # the body must actually be coupled: a free-falling uncoupled body
    # would carry exactly −g·(2dt) — the dam-break seed's density spike
    # instead kicks it hard through the κ reaction
    g_only = -9.81 * 2 * float(params.dt)
    assert abs(float(body1.vel[1]) - g_only) > 1e-2


def test_sharded_moving_boundary_matches_single_chip(mesh):
    """Constant prescribed boundary velocities (conveyor) sharded:
    friction + rho_adv boundary terms must match the single-chip step."""
    import jax.numpy as jnp
    from nereus_tpu.boundary import move_boundary
    from nereus_tpu.parallel import make_sharded_iisph_step
    cfg = nt.SimConfig(engine="pallas")
    params = nt.iisph_params(dt=5e-4)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)
    boundary = move_boundary(boundary, grid,
                             velocity=jnp.asarray([0.6, 0.0, -0.3]))
    assert boundary.vel is not None
    n = int(state.num_active)

    scfg = ShardConfig(n_shards=8, local_capacity=n, halo_capacity=512,
                       migration_capacity=256)
    sstate = shard_state(state, grid, scfg, mesh)
    sharded = make_sharded_iisph_step(mesh, params, grid, cfg, scfg,
                                      boundary)

    @jax.jit
    def single(s):
        return nt.iisph_step(s, params, grid, cfg, boundary)

    for it in range(2):
        state, d1 = single(state)
        sstate, dN = sharded(sstate)
        assert int(dN.seg_overflow) == 0
        assert int(dN.solver_iters) == int(d1.solver_iters), it
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
            rtol=0, atol=1e-4, err_msg=f"step {it}")


def test_sharded_pbf_matches_single_chip(mesh):
    from nereus_tpu.parallel import make_sharded_pbf_step
    from nereus_tpu.params import calibrate_mass
    cfg = nt.SimConfig(engine="pallas")
    params = calibrate_mass(nt.pbf_params(dt=5e-4), cfg)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)
    n = int(state.num_active)

    scfg = ShardConfig(n_shards=8, local_capacity=n, halo_capacity=512,
                       migration_capacity=256)
    sstate = shard_state(state, grid, scfg, mesh)
    sharded = make_sharded_pbf_step(mesh, params, grid, cfg, scfg,
                                    boundary)

    @jax.jit
    def single(s):
        return nt.pbf_step(s, params, grid, cfg, boundary)

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
            rtol=0, atol=1e-4, err_msg=f"step {it}")
        np.testing.assert_allclose(float(dN.max_density),
                                   float(d1.max_density),
                                   rtol=1e-3, atol=1e-5)


def test_sharded_wcsph_coupled_matches_single_chip(mesh):
    """Sharded WCSPH with a free rigid body (replicated body, one psum'd
    explicit reaction per step) vs the single-chip coupled step — fluid
    AND body trajectories must agree."""
    from nereus_tpu.parallel import make_sharded_wcsph_coupled_step
    cfg = nt.SimConfig(engine="pallas")
    params = nt.make_params(dt=2e-4)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)
    n = int(state.num_active)
    body = nt.make_rigid_box((-0.3, 0.23, 0.5), (0.08, 0.08, 0.08),
                             float(params.particle_radius), 300.0, params)

    scfg = ShardConfig(n_shards=8, local_capacity=n, halo_capacity=512,
                       migration_capacity=256)
    sstate = shard_state(state, grid, scfg, mesh)
    sharded = make_sharded_wcsph_coupled_step(mesh, params, grid, cfg,
                                              scfg, boundary)

    @jax.jit
    def single(s, b):
        return nt.wcsph_coupled_step(s, params, grid, cfg, b, boundary)

    body1 = bodyN = body
    for it in range(3):
        state, body1, d1 = single(state, body1)
        sstate, bodyN, dN = sharded(sstate, bodyN)
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
        np.testing.assert_allclose(np.asarray(bodyN.com),
                                   np.asarray(body1.com), atol=1e-6)
        np.testing.assert_allclose(np.asarray(bodyN.vel),
                                   np.asarray(body1.vel), atol=2e-4)
        np.testing.assert_allclose(np.asarray(bodyN.omega),
                                   np.asarray(body1.omega), atol=2e-3)
    # coupled for real: free fall alone would read exactly −g·(3dt)
    assert abs(float(body1.vel[1]) + 9.81 * 3 * float(params.dt)) > 1e-3


def test_sharded_wcsph_coupled_multiphase_matches_single_chip(mesh):
    """The sharded multiphase coupled step (phase columns through
    migration, derived-ghost hops, multiphase_body_pair contact, psum'd
    reaction) vs the single-chip multiphase coupled step."""
    import jax.numpy as jnp

    from nereus_tpu.parallel import make_sharded_wcsph_coupled_step
    cfg = nt.SimConfig(engine="pallas",
                       surface_tension_model=nt.SurfaceTensionModel.NONE)
    params = nt.make_params(dt=2e-4)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)
    n = int(state.num_active)
    # top half (by y) at 0.4x rest density
    pos_h = np.asarray(state.pos)[:n]
    y_cut = np.quantile(pos_h[:, 1], 0.5)
    rd = float(np.asarray(params.rest_density))
    pm = float(np.asarray(params.particle_mass))
    rho0 = np.full(state.capacity, rd, np.float32)
    rho0[:n] = np.where(pos_h[:, 1] >= y_cut, rd * 0.4, rd)
    state = nt.FluidState(
        pos=state.pos, vel=state.vel, pressure=state.pressure,
        num_active=state.num_active,
        mass=jnp.asarray(rho0 * (pm / rd)), rho0=jnp.asarray(rho0))
    body = nt.make_rigid_box((-0.3, 0.23, 0.5), (0.08, 0.08, 0.08),
                             float(params.particle_radius), 300.0, params)

    scfg = ShardConfig(n_shards=8, local_capacity=n, halo_capacity=512,
                       migration_capacity=256)
    sstate = shard_state(state, grid, scfg, mesh)
    sharded = make_sharded_wcsph_coupled_step(mesh, params, grid, cfg,
                                              scfg, boundary,
                                              multiphase=True)

    @jax.jit
    def single(s, b):
        return nt.wcsph_coupled_step(s, params, grid, cfg, b, boundary)

    body1 = bodyN = body
    for it in range(3):
        state, body1, d1 = single(state, body1)
        sstate, bodyN, dN = sharded(sstate, bodyN)
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
            np.asarray(merged.mass)[kN], np.asarray(state.mass[:n])[k1],
            rtol=0, atol=0, err_msg="phase columns must ride migration")
        np.testing.assert_allclose(np.asarray(bodyN.com),
                                   np.asarray(body1.com), atol=1e-6)
        np.testing.assert_allclose(np.asarray(bodyN.vel),
                                   np.asarray(body1.vel), atol=2e-4)
