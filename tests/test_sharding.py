"""Multi-chip domain sharding: 1-chip vs 8-shard equivalence (SURVEY §4.4).

Runs the same dam-break scene through the single-chip ``wcsph_step`` and the
8-virtual-device slab-sharded step and compares particle sets per step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import nereus_tpu as nt
from nereus_tpu import scene
from nereus_tpu.parallel import (ShardConfig, make_sharded_wcsph_step,
                                 shard_state, unshard_state)


def _sorted_by_pos(pos, vel):
    key = np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
    return pos[key], vel[key]


@pytest.fixture(scope="module")
def mesh():
    devices = np.array(jax.devices()[:8])
    return Mesh(devices, ("shards",))


@pytest.mark.parametrize("with_boundary", [False, True])
def test_sharded_matches_single_chip(mesh, with_boundary):
    cfg = nt.SimConfig(seg_window=32, boundary_seg_window=32)
    params = nt.make_params(dt=5e-4)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.3, 0.3, 0.3),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=with_boundary, boundary_radius=0.04)
    n = int(state.num_active)
    assert n > 200

    scfg = ShardConfig(n_shards=8, local_capacity=n, halo_capacity=512,
                       migration_capacity=256)
    sstate = shard_state(state, grid, scfg, mesh)
    sharded_step = make_sharded_wcsph_step(mesh, params, grid, cfg, scfg,
                                           boundary)

    @jax.jit
    def single_step(s):
        return nt.wcsph_step(s, params, grid, cfg, boundary)

    for it in range(5):
        state, diag1 = single_step(state)
        sstate, diagN = sharded_step(sstate)

        assert int(diagN.num_active) == n
        assert int(diagN.migration_violation) == 0
        assert int(diagN.halo_overflow) == 0
        assert int(diagN.migration_overflow) == 0
        assert int(diagN.capacity_overflow) == 0
        assert int(diagN.seg_overflow) == 0, it
        assert int(diag1.seg_overflow) == 0, it

        merged = unshard_state(sstate)
        p1 = np.asarray(state.pos[:n])
        v1 = np.asarray(state.vel[:n])
        pN = np.asarray(merged.pos)
        vN = np.asarray(merged.vel)
        p1s, v1s = _sorted_by_pos(p1, v1)
        pNs, vNs = _sorted_by_pos(pN, vN)
        np.testing.assert_allclose(pNs, p1s, rtol=0, atol=5e-5,
                                   err_msg=f"step {it} positions")
        np.testing.assert_allclose(vNs, v1s, rtol=0, atol=5e-3,
                                   err_msg=f"step {it} velocities")
        np.testing.assert_allclose(
            float(diagN.mean_density_error), float(diag1.mean_density_error),
            rtol=1e-3, atol=1e-5)


def test_migration_across_slabs(mesh):
    """A particle stream moving along +z must cross slab boundaries and keep
    the global count constant with zero violations."""
    cfg = nt.SimConfig(seg_window=32)
    params = nt.make_params(gravity=(0.0, 0.0, 0.0), dt=1e-3)
    # 16 mutually non-interacting particles (spacing > h): they advect
    # ballistically at constant velocity.
    pts = np.stack([
        np.zeros(16), np.zeros(16),
        np.linspace(0.05, 0.62, 16)], axis=-1)
    state = nt.make_fluid_state(pts)
    grid = nt.fit_grid((-0.5, -0.5, 0.0), (0.5, 0.5, 1.0),
                       float(params.interaction_radius))
    state = nt.FluidState(pos=state.pos,
                          vel=jnp.full_like(state.vel, 0.0).at[:, 2].set(5.0),
                          pressure=state.pressure,
                          num_active=state.num_active)

    scfg = ShardConfig(n_shards=8, local_capacity=64, halo_capacity=64,
                       migration_capacity=64)
    sstate = shard_state(state, grid, scfg, mesh)
    step = make_sharded_wcsph_step(mesh, params, grid, cfg, scfg, None)

    counts0 = np.asarray(sstate.num_active).copy()
    for _ in range(40):
        sstate, diag = step(sstate)
        assert int(diag.num_active) == 16
        assert int(diag.migration_violation) == 0
        assert int(diag.migration_overflow) == 0
    counts1 = np.asarray(sstate.num_active)
    # The stream drifted toward +z: occupancy must have shifted shards.
    assert not np.array_equal(counts0, counts1)
