"""Two-way fluid–elastic coupling (beyond-reference): Newton's third law
across the fluid↔body contact (total momentum conserved), buoyancy
(light bodies float where heavy ones sink), and oracle↔Pallas lockstep."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import nereus_tpu as nt
from nereus_tpu.boundary import box_boundary
from nereus_tpu.params import SimConfig, calibrate_mass, make_params
from nereus_tpu.scene import particle_cube
from nereus_tpu.solvers import elastic as EL

CFG = SimConfig(engine="segments", seg_window=64)


def _free_space_scene(cfg):
    """A fluid blob flying +x into a soft cube, no gravity, no walls —
    every force is an internal pair force, so total momentum is exact."""
    params = make_params(gravity=(0.0, 0.0, 0.0))
    h = float(np.asarray(params.interaction_radius))
    r = float(params.particle_radius)
    blob = particle_cube((0.15, 0.2, 0.2), (0.1, 0.1, 0.1), 2 * r)
    sp = 0.5 * h
    cube = EL.sample_box_solid((0.27, 0.15, 0.15),
                               (0.27 + 3 * sp, 0.15 + 3 * sp,
                                0.15 + 3 * sp), sp)
    lo = np.array((0.0, 0.0, 0.0))
    hi = np.array((0.6, 0.4, 0.4))
    grid = nt.fit_grid(lo - h, hi + h, h)
    state = nt.make_fluid_state(blob)
    state = dataclasses.replace(
        state, vel=jnp.broadcast_to(jnp.array([1.5, 0.0, 0.0]),
                                    state.vel.shape).astype(state.vel.dtype))
    ep = nt.elastic_params(1e4, 0.3)
    estate, statics, _ = nt.make_elastic_solid(np.asarray(cube), params,
                                               cfg, sp, grid=grid)
    psi = nt.elastic_psi(statics, params, cfg)
    return params, grid, state, estate, statics, ep, psi


def _momentum(state, estate, statics, params):
    n = int(state.num_active)
    pf = float(np.asarray(params.particle_mass)) * \
        np.asarray(state.vel, np.float64)[:n].sum(0)
    pb = float(np.asarray(statics.mass)) * \
        np.asarray(estate.vel, np.float64).sum(0)
    return pf + pb


def test_total_momentum_conserved_across_contact():
    params, grid, state, estate, statics, ep, psi = _free_space_scene(CFG)
    step = jax.jit(lambda s, e: nt.wcsph_elastic_step(
        s, params, grid, CFG, e, statics, ep, psi, None, substeps=2))
    p0 = _momentum(state, estate, statics, params)
    hit = False
    for k in range(40):
        state, estate, diag = step(state, estate)
        assert np.isfinite(np.asarray(state.pos)).all()
        assert np.isfinite(np.asarray(estate.pos)).all()
        if float(jnp.max(jnp.abs(estate.vel))) > 1e-4:
            hit = True
    assert hit, "the blob never touched the body"
    p1 = _momentum(state, estate, statics, params)
    scale = abs(p0).max()
    assert abs(p1 - p0).max() < 2e-3 * scale, (p0, p1)
    # the body actually picked up momentum from the impact (+x push)
    assert float(estate.vel[:, 0].mean()) > 0.0


def _tank_scene(cfg, density):
    # pool on the resting-block recipe: 0.8h lattice, mass calibrated AT
    # that spacing, two-spacing wall standoff (seeding against the wall
    # reads ~2rho0 and ejects particles — a scene failure, not a solver
    # property)
    params0 = make_params()
    h = float(np.asarray(params0.interaction_radius))
    r = float(params0.particle_radius)
    spf = 0.8 * h
    params = calibrate_mass(params0, cfg, spacing=spf)
    ext = np.array([0.35, 0.12, 0.35])
    pool = particle_cube((2 * spf + ext[0] / 2, 2 * spf + ext[1] / 2,
                          2 * spf + ext[2] / 2), ext, spf)
    lo = np.zeros(3)
    hi = np.array([ext[0] + 4 * spf, 0.8, ext[2] + 4 * spf])
    grid = nt.fit_grid(lo - h, hi + h, h)
    walls = box_boundary(grid, lo, hi, r, params)
    state = nt.make_fluid_state(pool)
    settle = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg, walls))
    for _ in range(120):
        state, _d = settle(state)
    surf = float(np.quantile(np.asarray(state.pos)
                             [:int(state.num_active), 1], 0.995))
    sp = 0.5 * h
    y0 = surf + 1.0 * sp
    cube = EL.sample_box_solid((0.16, y0, 0.16),
                               (0.16 + 3 * sp, y0 + 3 * sp,
                                0.16 + 3 * sp), sp)
    ep = nt.elastic_params(1e4, 0.3, damping=5.0, floor_y=0.0)
    estate, statics, _ = nt.make_elastic_solid(
        np.asarray(cube), params, cfg, sp, grid=grid, density=density)
    psi = nt.elastic_psi(statics, params, cfg)
    return params, grid, walls, state, estate, statics, ep, psi, surf


def _run_tank(density, steps=300):
    params, grid, walls, state, estate, statics, ep, psi, surf = \
        _tank_scene(CFG, density)
    step = jax.jit(lambda s, e: nt.wcsph_elastic_step(
        s, params, grid, CFG, e, statics, ep, psi, walls, substeps=4))
    for _ in range(steps):
        state, estate, diag = step(state, estate)
        assert np.isfinite(np.asarray(estate.pos)).all()
        assert np.isfinite(np.asarray(state.pos)).all()
    return float(estate.pos[:, 1].mean()), estate, surf


def test_light_body_floats_heavy_body_sinks():
    y_light, es_l, surf = _run_tank(density=200.0)
    y_heavy, es_h, _ = _run_tank(density=4000.0)
    # same start, same fluid: the heavy body ends well below the light
    # one, and the light one is still riding near the surface
    assert y_heavy < y_light - 0.02, (y_light, y_heavy)
    assert y_light > 0.6 * surf, (y_light, surf)
    # and neither left the tank or blew up
    for es in (es_l, es_h):
        y = np.asarray(es.pos)[:, 1]
        assert y.min() > -0.01 and y.max() < 0.6


def test_oracle_pallas_lockstep():
    cfg_p = SimConfig(engine="pallas", seg_window=64)
    params, grid, state, estate, statics, ep, psi = _free_space_scene(CFG)
    _, _, state_p, estate_p, statics_p, _, psi_p = _free_space_scene(cfg_p)
    np.testing.assert_allclose(np.asarray(psi), np.asarray(psi_p),
                               rtol=1e-6)
    for _ in range(2):
        state, estate, do = nt.wcsph_elastic_step(
            state, params, grid, CFG, estate, statics, ep, psi, None,
            substeps=2)
        state_p, estate_p, dp = nt.wcsph_elastic_step(
            state_p, params, grid, cfg_p, estate_p, statics_p, ep, psi_p,
            None, substeps=2)
    # fluid comes back hash-sorted in both engines — same order
    np.testing.assert_allclose(np.asarray(state_p.pos),
                               np.asarray(state.pos), atol=2e-6)
    np.testing.assert_allclose(np.asarray(estate_p.pos),
                               np.asarray(estate.pos), atol=2e-6)
    np.testing.assert_allclose(np.asarray(estate_p.vel),
                               np.asarray(estate.vel), atol=1e-3)


def test_sharded_elastic_matches_single_chip():
    """2-slab sharded fluid–elastic coupling ↔ single-chip Pallas: the
    psum'd per-sample reaction (ghost rows parked in the reverse-sweep
    source so owned fluid contributes exactly once) must reproduce the
    single-chip trajectory across slab boundaries, fluid AND body."""
    from jax.sharding import Mesh

    from nereus_tpu.parallel import (ShardConfig,
                                     make_sharded_wcsph_elastic_step,
                                     shard_state, unshard_state)

    cfg = SimConfig(engine="pallas", seg_window=64)
    params, grid, state, estate, statics, ep, psi = _free_space_scene(cfg)
    # a -z drift so fluid actually crosses the z slab boundary (the blob
    # straddles it) while the +x flight drives it into the body
    vel = np.array(state.vel)
    n = int(state.num_active)
    vel[:n, 2] = -0.25
    state = dataclasses.replace(state, vel=jnp.asarray(vel))

    mesh = Mesh(np.array(jax.devices()[:2]), ("shards",))
    scfg = ShardConfig(n_shards=2, local_capacity=n + 64,
                       halo_capacity=256, migration_capacity=128)
    sstate = shard_state(state, grid, scfg, mesh)
    step_sh = make_sharded_wcsph_elastic_step(
        mesh, params, grid, cfg, scfg, statics, ep, psi, None, substeps=2)
    step_1 = jax.jit(lambda s, e: nt.wcsph_elastic_step(
        s, params, grid, cfg, e, statics, ep, psi, None, substeps=2))

    es1, esN = estate, estate
    for it in range(25):
        state, es1, d1 = step_1(state, es1)
        sstate, esN, dN = step_sh(sstate, esN)
        assert int(dN.num_active) == n, it
        assert int(dN.seg_overflow) == 0, it
        assert int(dN.migration_overflow) == 0, it
        assert int(dN.halo_overflow) == 0, it

    merged = unshard_state(sstate)

    def canon(s, m):
        p = np.asarray(s.pos, np.float64)[:m]
        v = np.asarray(s.vel, np.float64)[:m]
        o = np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
        return p[o], v[o]

    po, vo = canon(state, n)
    ps, vs = canon(merged, int(merged.num_active))
    np.testing.assert_allclose(ps, po, atol=1e-5)
    np.testing.assert_allclose(vs, vo, atol=1e-4)
    # the body (statics order is engine-invariant) matches too, and it
    # actually picked up momentum from the impact — the reaction really
    # crossed the mesh
    np.testing.assert_allclose(np.asarray(esN.pos), np.asarray(es1.pos),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(esN.vel), np.asarray(es1.vel),
                               atol=1e-4)
    assert float(jnp.max(jnp.abs(es1.vel))) > 1e-4, "blob never hit"
    assert float(esN.vel[:, 0].mean()) > 0.0
