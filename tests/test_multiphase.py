"""Multiphase WCSPH (beyond-reference — upstream is strictly
single-phase): per-particle mass/ρ₀ columns, Solenthaler adapted
(number-density) densities, Hu–Adams volume-form pressure. Oracle ↔
Pallas lockstep, stratification physics, state plumbing, solver gates.

Scene notes: phases seed on ONE lattice at spacing s with m = m_cal·ρ₀/ρ₀_ref
(the same calibration factor as single-phase), so every particle starts at
exactly its own rest density — the adapted density's defining property.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nereus_tpu as nt
from nereus_tpu.boundary import box_boundary
from nereus_tpu.params import SurfaceTensionModel, calibrate_mass
from nereus_tpu.scene import particle_cube

ST_NONE = dict(surface_tension_model=SurfaceTensionModel.NONE)


def two_layer(ratio_bottom=1.0, ratio_top=0.4, jitter=0.05, seed=7,
              vel_y=0.0, side_cells=6, base_params=None):
    """Two stacked fluid layers in a tank (two-spacing wall standoff)."""
    base = base_params if base_params is not None else nt.make_params()
    spacing = 0.8 * float(base.interaction_radius)
    cfg = nt.SimConfig(engine="segments", **ST_NONE)
    params = calibrate_mass(base, cfg, spacing=spacing)
    pm = float(params.particle_mass)
    rd = float(params.rest_density)
    h = float(params.interaction_radius)
    side = side_cells * spacing
    bot = particle_cube((side / 2 + 2 * spacing,) * 3, (side,) * 3, spacing)
    pos = np.concatenate([bot, bot + np.array([0.0, side + spacing, 0.0])])
    rng = np.random.default_rng(seed)
    pos = pos + rng.uniform(-jitter, jitter, pos.shape) * spacing
    n1 = len(bot)
    rho0 = np.concatenate([np.full(n1, rd * ratio_bottom),
                           np.full(len(pos) - n1, rd * ratio_top)])
    mass = pm * rho0 / rd
    lo = np.zeros(3)
    hi = np.array([side + 4 * spacing, 3 * side, side + 4 * spacing])
    grid = nt.fit_grid(lo - h, hi + h, h)
    walls = box_boundary(grid, lo, hi, float(params.particle_radius), params)
    vels = np.tile([0.0, vel_y, 0.0], (len(pos), 1))
    state = nt.make_fluid_state(pos, velocities=vels, masses=mass,
                                rest_densities=rho0)
    return state, params, grid, walls, pm


def canon(state, n):
    p = np.asarray(state.pos)[:n]
    order = np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
    return (p[order], np.asarray(state.vel)[:n][order],
            np.asarray(state.mass)[:n][order])


def test_multiphase_engines_match():
    """Oracle ↔ Pallas lockstep from a wall-contacting state: settle with
    the oracle until the floor is inside h of the lowest particle (the
    boundary density column, β and friction all live), then one step per
    engine from the SAME state."""
    state, params, grid, walls, pm = two_layer(vel_y=-1.0)
    n = int(state.num_active)
    h = float(params.interaction_radius)
    cfg_o = nt.SimConfig(engine="segments", **ST_NONE)
    cfg_p = nt.SimConfig(engine="pallas", **ST_NONE)
    step_o = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg_o, walls))
    step_p = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg_p, walls))
    for i in range(40):
        state, _ = step_o(state)
        if float(np.asarray(state.pos)[:n, 1].min()) < 0.85 * h:
            break
    assert float(np.asarray(state.pos)[:n, 1].min()) < h, \
        "scene never reached wall contact — test setup broken"
    so, do = step_o(state)
    sp, dp = step_p(state)
    po, vo, mo = canon(so, n)
    pp, vp, mp = canon(sp, n)
    np.testing.assert_allclose(po, pp, atol=1e-6)
    np.testing.assert_allclose(vo, vp, atol=1e-4)
    np.testing.assert_array_equal(mo, mp)   # phase columns ride the sorts
    np.testing.assert_allclose(float(do.mean_density_error),
                               float(dp.mean_density_error), rtol=1e-5)
    np.testing.assert_allclose(float(do.max_density),
                               float(dp.max_density), rtol=1e-5)
    assert int(do.seg_overflow) == 0 and int(dp.seg_overflow) == 0


def test_multiphase_stratified_stays_stratified():
    """Light-on-heavy is a STABLE configuration: 400 steps of settling
    keep the phases ordered, in the tank, and each phase near its own
    rest density (per-particle-normalized diagnostics)."""
    state, params, grid, walls, pm = two_layer()
    n = int(state.num_active)
    cfg = nt.SimConfig(engine="segments", **ST_NONE)
    step = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg, walls))
    for i in range(400):
        state, diag = step(state)
        assert int(diag.seg_overflow) == 0, i
    p = np.asarray(state.pos)[:n]
    m = np.asarray(state.mass)[:n]
    heavy = m > 0.5 * pm
    assert np.isfinite(p).all()
    assert p[:, 1].min() > 0.0, "fluid fell through the floor"
    assert p[heavy, 1].mean() < p[~heavy, 1].mean(), \
        "stable stratification overturned"
    # the compression-side error settles to a few percent (WCSPH under
    # its own weight), identically normalized for both phases
    assert float(diag.mean_compression) < 0.2


def test_multiphase_inverted_overturns():
    """Heavy-on-light is UNSTABLE (Rayleigh–Taylor): the phase means must
    SWAP. The ratio-4 breakthrough is violent at the reference's fixed dt
    (interface jets exceed CFL and some particles eject) — this test
    asserts the physics discriminator (order swap + finiteness), not
    containment; the stable-configuration test above asserts containment.
    """
    state, params, grid, walls, pm = two_layer(ratio_bottom=0.25,
                                               ratio_top=1.0, seed=3)
    n = int(state.num_active)
    cfg = nt.SimConfig(engine="segments", **ST_NONE)
    step = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg, walls))
    for i in range(250):
        state, diag = step(state)
    p = np.asarray(state.pos)[:n]
    m = np.asarray(state.mass)[:n]
    heavy = m > 0.5 * pm
    assert np.isfinite(p).all()
    assert p[heavy, 1].mean() < p[~heavy, 1].mean(), \
        "heavy phase failed to sink below the light phase"


def test_multiphase_state_plumbing():
    """mass/rho0 ride every state operation: build, add (traced and
    host), remove (variadic sort), checkpoint roundtrip."""
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 1, (40, 3))
    mass = np.linspace(0.01, 0.02, 40)
    rho0 = np.linspace(500, 1000, 40)
    s = nt.make_fluid_state(pos, capacity=64, masses=mass,
                            rest_densities=rho0)
    assert s.multiphase
    np.testing.assert_allclose(np.asarray(s.mass)[:40], mass, rtol=1e-6)

    s2 = nt.add_particles(s, rng.uniform(0, 1, (4, 3)),
                          masses=0.03, rest_densities=1500.0)
    assert int(s2.num_active) == 44
    np.testing.assert_allclose(np.asarray(s2.mass)[40:44], 0.03)
    np.testing.assert_allclose(np.asarray(s2.rho0)[40:44], 1500.0)

    # traced add inherits the first particle's phase
    s3, ovf = nt.add_particles_traced(s2, rng.uniform(0, 1, (3, 3)))
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(s3.mass)[44:47],
                               float(mass[0]), rtol=1e-6)

    # remove keeps each survivor's own phase
    keep = np.asarray(s2.pos)[:, 0] < 0.5
    s4 = nt.remove_particles(s2, keep)
    nkeep = int(s4.num_active)
    m_expect = np.sort(np.asarray(s2.mass)[np.nonzero(
        keep & np.asarray(s2.active_mask()))[0]])
    np.testing.assert_allclose(np.sort(np.asarray(s4.mass)[:nkeep]),
                               m_expect, rtol=1e-6)

    # mixed usage refuses cleanly
    s_single = nt.make_fluid_state(pos, capacity=64)
    with pytest.raises(ValueError):
        nt.add_particles(s_single, pos[:2], masses=0.01,
                         rest_densities=500.0)
    with pytest.raises(ValueError):
        nt.make_fluid_state(pos, masses=mass)   # rho0 missing


def test_multiphase_checkpoint_roundtrip(tmp_path):
    from nereus_tpu.utils import load_checkpoint, save_checkpoint

    rng = np.random.default_rng(1)
    s = nt.make_fluid_state(rng.uniform(0, 1, (30, 3)), capacity=32,
                            masses=np.full(30, 0.02),
                            rest_densities=np.full(30, 800.0))
    path = str(tmp_path / "mp.npz")
    save_checkpoint(path, s, step=5)
    loaded, header = load_checkpoint(path)
    assert loaded.multiphase
    np.testing.assert_array_equal(np.asarray(loaded.mass),
                                  np.asarray(s.mass))
    np.testing.assert_array_equal(np.asarray(loaded.rho0),
                                  np.asarray(s.rho0))


def two_layer_dfsph(**kw):
    """two_layer with DFSPH-calibrated params (same scene geometry)."""
    return two_layer(base_params=nt.dfsph_params(), **kw)


def test_dfsph_multiphase_reduces_to_single_phase():
    """Uniform phase columns (m_i = m, ρ0_i = ρ₀) must reproduce the
    single-phase DFSPH step: the adapted-domain formulation reduces
    EXACTLY (the carried κ̂ differs by the factor ρ, the applied velocity
    changes are identical — see the derivation block in solvers/dfsph.py).
    10 free-fall + contact steps, same iteration counts, same
    trajectories to f32 op-order noise."""
    base = nt.dfsph_params()
    sp = 0.8 * float(base.interaction_radius)
    cfg = nt.SimConfig(engine="segments", **ST_NONE)
    params = calibrate_mass(base, cfg, spacing=sp)
    pm = float(params.particle_mass)
    rd = float(params.rest_density)
    h = float(params.interaction_radius)
    side = 5 * sp
    pos = particle_cube((side / 2 + 2 * sp,) * 3, (side,) * 3, sp)
    n = len(pos)
    lo = np.zeros(3)
    hi = np.array([side + 4 * sp, 2.5 * side, side + 4 * sp])
    grid = nt.fit_grid(lo - h, hi + h, h)
    walls = box_boundary(grid, lo, hi, float(params.particle_radius),
                         params)
    s1 = nt.make_fluid_state(pos)
    s2 = nt.make_fluid_state(pos, masses=pm, rest_densities=rd)
    step = jax.jit(lambda s: nt.dfsph_step(s, params, grid, cfg, walls))
    for i in range(10):
        s1, d1 = step(s1)
        s2, d2 = step(s2)
        assert int(d1.solver_iters) == int(d2.solver_iters), i
    np.testing.assert_allclose(np.asarray(s2.pos)[:n],
                               np.asarray(s1.pos)[:n], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.vel)[:n],
                               np.asarray(s1.vel)[:n], atol=1e-4)
    np.testing.assert_allclose(float(d2.mean_density_error),
                               float(d1.mean_density_error), atol=1e-6)


def test_dfsph_multiphase_engines_match():
    """Oracle ↔ Pallas lockstep for the multiphase DFSPH step from a
    wall-contacting two-phase state."""
    state, params, grid, walls, pm = two_layer_dfsph(vel_y=-1.0)
    cfg_o = nt.SimConfig(engine="segments", **ST_NONE)
    cfg_p = nt.SimConfig(engine="pallas", **ST_NONE)
    n = int(state.num_active)
    h = float(params.interaction_radius)
    step_o = jax.jit(lambda s: nt.dfsph_step(s, params, grid, cfg_o, walls))
    step_p = jax.jit(lambda s: nt.dfsph_step(s, params, grid, cfg_p, walls))
    for i in range(40):
        state, _ = step_o(state)
        if float(np.asarray(state.pos)[:n, 1].min()) < 0.85 * h:
            break
    assert float(np.asarray(state.pos)[:n, 1].min()) < h, \
        "scene never reached wall contact — test setup broken"
    so, do = step_o(state)
    sp_, dp = step_p(state)
    po, vo, mo = canon(so, n)
    pp, vp, mp = canon(sp_, n)
    np.testing.assert_allclose(po, pp, atol=1e-6)
    np.testing.assert_allclose(vo, vp, atol=1e-4)
    np.testing.assert_array_equal(mo, mp)
    assert int(do.solver_iters) == int(dp.solver_iters)
    np.testing.assert_allclose(float(do.mean_density_error),
                               float(dp.mean_density_error), atol=1e-5)
    assert int(do.seg_overflow) == 0 and int(dp.seg_overflow) == 0


def test_dfsph_multiphase_stratified_incompressible():
    """Two-phase DFSPH: light-on-heavy stays ordered AND incompressible —
    the solver holds each phase at its OWN rest density (clamped mean
    error ≤ 0.1%), where weakly-compressible multiphase reads percent-
    level compression under the same load."""
    state, params, grid, walls, pm = two_layer_dfsph()
    n = int(state.num_active)
    cfg = nt.SimConfig(engine="segments", **ST_NONE)
    step = jax.jit(lambda s: nt.dfsph_step(s, params, grid, cfg, walls))
    for i in range(300):
        state, diag = step(state)
        assert int(diag.seg_overflow) == 0, i
    p = np.asarray(state.pos)[:n]
    m = np.asarray(state.mass)[:n]
    heavy = m > 0.5 * pm
    assert np.isfinite(p).all()
    assert p[:, 1].min() > 0.0, "fluid fell through the floor"
    assert p[heavy, 1].mean() < p[~heavy, 1].mean(), \
        "stable stratification overturned"
    assert float(diag.mean_density_error) < 1e-3, \
        "incompressibility lost (clamped mean error above 0.1%)"


def test_sharded_multiphase_matches_single_chip():
    """2-slab sharded multiphase (Pallas interpret) ↔ single-chip oracle:
    the phase columns must ride the migration sorts/buffers and the
    derived (V, p·V²) ghost hop must reproduce the single-chip forces
    bit-closely across slab boundaries."""
    from jax.sharding import Mesh

    from nereus_tpu.parallel import (ShardConfig, make_sharded_wcsph_step,
                                     shard_state, unshard_state)

    state, params, grid, walls, pm = two_layer(vel_y=-0.5)
    # push the fluid across the z slab boundary too so phase columns
    # actually migrate between shards during the test
    vel = np.array(state.vel)
    vel[: int(state.num_active), 2] = -0.4
    state = dataclasses.replace(state, vel=jnp.asarray(vel))
    n = int(state.num_active)

    # BECKER phase-pair cohesion ON: the ρ₀ phase key must ride the
    # derived ghost hop and reproduce single-chip κ_eff across slabs
    cfg_o = nt.SimConfig(engine="segments", st_cross=0.25, **ST_BECKER)
    cfg_p = nt.SimConfig(engine="pallas", st_cross=0.25, **ST_BECKER)
    mesh = Mesh(np.array(jax.devices()[:2]), ("shards",))
    scfg = ShardConfig(n_shards=2, local_capacity=n + 64,
                       halo_capacity=256, migration_capacity=128)
    sstate = shard_state(state, grid, scfg, mesh)
    step_sh = make_sharded_wcsph_step(mesh, params, grid, cfg_p, scfg,
                                      walls, multiphase=True)
    step_1 = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg_o,
                                             walls))
    for it in range(4):
        state, d1 = step_1(state)
        sstate, dN = step_sh(sstate)
        assert int(dN.num_active) == n, it
        assert int(dN.seg_overflow) == 0, it
        assert int(dN.migration_overflow) == 0, it
        merged = unshard_state(sstate)
        po, vo, mo = canon(state, n)
        ps, vs, ms = canon(merged, int(merged.num_active))
        np.testing.assert_allclose(ps, po, atol=1e-5, err_msg=f"step {it}")
        np.testing.assert_allclose(vs, vo, atol=1e-4, err_msg=f"step {it}")
        np.testing.assert_array_equal(ms, mo)
    # particles crossed the slab boundary at least once
    # (counts change ⇒ migration really ran with the phase columns)
    np.testing.assert_allclose(float(dN.mean_density_error),
                               float(d1.mean_density_error), rtol=1e-4)


ST_BECKER = dict(surface_tension_model=SurfaceTensionModel.BECKER)


def test_multiphase_becker_reduces_to_single_phase():
    """Uniform phase columns + BECKER must reproduce the single-phase
    WCSPH BECKER step exactly (κ_eff = κ for every pair at any st_cross;
    the volume-form pressure/viscosity reduction was already enforced) —
    10 free-fall + contact steps."""
    base = nt.make_params()
    sp = 0.8 * float(base.interaction_radius)
    cfg = nt.SimConfig(engine="segments", st_cross=0.3, **ST_BECKER)
    params = calibrate_mass(base, cfg, spacing=sp)
    pm = float(params.particle_mass)
    rd = float(params.rest_density)
    h = float(params.interaction_radius)
    side = 5 * sp
    pos = particle_cube((side / 2 + 2 * sp,) * 3, (side,) * 3, sp)
    n = len(pos)
    lo = np.zeros(3)
    hi = np.array([side + 4 * sp, 2.5 * side, side + 4 * sp])
    grid = nt.fit_grid(lo - h, hi + h, h)
    walls = box_boundary(grid, lo, hi, float(params.particle_radius),
                         params)
    s1 = nt.make_fluid_state(pos)
    s2 = nt.make_fluid_state(pos, masses=pm, rest_densities=rd)
    step = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg, walls))
    for i in range(10):
        s1, d1 = step(s1)
        s2, d2 = step(s2)
    np.testing.assert_allclose(np.asarray(s2.pos)[:n],
                               np.asarray(s1.pos)[:n], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.vel)[:n],
                               np.asarray(s1.vel)[:n], atol=1e-4)


def test_multiphase_st_engines_match():
    """Two-phase BECKER cohesion: oracle ↔ Pallas lockstep from a
    wall-contacting state (the ρ₀ equality compare and the κ_eff blend
    must agree across engines), st_cross strictly between 0 and 1."""
    state, params, grid, walls, pm = two_layer(vel_y=-1.0)
    n = int(state.num_active)
    h = float(params.interaction_radius)
    cfg_o = nt.SimConfig(engine="segments", st_cross=0.25, **ST_BECKER)
    cfg_p = nt.SimConfig(engine="pallas", st_cross=0.25, **ST_BECKER)
    step_o = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg_o, walls))
    step_p = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg_p, walls))
    for i in range(40):
        state, _ = step_o(state)
        if float(np.asarray(state.pos)[:n, 1].min()) < 0.85 * h:
            break
    so, do = step_o(state)
    sp, dp = step_p(state)
    po, vo, mo = canon(so, n)
    pp, vp, mp = canon(sp, n)
    np.testing.assert_allclose(po, pp, atol=1e-6)
    np.testing.assert_allclose(vo, vp, atol=1e-4)
    np.testing.assert_array_equal(mo, mp)
    assert int(do.seg_overflow) == 0 and int(dp.seg_overflow) == 0


def test_multiphase_st_cross_controls_mixing_force():
    """st_cross really is the cross-phase knob: with a two-phase contact
    interface, the net ST acceleration on interface particles must
    differ between st_cross=0 and st_cross=1, and st_cross=1 must equal
    a phase-blind (single-phase-κ) run of the same positions."""
    state, params, grid, walls, pm = two_layer(jitter=0.0)
    cfg0 = nt.SimConfig(engine="segments", st_cross=0.0, **ST_BECKER)
    cfg1 = nt.SimConfig(engine="segments", st_cross=1.0, **ST_BECKER)
    s0, _ = nt.wcsph_step(state, params, grid, cfg0, walls)
    s1, _ = nt.wcsph_step(state, params, grid, cfg1, walls)
    dv0 = np.asarray(s0.vel) - np.asarray(state.vel)
    dv1 = np.asarray(s1.vel) - np.asarray(state.vel)
    assert np.abs(dv0 - dv1).max() > 1e-9, \
        "st_cross had no effect at a phase interface"
    # phase-blind at st_cross=1: swap in uniform rho0 columns but keep
    # masses — the ST term must match a (same-mass) single-κ pairing
    rd = float(params.rest_density)
    cap = state.capacity
    blind = dataclasses.replace(
        state, rho0=jnp.full((cap,), rd, np.asarray(state.rho0).dtype))
    # NOTE: changing rho0 also changes pressure/EOS — compare ONLY the
    # ST term by differencing against the ST_NONE step at each config
    cfgn = nt.SimConfig(engine="segments", **ST_NONE)
    sn, _ = nt.wcsph_step(state, params, grid, cfgn, walls)
    sbn, _ = nt.wcsph_step(blind, params, grid, cfgn, walls)
    sb1, _ = nt.wcsph_step(blind, params, grid, cfg1, walls)
    st_two = np.asarray(s1.vel) - np.asarray(sn.vel)
    st_blind = np.asarray(sb1.vel) - np.asarray(sbn.vel)
    np.testing.assert_allclose(st_two, st_blind, atol=1e-6)


def test_sharded_dfsph_multiphase_matches_single_chip():
    """2-slab sharded multiphase DFSPH ↔ single-chip (Pallas interpret):
    both stiffness while_loops must iterate in lockstep (psum'd means)
    and the derived ghost hops (1/m_j once, κ_jV̂_j² per iteration) must
    reproduce the single-chip trajectories across slab boundaries."""
    from jax.sharding import Mesh

    from nereus_tpu.parallel import (ShardConfig, make_sharded_dfsph_step,
                                     shard_state, unshard_state)

    state, params, grid, walls, pm = two_layer_dfsph(vel_y=-0.5)
    vel = np.array(state.vel)
    vel[: int(state.num_active), 2] = -0.4
    state = dataclasses.replace(state, vel=jnp.asarray(vel))
    n = int(state.num_active)

    # BECKER phase-pair cohesion rides the DFSPH advection ghost hop too
    cfg_p = nt.SimConfig(engine="pallas", st_cross=0.25, **ST_BECKER)
    mesh = Mesh(np.array(jax.devices()[:2]), ("shards",))
    scfg = ShardConfig(n_shards=2, local_capacity=n + 64,
                       halo_capacity=256, migration_capacity=128)
    sstate = shard_state(state, grid, scfg, mesh)
    step_sh = make_sharded_dfsph_step(mesh, params, grid, cfg_p, scfg,
                                      walls, multiphase=True)
    step_1 = jax.jit(lambda s: nt.dfsph_step(s, params, grid, cfg_p,
                                             walls))
    for it in range(4):
        state, d1 = step_1(state)
        sstate, dN = step_sh(sstate)
        assert int(dN.num_active) == n, it
        assert int(dN.seg_overflow) == 0, it
        assert int(dN.migration_overflow) == 0, it
        assert int(dN.solver_iters) == int(d1.solver_iters), it
        merged = unshard_state(sstate)
        po, vo, mo = canon(state, n)
        ps, vs, ms = canon(merged, int(merged.num_active))
        np.testing.assert_allclose(ps, po, atol=1e-5, err_msg=f"step {it}")
        np.testing.assert_allclose(vs, vo, atol=1e-4, err_msg=f"step {it}")
        np.testing.assert_array_equal(ms, mo)
    np.testing.assert_allclose(float(dN.mean_density_error),
                               float(d1.mean_density_error), rtol=1e-4)


def test_cli_second_phase(capsys):
    """--second-phase drives a two-phase dam-break end to end."""
    import json

    from nereus_tpu.app.cli import main as cli_main

    rc = cli_main(["run", "--solver", "wcsph", "--steps", "5",
                   "--neighbor-engine", "pallas",
                   "--surface-tension", "none",
                   "--second-phase", "0.4"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0
    # composes with --shards (sharded multiphase step)
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "3",
                   "--neighbor-engine", "pallas",
                   "--surface-tension", "none",
                   "--second-phase", "0.4", "--shards", "2"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0
    # DFSPH multiphase (incompressible two-phase), single-chip
    rc = cli_main(["run", "--solver", "dfsph", "--steps", "3",
                   "--neighbor-engine", "pallas",
                   "--surface-tension", "none",
                   "--second-phase", "0.4"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0
    # sharded multiphase DFSPH (incompressible two-phase over slabs)
    rc = cli_main(["run", "--solver", "dfsph", "--steps", "2",
                   "--neighbor-engine", "pallas",
                   "--surface-tension", "none", "--second-phase", "0.4",
                   "--shards", "2"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0
    # sharded multiphase is WCSPH/DFSPH-only
    assert cli_main(["run", "--solver", "pbf", "--steps", "2",
                     "--surface-tension", "none", "--second-phase", "0.4",
                     "--shards", "2"]) == 2
    capsys.readouterr()
    # the Becker ST default now composes (phase-pair cohesion); akinci
    # stays refused
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "2",
                   "--neighbor-engine", "pallas",
                   "--second-phase", "0.4", "--st-cross", "0.25"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0
    assert cli_main(["run", "--solver", "wcsph", "--steps", "2",
                     "--surface-tension", "akinci",
                     "--second-phase", "0.4"]) == 2
    capsys.readouterr()
    # composes with a rigid body (multiphase WCSPH rigid coupling)
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "3",
                   "--neighbor-engine", "pallas",
                   "--surface-tension", "none", "--second-phase", "0.4",
                   "--rigid-box", "0.25,0.6,0.25:0.1,0.1,0.1:200"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0
    # ... composes SHARDED too (replicated body, psum'd reaction) ...
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "2",
                   "--neighbor-engine", "pallas",
                   "--surface-tension", "none", "--second-phase", "0.4",
                   "--shards", "2",
                   "--rigid-box", "0.25,0.6,0.25:0.1,0.1,0.1:200"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0
    # ... and with DFSPH single-chip (multiphase Gauss-Seidel coupling)
    rc = cli_main(["run", "--solver", "dfsph", "--steps", "2",
                   "--neighbor-engine", "pallas",
                   "--surface-tension", "none", "--second-phase", "0.4",
                   "--rigid-box", "0.25,0.6,0.25:0.1,0.1,0.1:200"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0
    # sharded multiphase coupling stays WCSPH-only
    assert cli_main(["run", "--solver", "dfsph", "--steps", "2",
                     "--surface-tension", "none", "--second-phase", "0.4",
                     "--shards", "2",
                     "--rigid-box", "0.2,0.2,0.2:0.1,0.1,0.1:200"]) == 2
    capsys.readouterr()


def test_multiphase_gates():
    """Every non-WCSPH solver (and the single-phase-only WCSPH extras)
    refuses multiphase states explicitly instead of silently dropping
    the phase columns."""
    state, params, grid, walls, pm = two_layer(side_cells=4)
    cfg = nt.SimConfig(engine="segments", **ST_NONE)

    for fn in (nt.iisph_step, nt.pbf_step):
        with pytest.raises(NotImplementedError):
            fn(state, params, grid, cfg, walls)
    # DFSPH *supports* multiphase (incl. BECKER phase-pair cohesion) —
    # but not the single-phase-only extras (AKINCI ST / implicit visc)
    with pytest.raises(NotImplementedError):
        nt.dfsph_step(state, params, grid,
                      nt.SimConfig(
                          engine="segments",
                          surface_tension_model=SurfaceTensionModel.AKINCI),
                      walls)
    with pytest.raises(NotImplementedError):
        nt.dfsph_step(state, params, grid,
                      nt.SimConfig(engine="segments",
                                   viscosity_model="implicit", **ST_NONE),
                      walls)
    with pytest.raises(NotImplementedError):
        nt.wcsph_step(state, params, grid,
                      nt.SimConfig(
                          engine="segments",
                          surface_tension_model=SurfaceTensionModel.AKINCI),
                      walls)
    with pytest.raises(NotImplementedError):
        nt.pcisph_step(state, params, grid, cfg, walls,
                       delta=nt.pcisph_delta(params, cfg))
    # (round 5: both rigid couplings now ACCEPT multiphase — their
    # remaining refusals are asserted in test_multiphase_coupled.py)
    with pytest.raises(NotImplementedError):
        nt.wcsph_step(state, params, grid, cfg, walls, xsph_eps=0.1)
    # Becker ST default now COMPOSES with multiphase (phase-pair
    # cohesion); AKINCI stays refused — asserted in test_multiphase_gates
    cfg_iv = nt.SimConfig(engine="segments", viscosity_model="implicit",
                          **ST_NONE)
    with pytest.raises(NotImplementedError):
        nt.wcsph_step(state, params, grid, cfg_iv, walls)
    from jax.sharding import Mesh
    from nereus_tpu.parallel import (ShardConfig, make_sharded_iisph_step,
                                     make_sharded_wcsph_step, shard_state)
    mesh = Mesh(np.array(jax.devices()[:1]), ("shards",))
    scfg = ShardConfig(n_shards=1, local_capacity=4096)
    sstate = shard_state(state, grid, scfg, mesh)
    assert sstate.multiphase          # columns ride the distribution
    cfg_pal = nt.SimConfig(engine="pallas", **ST_NONE)
    with pytest.raises(NotImplementedError):   # non-WCSPH sharded refuses
        make_sharded_iisph_step(mesh, params, grid, cfg_pal, scfg,
                                walls)(sstate)
    with pytest.raises(ValueError):   # single-phase-built step refuses
        make_sharded_wcsph_step(mesh, params, grid, cfg, scfg,
                                walls)(sstate)
    cfg_ak = nt.SimConfig(
        engine="segments",
        surface_tension_model=SurfaceTensionModel.AKINCI)
    with pytest.raises(NotImplementedError):   # AKINCI single-phase-only
        make_sharded_wcsph_step(mesh, params, grid, cfg_ak, scfg, walls,
                                multiphase=True)
