"""Elastic solids (total-Lagrangian corrected SPH, beyond-reference —
upstream simulates fluids only): exactness on affine deformations (rigid
rotation → zero force, uniform stretch → analytic StVK stress), momentum
conservation, oracle↔Pallas lockstep, and physical stories (free
oscillation, damped cantilever sag)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nereus_tpu as nt
from nereus_tpu.params import SimConfig, make_params
from nereus_tpu.solvers import elastic as EL


def _bar(cfg, nx=8, ny=4, nz=4, fixed_x0=False):
    """Small rubber bar; spacing = h/2 (~33 reference neighbors)."""
    params = make_params(dt=1e-4, gravity=(0.0, 0.0, 0.0))
    h = float(np.asarray(params.interaction_radius))
    sp = 0.5 * h
    pos = EL.sample_box_solid(
        (0.0, 0.0, 0.0), ((nx - 1) * sp, (ny - 1) * sp, (nz - 1) * sp), sp)
    fixed = pos[:, 0] < 0.5 * sp if fixed_x0 else None
    ep = nt.elastic_params(1e5, 0.3, damping=0.0)
    state, statics, grid = nt.make_elastic_solid(pos, params, cfg, sp,
                                                 fixed=fixed)
    return state, statics, params, ep, grid


@pytest.fixture(scope="module")
def oracle_bar():
    cfg = SimConfig(engine="segments", seg_window=64)
    return cfg, _bar(cfg)


def test_plan_exact_and_correction_wellposed(oracle_bar):
    cfg, (state, statics, params, ep, grid) = oracle_bar
    assert int(statics.miss) == 0
    # interior correction matrices are ~symmetric-positive-ish and finite;
    # rest F must be exactly reconstructible: V·raw(X)·C = I
    raw = EL._f_gradient_oracle(statics, statics.x0, params, grid, cfg)
    f = jnp.einsum("nab,nbc->nac",
                   statics.vol * raw.reshape(statics.n, 3, 3), statics.corr)
    err = np.abs(np.asarray(f) - np.eye(3)).max()
    assert err < 1e-4, err


def test_rest_state_is_equilibrium(oracle_bar):
    cfg, (state, statics, params, ep, grid) = oracle_bar
    s = state
    step = jax.jit(lambda s: nt.elastic_step(s, statics, params, ep,
                                             grid, cfg))
    for _ in range(20):
        s, diag = step(s)
    drift = np.abs(np.asarray(s.pos) - np.asarray(statics.x0)).max()
    h = float(np.asarray(params.interaction_radius))
    assert drift < 2e-3 * h, drift
    assert float(diag.elastic_energy) < 1e-8


def test_rigid_rotation_gives_zero_force(oracle_bar):
    """F = R exactly on affine maps (corrected gradients), E = 0 under
    StVK → elastic force 0; hourglass error is exactly affine-blind."""
    cfg, (state, statics, params, ep, grid) = oracle_bar
    r = np.asarray(nt.rotation_matrix(np.array([0.0, 0.0, 1.0]),
                                      np.deg2rad(30.0)))
    com = np.asarray(statics.x0).mean(0)
    rot = (np.asarray(statics.x0) - com) @ r.T + com
    s = dataclasses.replace(state, pos=jnp.asarray(rot, statics.x0.dtype))
    s2, diag = nt.elastic_step(s, statics, params, ep, grid, cfg)
    # velocities after one step measure the net acceleration; calibrate
    # the "zero" bound against a real 1% stretch of the same body
    vmax_rot = float(jnp.max(jnp.abs(s2.vel)))
    stretched = np.asarray(statics.x0) * np.array([1.01, 1.0, 1.0])
    s3, _ = nt.elastic_step(
        dataclasses.replace(state,
                            pos=jnp.asarray(stretched, statics.x0.dtype)),
        statics, params, ep, grid, cfg)
    vmax_stretch = float(jnp.max(jnp.abs(s3.vel)))
    assert vmax_rot < 1e-3 * vmax_stretch, (vmax_rot, vmax_stretch)
    assert float(diag.elastic_energy) < 1e-8


def test_uniform_stretch_matches_analytic_stvk(oracle_bar):
    cfg, (state, statics, params, ep, grid) = oracle_bar
    eps = 0.03
    stretched = np.asarray(statics.x0) * np.array([1.0 + eps, 1.0, 1.0])
    s = dataclasses.replace(state,
                            pos=jnp.asarray(stretched, statics.x0.dtype))
    raw = EL._f_gradient_oracle(statics, s.pos, params, grid, cfg)
    f = jnp.einsum("nab,nbc->nac",
                   statics.vol * raw.reshape(statics.n, 3, 3), statics.corr)
    f_ref = np.diag([1.0 + eps, 1.0, 1.0])
    assert np.abs(np.asarray(f) - f_ref).max() < 1e-3
    # analytic StVK energy density for this F
    e_ref = 0.5 * (f_ref.T @ f_ref - np.eye(3))
    mu, lam = float(ep.mu), float(ep.lam)
    psi = mu * (e_ref * e_ref).sum() + 0.5 * lam * np.trace(e_ref) ** 2
    _, diag = nt.elastic_step(s, statics, params, ep, grid, cfg)
    u_ref = psi * float(statics.vol) * statics.n
    assert abs(float(diag.elastic_energy) - u_ref) < 1e-2 * u_ref
    # restoring: the +x face accelerates back toward −x
    s2, _ = nt.elastic_step(s, statics, params, ep, grid, cfg)
    x0c = np.asarray(statics.x0)[:, 0]
    sp = 0.5 * float(np.asarray(params.interaction_radius))
    face = x0c > x0c.max() - 0.4 * sp
    assert face.any()
    assert float(np.asarray(s2.vel)[face, 0].mean()) < 0.0


def test_momentum_conserved_and_oscillation_bounded(oracle_bar):
    cfg, (state, statics, params, ep, grid) = oracle_bar
    eps = 0.02
    s = dataclasses.replace(
        state, pos=jnp.asarray(np.asarray(statics.x0)
                               * np.array([1.0 + eps, 1.0, 1.0]),
                               statics.x0.dtype))
    step = jax.jit(lambda s: nt.elastic_step(s, statics, params, ep,
                                             grid, cfg))
    u0 = None
    for k in range(150):
        s, diag = step(s)
        if u0 is None:
            u0 = float(diag.elastic_energy)
        assert np.isfinite(np.asarray(s.pos)).all()
    v = np.asarray(s.vel, np.float64)
    mom = np.abs(v.sum(0)).max()
    assert mom < 1e-4 * np.abs(v).sum(), (mom, np.abs(v).sum())
    # energy bounded by the initial strain energy (symplectic wobble aside)
    assert float(diag.elastic_energy) < 2.0 * u0
    # it moved (this is a real oscillation, not a frozen state)
    assert float(diag.max_speed) > 0.0


def test_damped_stretch_relaxes_to_rest(oracle_bar):
    cfg, (state, statics, params, ep, grid) = oracle_bar
    ep_d = dataclasses.replace(ep, damping=jnp.asarray(80.0, jnp.float32))
    eps = 0.02
    s = dataclasses.replace(
        state, pos=jnp.asarray(np.asarray(statics.x0)
                               * np.array([1.0 + eps, 1.0, 1.0]),
                               statics.x0.dtype))
    step = jax.jit(lambda s: nt.elastic_step(s, statics, params, ep_d,
                                             grid, cfg))
    _, d0 = step(s)
    for _ in range(600):
        s, diag = step(s)
    assert float(diag.elastic_energy) < 0.1 * float(d0.elastic_energy)


def test_cantilever_sags_under_gravity():
    cfg = SimConfig(engine="segments", seg_window=64)
    state, statics, params, ep, grid = _bar(cfg, nx=10, ny=3, nz=3,
                                            fixed_x0=True)
    params = dataclasses.replace(
        params, gravity=jnp.asarray([0.0, -9.81, 0.0], jnp.float32))
    ep = dataclasses.replace(ep, damping=jnp.asarray(40.0, jnp.float32))
    step = jax.jit(lambda s: nt.elastic_step(s, statics, params, ep,
                                             grid, cfg))
    s = state
    for _ in range(500):
        s, diag = step(s)
        assert np.isfinite(np.asarray(s.pos)).all()
    x0 = np.asarray(statics.x0)
    sp = 0.5 * float(np.asarray(params.interaction_radius))
    tip = x0[:, 0] > x0[:, 0].max() - 0.4 * sp
    root = x0[:, 0] < 0.4 * sp
    assert tip.any() and root.any()
    root_y = x0[root][:, 1].mean()
    tip_y = np.asarray(s.pos)[tip, 1].mean()
    # the tip sags below the root but the bar holds (elastic, not fluid)
    assert tip_y < root_y - 1e-4
    assert tip_y > root_y - x0[:, 0].max()  # did not collapse straight down
    # fixed particles never moved
    rooted = x0[:, 0] < 1e-9
    assert np.abs(np.asarray(s.pos)[rooted] - x0[rooted]).max() == 0.0


def test_dropped_cube_bounces_on_strain_energy():
    """A soft cube dropped on the penalty-spring floor flattens, stores
    strain energy, and rebounds — restitution emerges from elasticity
    alone — with the total energy bounded by the initial potential (the
    spring is conservative; a position-projection floor measurably pumped
    energy, and an under-sized oracle seg_window grows rest noise
    exponentially — both former bugs this test guards)."""
    cfg = SimConfig(engine="segments", seg_window=64)
    params = make_params(dt=1e-4, gravity=(0.0, -9.81, 0.0))
    h = float(np.asarray(params.interaction_radius))
    sp = 0.5 * h
    drop = 0.05
    pos = EL.sample_box_solid((0.0, drop, 0.0),
                              (5 * sp, 5 * sp + drop, 5 * sp), sp)
    ep = nt.elastic_params(2e5, 0.3, floor_y=0.0)
    state, statics, grid = nt.make_elastic_solid(pos, params, cfg, sp)
    step = jax.jit(lambda s: nt.elastic_step(s, statics, params, ep,
                                             grid, cfg))
    s = state
    m = float(statics.mass)

    def total_energy(s, diag):
        v = np.asarray(s.vel, np.float64)
        y = np.asarray(s.pos, np.float64)[:, 1]
        return (0.5 * m * (v * v).sum() + m * 9.81 * y.sum()
                + float(diag.elastic_energy))

    min_y, max_u, rebound_v, e0 = 1e9, 0.0, 0.0, None
    touched = False
    for k in range(1200):
        s, diag = step(s)
        if e0 is None:
            e0 = total_energy(s, diag)
        y = float(jnp.min(s.pos[:, 1]))
        min_y = min(min_y, y)
        if y <= 1e-6:
            touched = True
        if touched:
            max_u = max(max_u, float(diag.elastic_energy))
            rebound_v = max(rebound_v,
                            float(jnp.mean(s.vel[:, 1])))
        assert np.isfinite(np.asarray(s.pos)).all()
    assert touched
    assert min_y >= -0.5 * sp, min_y       # at most shallow penetration
    assert max_u > 0.0                     # impact stored strain energy
    # the body as a whole moved back UP after contact (a real bounce:
    # mean vertical velocity turns positive)
    assert rebound_v > 0.05, rebound_v
    # no energy injection: conservative spring + conservative elasticity
    assert total_energy(s, diag) < 1.1 * e0, (total_energy(s, diag), e0)


def test_oracle_pallas_lockstep():
    cfg_o = SimConfig(engine="segments", seg_window=64)
    cfg_p = SimConfig(engine="pallas", seg_window=64)
    state, statics, params, ep, grid = _bar(cfg_o)
    state_p, statics_p, grid_p = nt.make_elastic_solid(
        np.asarray(statics.x0), params, cfg_p,
        0.5 * float(np.asarray(params.interaction_radius)), grid=grid)
    assert int(statics_p.miss) == 0
    np.testing.assert_allclose(np.asarray(statics_p.corr),
                               np.asarray(statics.corr), atol=1e-5)
    eps = 0.02
    stretched = jnp.asarray(np.asarray(statics.x0)
                            * np.array([1.0 + eps, 1.0, 1.0]),
                            statics.x0.dtype)
    so = dataclasses.replace(state, pos=stretched)
    sp_ = dataclasses.replace(state_p, pos=stretched)
    for _ in range(3):
        so, do = nt.elastic_step(so, statics, params, ep, grid, cfg_o)
        sp_, dp = nt.elastic_step(sp_, statics_p, params, ep, grid_p, cfg_p)
    np.testing.assert_allclose(np.asarray(sp_.pos), np.asarray(so.pos),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sp_.vel), np.asarray(so.vel),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(float(dp.elastic_energy),
                               float(do.elastic_energy), rtol=1e-3)


def test_tank_box_walls_contain_sliding_cube():
    """A cube sliding +x in zero gravity hits the tank's AABB side wall
    (the same conservative penalty spring as the floor, on all 6 faces),
    stays inside, and bounces back — with total energy bounded (the wall
    spring must not pump, exactly like the floor)."""
    cfg = SimConfig(engine="segments", seg_window=64)
    params = make_params(dt=1e-4, gravity=(0.0, 0.0, 0.0))
    h = float(np.asarray(params.interaction_radius))
    sp = 0.5 * h
    pos = EL.sample_box_solid((0.0, 0.0, 0.0), (4 * sp, 4 * sp, 4 * sp),
                              sp)
    wall_x = 4 * sp + 0.03
    ep = nt.elastic_params(2e5, 0.3,
                           box_lo=(-1.0, -1.0, -1.0),
                           box_hi=(wall_x, 1.0, 1.0))
    state, statics, grid = nt.make_elastic_solid(pos, params, cfg, sp)
    v0 = 1.0
    state = dataclasses.replace(
        state, vel=jnp.broadcast_to(jnp.array([v0, 0.0, 0.0]),
                                    state.vel.shape).astype(state.vel.dtype))
    step = jax.jit(lambda s: nt.elastic_step(s, statics, params, ep,
                                             grid, cfg))
    m = float(statics.mass)
    n = state.pos.shape[0]
    e0 = 0.5 * m * n * v0 * v0
    max_x, vx_min = -1e9, 1e9
    for _ in range(1500):
        state, diag = step(state)
        assert np.isfinite(np.asarray(state.pos)).all()
        max_x = max(max_x, float(jnp.max(state.pos[:, 0])))
        vx_min = min(vx_min, float(jnp.mean(state.vel[:, 0])))
        v = np.asarray(state.vel, np.float64)
        e = 0.5 * m * (v * v).sum() + float(diag.elastic_energy)
        assert e < 1.1 * e0 + 1e-9, e
    assert max_x > wall_x - 1e-6            # it reached the wall
    assert max_x < wall_x + 2 * sp          # shallow penetration only
    assert vx_min < -0.2 * v0               # and bounced back


def test_elastic_plan_escalates_window_width():
    """The lifetime-static elastic plan must COVER every reference pair:
    with a deliberately tiny SimConfig window the builder escalates the
    width until coverage is exact (statics.miss == 0, statics.win
    records the widened width), instead of silently dropping pairs
    (truncation breaks force antisymmetry — the exponential rest-noise
    failure)."""
    cfg = nt.SimConfig(engine="pallas", sweep_win=128)
    params = make_params(dt=1e-4, gravity=(0.0, 0.0, 0.0))
    h = float(np.asarray(params.interaction_radius))
    sp = 0.5 * h
    pts = nt.sample_box_solid((0, 0, 0), (11.1 * sp, 11.1 * sp, 11.1 * sp),
                              sp)
    state, statics, grid = nt.make_elastic_solid(pts, params, cfg, sp)
    assert int(np.asarray(statics.miss)) == 0
    assert statics.win >= 256, statics.win
    # and the widened plan actually drives a healthy step
    ep = nt.elastic_params(1e5, 0.3, damping=0.0)
    import jax
    s2, d = jax.jit(lambda s: nt.elastic_step(
        s, statics, params, ep, grid, cfg))(state)
    assert int(np.asarray(d.seg_overflow)) == 0
    assert np.isfinite(np.asarray(s2.pos)).all()
