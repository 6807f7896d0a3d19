"""PBF (Position Based Fluids, Macklin & Müller 2013 — beyond-reference:
upstream's newest solver is IISPH; its PCISPH is an empty stub,
sph/pcisph/sph_cuda.cu:944-952): oracle↔Pallas lockstep and the canonical
dam-settle physics story on the frozen-neighborhood contract."""

import dataclasses

import jax
import numpy as np

import nereus_tpu as nt
from nereus_tpu import grid as G
from nereus_tpu.boundary import box_boundary
from nereus_tpu.params import SimConfig, calibrate_mass, pbf_params
from nereus_tpu.scene import particle_cube
from nereus_tpu.state import make_fluid_state


def _settle_scene(nside=9):
    cfg = SimConfig(engine="segments")
    params = calibrate_mass(pbf_params(dt=1e-3), cfg)
    h = float(params.interaction_radius)
    sp = 2 * float(params.particle_radius)
    side = nside * sp
    pos = particle_cube((0.25, 0.3, 0.25), (side, side, side), sp)
    lo, hi = np.zeros(3), np.array((0.5, 0.8, 0.5))
    grid = G.fit_grid(lo - h, hi + h, h)
    boundary = box_boundary(grid, lo, hi, float(params.particle_radius),
                            params)
    state = make_fluid_state(pos)
    return cfg, params, grid, boundary, state


import pytest


@pytest.mark.parametrize("extras", [
    {},
    dict(xsph_eps=0.02, vorticity_eps=0.01),
])
def test_pbf_pallas_matches_oracle(extras):
    """Three full steps: Pallas (interpret) vs the segments oracle, same
    frozen-neighborhood iteration — per-particle states must track
    (including the XSPH + vorticity-confinement post-passes)."""
    cfg_o, params, grid, boundary, state = _settle_scene(nside=7)
    cfg_p = dataclasses.replace(cfg_o, engine="pallas")
    s_o, s_p = state, state
    for it in range(3):
        s_o, d_o = jax.jit(lambda s: nt.pbf_step(
            s, params, grid, cfg_o, boundary, **extras))(s_o)
        s_p, d_p = jax.jit(lambda s: nt.pbf_step(
            s, params, grid, cfg_p, boundary, **extras))(s_p)
        assert int(np.asarray(d_p.seg_overflow)) == 0
        np.testing.assert_allclose(np.sort(np.asarray(s_o.pos), axis=0),
                                   np.sort(np.asarray(s_p.pos), axis=0),
                                   rtol=2e-4, atol=2e-6,
                                   err_msg=f"step {it}")
        np.testing.assert_allclose(np.sort(np.asarray(s_o.vel), axis=0),
                                   np.sort(np.asarray(s_p.vel), axis=0),
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(float(d_o.max_density),
                                   float(d_p.max_density), rtol=1e-4)


def test_pbf_dam_settle():
    """Free fall obeys ½gt² (positions are projected only under
    compression), impact engages the constraint, the fluid lands and
    stays above the floor with bounded compression — at dt 1e-3, 2×
    the WCSPH timestep, PBF's selling point."""
    cfg, params, grid, boundary, state = _settle_scene()
    cfg = dataclasses.replace(cfg, engine="pallas")
    dt = float(params.dt)
    step = jax.jit(lambda s: nt.pbf_step(s, params, grid, cfg, boundary))
    y0 = float(np.asarray(state.pos[:, 1].min()))
    maxcomp = 0.0
    for i in range(200):
        state, diag = step(state)
        maxcomp = max(maxcomp, float(np.asarray(diag.mean_compression)))
        if i == 29:
            ymin = float(np.asarray(state.pos[:, 1]).min())
            drop = y0 - ymin
            want = 0.5 * 9.81 * (30 * dt) ** 2
            # scorr acts even in free fall (anti-clustering inflates the
            # cube edges slightly — measured 1.4× on the edge-most
            # particle at the default k; exactly 1.0× at k=0)
            assert want * 0.7 < drop < want * 1.75, (drop, want)
    p = np.asarray(state.pos)
    act = int(np.asarray(state.num_active))
    assert np.isfinite(p[:act]).all()
    assert p[:act, 1].min() > 0.0, "floor penetration"
    assert maxcomp < 0.05, maxcomp
    assert int(np.asarray(diag.seg_overflow)) == 0
    # settled: velocities damp out to near rest
    v = np.asarray(state.vel[:act])
    assert np.abs(v).max() < 1.5, np.abs(v).max()


def test_pbf_xsph_smooths():
    """XSPH smoothing reduces the velocity spread of a splashy impact
    without blowing anything up."""
    cfg, params, grid, boundary, state = _settle_scene(nside=7)
    cfg = dataclasses.replace(cfg, engine="pallas")
    step0 = jax.jit(lambda s: nt.pbf_step(s, params, grid, cfg, boundary))
    step1 = jax.jit(lambda s: nt.pbf_step(s, params, grid, cfg, boundary,
                                          xsph_eps=0.05))
    s0, s1 = state, state
    for _ in range(120):
        s0, _ = step0(s0)
        s1, d1 = step1(s1)
    act = int(np.asarray(state.num_active))
    v0 = np.asarray(s0.vel[:act])
    v1 = np.asarray(s1.vel[:act])
    assert np.isfinite(v1).all()
    assert v1.std() < v0.std()
