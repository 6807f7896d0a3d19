"""Elastoplastic solids (beyond-reference — upstream simulates fluids
only): additive Green-strain plasticity with von Mises flow (O'Brien,
Bargteil & Hodgins 2002 §3) on the total-Lagrangian elastic solver.

Covers: exact reduction to the pure elastic solver at infinite yield,
the flow rule's invariants (deviatoric increments, radial return onto
the yield surface, the ``max_plastic`` cap), the physical story
(a squashed cube takes a permanent set where its elastic twin springs
back), oracle↔Pallas lockstep with active flow, and checkpoint
persistence of the accumulated plastic strain."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import nereus_tpu as nt
from nereus_tpu.params import SimConfig, make_params
from nereus_tpu.solvers import elastic as EL


def _cube(cfg, *, plastic, n=5, gravity=(0.0, 0.0, 0.0)):
    params = make_params(dt=2e-4, gravity=gravity)
    h = float(np.asarray(params.interaction_radius))
    sp = 0.5 * h
    side = (n - 1) * sp
    pos = EL.sample_box_solid((0.0, 0.0, 0.0), (side, side, side), sp)
    state, statics, grid = nt.make_elastic_solid(pos, params, cfg, sp,
                                                 plastic=plastic)
    return state, statics, params, grid, sp, side


def _squash_vel(statics, side, speed=2.0):
    """Downward ramp velocity field: top moves at -speed, bottom still."""
    y = statics.x0[:, 1]
    v = jnp.zeros_like(statics.x0)
    return v.at[:, 1].set(-speed * y / side)


def _run(state, statics, params, ep, grid, cfg, steps):
    @jax.jit
    def go(s):
        def body(_, c):
            return nt.elastic_step(c[0], statics, params, ep, grid, cfg)
        return jax.lax.fori_loop(
            0, steps - 1, body,
            nt.elastic_step(s, statics, params, ep, grid, cfg))
    return go(state)


def test_inf_yield_reduces_to_elastic_exactly():
    """A plastic-capable body with the default (infinite) yield strain
    must trace the pure elastic body bit-for-bit, and accumulate exactly
    zero plastic strain."""
    cfg = SimConfig(engine="segments", seg_window=64)
    se, statics, params, grid, sp, side = _cube(cfg, plastic=False)
    sp_, statics2, _, _, _, _ = _cube(cfg, plastic=True)
    v0 = _squash_vel(statics, side)
    se = dataclasses.replace(se, vel=v0)
    sp_ = dataclasses.replace(sp_, vel=v0)
    ep = nt.elastic_params(5e4, damping=2.0, floor_y=0.0)
    a, _ = _run(se, statics, params, ep, grid, cfg, 50)
    b, _ = _run(sp_, statics, params, ep, grid, cfg, 50)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))
    assert float(jnp.abs(b.plastic).max()) == 0.0


def test_flow_rule_invariants():
    """Direct unit test of :func:`plastic_flow`: increments are
    deviatoric (tr E_p = 0), an instantaneous return (ν·dt ≥ 1) lands
    the deviatoric elastic strain exactly on the yield surface, below
    yield nothing flows, and ``max_plastic`` caps ‖E_p‖."""
    ep = nt.elastic_params(1e5, yield_strain=0.05, creep=jnp.inf,
                           max_plastic=0.30)
    # a strain with volumetric + deviatoric parts, plus a sub-yield one
    e1 = jnp.array([[0.20, 0.03, 0.0], [0.03, -0.06, 0.0],
                    [0.0, 0.0, 0.01]], jnp.float32)
    e2 = 0.01 * jnp.eye(3, dtype=jnp.float32)      # pure volumetric
    e_tot = jnp.stack([e1, e2])
    p0 = jnp.zeros((2, 3, 3), jnp.float32)
    dt = jnp.asarray(1e-4, jnp.float32)
    e_el, p1 = EL.plastic_flow(e_tot, p0, ep, dt)
    # deviatoric flow: traceless plastic strain, volumetric part elastic
    assert float(jnp.abs(jnp.einsum("naa->n", p1)).max()) < 1e-6
    np.testing.assert_allclose(
        np.trace(np.asarray(e_el[0])), np.trace(np.asarray(e1)),
        rtol=1e-6)
    # radial return: ‖dev(E_el)‖ == γ_y for the yielding tensor
    dev = e_el[0] - jnp.trace(e_el[0]) / 3.0 * jnp.eye(3)
    mag = float(jnp.sqrt(jnp.sum(dev * dev)))
    np.testing.assert_allclose(mag, 0.05, rtol=1e-5)
    # below yield: untouched
    assert float(jnp.abs(p1[1]).max()) == 0.0
    np.testing.assert_array_equal(np.asarray(e_el[1]), np.asarray(e2))
    # cap: drive a huge strain through — ‖E_p‖ must stop at max_plastic
    # (the unconstrained return would flow ‖dev‖ − γ_y ≈ 0.93 ≫ 0.30)
    e_big = jnp.stack([5.0 * e1, e2])
    _, p2 = EL.plastic_flow(e_big, p1, ep, dt)
    pmag = float(jnp.sqrt(jnp.sum(p2[0] * p2[0])))
    assert pmag <= 0.30 * (1 + 1e-5), pmag
    assert pmag > 0.29, pmag
    # finite creep flows strictly less than the instantaneous return
    ep_slow = nt.elastic_params(1e5, yield_strain=0.05, creep=100.0)
    _, p_slow = EL.plastic_flow(e_tot, p0, ep_slow, dt)
    assert 0.0 < float(jnp.sqrt(jnp.sum(p_slow[0] ** 2))) < float(
        jnp.sqrt(jnp.sum(p1[0] ** 2)))


def test_squashed_cube_takes_permanent_set():
    """The physical story: two identical cubes get the same squash
    impulse against the floor; the elastic one springs back toward its
    rest shape, the plastic one keeps a permanent set."""
    cfg = SimConfig(engine="segments", seg_window=64)
    g = (0.0, -9.81, 0.0)  # gravity seats the cube on the floor spring
    se, statics, params, grid, sp, side = _cube(cfg, plastic=False,
                                                gravity=g)
    spl, *_ = _cube(cfg, plastic=True, gravity=g)
    v0 = _squash_vel(statics, side)
    se = dataclasses.replace(se, vel=v0)
    spl = dataclasses.replace(spl, vel=v0)
    ep_e = nt.elastic_params(5e4, damping=2.0, floor_y=0.0)
    ep_p = nt.elastic_params(5e4, damping=2.0, floor_y=0.0,
                             yield_strain=0.02)
    a, _ = _run(se, statics, params, ep_e, grid, cfg, 800)
    b, diag = _run(spl, statics, params, ep_p, grid, cfg, 800)

    def shape_res(s):  # COM-removed: measure deformation, not translation
        d = (s.pos - s.pos.mean(0)) - (statics.x0 - statics.x0.mean(0))
        return float(jnp.abs(d).max())

    res_e = shape_res(a)
    res_p = shape_res(b)
    # permanent deformation well beyond the (still ringing) elastic one
    assert res_p > 2.0 * res_e, (res_p, res_e)
    assert res_p > 0.5 * sp, res_p
    assert float(jnp.abs(b.plastic).max()) > 0.05
    # von Mises flow never changes volume plastically
    assert float(jnp.abs(jnp.einsum("naa->n", b.plastic)).max()) < 1e-5
    # and the run stayed healthy
    assert float(diag.max_speed) < 10.0
    assert int(diag.seg_overflow) == 0


def test_plastic_oracle_pallas_lockstep():
    """Active plastic flow through the Pallas window-sweep engine matches
    the segment oracle (the flow is shared batched 3×3 math between the
    sweeps — this pins the full step composition)."""
    cfg_o = SimConfig(engine="segments", seg_window=64)
    cfg_p = SimConfig(engine="pallas", seg_window=64)
    so, statics, params, grid, sp, side = _cube(cfg_o, plastic=True)
    sp2, statics_p, grid_p = nt.make_elastic_solid(
        np.asarray(statics.x0), params, cfg_p, sp, plastic=True)
    assert int(statics_p.miss) == 0
    stretched = jnp.asarray(np.asarray(statics.x0)
                            * np.array([1.06, 1.0, 1.0]),
                            statics.x0.dtype)
    so = dataclasses.replace(so, pos=stretched)
    sp2 = dataclasses.replace(sp2, pos=stretched)
    ep = nt.elastic_params(1e5, yield_strain=0.02)
    for _ in range(3):
        so, do = nt.elastic_step(so, statics, params, ep, grid, cfg_o)
        sp2, dp = nt.elastic_step(sp2, statics_p, params, ep, grid_p,
                                  cfg_p)
    # the 6% stretch is beyond the 2% yield — flow must be active
    assert float(jnp.abs(so.plastic).max()) > 1e-3
    np.testing.assert_allclose(np.asarray(sp2.pos), np.asarray(so.pos),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sp2.plastic),
                               np.asarray(so.plastic), rtol=0, atol=1e-6)


def test_cli_yield_strain_checkpoints_plastic(tmp_path, capsys):
    """``--elastic-box ... --yield-strain`` builds a plastic body whose
    accumulated strain rides the checkpoint, and ``--resume`` restores
    it (the yield_strain key participates in the resume-mismatch check)."""
    from nereus_tpu.app.cli import main as cli_main
    from nereus_tpu.utils.checkpoint import load_checkpoint
    out = str(tmp_path / "pl")
    spec = "0.25,0.5,0.25:0.06:1e4:300"
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "6",
                   "--neighbor-engine", "pallas", "--elastic-box", spec,
                   "--yield-strain", "0.02",
                   "--checkpoint-every", "4", "--out", out])
    assert rc == 0
    capsys.readouterr()
    ckpt = f"{out}_ckpt_000004.npz"
    _, header, elastic = load_checkpoint(ckpt, return_elastic=True)
    assert header["extra"]["yield_strain"] == 0.02
    es, _ = elastic[0]
    assert es.plastic is not None and es.plastic.shape == (es.capacity,
                                                          3, 3)
    assert np.isfinite(np.asarray(es.plastic)).all()
    # resume under the same yield continues with the stored E_p
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "2",
                   "--neighbor-engine", "pallas", "--elastic-box", spec,
                   "--yield-strain", "0.02", "--resume", ckpt,
                   "--out", out])
    assert rc == 0
    capsys.readouterr()
    # a different yield strain is a physics mismatch → refuse
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "2",
                   "--neighbor-engine", "pallas", "--elastic-box", spec,
                   "--yield-strain", "0.05", "--resume", ckpt,
                   "--out", out])
    assert rc == 2
    capsys.readouterr()


def test_checkpoint_roundtrip_plastic(tmp_path):
    """The accumulated plastic strain is physical state: it must survive
    a checkpoint save/load (additive key — elastic-only checkpoints keep
    loading with ``plastic=None``)."""
    from nereus_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    cfg = SimConfig(engine="segments", seg_window=64)
    s, statics, params, grid, sp, side = _cube(cfg, plastic=True)
    pl = jnp.linspace(0.0, 0.01, 9 * statics.n,
                      dtype=jnp.float32).reshape(statics.n, 3, 3)
    s = dataclasses.replace(s, plastic=pl)
    fs = nt.make_fluid_state(np.zeros((4, 3), np.float32), capacity=4)
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, fs, step=3, elastic=[(s, statics)])
    _, header, elastic = load_checkpoint(p, return_elastic=True)
    (es, _x0), = elastic
    np.testing.assert_array_equal(np.asarray(es.plastic), np.asarray(pl))
    # elastic-only body → no plastic key, loads as None
    s0 = dataclasses.replace(s, plastic=None)
    save_checkpoint(p, fs, step=3, elastic=[(s0, statics)])
    _, _, elastic0 = load_checkpoint(p, return_elastic=True)
    assert elastic0[0][0].plastic is None
