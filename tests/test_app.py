"""App layer: CLI, renderer, export, checkpoint/resume (SURVEY §5.4/§5.5)."""

import json
import os

import numpy as np
import pytest

import nereus_tpu as nt
from nereus_tpu.app.cli import main as cli_main
from nereus_tpu.app.render import Camera, render_frame
from nereus_tpu.utils import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    state = nt.make_fluid_state(rng.uniform(0, 1, (100, 3)),
                                velocities=rng.normal(size=(100, 3)),
                                capacity=128)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, step=42, extra={"solver": "wcsph"})
    loaded, header = load_checkpoint(path)
    assert header["step"] == 42
    assert header["extra"]["solver"] == "wcsph"
    np.testing.assert_array_equal(np.asarray(loaded.pos),
                                  np.asarray(state.pos))
    np.testing.assert_array_equal(np.asarray(loaded.vel),
                                  np.asarray(state.vel))
    assert int(loaded.num_active) == 100


def test_checkpoint_body_roundtrip(tmp_path):
    """Rigid bodies are dynamic state: they persist (pose, velocities,
    shell) and load back bit-for-bit; body-free checkpoints keep loading
    under both signatures (additive format)."""
    from nereus_tpu.rigid import RigidBody
    from nereus_tpu.utils.checkpoint import _BODY_FIELDS

    rng = np.random.default_rng(1)
    state = nt.make_fluid_state(rng.uniform(0, 1, (50, 3)), capacity=64)
    params = nt.make_params()
    body = nt.make_rigid_box((0.3, 0.4, 0.3), (0.08, 0.08, 0.08),
                             float(params.particle_radius), 200.0, params)
    import dataclasses
    body = dataclasses.replace(body,
                               vel=np.array([0.1, -0.2, 0.3], np.float32),
                               omega=np.array([1.0, 0.0, -2.0], np.float32))
    path = str(tmp_path / "ckpt_body.npz")
    save_checkpoint(path, state, step=3, bodies=body)
    loaded, header, bodies = load_checkpoint(path, return_bodies=True)
    assert header["num_bodies"] == 1 and len(bodies) == 1
    assert isinstance(bodies[0], RigidBody)
    for f in _BODY_FIELDS:
        np.testing.assert_array_equal(np.asarray(getattr(bodies[0], f)),
                                      np.asarray(getattr(body, f)), f)
    # two-tuple signature unchanged; body-free files report zero bodies
    loaded2, header2 = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(loaded2.pos),
                                  np.asarray(state.pos))
    nobody = str(tmp_path / "ckpt_nobody.npz")
    save_checkpoint(nobody, state, step=3)
    _, h3, b3 = load_checkpoint(nobody, return_bodies=True)
    assert h3["num_bodies"] == 0 and b3 == ()


def test_cli_rigid_box_resume(tmp_path, capsys):
    """A --rigid-box run's checkpoints carry the body; --resume continues
    it mid-trajectory instead of resetting to the spawn pose, and a
    different --rigid-box spec refuses like any physics mismatch."""
    out = str(tmp_path / "rb")
    spec = "0.25,0.45,0.25:0.08,0.08,0.08:200"
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "6",
                   "--neighbor-engine", "pallas", "--rigid-box", spec,
                   "--checkpoint-every", "4", "--out", out])
    assert rc == 0
    capsys.readouterr()
    ckpt = f"{out}_ckpt_000004.npz"
    _, header, bodies = load_checkpoint(ckpt, return_bodies=True)
    assert header["extra"]["rigid_box"] == spec
    assert len(bodies) == 1
    com4 = np.asarray(bodies[0].com)
    assert np.isfinite(com4).all()
    assert com4[1] < 0.45          # the body has fallen from spawn

    rc = cli_main(["run", "--solver", "wcsph", "--steps", "4",
                   "--neighbor-engine", "pallas", "--rigid-box", spec,
                   "--checkpoint-every", "2", "--resume", ckpt,
                   "--out", out])
    assert rc == 0
    capsys.readouterr()
    _, _, bodies6 = load_checkpoint(f"{out}_ckpt_000006.npz",
                                    return_bodies=True)
    # resumed mid-fall: two more steps continue the trajectory downward
    assert float(bodies6[0].com[1]) < float(com4[1])

    # a different body spec is a physics mismatch → refuse
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "2",
                   "--neighbor-engine", "pallas",
                   "--rigid-box", "0.25,0.45,0.25:0.08,0.08,0.08:900",
                   "--resume", ckpt, "--out", out])
    assert rc == 2
    capsys.readouterr()


def test_cli_elastic_box_resume(tmp_path, capsys):
    """An --elastic-box run's checkpoints carry the deformable body's
    dynamic state plus its reference configuration as an alignment
    witness; --resume continues it mid-trajectory, and a different
    --elastic-box spec refuses like any physics mismatch."""
    out = str(tmp_path / "eb")
    spec = "0.25,0.5,0.25:0.06:1e4:300"
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "6",
                   "--neighbor-engine", "pallas", "--elastic-box", spec,
                   "--checkpoint-every", "4", "--out", out])
    assert rc == 0
    capsys.readouterr()
    ckpt = f"{out}_ckpt_000004.npz"
    _, header, elastic = load_checkpoint(ckpt, return_elastic=True)
    assert header["extra"]["elastic_box"] == spec
    assert header["num_elastic"] == 1 and len(elastic) == 1
    es4, x04 = elastic[0]
    assert np.isfinite(np.asarray(es4.pos)).all()
    assert x04.shape == es4.pos.shape
    ycom4 = float(np.asarray(es4.pos)[:, 1].mean())
    assert ycom4 < 0.5             # the body has fallen from spawn

    rc = cli_main(["run", "--solver", "wcsph", "--steps", "4",
                   "--neighbor-engine", "pallas", "--elastic-box", spec,
                   "--checkpoint-every", "2", "--resume", ckpt,
                   "--out", out])
    assert rc == 0
    capsys.readouterr()
    _, _, elastic6 = load_checkpoint(f"{out}_ckpt_000006.npz",
                                     return_elastic=True)
    # resumed mid-fall: two more steps continue the trajectory downward
    assert float(np.asarray(elastic6[0][0].pos)[:, 1].mean()) < ycom4

    # a different body spec is a physics mismatch → refuse
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "2",
                   "--neighbor-engine", "pallas",
                   "--elastic-box", "0.25,0.5,0.25:0.06:1e4:900",
                   "--resume", ckpt, "--out", out])
    assert rc == 2
    capsys.readouterr()


def test_cli_yield_strain_resume_mismatch(tmp_path, capsys):
    """yield_strain is the first float-or-None resume key: a plastic
    checkpoint resumed without --yield-strain (and an elastic checkpoint
    resumed with it) must refuse cleanly with rc 2 — not crash inside
    np.isclose(float, None) — and --allow-resume-mismatch must still
    reach the virgin-E_p injection path for elastic→plastic resumes."""
    spec = "0.25,0.5,0.25:0.06:1e4:300"

    out = str(tmp_path / "ys")
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "3",
                   "--neighbor-engine", "pallas", "--elastic-box", spec,
                   "--yield-strain", "0.02",
                   "--checkpoint-every", "2", "--out", out])
    assert rc == 0
    capsys.readouterr()
    # plastic checkpoint, non-plastic resume → clean refusal
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "2",
                   "--neighbor-engine", "pallas", "--elastic-box", spec,
                   "--resume", f"{out}_ckpt_000002.npz", "--out", out])
    assert rc == 2
    capsys.readouterr()

    out2 = str(tmp_path / "ys2")
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "3",
                   "--neighbor-engine", "pallas", "--elastic-box", spec,
                   "--checkpoint-every", "2", "--out", out2])
    assert rc == 0
    capsys.readouterr()
    ckpt2 = f"{out2}_ckpt_000002.npz"
    # elastic checkpoint, plastic resume → clean refusal ...
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "2",
                   "--neighbor-engine", "pallas", "--elastic-box", spec,
                   "--yield-strain", "0.02",
                   "--resume", ckpt2, "--out", out2])
    assert rc == 2
    capsys.readouterr()
    # ... and the override resumes with a virgin E_p
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "2",
                   "--neighbor-engine", "pallas", "--elastic-box", spec,
                   "--yield-strain", "0.02", "--allow-resume-mismatch",
                   "--resume", ckpt2, "--out", out2])
    assert rc == 0
    capsys.readouterr()


def test_cli_control_channel(tmp_path, capsys):
    """The offline interactive session the reference does with keys
    (pause main.cpp:334-345, camera :353-472, drop :499-521):
    pause → inspect (camera orbit re-renders the frozen frame) → drop a
    cube → resume → stop, against a live run polling OUT_control.json."""
    import threading
    import time as _time

    out = str(tmp_path / "ctl")
    ctl = f"{out}_control.json"

    def write(doc):
        tmp = ctl + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, ctl)

    rcs = []
    t = threading.Thread(target=lambda: rcs.append(cli_main(
        ["run", "--solver", "wcsph", "--steps", "100000",
         "--no-boundary", "--control", "--export", "png", "--watch",
         "--export-every", "3", "--out", out])))
    t.start()
    latest = os.path.join(out, "latest.png")
    deadline = _time.time() + 120
    while not os.path.exists(latest) and _time.time() < deadline:
        _time.sleep(0.3)
    assert os.path.exists(latest), "run never produced a frame"

    # pause, then orbit the camera: latest.png must re-render while the
    # sim is frozen
    write({"seq": 1, "pause": True})
    _time.sleep(1.5)
    m0 = os.stat(latest).st_mtime_ns
    write({"seq": 2, "pause": True,
           "camera": {"azimuth": 135, "elevation": 35, "distance": 2.0}})
    deadline = _time.time() + 60
    while os.stat(latest).st_mtime_ns == m0 and _time.time() < deadline:
        _time.sleep(0.3)
    assert os.stat(latest).st_mtime_ns != m0, \
        "camera orbit while paused did not re-render"

    # resume with a drop, then stop
    write({"seq": 3, "pause": False, "drop": True})
    _time.sleep(1.0)
    write({"seq": 4, "stop": True})
    t.join(timeout=120)
    assert not t.is_alive(), "run did not stop on control command"
    assert rcs == [0]
    lines = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(lines[-1])
    assert summary["seg_overflow"] == 0
    # the dropped cube grew the live particle count past the seed scene
    base = cli_main(["run", "--solver", "wcsph", "--steps", "1",
                     "--no-boundary", "--out", str(tmp_path / "ref")])
    assert base == 0
    ref = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["particles"] > ref["particles"]


def test_render_frame_draws_particles():
    rng = np.random.default_rng(1)
    pos = rng.uniform(0.1, 0.4, (500, 3))
    vel = rng.normal(size=(500, 3))
    img = render_frame(pos, vel, width=320, height=240,
                       camera=Camera(eye=(1.0, 0.8, 1.5),
                                     target=(0.25, 0.25, 0.25)))
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    background = np.array([0.08, 0.09, 0.12]) * 255
    lit = np.abs(img.astype(float) - background).sum(axis=-1) > 30
    assert lit.sum() > 100  # particles actually appear
    # empty scene renders clean background
    img0 = render_frame(np.zeros((0, 3)), width=64, height=64)
    assert img0.shape == (64, 64, 3)


def test_cli_run_npz_export(tmp_path, capsys):
    out = str(tmp_path / "frames")
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "5",
                   "--no-boundary", "--export", "npz",
                   "--export-every", "2", "--out", out])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["steps"] == 5
    assert summary["seg_overflow"] == 0
    frames = sorted(os.listdir(out))
    assert frames == ["frame_000000.npz", "frame_000001.npz",
                      "frame_000002.npz"]
    with np.load(os.path.join(out, frames[0])) as z:
        assert z["pos"].shape[1] == 3
        assert z["pos"].shape[0] == summary["particles"]


@pytest.mark.parametrize("solver", ["wcsph", "iisph"])
def test_cli_sharded_run(capsys, solver):
    rc = cli_main(["run", "--solver", solver, "--steps", "3",
                   "--shards", "8", "--no-boundary"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0


def test_cli_info(capsys):
    assert cli_main(["info"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["device_count"] >= 8


def test_add_particles_and_drop_cli(tmp_path, capsys):
    import nereus_tpu as nt2
    state = nt2.make_fluid_state(np.random.default_rng(0).uniform(
        0, 0.3, (50, 3)), capacity=80)
    s2 = nt2.add_particles(state, np.full((20, 3), 0.4),
                           velocities=(0.0, -1.0, 0.0))
    assert int(s2.num_active) == 70
    np.testing.assert_allclose(np.asarray(s2.pos[50:70]), 0.4)
    np.testing.assert_allclose(np.asarray(s2.vel[50:70, 1]), -1.0)
    with pytest.raises(ValueError):
        nt2.add_particles(s2, np.zeros((20, 3)))

    rc = cli_main(["run", "--solver", "wcsph", "--steps", "7",
                   "--scene", "cube-drop", "--no-boundary",
                   "--drop-cube-every", "3"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0


@pytest.mark.parametrize("solver", ["wcsph", "iisph", "pcisph"])
def test_cli_adaptive_dt(capsys, solver):
    rc = cli_main(["run", "--solver", solver, "--steps", "5",
                   "--no-boundary", "--adaptive-dt", "0.4"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0


def test_cli_adaptive_dt_sharded(capsys):
    rc = cli_main(["run", "--solver", "pcisph", "--steps", "3",
                   "--shards", "8", "--no-boundary",
                   "--adaptive-dt", "0.4"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0
    assert summary["capacity_overflow"] == 0


def test_orbax_checkpoint_roundtrip(tmp_path):
    import nereus_tpu as nt2
    from nereus_tpu.utils import load_checkpoint_orbax, save_checkpoint_orbax
    rng = np.random.default_rng(2)
    state = nt2.make_fluid_state(rng.uniform(0, 1, (64, 3)), capacity=96)
    path = str(tmp_path / "ckpt_orbax")
    save_checkpoint_orbax(path, state, step=7)
    loaded, step = load_checkpoint_orbax(path)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(loaded.pos),
                                  np.asarray(state.pos))
    assert int(loaded.num_active) == 64


@pytest.mark.parametrize("shards", [1, 8])
def test_cli_refit_every(capsys, shards):
    """--refit-every rebuilds the grid (and re-shards) mid-run: a freely
    falling cube leaves any fixed AABB eventually; the refit path must keep
    the step healthy (rc 0, no overflow) through rebuilds."""
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "9",
                   "--scene", "cube-drop", "--no-boundary",
                   "--refit-every", "3", "--shards", str(shards)])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0


def test_cli_resume_verifies_config(tmp_path, capsys):
    """Checkpoints are self-describing: --resume under a different physics
    config refuses (rc 2) unless --allow-resume-mismatch is given."""
    out = str(tmp_path / "r")
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "5",
                   "--no-boundary", "--checkpoint-every", "2",
                   "--out", out])
    assert rc == 0
    capsys.readouterr()
    ckpt = f"{out}_ckpt_000004.npz"
    assert os.path.exists(ckpt)
    _, header = load_checkpoint(ckpt)
    assert header["extra"]["solver"] == "wcsph"
    assert header["extra"]["boundary"] is False

    # same config resumes fine, continuing absolute step numbering
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "2",
                   "--no-boundary", "--resume", ckpt, "--out", out])
    assert rc == 0
    capsys.readouterr()

    # different solver refuses ...
    rc = cli_main(["run", "--solver", "iisph", "--steps", "2",
                   "--no-boundary", "--resume", ckpt, "--out", out])
    assert rc == 2
    capsys.readouterr()
    # ... unless explicitly overridden
    rc = cli_main(["run", "--solver", "iisph", "--steps", "2",
                   "--no-boundary", "--resume", ckpt, "--out", out,
                   "--allow-resume-mismatch"])
    assert rc == 0
    capsys.readouterr()


def test_cli_watch_latest_png(tmp_path, capsys):
    out = str(tmp_path / "w")
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "4",
                   "--no-boundary", "--export", "png", "--watch",
                   "--export-every", "2", "--out", out])
    assert rc == 0
    capsys.readouterr()
    files = sorted(os.listdir(out))
    assert "latest.png" in files
    # latest.png equals the newest numbered frame
    import PIL.Image as I
    last = [f for f in files if f.startswith("frame_")][-1]
    a = np.asarray(I.open(os.path.join(out, last)))
    b = np.asarray(I.open(os.path.join(out, "latest.png")))
    np.testing.assert_array_equal(a, b)


def test_cli_segments_engine(capsys):
    """The jnp segment engine stays reachable from the CLI (the oracle
    path users get off-TPU or by explicit choice)."""
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "3",
                   "--no-boundary", "--neighbor-engine", "segments"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0


def test_cli_wavemaker(capsys):
    """--wavemaker drives a prescribed boundary oscillation (grid widened
    to cover the sweep; move_boundary runs inside the jitted step)."""
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "6",
                   "--wavemaker", "x:0.03:2"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0
    assert np.isfinite(summary["mean_density_error"])


def test_cli_wavemaker_incompatible_flags(capsys):
    assert cli_main(["run", "--wavemaker", "x:0.03:2",
                     "--shards", "2"]) == 2
    assert cli_main(["run", "--wavemaker", "x:0.03:2",
                     "--adaptive-dt", "0.4"]) == 2
    with pytest.raises(SystemExit):
        cli_main(["run", "--wavemaker", "bogus"])


def test_remove_particles_semantics():
    """remove_particles: keepers stay in order at the front, dropped slots
    park at the sentinel, live count drops — all traced (jit once)."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    pos = rng.uniform(0, 1, (50, 3))
    vel = rng.normal(size=(50, 3))
    state = nt.make_fluid_state(pos, velocities=vel, capacity=64)

    @jax.jit
    def drop_low_x(s):
        return nt.remove_particles(s, s.pos[:, 0] >= 0.5)

    out = drop_low_x(state)
    keep = pos[:, 0] >= 0.5
    k = int(keep.sum())
    assert int(out.num_active) == k
    np.testing.assert_allclose(np.asarray(out.pos)[:k],
                               pos[keep].astype(np.float32), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.vel)[:k],
                               vel[keep].astype(np.float32), atol=1e-6)
    assert (np.asarray(out.pos)[k:] == 1e9).all()
    assert (np.asarray(out.vel)[k:] == 0).all()
    # freed slots are reusable
    again = nt.add_particles(out, np.full((64 - k, 3), 0.3))
    assert int(again.num_active) == 64
    # already-inactive slots stay inactive even when keep says True
    out2 = drop_low_x(out)
    assert int(out2.num_active) == k


def test_cli_outflow_drains(capsys):
    """A free-falling cube with no boundary + a drain plane loses
    particles (the reference can only ever add)."""
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "60",
                   "--no-boundary", "--outflow", "y:below:-0.05"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0
    n0 = 2197  # default dam-break cube at the default n-target
    assert summary["particles"] < n0, summary["particles"]


def test_add_particles_traced_semantics():
    import jax
    import jax.numpy as jnp
    state = nt.make_fluid_state(np.zeros((4, 3)) + 0.2, capacity=10)
    pts = np.full((3, 3), 0.4, np.float32)

    @jax.jit
    def emit(s):
        return nt.add_particles_traced(s, pts, velocities=jnp.ones(3))

    s1, ovf = emit(state)
    assert int(ovf) == 0 and int(s1.num_active) == 7
    np.testing.assert_allclose(np.asarray(s1.pos)[4:7], pts)
    np.testing.assert_allclose(np.asarray(s1.vel)[4:7], 1.0)
    s2, ovf = emit(s1)
    assert int(ovf) == 0 and int(s2.num_active) == 10
    # would not fit: emits NOTHING, reports the count, state unchanged
    s3, ovf = emit(s2)
    assert int(ovf) == 3 and int(s3.num_active) == 10
    np.testing.assert_array_equal(np.asarray(s3.pos), np.asarray(s2.pos))


def test_fountain_emit_and_drain():
    """Flow-through pipeline fully inside one jitted step: a nozzle emits
    every step, a drain plane removes — the live count stays bounded by
    capacity while particles cycle through."""
    import jax
    import jax.numpy as jnp
    cfg = nt.SimConfig()
    params = nt.make_params()
    spacing = float(params.interaction_radius) - 0.005
    from nereus_tpu.scene import particle_cube
    nozzle = particle_cube((0.25, 0.55, 0.25), (0.08, 0.04, 0.08), spacing)
    state = nt.make_fluid_state(np.zeros((0, 3)), capacity=2048)
    grid = nt.fit_grid(np.array([-0.2, -0.2, -0.2]),
                       np.array([0.7, 0.8, 0.7]),
                       float(params.interaction_radius))

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def step(s, emit):
        # traced emission gate: an empty emission = add 0 of the batch
        # (remove the freshly added ones again) would churn; instead gate
        # by emitting into a rejected state via the overflow path — the
        # cleanest traced gate is simply two jitted branches, so `emit`
        # stays a static python bool here (two compiles total)
        emitted_ovf = jnp.int32(0)
        if emit:
            # jet fast enough that consecutive batches separate by more
            # than one lattice spacing before the next emission
            s, emitted_ovf = nt.add_particles_traced(
                s, nozzle, velocities=jnp.asarray([0.0, -3.0, 0.0]))
        s, d = nt.wcsph_step(s, params, grid, cfg, None)
        s = nt.remove_particles(s, s.pos[:, 1] >= 0.0)
        return s, d, emitted_ovf

    counts = []
    for i in range(80):
        state, d, ovf = step(state, i % 16 == 0)
        assert int(d.seg_overflow) == 0, i
        counts.append(int(state.num_active))
    assert max(counts) <= 2048
    assert counts[0] > 0                    # emission happening
    p = np.asarray(state.pos[:counts[-1]])
    assert np.isfinite(p).all()
    assert p[:, 1].min() >= -0.05            # drain keeps the tail short


def test_cli_xsph(capsys):
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "5",
                   "--no-boundary", "--xsph", "0.4"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0
    assert cli_main(["run", "--solver", "iisph", "--steps", "2",
                     "--xsph", "0.4"]) == 2


def test_cli_rigid_box(capsys):
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "8",
                   "--neighbor-engine", "pallas",
                   "--rigid-box", "0.25,0.45,0.25:0.08,0.08,0.08:200"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0
    # incompatible combos refuse
    assert cli_main(["run", "--solver", "iisph",
                     "--rigid-box", "0.2,0.2,0.2:0.1,0.1,0.1:200"]) == 2


def test_cli_emit(capsys):
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "16",
                   "--neighbor-engine", "pallas",
                   "--emit", "0.25,0.6,0.25:0,-1,0:5"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0
    assert summary.get("emit_overflow", 1) == 0   # emissions all accepted


def test_cli_pbf(capsys):
    rc = cli_main(["run", "--solver", "pbf", "--steps", "5",
                   "--neighbor-engine", "pallas"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0
    # XSPH + vorticity confinement post-passes
    rc = cli_main(["run", "--solver", "pbf", "--steps", "4",
                   "--neighbor-engine", "pallas",
                   "--xsph", "0.02", "--vorticity", "0.01"])
    assert rc == 0
    # incompatible combos refuse
    assert cli_main(["run", "--solver", "wcsph",
                     "--vorticity", "0.01"]) == 2


def test_cli_rigid_box_dfsph(capsys):
    rc = cli_main(["run", "--solver", "dfsph", "--steps", "4",
                   "--neighbor-engine", "pallas",
                   "--rigid-box", "0.25,0.45,0.25:0.08,0.08,0.08:200"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["seg_overflow"] == 0


def test_cli_elastic_box(capsys):
    """--elastic-box: a light deformable cube coupled into the dam-break
    tank — runs, stays finite, reports its height in the summary."""
    rc = cli_main(["run", "--solver", "wcsph", "--steps", "5",
                   "--neighbor-engine", "pallas",
                   "--elastic-box", "0.25,0.45,0.25:0.09:1e4:300"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert "elastic_ycom" in summary
    assert 0.0 < summary["elastic_ycom"] < 1.0
    assert summary["seg_overflow"] == 0

    # gating: refuses composition it does not support
    rc = cli_main(["run", "--solver", "iisph", "--steps", "1",
                   "--elastic-box", "0.25,0.45,0.25:0.09:1e4:300"])
    assert rc == 2
