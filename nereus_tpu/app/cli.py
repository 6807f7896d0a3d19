"""Command-line driver: the offline analogue of the reference demo app.

The reference's ``main()`` hard-codes one scene (IISPH, 0.5³ fluid cube,
box boundary, gravity disabled — ``main.cpp:533-555``) behind an
interactive GL window. Here scenes, solvers, kernel sets, sharding and
export are CLI flags over the same physics:

    python -m nereus_tpu run --solver iisph --steps 500 --export png
    python -m nereus_tpu run --solver wcsph --n-target 128000 --shards 8
    python -m nereus_tpu info
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _build_parser():
    p = argparse.ArgumentParser(
        prog="nereus_tpu",
        description="TPU-native SPH fluid simulation (WCSPH/IISPH/PCISPH)")
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run a simulation")
    run.add_argument("--solver",
                     choices=["wcsph", "iisph", "dfsph", "pbf", "pcisph"],
                     default="wcsph")
    run.add_argument("--scene", choices=["dam-break", "cube-drop", "demo"],
                     default="dam-break",
                     help="'demo' reproduces the reference app scene "
                          "(fluid cube, box boundary, zero gravity)")
    run.add_argument("--steps", type=int, default=400)
    run.add_argument("--n-target", type=int, default=None,
                     help="approximate particle count (scales the cube)")
    run.add_argument("--dt", type=float, default=None)
    run.add_argument("--kernel-set", choices=["muller", "monaghan"],
                     default="muller")
    run.add_argument("--surface-tension",
                     choices=["none", "becker", "akinci"], default="becker")
    run.add_argument("--st-cross", type=float, default=0.0,
                     metavar="FACTOR",
                     help="multiphase: cross-phase cohesion factor for "
                     "--surface-tension becker with --second-phase "
                     "(0 = immiscible, 1 = phase-blind)")
    run.add_argument("--no-boundary", action="store_true")
    run.add_argument("--calibrate-mass", action="store_true",
                     help="set particle mass so a rest lattice sums to rho0 "
                          "(recommended for PCISPH)")
    run.add_argument("--seg-window", type=int, default=48)
    run.add_argument("--sweep-block", type=int, default=None,
                     help="particles per Pallas sweep block (multiple of "
                          "8); default 176 (scan-tuned at 1M)")
    run.add_argument("--sweep-win", type=int, default=None,
                     help="Pallas window width (multiple of 128)")
    run.add_argument("--neighbor-engine", choices=["auto", "pallas",
                                                   "segments"],
                     default="auto",
                     help="auto = Pallas window kernels on TPU, jnp "
                          "segment gathers elsewhere")
    run.add_argument("--shards", type=int, default=1,
                     help="slab-shard the domain over this many devices")
    run.add_argument("--export", choices=["none", "png", "npz", "mp4"],
                     default="none")
    run.add_argument("--watch", action="store_true",
                     help="with --export png/mp4: keep OUT/latest.png "
                          "updated with the newest frame (atomic replace) "
                          "— tail it to watch a running sim")
    run.add_argument("--control", action="store_true",
                     help="poll OUT_control.json every step for runtime "
                          "commands — pause/resume, drop-cube-now, "
                          "camera orbit, stop (see app/control.py for "
                          "the protocol): the offline equivalent of the "
                          "reference's pause key / mouse camera / "
                          "keypress particle drop")
    run.add_argument("--export-mesh", type=int, default=0, metavar="K",
                     help="every K steps, reconstruct the fluid surface "
                          "(metaball field + marching tetrahedra, "
                          "app/surface.py; beyond-reference — upstream "
                          "renders raw point sprites only) and write "
                          "OUT/mesh_STEP.obj; host-side at export "
                          "cadence, not the TPU hot path")
    run.add_argument("--mesh-spacing", type=float, default=None,
                     help="surface grid vertex spacing (default h/2)")
    run.add_argument("--export-every", type=int, default=10,
                     help="export cadence in steps (reference records every "
                          "10th frame, main.cpp:619)")
    run.add_argument("--out", default="out")
    run.add_argument("--checkpoint-every", type=int, default=0)
    run.add_argument("--resume", default=None, metavar="CKPT.npz")
    run.add_argument("--allow-resume-mismatch", action="store_true",
                     help="resume even when the checkpoint header records a "
                          "different solver/scene/physics config (default: "
                          "refuse — stepping a restored state under "
                          "different physics is usually a mistake)")
    run.add_argument("--profile-dir", default=None,
                     help="write a jax.profiler trace of the run here")
    run.add_argument("--report-every", type=int, default=100)
    run.add_argument("--drop-cube-every", type=int, default=0, metavar="K",
                     help="drop a fresh particle cube every K steps (the "
                          "reference demo's 'K' key, main.cpp:499-521); "
                          "single-chip solvers only")
    run.add_argument("--refit-every", type=int, default=0, metavar="K",
                     help="every K steps, refit the grid to the live "
                          "particle AABB (SPH::updateGrid, sph.cpp:300-337)"
                          ", re-sort the boundary set and rebuild the step "
                          "(re-sharding sharded runs); use when fluid can "
                          "leave the initial domain")
    run.add_argument("--adaptive-dt", type=float, default=None,
                     metavar="LAMBDA",
                     help="CFL timestep dt = min(LAMBDA*h/|v|max, dt) per "
                          "step (the reference's disabled #if 0 block, "
                          "sph.cpp:217); all solvers, single-chip and "
                          "sharded")
    run.add_argument("--rigid-box", default=None,
                     metavar="CX,CY,CZ:SX,SY,SZ:DENSITY",
                     help="drop a rigid box into the scene with two-way "
                          "coupling (wcsph_coupled_step / "
                          "dfsph_coupled_step): floats/sinks by "
                          "its material density (kg/m^3), e.g. "
                          "0.25,0.4,0.25:0.08,0.08,0.08:150; single-chip "
                          "WCSPH or DFSPH only")
    run.add_argument("--rigid-obj", default=None,
                     metavar="PATH:DENSITY[:SCALE[:OX,OY,OZ]]",
                     help="two-way coupled rigid body from a closed "
                     "triangle-mesh OBJ (exact polyhedral mass/inertia, "
                     "Akinci surface shell); same solver support as "
                     "--rigid-box")
    run.add_argument("--elastic-box", default=None,
                     metavar="CX,CY,CZ:SIDE:YOUNG:DENSITY",
                     help="drop a deformable elastic cube (total-Lagrangian"
                     " SPH, two-way coupled — it splashes, deforms, floats"
                     " when DENSITY < rho0): side SIDE sampled at h/2,"
                     " Young's modulus YOUNG. WCSPH or DFSPH (the body"
                     " couples through the incompressible pressure solver"
                     " itself); WCSPH composes with --shards (replicated"
                     " body, psum'd per-sample reaction); 4 elastic"
                     " substeps per fluid step; body-wall contact is a"
                     " floor-plane penalty at the tank floor (v1)")
    run.add_argument("--yield-strain", type=float, default=None,
                     metavar="GAMMA",
                     help="make the --elastic-box body elastoplastic: von"
                     " Mises yield threshold on the deviatoric Green"
                     " strain (additive plasticity, O'Brien 2002) — the"
                     " body takes a permanent set where impacts exceed"
                     " GAMMA (try 0.02-0.05); elastic when omitted")
    run.add_argument("--obstacle-obj", default=None,
                     metavar="PATH[:SCALE[:OX,OY,OZ]]",
                     help="static obstacle/terrain sampled from a "
                     "triangle-mesh OBJ, merged into the scene walls "
                     "(grid auto-widens to cover it)")
    run.add_argument("--second-phase", default=None,
                     metavar="RATIO[:FRACTION]",
                     help="multiphase: mark the top FRACTION (default "
                     "0.5) of the fluid as a second phase with rest "
                     "density RATIO*rho0 (WCSPH or DFSPH, both incl. "
                     "--shards; --surface-tension becker applies "
                     "phase-pair cohesion scaled by --st-cross, "
                     "akinci is refused)")
    run.add_argument("--xsph", type=float, default=None, metavar="EPS",
                     help="Monaghan XSPH velocity smoothing (WCSPH: "
                          "position update only, typical 0.3-0.5; PBF: "
                          "the carried velocity — the paper's viscosity, "
                          "typical 0.01-0.05) — one extra fluid sweep")
    run.add_argument("--vorticity", type=float, default=None,
                     metavar="EPS",
                     help="PBF vorticity confinement (Macklin & Muller "
                          "2013 s5): v += dt*EPS*(N x omega) — restores "
                          "rotational energy the projection damps; two "
                          "extra fluid sweeps per step")
    run.add_argument("--emit", default=None, metavar="X,Y,Z:VX,VY,VZ:EVERY",
                     help="traced inflow emitter: every EVERY steps, add "
                          "a 3x3 particle patch at X,Y,Z (oriented "
                          "perpendicular to the velocity) moving at "
                          "VX,VY,VZ — add_particles_traced keeps shapes "
                          "static and never recompiles; emissions that "
                          "would overflow capacity are rejected and "
                          "counted (emit_overflow); single-chip")
    run.add_argument("--outflow", default=None,
                     metavar="AXIS:below|above:VALUE",
                     help="open-boundary outflow: every step, remove "
                          "particles past the plane (e.g. y:below:0.02 "
                          "drains everything that falls below y=0.02) — "
                          "remove_particles keeps shapes static and the "
                          "live count traced (no recompile); single-chip")
    run.add_argument("--implicit-viscosity", type=float, default=None,
                     metavar="NU",
                     help="WCSPH/DFSPH: replace the explicit Muller "
                          "viscosity with the Weiler-2018 implicit solve "
                          "(matrix-free CG on (I - dt*nu*lap) v = v*; "
                          "beyond-reference) at kinematic viscosity NU — "
                          "unconditionally stable for honey/lava regimes; "
                          "e.g. 5.0")
    run.add_argument("--wavemaker", default=None, metavar="AXIS:AMP:HZ",
                     help="oscillate the boundary box rigidly along AXIS "
                          "(x/y/z): offset A*sin(2*pi*f*t), velocity "
                          "A*2*pi*f*cos(2*pi*f*t) — prescribed-motion "
                          "boundaries (beyond-reference; "
                          "boundary.move_boundary runs on device inside "
                          "the jitted step). Single-chip, fixed dt, "
                          "static grid; e.g. x:0.05:2")

    sub.add_parser("info", help="print device/platform info")
    return p


def _make_setup(args):
    import jax.numpy as jnp
    import nereus_tpu as nt
    from nereus_tpu import scene as scenelib
    from nereus_tpu.params import calibrate_mass

    kernel_set = (nt.KernelSet.MULLER if args.kernel_set == "muller"
                  else nt.KernelSet.MONAGHAN)
    st = {"none": nt.SurfaceTensionModel.NONE,
          "becker": nt.SurfaceTensionModel.BECKER,
          "akinci": nt.SurfaceTensionModel.AKINCI}[args.surface_tension]
    kw = {}
    if args.sweep_block is not None:
        kw["sweep_block"] = args.sweep_block
    if args.sweep_win is not None:
        kw["sweep_win"] = args.sweep_win
    if getattr(args, "implicit_viscosity", None) is not None:
        if args.solver not in ("wcsph", "dfsph"):
            raise SystemExit(
                "--implicit-viscosity requires --solver wcsph or dfsph")
        kw["viscosity_model"] = "implicit"
    cfg = nt.SimConfig(kernel_set=kernel_set, surface_tension_model=st,
                       seg_window=args.seg_window,
                       engine=args.neighbor_engine,
                       st_cross=getattr(args, "st_cross", 0.0), **kw)
    if getattr(args, "elastic_box", None) and cfg.seg_window < 64:
        # the elastic body's h/2 reference lattice overflows the segment
        # oracle's default window (make_elastic_solid measures and
        # refuses; pre-empt with the measured-safe value)
        import dataclasses as _dc
        cfg = _dc.replace(cfg, seg_window=64)

    overrides = {}
    if args.dt is not None:
        overrides["dt"] = args.dt
    if args.scene == "demo":
        overrides["gravity"] = (0.0, 0.0, 0.0)  # main.cpp:552 setGravity(0)
    if getattr(args, "implicit_viscosity", None) is not None:
        overrides["viscosity"] = args.implicit_viscosity
    if args.solver == "wcsph":
        params = nt.make_params(**overrides)
    elif args.solver == "iisph":
        params = nt.iisph_params(**overrides)
    elif args.solver == "dfsph":
        params = nt.dfsph_params(**overrides)
    elif args.solver == "pbf":
        params = nt.pbf_params(**overrides)
    else:
        params = nt.pcisph_params(**overrides)
    if args.calibrate_mass or args.solver in ("pcisph", "pbf"):
        params = calibrate_mass(params, cfg)

    scene_kw = {}
    if args.scene == "cube-drop":
        scene_kw.update(cube_center=(0.25, 0.6, 0.25),
                        box_min=(0.0, 0.0, 0.0), box_max=(0.5, 1.0, 0.5),
                        cube_size=(0.3, 0.3, 0.3))
    if args.drop_cube_every:
        # leave headroom for dropped cubes (~3 extra fills of the run)
        drops = args.steps // args.drop_cube_every + 1
        scene_kw["capacity_factor"] = 1 + drops
    if args.emit:
        # emitted patches are tiny (9 particles); doubled capacity is
        # generous headroom at CLI scales
        scene_kw["capacity_factor"] = max(
            scene_kw.get("capacity_factor", 1), 2)
    if getattr(args, "control", False):
        # headroom for interactive drop-cube-now commands
        scene_kw["capacity_factor"] = max(
            scene_kw.get("capacity_factor", 1), 2)
    state, grid, boundary = scenelib.dam_break(
        params, cfg, n_target=args.n_target,
        with_boundary=not args.no_boundary, **scene_kw)
    if args.wavemaker:
        # widen the grid so it covers the piston's full sweep, then
        # re-sort the boundary against the widened grid
        from nereus_tpu.boundary import rehash_boundary
        axis, amp, _ = _parse_wavemaker(args.wavemaker)
        cell = float(np.asarray(grid.cell).reshape(-1)[0])
        lo = np.asarray(grid.origin, np.float64)
        hi = lo + np.asarray(grid.size, np.float64) * cell
        pad = np.zeros(3)
        pad[axis] = float(amp) + cell
        grid = nt.fit_grid(lo - pad, hi + pad, cell)
        if boundary is not None:
            boundary = rehash_boundary(boundary, grid)
    return cfg, params, state, grid, boundary


def _parse_rigid_obj(spec: str):
    """'PATH:DENSITY[:SCALE[:OX,OY,OZ]]' → (path, density, scale, offset)."""
    try:
        parts = spec.split(":")
        assert 2 <= len(parts) <= 4
        path, rho = parts[0], float(parts[1])
        scale = float(parts[2]) if len(parts) > 2 else 1.0
        off = (tuple(float(v) for v in parts[3].split(","))
               if len(parts) > 3 else (0.0, 0.0, 0.0))
        assert len(off) == 3
        return path, rho, scale, off
    except (ValueError, AssertionError):
        raise SystemExit(
            f"--rigid-obj expects PATH:DENSITY[:SCALE[:OX,OY,OZ]], "
            f"got {spec!r}")


def _parse_obstacle_obj(spec: str):
    """'PATH[:SCALE[:OX,OY,OZ]]' → (path, scale, offset)."""
    try:
        parts = spec.split(":")
        assert 1 <= len(parts) <= 3
        scale = float(parts[1]) if len(parts) > 1 else 1.0
        off = (tuple(float(v) for v in parts[2].split(","))
               if len(parts) > 2 else (0.0, 0.0, 0.0))
        assert len(off) == 3
        return parts[0], scale, off
    except (ValueError, AssertionError):
        raise SystemExit(
            f"--obstacle-obj expects PATH[:SCALE[:OX,OY,OZ]], got {spec!r}")


def _parse_elastic_box(spec: str):
    """'CX,CY,CZ:SIDE:YOUNG:DENSITY' → (center, side, young, density)."""
    try:
        c_s, side_s, e_s, d_s = spec.split(":")
        center = tuple(float(v) for v in c_s.split(","))
        assert len(center) == 3
        return center, float(side_s), float(e_s), float(d_s)
    except (ValueError, AssertionError):
        raise SystemExit(
            f"--elastic-box expects CX,CY,CZ:SIDE:YOUNG:DENSITY, "
            f"got {spec!r}")


def _parse_rigid_box(spec: str):
    """'CX,CY,CZ:SX,SY,SZ:DENSITY' → (center, size, density)."""
    try:
        c_s, s_s, d_s = spec.split(":")
        center = tuple(float(v) for v in c_s.split(","))
        size = tuple(float(v) for v in s_s.split(","))
        assert len(center) == 3 and len(size) == 3
        return center, size, float(d_s)
    except (ValueError, AssertionError):
        raise SystemExit(
            f"--rigid-box expects CX,CY,CZ:SX,SY,SZ:DENSITY, got {spec!r}")


def _parse_emit(spec: str):
    """'X,Y,Z:VX,VY,VZ:EVERY' → (pos, vel, every)."""
    try:
        p_s, v_s, e_s = spec.split(":")
        pos = tuple(float(v) for v in p_s.split(","))
        vel = tuple(float(v) for v in v_s.split(","))
        assert len(pos) == 3 and len(vel) == 3
        return pos, vel, int(e_s)
    except (ValueError, AssertionError):
        raise SystemExit(
            f"--emit expects X,Y,Z:VX,VY,VZ:EVERY (e.g. "
            f"0.25,0.6,0.25:0,-1,0:20), got {spec!r}")


def _parse_outflow(spec: str):
    """'AXIS:below|above:VALUE' → (axis index, keep_above bool, value)."""
    try:
        axis_s, dir_s, val_s = spec.split(":")
        axis = {"x": 0, "y": 1, "z": 2}[axis_s.lower()]
        if dir_s not in ("below", "above"):
            raise ValueError(dir_s)
        return axis, dir_s == "below", float(val_s)
    except (ValueError, KeyError):
        raise SystemExit(
            f"--outflow expects AXIS:below|above:VALUE (e.g. "
            f"y:below:0.02), got {spec!r}")


def _parse_wavemaker(spec: str):
    """'AXIS:AMP:HZ' → (axis index, amplitude, angular frequency)."""
    try:
        axis_s, amp_s, hz_s = spec.split(":")
        axis = {"x": 0, "y": 1, "z": 2}[axis_s.lower()]
        return axis, float(amp_s), 2.0 * np.pi * float(hz_s)
    except (ValueError, KeyError):
        raise SystemExit(
            f"--wavemaker expects AXIS:AMP:HZ (e.g. x:0.05:2), got "
            f"{spec!r}")


def _run_desc(args, params, grid):
    """Physics-identifying header written into every checkpoint, so a
    checkpoint can refuse to resume under different physics (the ``extra``
    slot of ``save_checkpoint``; the reference has no persistence at all,
    SURVEY §5.4). ``grid_size`` is informational only — it is derived from
    the scene and may legitimately change across --refit-every rebuilds."""
    return {
        "solver": args.solver,
        "scene": args.scene,
        "kernel_set": args.kernel_set,
        "surface_tension": args.surface_tension,
        "boundary": not args.no_boundary,
        "n_target": args.n_target,
        "dt": float(np.asarray(params.dt)),
        # catches a --calibrate-mass mismatch (mass changes by a large
        # factor and silently alters the physics of a restored state)
        "particle_mass": float(np.asarray(params.particle_mass)),
        "grid_size": np.asarray(grid.size).tolist(),
        "wavemaker": args.wavemaker,
        "rigid_box": args.rigid_box,
        "rigid_obj": args.rigid_obj,
        "obstacle_obj": args.obstacle_obj,
        "second_phase": args.second_phase,
        "elastic_box": getattr(args, "elastic_box", None),
        "yield_strain": getattr(args, "yield_strain", None),
    }


# Header keys that must match between a checkpoint and the resuming run.
_RESUME_KEYS = ("solver", "scene", "kernel_set", "surface_tension",
                "boundary", "n_target", "dt", "particle_mass", "wavemaker",
                "rigid_box", "rigid_obj", "obstacle_obj", "second_phase",
                "elastic_box", "yield_strain")


def cmd_run(args):
    import jax
    import nereus_tpu as nt
    from nereus_tpu.params import calibrate_mass  # noqa: F401
    from nereus_tpu.utils import (StepMeter, get_logger, load_checkpoint,
                                  save_checkpoint)
    from nereus_tpu.utils.metrics import profile_trace

    from nereus_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    log = get_logger()
    if args.xsph is not None and (args.solver not in ("wcsph", "pbf")
                                  or args.shards > 1):
        log.error("--xsph applies to single-chip WCSPH or PBF only")
        return 2
    if args.vorticity is not None and (args.solver != "pbf"
                                       or args.shards > 1):
        log.error("--vorticity applies to single-chip PBF only")
        return 2
    if args.rigid_box is not None and args.rigid_obj is not None:
        log.error("--rigid-box and --rigid-obj are mutually exclusive")
        return 2
    if args.rigid_box is not None or args.rigid_obj is not None:
        if args.rigid_box is not None:
            _parse_rigid_box(args.rigid_box)  # validate early
        else:
            _parse_rigid_obj(args.rigid_obj)
        bad = [n for f, n in ((args.solver not in ("wcsph", "dfsph"),
                               "--solver wcsph|dfsph"),
                              (args.shards > 1 and args.adaptive_dt,
                               "no --adaptive-dt with sharded rigid"),
                              (args.wavemaker, "no --wavemaker"),
                              (args.xsph is not None, "no --xsph"))
               if f]
        if bad:
            log.error("--rigid-box/--rigid-obj requires: %s", ", ".join(bad))
            return 2
    if args.elastic_box is not None:
        _parse_elastic_box(args.elastic_box)  # validate early
        bad = [n for f, n in (
            (args.solver not in ("wcsph", "dfsph"),
             "--solver wcsph or dfsph"),
            (args.solver == "dfsph" and args.shards > 1,
             "--shards 1 for dfsph (sharded elastic coupling is "
             "WCSPH-only)"),
            (args.rigid_box or args.rigid_obj, "no rigid bodies"),
            (args.wavemaker, "no --wavemaker"),
            (args.xsph is not None, "no --xsph"),
            (args.adaptive_dt, "no --adaptive-dt"),
            (args.outflow, "no --outflow"),
            (args.emit, "no --emit"),
            (args.drop_cube_every, "no --drop-cube-every"),
            (args.refit_every, "no --refit-every"),
            (args.second_phase is not None, "no --second-phase")) if f]
        if bad:
            log.error("--elastic-box requires: %s", ", ".join(bad))
            return 2

    drain = None
    if args.outflow:
        if args.shards > 1:
            log.error("--outflow is single-chip only")
            return 2
        import jax.numpy as jnp
        axis, drop_below, value = _parse_outflow(args.outflow)

        @jax.jit
        def drain(s):
            col = s.pos[:, axis]
            keep = (col >= value) if drop_below else (col <= value)
            return nt.remove_particles(s, keep)
    if args.wavemaker:
        _parse_wavemaker(args.wavemaker)  # validate early
        for flag, name in ((args.shards > 1, "--shards"),
                           (args.adaptive_dt, "--adaptive-dt"),
                           (args.refit_every, "--refit-every"),
                           (args.no_boundary, "--no-boundary")):
            if flag:
                log.error("--wavemaker is incompatible with %s "
                          "(single-chip, fixed dt, static grid, needs a "
                          "boundary)", name)
                return 2
    if args.second_phase is not None:
        try:
            parts = args.second_phase.split(":")
            sp_ratio = float(parts[0])
            sp_frac = float(parts[1]) if len(parts) > 1 else 0.5
            assert sp_ratio > 0 and 0 < sp_frac < 1
        except (ValueError, AssertionError):
            log.error("--second-phase expects RATIO[:FRACTION], got %r",
                      args.second_phase)
            return 2
        bad = [n for f, n in ((args.solver not in ("wcsph", "dfsph"),
                               "--solver wcsph|dfsph"),
                              (args.shards > 1
                               and args.solver not in ("wcsph", "dfsph"),
                               "--shards 1 (sharded multiphase is "
                               "WCSPH/DFSPH-only)"),
                              (args.surface_tension == "akinci",
                               "--surface-tension none|becker (akinci "
                               "is single-phase-only)"),
                              (args.xsph is not None, "no --xsph"),
                              (args.implicit_viscosity is not None,
                               "no --implicit-viscosity"),
                              ((args.rigid_box or args.rigid_obj)
                               and args.shards > 1
                               and args.solver != "wcsph",
                               "--shards 1 for dfsph rigid bodies "
                               "(sharded multiphase coupling is "
                               "WCSPH-only)")) if f]
        if bad:
            log.error("--second-phase requires: %s", ", ".join(bad))
            return 2
    cfg, params, state, grid, boundary = _make_setup(args)
    if args.second_phase is not None:
        import jax.numpy as jnp
        # top FRACTION of the fluid (by y) becomes phase 2: rest density
        # RATIO*rho0, mass scaled identically so every particle starts at
        # its own rest density on the shared seeding lattice
        n0 = int(np.asarray(state.num_active))
        pos_h = np.asarray(state.pos)[:n0]
        y_cut = np.quantile(pos_h[:, 1], 1.0 - sp_frac)
        rd = float(np.asarray(params.rest_density))
        pm = float(np.asarray(params.particle_mass))
        rho0 = np.where(pos_h[:, 1] >= y_cut, rd * sp_ratio, rd)
        cap = state.capacity
        rho0_full = np.full(cap, rd)
        rho0_full[:n0] = rho0
        state = nt.FluidState(
            pos=state.pos, vel=state.vel, pressure=state.pressure,
            num_active=state.num_active,
            mass=jnp.asarray(rho0_full * (pm / rd), cfg.dtype),
            rho0=jnp.asarray(rho0_full, cfg.dtype))
        log.info("second phase: %d of %d particles at rho0=%g",
                 int((rho0 != rd).sum()), n0, rd * sp_ratio)
    if args.obstacle_obj:
        # a static mesh obstacle joins the walls as ONE hash-sorted set;
        # the grid widens to cover it (and the walls re-sort) first
        if args.wavemaker:
            log.error("--obstacle-obj is incompatible with --wavemaker "
                      "(the prescribed motion would move the obstacle)")
            return 2
        from nereus_tpu.boundary import rehash_boundary
        path, scale, off = _parse_obstacle_obj(args.obstacle_obj)
        mv, mf = nt.load_obj(path)
        mv = mv * scale + np.asarray(off, np.float64)
        h = float(params.interaction_radius)
        cell = float(np.asarray(grid.cell).reshape(-1)[0])
        glo = np.asarray(grid.origin, np.float64)
        ghi = glo + np.asarray(grid.size, np.float64) * cell
        lo = np.minimum(glo, mv.min(axis=0) - h)
        hi = np.maximum(ghi, mv.max(axis=0) + h)
        if (lo < glo - 1e-12).any() or (hi > ghi + 1e-12).any():
            grid = nt.fit_grid(lo, hi, cell)
            if boundary is not None:
                boundary = rehash_boundary(boundary, grid)
        mb = nt.mesh_boundary(grid, mv, mf,
                              float(params.particle_radius), params,
                              kernel_set=cfg.kernel_set)
        boundary = (mb if boundary is None
                    else nt.concat_boundaries(grid, boundary, mb))
        log.info("obstacle %s: %d boundary samples", path,
                 mb.num_boundaries)
    desc = _run_desc(args, params, grid)
    step0 = 0
    resume_bodies = ()
    resume_elastic = ()
    if args.resume:
        state, header, resume_bodies, resume_elastic = load_checkpoint(
            args.resume, return_bodies=True, return_elastic=True)
        prev = header.get("extra") or {}
        def differs(a, b):
            # float keys (dt, particle_mass) are recomputed at resume
            # time; compare with a tight relative tolerance so benign
            # cross-version arithmetic drift doesn't refuse bit-equal-
            # intent checkpoints
            if a is None or b is None:
                # float-or-None keys (yield_strain): one side absent
                # means the physics differs — refuse, don't crash in
                # np.isclose(float, None)
                return a is not b
            if isinstance(a, float) or isinstance(b, float):
                return not np.isclose(a, b, rtol=1e-7, atol=0.0)
            return a != b

        mismatch = {k: {"checkpoint": prev[k], "run": desc[k]}
                    for k in _RESUME_KEYS
                    if k in prev and differs(prev[k], desc[k])}
        if mismatch:
            if args.allow_resume_mismatch:
                log.warning("resume config mismatch (continuing as asked): "
                            "%s", json.dumps(mismatch))
            else:
                log.error("refusing to resume %s: it was written by a "
                          "different run config %s — pass "
                          "--allow-resume-mismatch to step it under the new "
                          "physics anyway", args.resume,
                          json.dumps(mismatch))
                return 2
        elif not prev:
            log.warning("checkpoint %s has no config header (pre-v2 file); "
                        "cannot verify it matches this run", args.resume)
        # --steps counts *additional* steps; loop/checkpoint numbering
        # continues from the checkpoint's absolute step so resumed runs
        # never overwrite earlier checkpoint files.
        step0 = int(header["step"]) + 1
        log.info("resumed from %s at step %d (running %d more)",
                 args.resume, header["step"], args.steps)
    n = int(np.asarray(state.num_active).sum())
    log.info("scene=%s solver=%s particles=%d boundaries=%d grid=%s",
             args.scene, args.solver, n,
             0 if boundary is None else boundary.num_boundaries,
             np.asarray(grid.size).tolist())

    def build_stepper(grid, boundary, host_state):
        """Build (step, run_state, to_host) for the current grid.

        Called once up front and again after every ``--refit-every`` grid
        refit (the recompile is amortized by the persistent compilation
        cache when grid sizes repeat)."""
        if args.shards > 1:
            from jax.sharding import Mesh
            from nereus_tpu.parallel import (ShardConfig,
                                             make_sharded_dfsph_step,
                                             make_sharded_iisph_step,
                                             make_sharded_pbf_step,
                                             make_sharded_pcisph_step,
                                             make_sharded_wcsph_step,
                                             shard_state, slab_counts,
                                             unshard_state)
            devs = jax.devices()
            if len(devs) < args.shards:
                raise SystemExit(
                    f"only {len(devs)} devices available")
            mesh = Mesh(np.array(devs[:args.shards]), ("shards",))
            counts = slab_counts(host_state, grid, args.shards)
            scfg = ShardConfig(
                n_shards=args.shards,
                local_capacity=int(1.5 * counts.max()) + 256,
                halo_capacity=4096, migration_capacity=1024)
            log.info("slab occupancy: %s, local capacity %d",
                     counts.tolist(), scfg.local_capacity)
            run_state = shard_state(host_state, grid, scfg, mesh)
            lam = args.adaptive_dt
            if body_holder[0] is not None:
                # sharded rigid coupling (WCSPH explicit incl.
                # multiphase, or DFSPH Gauss–Seidel; validated above)
                if args.solver == "wcsph":
                    from nereus_tpu.parallel import \
                        make_sharded_wcsph_coupled_step
                    cstep = make_sharded_wcsph_coupled_step(
                        mesh, params, grid, cfg, scfg, boundary,
                        multiphase=host_state.multiphase)
                else:
                    from nereus_tpu.parallel import \
                        make_sharded_dfsph_coupled_step
                    cstep = make_sharded_dfsph_coupled_step(
                        mesh, params, grid, cfg, scfg, boundary)

                def _cstep(s, t=None):
                    s2, body_holder[0], d = cstep(s, body_holder[0])
                    return s2, d

                return _cstep, run_state, unshard_state
            if elastic_holder[0] is not None:
                # sharded fluid–elastic coupling (WCSPH; validated above)
                from nereus_tpu.parallel import \
                    make_sharded_wcsph_elastic_step
                statics_e, ep_e, psi_e = elastic_ctx[0]
                estep = make_sharded_wcsph_elastic_step(
                    mesh, params, grid, cfg, scfg, statics_e, ep_e,
                    psi_e, boundary, substeps=4)

                def _estep(s, t=None):
                    s2, elastic_holder[0], d = estep(s, elastic_holder[0])
                    return s2, d

                return _estep, run_state, unshard_state
            if args.solver == "wcsph":
                step = make_sharded_wcsph_step(
                    mesh, params, grid, cfg, scfg, boundary,
                    adaptive_dt_lambda=lam,
                    multiphase=host_state.multiphase)
            elif args.solver == "iisph":
                step = make_sharded_iisph_step(
                    mesh, params, grid, cfg, scfg, boundary,
                    adaptive_dt_lambda=lam)
            elif args.solver == "dfsph":
                step = make_sharded_dfsph_step(
                    mesh, params, grid, cfg, scfg, boundary,
                    adaptive_dt_lambda=lam,
                    multiphase=host_state.multiphase)
            elif args.solver == "pbf":
                step = make_sharded_pbf_step(
                    mesh, params, grid, cfg, scfg, boundary,
                    adaptive_dt_lambda=lam)
            else:
                step = make_sharded_pcisph_step(
                    mesh, params, grid, cfg, scfg, boundary,
                    delta=nt.pcisph_delta(params, cfg),
                    adaptive_dt_lambda=lam)
            return step, run_state, unshard_state

        import dataclasses

        import jax.numpy as jnp

        def maybe_adapt(s, p):
            # CFL dt, capped at the configured dt (sph.cpp:217-231)
            if not args.adaptive_dt:
                return p
            dt = jnp.minimum(nt.cfl_dt(s, p, float(args.adaptive_dt)),
                             p.dt)
            return dataclasses.replace(p, dt=dt)

        if body_holder[0] is not None:
            coupled_fn = (nt.dfsph_coupled_step if args.solver == "dfsph"
                          else nt.wcsph_coupled_step)
            coupled = jax.jit(lambda s, b: coupled_fn(
                s, maybe_adapt(s, params), grid, cfg, b, boundary))

            def _cstep(s, t=None):
                s2, body_holder[0], d = coupled(s, body_holder[0])
                return s2, d

            return _cstep, host_state, lambda s: s

        if elastic_holder[0] is not None:
            statics_e, ep_e, psi_e = elastic_ctx[0]
            efn = (nt.dfsph_elastic_step if args.solver == "dfsph"
                   else nt.wcsph_elastic_step)
            estep = jax.jit(lambda s, e: efn(
                s, params, grid, cfg, e, statics_e, ep_e, psi_e,
                boundary, substeps=4))

            def _estep(s, t=None):
                s2, elastic_holder[0], d = estep(s, elastic_holder[0])
                return s2, d

            return _estep, host_state, lambda s: s

        wm = _parse_wavemaker(args.wavemaker) if args.wavemaker else None

        def bd_at(t):
            # prescribed rigid oscillation, built on device each step
            # (the traced t never recompiles)
            if wm is None:
                return boundary
            from nereus_tpu.boundary import move_boundary
            axis, amp, om = wm
            unit = jnp.zeros(3, cfg.dtype).at[axis].set(1.0)
            return move_boundary(
                boundary, grid, offset=unit * (amp * jnp.sin(om * t)),
                velocity=unit * (amp * om * jnp.cos(om * t)))

        if args.solver == "pcisph":
            denom = nt.pcisph_grad_denom(params, cfg)

            def _step(s, t=None):
                p2 = maybe_adapt(s, params)
                return nt.pcisph_step(
                    s, p2, grid, cfg,
                    boundary if t is None else bd_at(t),
                    delta=nt.pcisph_delta_from_denom(p2, denom))

            step = jax.jit(_step)
        else:
            solver = {"wcsph": nt.wcsph_step,
                      "iisph": nt.iisph_step,
                      "dfsph": nt.dfsph_step,
                      "pbf": nt.pbf_step}[args.solver]
            xkw = ({"xsph_eps": float(args.xsph)}
                   if args.xsph is not None else {})
            if args.vorticity is not None:
                xkw["vorticity_eps"] = float(args.vorticity)

            def _step(s, t=None):
                return solver(s, maybe_adapt(s, params), grid, cfg,
                              boundary if t is None else bd_at(t), **xkw)

            step = jax.jit(_step)
        return step, host_state, lambda s: s

    body_holder = [None]
    if args.rigid_box:
        center, size, rho = _parse_rigid_box(args.rigid_box)
        body_holder[0] = nt.make_rigid_box(
            center, size, float(params.particle_radius), rho, params)
        log.info("rigid box: center=%s size=%s density=%g samples=%d",
                 center, size, rho, body_holder[0].num_samples)
    elif args.rigid_obj:
        path, rho, scale, off = _parse_rigid_obj(args.rigid_obj)
        rv, rf = nt.load_obj(path)
        body_holder[0] = nt.make_rigid_mesh(
            rv, rf, float(params.particle_radius), rho, params,
            kernel_set=cfg.kernel_set, scale=scale, offset=off)
        log.info("rigid mesh %s: mass=%.4g com=%s samples=%d", path,
                 float(body_holder[0].mass),
                 np.asarray(body_holder[0].com).round(4).tolist(),
                 body_holder[0].num_samples)
    if body_holder[0] is not None:
        if resume_bodies:
            # the body is dynamic state: resume mid-trajectory (shell
            # included — no rebuild drift), not at the scene's spawn pose
            body_holder[0] = resume_bodies[0]
            log.info("resumed rigid body at com=%s",
                     np.asarray(body_holder[0].com).tolist())
        elif args.resume:
            log.warning("checkpoint %s carries no rigid body — the "
                        "--rigid-box body restarts at its spawn pose",
                        args.resume)

    elastic_holder = [None]
    elastic_ctx = [None]
    if args.elastic_box:
        center, side, young, rho_e = _parse_elastic_box(args.elastic_box)
        spe = 0.5 * float(np.asarray(params.interaction_radius))
        npts = max(int(round(side / spe)), 1)
        lo_e = np.asarray(center, np.float64) - (npts * spe) / 2.0
        pts = nt.sample_box_solid(lo_e, lo_e + npts * spe, spe)
        if boundary is not None and boundary.num_boundaries > 0:
            bp = np.asarray(boundary.pos)
            floor_y = float(bp[:, 1].min())
            # tank AABB from the wall samples (open top): dry contact /
            # splash-out containment on all side walls, not just the floor
            box_lo = (float(bp[:, 0].min()), -np.inf, float(bp[:, 2].min()))
            box_hi = (float(bp[:, 0].max()), np.inf, float(bp[:, 2].max()))
        else:
            floor_y = -np.inf
            box_lo = box_hi = None
        plastic_e = args.yield_strain is not None
        ep_e = nt.elastic_params(
            young, damping=5.0, floor_y=floor_y,
            box_lo=box_lo, box_hi=box_hi,
            yield_strain=(args.yield_strain if plastic_e else np.inf))
        estate_e, statics_e, _g = nt.make_elastic_solid(
            pts, params, cfg, spe, grid=grid, density=rho_e,
            plastic=plastic_e)
        psi_e = nt.elastic_psi(statics_e, params, cfg)
        elastic_holder[0] = estate_e
        elastic_ctx[0] = (statics_e, ep_e, psi_e)
        log.info("elastic box: center=%s side=%g young=%g density=%g "
                 "particles=%d floor_y=%g", center, side, young, rho_e,
                 statics_e.n, floor_y)
        if resume_elastic:
            # the body is dynamic state: resume mid-trajectory. The
            # statics were rebuilt from the (resume-key-matched) spec
            # above; the stored reference configuration is the row-
            # alignment witness — restored (pos, vel) rows are hash-
            # sorted by x0, and a different grid could permute them.
            res_estate, res_x0 = resume_elastic[0]
            if not np.array_equal(res_x0, np.asarray(statics_e.x0)):
                if args.allow_resume_mismatch:
                    log.warning("elastic reference configuration in %s "
                                "does not match the rebuilt body "
                                "(grid/scene drift) — the --elastic-box "
                                "body restarts at its spawn pose",
                                args.resume)
                else:
                    log.error("refusing to resume %s: its elastic body's "
                              "reference configuration does not match "
                              "this run's rebuilt body (grid or scene "
                              "drift would silently permute the restored "
                              "rows) — pass --allow-resume-mismatch to "
                              "restart the body at its spawn pose",
                              args.resume)
                    return 2
            else:
                if plastic_e and res_estate.plastic is None:
                    # pre-plasticity checkpoint under a now-plastic run
                    # (key absent → no resume mismatch): virgin E_p
                    import dataclasses as _dcl

                    import jax.numpy as _jnp
                    res_estate = _dcl.replace(
                        res_estate, plastic=_jnp.zeros(
                            (statics_e.n, 3, 3), cfg.dtype))
                elastic_holder[0] = res_estate
                log.info("resumed elastic body at ycom=%.4f",
                         float(np.asarray(res_estate.pos)[:, 1].mean()))
        elif args.resume:
            log.warning("checkpoint %s carries no elastic body — the "
                        "--elastic-box body restarts at its spawn pose",
                        args.resume)

    try:
        step, run_state, to_host = build_stepper(grid, boundary, state)
    except SystemExit as e:
        log.error("%s", e)
        return 2

    exporter = None
    if args.export != "none":
        from .export import FrameExporter
        exporter = FrameExporter(args.out, args.export,
                                 watch=bool(args.watch))

    control = None
    if args.control:
        from .control import ControlChannel
        control = ControlChannel(f"{args.out}_control.json", log)
        log.info("runtime control live: write %s (pause/drop/camera/"
                 "stop; see nereus_tpu/app/control.py)", control.path)

    drop_pts = None
    if args.drop_cube_every:
        if args.shards > 1:
            log.error("--drop-cube-every is single-chip only")
            return 2
        from nereus_tpu.scene import particle_cube
        spacing = float(params.interaction_radius) - 0.005
        drop_pts = particle_cube((0.25, 0.55, 0.25), (0.12, 0.12, 0.12),
                                 spacing)

    emit_jit = emit_every = None
    if args.emit:
        if args.shards > 1:
            log.error("--emit is single-chip only")
            return 2
        import jax
        epos, evel, emit_every = _parse_emit(args.emit)
        sp = 2.0 * float(params.particle_radius)
        # 3x3 patch perpendicular to the dominant velocity axis
        ax = int(np.argmax(np.abs(evel))) if any(evel) else 1
        o1, o2 = [d for d in range(3) if d != ax]
        pts = []
        for a in (-sp, 0.0, sp):
            for b in (-sp, 0.0, sp):
                q = list(epos)
                q[o1] += a
                q[o2] += b
                pts.append(q)
        epts = np.asarray(pts, np.float32)
        evels = np.broadcast_to(
            np.asarray(evel, np.float32), epts.shape).copy()
        emit_jit = jax.jit(
            lambda s: nt.add_particles_traced(s, epts, evels))
        log.info("emitter: %d particles at %s vel %s every %d steps",
                 len(epts), epos, evel, emit_every)

    # Overflow diagnostics are tracked as a running on-device max across
    # steps — a long sharded run that exceeds a heuristically sized
    # capacity must be surfaced even if the final step looks clean.
    _OVF_FIELDS = ("seg_overflow", "halo_overflow", "migration_overflow",
                   "capacity_overflow", "migration_violation")
    ovf_max = {}

    def track_overflow(diag):
        import jax.numpy as jnp
        for f in _OVF_FIELDS:
            v = getattr(diag, f, None)
            if v is not None:
                ovf_max[f] = (v if f not in ovf_max
                              else jnp.maximum(ovf_max[f], v))

    def _apply_control(cmds):
        # one-shot commands from the control file (ControlChannel seq-
        # gates them); runs between steps, so device state is consistent
        nonlocal run_state, n
        if "camera" in cmds and exporter is not None:
            from .control import orbit_camera
            cam = orbit_camera(cmds["camera"])
            exporter.render_kwargs["camera"] = cam
            log.info("camera -> eye=%s target=%s",
                     tuple(round(v, 3) for v in cam.eye), cam.target)
            if control.paused:
                # pause -> inspect: re-render the frozen state so
                # latest.png reflects the new view immediately
                hs = to_host(run_state)
                na = int(np.asarray(hs.num_active).sum())
                exporter.add(np.asarray(hs.pos)[:na],
                             np.asarray(hs.vel)[:na],
                             np.asarray(hs.pressure)[:na])
        if cmds.get("drop"):
            if args.shards > 1:
                log.warning("control drop ignored (single-chip only)")
            else:
                from nereus_tpu.scene import particle_cube
                spec = cmds["drop"]
                if isinstance(spec, (list, tuple)) and len(spec) == 4:
                    center, side = tuple(spec[:3]), float(spec[3])
                else:
                    center, side = (0.25, 0.55, 0.25), 0.12
                spacing = float(params.interaction_radius) - 0.005
                pts = particle_cube(center, (side,) * 3, spacing)
                try:
                    run_state = nt.add_particles(run_state, pts)
                    n = int(run_state.num_active)
                    log.info("control drop: %d particles at %s "
                             "(live: %d)", len(pts), center, n)
                except ValueError as e:
                    log.warning("control drop skipped: %s", e)
        if cmds.get("stop"):
            log.info("stopped by control file")

    meter = StepMeter(n, report_every=args.report_every, logger=log)
    t0 = time.perf_counter()
    diag = None
    with profile_trace(args.profile_dir):
        for i in range(step0, step0 + args.steps):
            if control is not None and control.pump(_apply_control):
                break
            if args.refit_every and i > step0 \
                    and (i - step0) % args.refit_every == 0:
                from nereus_tpu.boundary import rehash_boundary
                hs = to_host(run_state)
                grid = nt.refit_grid(hs, float(params.interaction_radius),
                                     boundary=boundary, dtype=cfg.dtype)
                if boundary is not None:
                    boundary = rehash_boundary(boundary, grid)
                log.info("step %d: grid refit to %s", i,
                         np.asarray(grid.size).tolist())
                step, run_state, to_host = build_stepper(grid, boundary, hs)
            if emit_jit is not None and i and i % emit_every == 0:
                import jax.numpy as jnp
                run_state, eovf = emit_jit(run_state)
                ovf_max["emit_overflow"] = (
                    eovf if "emit_overflow" not in ovf_max
                    else jnp.maximum(ovf_max["emit_overflow"], eovf))
            if drop_pts is not None and i and i % args.drop_cube_every == 0:
                try:
                    run_state = nt.add_particles(run_state, drop_pts)
                    n = int(run_state.num_active)
                    log.info("dropped %d particles (live: %d)",
                             len(drop_pts), n)
                except ValueError as e:
                    log.warning("drop skipped: %s", e)
            if args.wavemaker:
                import jax.numpy as jnp
                t_sim = i * float(np.asarray(params.dt))
                run_state, diag = step(run_state, jnp.asarray(
                    t_sim, cfg.dtype))
            else:
                run_state, diag = step(run_state)
            if drain is not None:
                run_state = drain(run_state)
            track_overflow(diag)
            meter.tick()
            if exporter is not None and i % args.export_every == 0:
                hs = to_host(run_state)
                na = int(np.asarray(hs.num_active).sum())
                exporter.add(np.asarray(hs.pos)[:na],
                             np.asarray(hs.vel)[:na],
                             np.asarray(hs.pressure)[:na])
            if args.export_mesh and i % args.export_mesh == 0:
                from .surface import reconstruct_surface, write_obj
                hs = to_host(run_state)
                na = int(np.asarray(hs.num_active).sum())
                verts, faces = reconstruct_surface(
                    np.asarray(hs.pos)[:na],
                    float(params.interaction_radius),
                    particle_radius=float(params.particle_radius),
                    spacing=args.mesh_spacing)
                os.makedirs(args.out, exist_ok=True)
                write_obj(os.path.join(args.out, f"mesh_{i:05d}.obj"),
                          verts, faces)
            if args.checkpoint_every and i and i % args.checkpoint_every == 0:
                save_checkpoint(f"{args.out}_ckpt_{i:06d}.npz",
                                to_host(run_state), step=i, extra=desc,
                                bodies=(body_holder[0],)
                                if body_holder[0] is not None else None,
                                elastic=((elastic_holder[0],
                                          elastic_ctx[0][0]),)
                                if elastic_holder[0] is not None else None)
        jax.block_until_ready(run_state.pos)
    dt_wall = time.perf_counter() - t0
    if drain is not None:
        # the live count changed on device; refresh for the summary
        n = int(np.asarray(to_host(run_state).num_active).sum())
    if exporter is not None:
        exporter.close()

    ovf_max = {k: int(np.asarray(v)) for k, v in ovf_max.items()}
    bad = False
    if ovf_max.get("seg_overflow", 0) > 0:
        log.warning("neighbor window overflow by %d — increase --seg-window "
                    "(results truncated!)", ovf_max["seg_overflow"])
        bad = True
    for f in _OVF_FIELDS[1:]:
        if ovf_max.get(f, 0) > 0:
            log.warning("sharded %s = %d at some step — particles were "
                        "lost; increase the corresponding ShardConfig "
                        "capacity", f, ovf_max[f])
            bad = True
    summary = {
        "steps": args.steps, "particles": n,
        "wall_s": round(dt_wall, 3),
        "particle_steps_per_sec": round(args.steps * n / dt_wall, 1),
        "mean_density_error": float(np.asarray(diag.mean_density_error)),
        "mean_compression": float(np.asarray(diag.mean_compression)),
        "max_density": float(np.asarray(diag.max_density)),
        **ovf_max,
    }
    if hasattr(diag, "solver_iters"):
        summary["solver_iters"] = int(np.asarray(diag.solver_iters))
    if elastic_holder[0] is not None:
        e_pos = np.asarray(elastic_holder[0].pos)
        summary["elastic_ycom"] = round(float(e_pos[:, 1].mean()), 4)
        if not np.isfinite(e_pos).all():
            log.warning("elastic body state is non-finite")
            bad = True
    log.info("done: %s", json.dumps(summary))
    print(json.dumps(summary))
    return 3 if bad else 0


def cmd_info(_args):
    import jax
    info = {
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "device_count": jax.device_count(),
    }
    print(json.dumps(info, indent=2))
    return 0


def main(argv=None):
    args = _build_parser().parse_args(argv)
    if args.cmd == "run":
        return cmd_run(args)
    if args.cmd == "info":
        return cmd_info(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
