#!/usr/bin/env python
"""Benchmarks. Default: the headline (WCSPH particle-steps/sec at ~1M
particles, one chip) as ONE JSON line {"metric", "value", "unit",
"vs_baseline"} — the driver contract.

``--all`` additionally regenerates every BASELINE.md row (one JSON line
each), so round-over-round regressions are mechanical to spot:

    python bench.py --all            # full table
    python bench.py --cases wcsph_1M,iisph_256k

The reference (Mathiasb17/Nereus) publishes no numbers (BASELINE.md); its
hard particle cap is 150k (`sph/sph.h:19`) and its demo renders at
interactive rates, so the operative baseline is taken as 1e7
particle-steps/sec — a generous estimate of the CUDA build at its 150k cap
running ~66 fps with the per-step PCIe round-trip it performs
(`sph/sph.cpp:233-234,283-284`). ``vs_baseline`` = measured / 1e7.

All timings use the honest harness: steps chained inside ONE jit via
``lax.fori_loop`` with the carry threading the state, result forced to
host (per-step dispatch over a tunneled runtime otherwise dominates, and
``block_until_ready`` alone is not a reliable fence there).
"""

import argparse
import json
import sys
import time

BASELINE_PARTICLE_STEPS_PER_SEC = 1.0e7


def _require_devices(timeout_s: float = 300.0):
    """Fail fast (with the contract JSON line) when the TPU runtime never
    comes up. ``jax.devices()`` over the tunneled runtime HANGS forever when
    the relay is down (observed round 4) — a bench that hangs produces no
    JSON at all, which is worse than an honest zero."""
    import threading
    done = threading.Event()
    out = {}

    def probe():
        import jax
        out["devices"] = jax.devices()
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print(json.dumps({
            "metric": "wcsph_particle_steps_per_sec_1M",
            "value": 0.0,
            "unit": "particle-steps/sec",
            "vs_baseline": 0.0,
        }))
        print(f"# bench failed: device init did not complete within "
              f"{timeout_s:.0f}s (TPU tunnel down?)", file=sys.stderr)
        import os
        os._exit(1)
    return out["devices"]


def _chain_and_time(step_fn, state, n_steps, donate=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    def chain(s):
        def body(i, carry):
            st, ovf, derr, dcmp, iters = carry
            st2, d = step_fn(st)
            return (st2, ovf + d.seg_overflow,
                    derr + d.mean_density_error,
                    dcmp + d.mean_compression,
                    iters + d.solver_iters)
        return jax.lax.fori_loop(
            0, n_steps, body,
            (s, jnp.int32(0), jnp.float32(0), jnp.float32(0),
             jnp.int32(0)))

    # donate=True: XLA writes the new state over the input's buffers --
    # the peak-memory mode a python-loop user gets (the 14M row fits
    # ONLY donated: 15.43G plain vs 14.96G donated of 15.75G HBM,
    # tools/memaudit.py). The timed second chain then starts from the
    # warm run's end state (steps S..2S of the fall) -- same work.
    chain = jax.jit(chain, donate_argnums=0) if donate else jax.jit(chain)
    st, ovf, derr, dcmp, iters = chain(state)    # compile + warm run
    float(np.asarray(derr))
    t0 = time.perf_counter()
    st, ovf, derr, dcmp, iters = chain(st if donate else state)
    derr_total = float(np.asarray(derr))   # forces completion
    dt = time.perf_counter() - t0
    return dict(steps_per_sec=n_steps / dt,
                seg_overflow=float(np.asarray(ovf)),
                mean_density_error=derr_total / n_steps,
                mean_compression=float(np.asarray(dcmp)) / n_steps,
                solver_iters=float(np.asarray(iters)) / n_steps)


def _scene(nt, scene, params, cfg, n_target, with_boundary,
           settle_spacing=None):
    if with_boundary == "settled":
        # resting block on the floor of a tight box: implicit solvers face
        # real compression from step 1 (the free-fall dam-break gives them
        # nothing to solve for its first dozens of steps). settle_spacing
        # is the SAME value the caller calibrated the mass to — computed
        # once in run_case (a spacing/calibration mismatch is the
        # documented explosive failure, see resting_block).
        return scene.resting_block(params, cfg, n_target=n_target,
                                   spacing=settle_spacing,
                                   impact_velocity=-1.0)
    return scene.dam_break(params, cfg, n_target=n_target,
                           with_boundary=with_boundary)


def _run_physics_case(name, n_steps=10, scale=1.0):
    """Flagship-physics rows on the real chip: pure elastic (static-plan
    sweeps, no per-step ctx), elastoplastic, fluid–elastic coupling,
    DFSPH rigid coupling, and the round-5 multiphase × rigid composition.
    Scenes mirror the validated test scenes (tests/test_elastic*.py,
    test_dfsph_coupled.py, test_multiphase_coupled.py) scaled up."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import nereus_tpu as nt
    from nereus_tpu.params import calibrate_mass
    from nereus_tpu.solvers.wcsph import StepDiagnostics
    from nereus_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    # pallas explicitly: that is the TPU production path, and it makes a
    # CPU smoke run (--scale) exercise the same code via interpret mode
    # (solid lattices overflow the segment oracle's default seg_window)
    cfg = nt.SimConfig(engine="pallas")

    if name in ("elastic_512k", "elastic_plastic_512k"):
        plastic = name == "elastic_plastic_512k"
        # 80^3 solid block (spacing h/2) resting on its contact floor
        # under gravity: the penalty floor loads the bottom layers, so
        # stress/plastic-return math runs on real deformation
        params = nt.make_params(dt=1e-4)
        h = float(np.asarray(params.interaction_radius))
        sp = 0.5 * h
        n_side = max(int(round(80 * scale ** (1 / 3))), 6)
        side = (n_side - 1) * sp
        pts = nt.sample_box_solid((0.0, 0.5 * sp, 0.0),
                                  (side + 0.1 * sp, 0.5 * sp + side + 0.1 * sp,
                                   side + 0.1 * sp), sp)
        ep = nt.elastic_params(
            2e5, 0.3, damping=5.0, floor_y=0.0,
            yield_strain=(0.02 if plastic else np.inf))
        estate, statics, grid = nt.make_elastic_solid(
            pts, params, cfg, sp, plastic=plastic)
        n = statics.n

        def step(e):
            e2, d = nt.elastic_step(e, statics, params, ep, grid, cfg)
            z = jnp.asarray(0.0, cfg.dtype)
            return e2, StepDiagnostics(
                max_density=z, mean_density_error=z, mean_compression=z,
                seg_overflow=d.seg_overflow,
                solver_iters=jnp.asarray(0, jnp.int32))
        state = estate

    elif name == "wcsph_elastic_256k":
        # dam-break at 256k slamming into a soft 16^3 cube parked on the
        # floor in its path (two-way coupling: per-sample reaction +
        # 4 elastic substeps per fluid step)
        from nereus_tpu import scene
        params = nt.make_params()
        state, grid, boundary = scene.dam_break(
            params, cfg, n_target=max(int(256_000 * scale), 400),
            with_boundary=True)
        h = float(np.asarray(params.interaction_radius))
        sp = 0.5 * h
        nf = int(np.asarray(state.num_active))
        posf = np.asarray(state.pos)[:nf]
        floor_y = float(np.asarray(boundary.pos)[:, 1].min())
        cx = posf[:, 0].max() + 0.3
        cz = float(posf[:, 2].mean())
        side = max(int(round(15 * scale ** (1 / 3))), 3) * sp
        cube = nt.sample_box_solid(
            (cx, floor_y + 2 * sp, cz - side / 2),
            (cx + side + 0.1 * sp, floor_y + 2 * sp + side + 0.1 * sp,
             cz + side / 2 + 0.1 * sp), sp)
        ep = nt.elastic_params(1e5, 0.3, damping=5.0, floor_y=floor_y)
        estate, statics, _ = nt.make_elastic_solid(cube, params, cfg, sp,
                                                   grid=grid, density=400.0)
        psi = nt.elastic_psi(statics, params, cfg)
        n = nf + statics.n

        def step(s):
            fs, es = s
            nfs, nes, d = nt.wcsph_elastic_step(fs, params, grid, cfg, es,
                                                statics, ep, psi, boundary,
                                                substeps=4)
            return (nfs, nes), d
        state = (state, estate)

    elif name == "mp_coupled_256k":
        # the round-5 flagship composition: a rigid box dropped onto a
        # 256k TWO-PHASE tank (multiphase WCSPH + the multiphase_body_pair
        # contact; adapted densities, per-query-phase psi rescale)
        from nereus_tpu.scene import resting_block
        base = nt.make_params()
        spacing = 0.8 * float(base.interaction_radius)
        params = calibrate_mass(base, cfg, spacing=spacing)
        state, grid, walls = resting_block(
            params, cfg, n_target=max(int(256_000 * scale), 343),
            spacing=spacing, impact_velocity=-1.0)
        nf = int(np.asarray(state.num_active))
        posf = np.asarray(state.pos)[:nf]
        rd = float(np.asarray(params.rest_density))
        pm = float(np.asarray(params.particle_mass))
        y_cut = np.quantile(posf[:, 1], 0.5)
        rho0 = np.full(state.capacity, rd, np.float32)
        rho0[:nf] = np.where(posf[:, 1] >= y_cut, rd * 0.4, rd)
        state = nt.FluidState(
            pos=state.pos, vel=state.vel, pressure=state.pressure,
            num_active=state.num_active,
            mass=jnp.asarray(rho0 * (pm / rd), cfg.dtype),
            rho0=jnp.asarray(rho0, cfg.dtype))
        water_top = float(posf[:, 1].max())
        cx = float(posf[:, 0].mean())
        cz = float(posf[:, 2].mean())
        body = nt.make_rigid_box((cx, water_top + 0.1, cz),
                                 (0.15, 0.15, 0.15),
                                 float(params.particle_radius), 600.0,
                                 params)
        n = nf + body.num_samples

        def step(s):
            fs, b = s
            nfs, nb, d = nt.wcsph_coupled_step(fs, params, grid, cfg, b,
                                               walls)
            return (nfs, nb), d
        state = (state, body)

    elif name == "dfsph_coupled_256k":
        # settled 256k DFSPH tank + a density-400 rigid box dropped onto
        # it: Gauss–Seidel interface with per-iteration reaction psum,
        # body-mobility diagonal on (strong coupling)
        from nereus_tpu.scene import resting_block
        base = nt.dfsph_params(dt=5e-4)
        spacing = 0.8 * float(base.interaction_radius)
        params = calibrate_mass(base, cfg, spacing=spacing)
        state, grid, walls = resting_block(
            params, cfg, n_target=max(int(256_000 * scale), 343),
            spacing=spacing, impact_velocity=-1.0)
        nf = int(np.asarray(state.num_active))
        posf = np.asarray(state.pos)[:nf]
        water_top = float(posf[:, 1].max())
        cx = float(posf[:, 0].mean())
        cz = float(posf[:, 2].mean())
        body = nt.make_rigid_box((cx, water_top + 0.1, cz),
                                 (0.15, 0.15, 0.15),
                                 float(params.particle_radius), 400.0,
                                 params)
        n = nf + body.num_samples

        def step(s):
            fs, b = s
            nfs, nb, d = nt.dfsph_coupled_step(fs, params, grid, cfg, b,
                                               walls)
            return (nfs, nb), d
        state = (state, body)
    else:
        raise KeyError(name)

    r = _chain_and_time(step, state, n_steps)
    value = r["steps_per_sec"] * n
    return {
        "metric": f"{name}_particle_steps_per_sec",
        "value": value,
        "unit": "particle-steps/sec",
        "vs_baseline": value / BASELINE_PARTICLE_STEPS_PER_SEC,
        "n": n,
        "ms_per_step": 1e3 / r["steps_per_sec"],
        "seg_overflow": r["seg_overflow"],
        "mean_density_error": r["mean_density_error"],
        "mean_compression": r["mean_compression"],
        "solver_iters_per_step": r["solver_iters"],
    }


PHYSICS_CASES = ("elastic_512k", "elastic_plastic_512k",
                 "wcsph_elastic_256k", "dfsph_coupled_256k",
                 "mp_coupled_256k")


def run_case(name, n_steps=10, scale=1.0):
    """Run one named benchmark case; returns a result dict."""
    import jax  # noqa: F401
    import numpy as np
    import nereus_tpu as nt
    from nereus_tpu import scene
    from nereus_tpu.params import calibrate_mass
    from nereus_tpu.utils import enable_compilation_cache

    if name in PHYSICS_CASES:
        return _run_physics_case(name, n_steps, scale=scale)

    enable_compilation_cache()

    solver, n_target, with_boundary = {
        # staged BASELINE configs (BASELINE.md)
        "wcsph_150k": ("wcsph", 150_000, False),
        "wcsph_1M": ("wcsph", 2 ** 20, False),
        "wcsph_2M": ("wcsph", 2 ** 21, False),
        "wcsph_4M": ("wcsph", 2 ** 22, False),
        "wcsph_8M": ("wcsph", 2 ** 23, False),
        "wcsph_10M": ("wcsph", 10_000_000, False),
        # past ~2^24 grid cells (dam-break geometry crosses it near 20M
        # particles) the engine runs wide bitcast-int32 hashes
        "wcsph_20M": ("wcsph", 20_000_000, False),
        # the wide-hash row that FITS one v5e's 16G HBM (wcsph_20M needs
        # 19.95G — measured OOM): 12M particles with the domain stretched
        # along z (the hash-major axis) past 2^24 cells, so the mod-2^24
        # wide payloads run for real at scale (same fluid; the extra
        # cells are empty and cost nothing — the engine has no dense
        # cell arrays)
        "wcsph_wide12M": ("wcsph", 12_000_000, False),
        # the measured single-chip HBM ceiling row (round 5): 14.2M fits
        # at 15.43G of 15.75G; 16M extrapolates to ~17.6G (memaudit
        # scaling law, 12M=13.2G / 14M=15.4G) and cannot fit
        "wcsph_14M": ("wcsph", 14_000_000, False),
        "iisph_1M": ("iisph", 2 ** 20, False),
        "wcsph_boundary_274k": ("wcsph", 256_000, True),
        "iisph_256k": ("iisph", 256_000, False),
        "pcisph_256k": ("pcisph", 256_000, False),
        # settled-state rows: solver_iters_per_step must exceed the
        # configured minimum or the row is not pricing a real solve
        "iisph_256k_settled": ("iisph", 256_000, "settled"),
        "pcisph_256k_settled": ("pcisph", 256_000, "settled"),
        # settled WCSPH: makes the compression-side density error
        # assessable against the reference's ~1% criterion (free-fall
        # rows read ~0.17 |.| error from pure surface rarefaction)
        "wcsph_256k_settled": ("wcsph", 256_000, "settled"),
        # the 1M implicit row must price a real solve (the free-fall
        # iisph_1M exits at min iterations)
        "iisph_1M_settled": ("iisph", 2 ** 20, "settled"),
        # the honest steady-state headline companion: the dam-break 1M
        # row free-falls at ~7 neighbors/query; this one prices the
        # settled ~30-neighbor regime the engine actually serves
        "wcsph_1M_settled": ("wcsph", 2 ** 20, "settled"),
        # beyond-reference solver (Bender & Koschier DFSPH)
        "dfsph_256k_settled": ("dfsph", 256_000, "settled"),
        # beyond-reference: Weiler-2018 implicit viscosity (honey regime,
        # nu = 100x default) — prices the per-step CG matvec sweeps; the
        # impacting block gives the solve real shear from step 1
        "dfsph_visc_256k_settled": ("dfsph_visc", 256_000, "settled"),
        # beyond-reference solver (Macklin & Muller PBF): fixed-iteration
        # position projection -- the real-time method, so a free-fall 1M
        # row is honest (every step costs the same 2*pbf_iters sweeps)
        "pbf_1M": ("pbf", 2 ** 20, False),
        "pbf_256k_settled": ("pbf", 256_000, "settled"),
        # beyond-reference: two-phase WCSPH (adapted-density multiphase,
        # ratio 0.3 on the top half = stable oil-on-water) — prices the
        # 16-row wide source pack the multiphase force sweep ships
        "multiphase_1M": ("multiphase", 2 ** 20, False),
        "sharded_wcsph_1M": ("sharded_wcsph", 2 ** 20, False),
        "sharded_iisph_256k": ("sharded_iisph", 256_000, False),
        "sharded_dfsph_256k": ("sharded_dfsph", 256_000, False),
    }[name]

    cfg_kw = {}
    if name in ("wcsph_8M", "wcsph_10M", "wcsph_20M", "wcsph_wide12M",
                "wcsph_14M"):
        # fused dz-spans scale with the grid's x-extent; at 193^3+ grids
        # the default 3x512 coverage misses (47k/225k plan misses
        # measured at 8M/10M) — 3x640 covers both cleanly
        cfg_kw["sweep_win"] = 640
    # auto defaults (fused 3-row windows: block 152, win 512) cover every
    # other row, measured: 0 plan misses at 150k/1M/2M/4M dam-break,
    # boundary_274k, and the settled scenes at 256k/1M
    if solver == "dfsph_visc":
        cfg_kw["viscosity_model"] = "implicit"
    import os as _os
    wf = _os.environ.get("NEREUS_PCISPH_WARM_FRAC")
    if wf and solver == "pcisph":
        # round-5 warm-fraction scan knob (settled row only; the loop
        # only ADDS pressure, so fractions near 1 risk overshoot lock-in
        # -- measured before any default change)
        cfg_kw["pcisph_warm_frac"] = float(wf)
    cfg = nt.SimConfig(**cfg_kw)
    if solver in ("iisph", "sharded_iisph"):
        params = nt.iisph_params()
    elif solver in ("dfsph", "sharded_dfsph"):
        params = nt.dfsph_params()
    elif solver == "dfsph_visc":
        params = nt.dfsph_params(viscosity=5.0)
    elif solver == "pbf":
        params = calibrate_mass(nt.pbf_params(), cfg)
    elif solver == "pcisph":
        params = calibrate_mass(nt.pcisph_params(), cfg)
    else:
        params = nt.make_params()
    settle_spacing = None
    if with_boundary == "settled":
        # ONE spacing value feeds both the mass calibration and the scene
        # lattice (resting_block documents why they must agree)
        settle_spacing = 0.8 * float(params.interaction_radius)
        params = calibrate_mass(params, cfg, spacing=settle_spacing)
    state, grid, boundary = _scene(nt, scene, params, cfg, n_target,
                                   with_boundary, settle_spacing)
    n = int(np.asarray(state.num_active).sum())

    if name == "wcsph_wide12M":
        import math
        gx, gy, gz = (int(v) for v in grid.size)
        gz_wide = max(int(math.ceil((2 ** 24 * 1.05) / (gx * gy))), gz)
        grid = nt.make_grid(np.asarray(grid.origin),
                            (gx, gy, gz_wide), float(grid.cell[0]))
        assert grid.num_cells > 2 ** 24, grid.size

    if solver == "multiphase":
        # top half of the fluid (by y) at rest density 0.3*rho0 — same
        # construction as the CLI's --second-phase 0.3:0.5 (cli.py)
        import jax.numpy as jnp
        n0 = int(np.asarray(state.num_active))
        pos_h = np.asarray(state.pos)[:n0]
        y_cut = np.quantile(pos_h[:, 1], 0.5)
        rd = float(np.asarray(params.rest_density))
        pm = float(np.asarray(params.particle_mass))
        rho0_full = np.full(state.capacity, rd)
        rho0_full[:n0] = np.where(pos_h[:, 1] >= y_cut, rd * 0.3, rd)
        state = nt.FluidState(
            pos=state.pos, vel=state.vel, pressure=state.pressure,
            num_active=state.num_active,
            mass=jnp.asarray(rho0_full * (pm / rd), cfg.dtype),
            rho0=jnp.asarray(rho0_full, cfg.dtype))

    if solver in ("wcsph", "multiphase"):
        step = lambda s: nt.wcsph_step(s, params, grid, cfg, boundary)  # noqa: E731
    elif solver == "iisph":
        step = lambda s: nt.iisph_step(s, params, grid, cfg, boundary)  # noqa: E731
    elif solver in ("dfsph", "dfsph_visc"):
        step = lambda s: nt.dfsph_step(s, params, grid, cfg, boundary)  # noqa: E731
    elif solver == "pbf":
        step = lambda s: nt.pbf_step(s, params, grid, cfg, boundary)  # noqa: E731
    elif solver == "pcisph":
        delta = nt.pcisph_delta(params, cfg)
        # settled row: tighten the corrective tolerance from the default
        # 1% to the 0.1% the reference's IISPH loop uses (its PCISPH is an
        # empty stub, sph_cuda.cu:944-952 — no upstream tolerance exists)
        # so the loop is driven by measured density error, not the minimum
        tol = {"settled": 0.001}.get(with_boundary, 0.01)
        step = lambda s: nt.pcisph_step(  # noqa: E731
            s, params, grid, cfg, boundary, delta=delta, tol_frac=tol)
    else:  # sharded_* — N z-slabs over ALL reachable chips (1 today; on a
        # pod the same command produces the N-chip row unmodified)
        from jax.sharding import Mesh
        from nereus_tpu.parallel import (ShardConfig,
                                         make_sharded_dfsph_step,
                                         make_sharded_iisph_step,
                                         make_sharded_wcsph_step,
                                         shard_state)
        import jax
        devs = jax.devices()
        mesh = Mesh(np.array(devs), ("shards",))
        # dam-break fluid concentrates in a fraction of the z-slabs, so
        # size every slab for the whole set (cheap at these n)
        scfg = ShardConfig(n_shards=len(devs), local_capacity=n + 256)
        state = shard_state(state, grid, scfg, mesh)
        make = {"sharded_iisph": make_sharded_iisph_step,
                "sharded_dfsph": make_sharded_dfsph_step,
                "sharded_wcsph": make_sharded_wcsph_step}[solver]
        step = make(mesh, params, grid, cfg, scfg, boundary)
        # sharded step is already jitted and returns ShardedDiagnostics
        # (same fields used below)

    r = _chain_and_time(step, state, n_steps, donate=(name == "wcsph_14M"))
    value = r["steps_per_sec"] * n
    return {
        "metric": f"{name}_particle_steps_per_sec",
        "value": value,
        "unit": "particle-steps/sec",
        "vs_baseline": value / BASELINE_PARTICLE_STEPS_PER_SEC,
        "n": n,
        "ms_per_step": 1e3 / r["steps_per_sec"],
        "seg_overflow": r["seg_overflow"],
        "mean_density_error": r["mean_density_error"],
        "mean_compression": r["mean_compression"],
        "solver_iters_per_step": r["solver_iters"],
    }


def main():
    _require_devices()
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="run every BASELINE.md case (one JSON line each)")
    ap.add_argument("--cases", default=None,
                    help="comma-separated case names")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="size multiplier for the physics cases "
                         "(CPU smoke runs)")
    args = ap.parse_args()

    all_cases = ["wcsph_150k", "wcsph_1M", "wcsph_boundary_274k",
                 "iisph_256k", "pcisph_256k", "iisph_256k_settled",
                 "pcisph_256k_settled", "wcsph_256k_settled",
                 "sharded_wcsph_1M", "sharded_iisph_256k",
                 "sharded_dfsph_256k", "wcsph_2M",
                 "wcsph_4M", "wcsph_8M", "wcsph_10M", "wcsph_wide12M", "iisph_1M",
                 "iisph_1M_settled", "dfsph_256k_settled",
                 "dfsph_visc_256k_settled",
                 "pbf_1M", "pbf_256k_settled", "multiphase_1M",
                 "wcsph_1M_settled", "elastic_512k", "elastic_plastic_512k",
                 "wcsph_elastic_256k", "dfsph_coupled_256k",
                 "mp_coupled_256k", "wcsph_14M"]
    if args.cases:
        cases = args.cases.split(",")
    elif args.all:
        cases = all_cases
    else:
        cases = None  # headline contract

    if cases is None:
        try:
            r = run_case("wcsph_1M", n_steps=args.steps)
            print(json.dumps({
                "metric": "wcsph_particle_steps_per_sec_1M",
                "value": r["value"],
                "unit": "particle-steps/sec",
                "vs_baseline": r["vs_baseline"],
            }))
            print(f"# n={r['n']} seg_overflow={r['seg_overflow']} "
                  f"mean_density_err={r['mean_density_error']:.4f} "
                  f"mean_compression={r['mean_compression']:.4f}",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — always emit the JSON line
            print(json.dumps({
                "metric": "wcsph_particle_steps_per_sec_1M",
                "value": 0.0,
                "unit": "particle-steps/sec",
                "vs_baseline": 0.0,
            }))
            print(f"# bench failed: {e!r}", file=sys.stderr)
            raise
        return

    if len(cases) == 1:
        try:
            print(json.dumps(run_case(cases[0], n_steps=args.steps,
                                      scale=args.scale)),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — keep the table going
            print(json.dumps({"metric": cases[0], "error": repr(e)}),
                  flush=True)
        return

    # One subprocess per case: a transient TPU-backend error (the
    # tunneled runtime occasionally wedges a process's TPU client) must
    # not poison every following row of the table.
    import subprocess
    for name in cases:
        r = subprocess.run(
            [sys.executable, __file__, "--cases", name,
             "--steps", str(args.steps)],
            capture_output=True, text=True)
        line = [ln for ln in r.stdout.strip().splitlines()
                if ln.startswith("{")]
        if line:
            print(line[-1], flush=True)
        else:
            print(json.dumps({"metric": name,
                              "error": r.stderr.strip()[-400:]}),
                  flush=True)


if __name__ == "__main__":
    main()
