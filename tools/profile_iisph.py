#!/usr/bin/env python
"""Profile a SETTLED IISPH step on the real chip (VERDICT r3 item #3b).

The settled rows (scene.resting_block) are the only benches that price a
real Jacobi solve; this tool splits their cost:

  ctx      — hash-sort + window planning (build_pallas_ctx)
  step     — full iisph_step at the production tolerance (dynamic iters)
  fixedK   — iisph_step pinned to exactly K Jacobi iterations (min=max=K)
             for K in --fixed (default 2,12): the difference divided by
             the iteration delta is the marginal cost of ONE Jacobi
             iteration (2 sweeps + repack + error reduce), separating it
             from the predict/setup phase.

Timing uses the honest harness: S steps chained in one jit via
lax.fori_loop with a data dependence, result forced to host. With
--trace DIR, also writes an xprof trace of a few full steps.

Usage: python tools/profile_iisph.py [--n 262144] [--steps 5]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262_144)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--block", type=int, default=0)
    ap.add_argument("--win", type=int, default=0)
    ap.add_argument("--fixed", default="2,12")
    ap.add_argument("--pieces", default="ctx,step,fixed")
    ap.add_argument("--trace", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import nereus_tpu as nt
    from nereus_tpu import scene
    from nereus_tpu.params import calibrate_mass
    from nereus_tpu.solvers.pallas_common import build_pallas_ctx
    from nereus_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = nt.SimConfig(sweep_block=args.block, sweep_win=args.win)
    params = nt.iisph_params()
    sp = 0.8 * float(params.interaction_radius)
    params = calibrate_mass(params, cfg, spacing=sp)
    state, grid, boundary = scene.resting_block(
        params, cfg, n_target=args.n, spacing=sp, impact_velocity=-1.0)
    n = int(np.asarray(state.num_active))
    S = args.steps
    pieces = args.pieces.split(",")
    print(f"n={n} grid={grid.size} steps={S} "
          f"block={cfg.resolve_block(True)} win={cfg.resolve_win(True)}")

    def chain_steps(cfg_k):
        @jax.jit
        def run(s):
            def body(_, carry):
                st, acc = carry
                st = dataclasses.replace(st, pos=st.pos + acc * 1e-20)
                st, diag = nt.iisph_step(st, params, grid, cfg_k, boundary)
                return (st, acc
                        + (diag.mean_density_error * 1e-30
                           + diag.solver_iters.astype(st.pos.dtype)))
            st, acc = jax.lax.fori_loop(0, S, body, (s, jnp.zeros((), s.pos.dtype)))
            return acc
        return run

    if "ctx" in pieces:
        @jax.jit
        def ctx_chain(s):
            def body(_, carry):
                st, acc = carry
                st = dataclasses.replace(st, pos=st.pos + acc * 1e-20)
                ctx = build_pallas_ctx(st, params, grid, cfg, boundary)
                a = (jnp.sum(ctx.anchors[::997].astype(jnp.float32))
                     + ctx.miss).astype(st.pos.dtype)
                return (st, acc + a * 1e-30)
            return jax.lax.fori_loop(0, S, body,
                                     (s, jnp.zeros((), s.pos.dtype)))[1]

        t = timed(ctx_chain, state)
        print(f"ctx    : {1e3 * t / S:8.2f} ms/step")

    results = {}
    if "step" in pieces:
        run = chain_steps(cfg)
        t = timed(run, state)
        iters = float(np.asarray(run(state))) / S
        results["step"] = (t, iters)
        print(f"step   : {1e3 * t / S:8.2f} ms/step "
              f"(mean {iters:.1f} Jacobi iters/step)")

    if "fixed" in pieces:
        ks = [int(k) for k in args.fixed.split(",")]
        ts = []
        for k in ks:
            cfg_k = dataclasses.replace(cfg, iisph_min_iters=k,
                                        iisph_max_iters=k)
            t = timed(chain_steps(cfg_k), state)
            ts.append(t)
            print(f"fixed{k:<3d}: {1e3 * t / S:8.2f} ms/step")
        if len(ks) >= 2:
            dt_it = (ts[-1] - ts[0]) / (ks[-1] - ks[0]) / S
            setup = ts[0] / S - ks[0] * dt_it
            print(f"per-Jacobi-iteration: {1e3 * dt_it:8.2f} ms "
                  f"(predict/setup {1e3 * setup:8.2f} ms/step)")

    if args.trace:
        run = chain_steps(cfg)
        run(state)
        with jax.profiler.trace(args.trace):
            np.asarray(run(state))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
