#!/usr/bin/env python
"""Split the WCSPH Pallas step into pieces and time each on the real chip.

Usage:
    python tools/profile_step.py [--n 1048576] [--steps 10] [--block 88]
                                 [--trace DIR]

Each piece is timed with the honest harness: S iterations chained inside
one jit via ``lax.fori_loop`` with a data dependence between iterations,
result forced to host (CLAUDE.md: ``block_until_ready`` over the tunnel is
unreliable). Pieces:

  step    — the full wcsph_step (sort + plan + 2 sweeps + integrate)
  ctx     — hash-sort + window planning only (build_pallas_ctx)
  density — the density sweep alone (plan/pack held fixed)
  force   — the fused force sweep alone (plan/pack held fixed)

With --trace, also writes an xprof trace of a few full steps.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)  # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2 ** 20)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--block", type=int, default=None)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--pieces", default="step,ctx,density,force")
    args = ap.parse_args()

    import nereus_tpu as nt
    from nereus_tpu import scene
    from nereus_tpu.ops import pallas_sph as PS
    from nereus_tpu.solvers.pallas_common import build_pallas_ctx
    from nereus_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    kw = {} if args.block is None else {"sweep_block": args.block}
    cfg = nt.SimConfig(**kw)
    params = nt.make_params()
    state, grid, boundary = scene.dam_break(
        params, cfg, n_target=args.n, with_boundary=False)
    n = int(state.num_active)
    S = args.steps
    print(f"n={n} block={cfg.sweep_block or 'auto'} steps={S} "
          f"device={jax.devices()[0].platform}")

    pieces = args.pieces.split(",")
    results = {}

    if "step" in pieces:
        @jax.jit
        def chain_step(s):
            def body(i, carry):
                st, acc = carry
                st2, d = nt.wcsph_step(st, params, grid, cfg)
                return (st2, acc + d.mean_density_error)
            return jax.lax.fori_loop(0, S, body, (s, jnp.float32(0)))[1]

        results["step"] = timed(chain_step, state) / S

    if "ctx" in pieces:
        @jax.jit
        def chain_ctx(s):
            def body(i, carry):
                st, acc = carry
                # perturb positions so the sort/plan can't be hoisted
                st = st.__class__(pos=st.pos + acc * 1e-20, vel=st.vel,
                                  pressure=st.pressure,
                                  num_active=st.num_active)
                ctx = build_pallas_ctx(st, params, grid, cfg, None)
                acc2 = (jnp.sum(ctx.anchors[::997].astype(jnp.float32))
                        + ctx.miss).astype(jnp.float32)
                return (st, acc + acc2 * 1e-30)
            return jax.lax.fori_loop(0, S, body, (s, jnp.float32(0)))[1]

        results["ctx"] = timed(chain_ctx, state) / S

    def sweep_chain(which):
        @jax.jit
        def chain(s):
            ctx = build_pallas_ctx(s, params, grid, cfg, None)
            cb, c = ctx.cb, ctx.c
            pm = params.particle_mass
            psi = jnp.full((c,), 1.0, ctx.dtype) * pm

            def body(i, carry):
                q_extra, acc = carry
                # stack(axis=0).T matches the production query build
                # (pallas_common.queries); axis=1 concat is the measured
                # ~7x slower lane-padded form (ADVICE r3)
                if which == "density":
                    q = jnp.stack(
                        [ctx.px + q_extra * 1e-20, ctx.py, ctx.pz,
                         jnp.zeros((cb,), ctx.dtype)], axis=0).T
                    out = PS.density_sweep(
                        cfg, q, ctx.pack(slot6=psi), ctx.anchors,
                        ctx.pvec, ctx.gsize,
                        n_rows=ctx.n_rows, interpret=ctx.interp)
                    r = out
                else:
                    dens = jnp.full((cb,), params.rest_density, ctx.dtype)
                    q = jnp.stack(
                        [ctx.px + q_extra * 1e-20, ctx.py, ctx.pz,
                         ctx.vx, ctx.vy, ctx.vz,
                         dens, jnp.zeros((cb,), ctx.dtype)], axis=0).T
                    out = PS.fluid_force_sweep(
                        cfg, q, ctx.pack(vel=(ctx.vx, ctx.vy, ctx.vz),
                                         slot6=dens),
                        ctx.anchors, ctx.pvec, ctx.gsize,
                        n_rows=ctx.n_rows, interpret=ctx.interp)
                    r = out[:, 0]
                return (r * 1e-30, acc + jnp.sum(r[::997]))
            return jax.lax.fori_loop(
                0, S, body,
                (jnp.zeros((cb,), ctx.dtype), jnp.float32(0)))[1]
        return chain

    if "density" in pieces:
        results["density"] = timed(sweep_chain("density"), state) / S
    if "force" in pieces:
        results["force"] = timed(sweep_chain("force"), state) / S

    for k, v in results.items():
        print(f"{k:>8}: {v * 1e3:8.2f} ms")
    if "step" in results:
        ps = n / results["step"]
        print(f"particle-steps/s: {ps:.3e}")

    if args.trace:
        @jax.jit
        def chain_step(s):
            def body(i, carry):
                st, acc = carry
                st2, d = nt.wcsph_step(st, params, grid, cfg)
                return (st2, acc + d.mean_density_error)
            return jax.lax.fori_loop(0, 3, body, (s, jnp.float32(0)))[1]
        np.asarray(chain_step(state))
        with jax.profiler.trace(args.trace):
            np.asarray(chain_step(state))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
