#!/usr/bin/env python
"""Scan (sweep_block, sweep_win, sweep_kfold) on the real chip.

For each combo: rebuild the scene/plan, time the density and force sweeps
(and the ctx = sort+plan) with the honest harness (S steps chained in one
jit fori_loop, result forced to host). One process, combos serialized —
never run a second TPU process concurrently (CLAUDE.md).

Usage:
  python tools/kscan.py --n 1048576 --combos 176:256:1,88:128:2,48:128:4
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
    ap.add_argument("--n", type=int, default=2 ** 20)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--combos", default="176:256:1")
    ap.add_argument("--pieces", default="ctx,density,force")
    ap.add_argument("--fused", type=int, default=0,
                    help="1 = fused 3-row windows (win 0 in a combo = auto)")
    ap.add_argument("--scene", default="dam_break",
                    choices=("dam_break", "settled"),
                    help="settled = resting_block at rest density "
                    "(the implicit solvers' regime)")
    args = ap.parse_args()

    import nereus_tpu as nt
    from nereus_tpu import scene
    from nereus_tpu.ops import pallas_sph as PS
    from nereus_tpu.solvers.pallas_common import build_pallas_ctx
    from nereus_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from nereus_tpu.params import calibrate_mass
    params = nt.make_params()
    settle_sp = None
    if args.scene == "settled":
        settle_sp = 0.8 * float(params.interaction_radius)
        params = calibrate_mass(params, nt.SimConfig(), spacing=settle_sp)
    S = args.steps
    pieces = args.pieces.split(",")
    rows = []
    print(f"device={jax.devices()[0].platform} steps={S}", flush=True)

    for combo in args.combos.split(","):
        block, win, kfold = (int(x) for x in combo.split(":"))
        cfg = nt.SimConfig(sweep_block=block, sweep_win=win,
                           sweep_kfold=kfold,
                           sweep_fused_rows=bool(args.fused))
        if args.scene == "settled":
            state, grid, bnd = scene.resting_block(
                params, cfg, n_target=args.n, spacing=settle_sp,
                impact_velocity=-1.0)
        else:
            state, grid, bnd = scene.dam_break(params, cfg,
                                               n_target=args.n,
                                               with_boundary=False)
            bnd = None
        n = int(state.num_active)
        res = {}

        if "ctx" in pieces:
            @jax.jit
            def chain_ctx(s):
                def body(i, carry):
                    st, acc = carry
                    st = st.__class__(pos=st.pos + acc * 1e-20, vel=st.vel,
                                      pressure=st.pressure,
                                      num_active=st.num_active)
                    ctx = build_pallas_ctx(st, params, grid, cfg, bnd)
                    a = (jnp.sum(ctx.anchors[::997].astype(jnp.float32))
                         + ctx.miss).astype(jnp.float32)
                    return (st, acc + a * 1e-30)
                return jax.lax.fori_loop(0, S, body, (s, jnp.float32(0)))[1]
            res["ctx"] = timed(chain_ctx, state) / S

        def sweep_chain(which):
            @jax.jit
            def chain(s):
                ctx = build_pallas_ctx(s, params, grid, cfg, bnd)
                cb, c = ctx.cb, ctx.c
                pm = params.particle_mass
                psi = jnp.full((c,), 1.0, ctx.dtype) * pm

                def body(i, carry):
                    q_extra, acc = carry
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
                        dens = jnp.full((cb,), params.rest_density,
                                        ctx.dtype)
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

        # miss check: the plan must cover at this (block, win)
        @jax.jit
        def miss_of(s):
            return build_pallas_ctx(s, params, grid, cfg, bnd).miss
        miss = int(np.asarray(miss_of(state)))

        if "density" in pieces:
            res["density"] = timed(sweep_chain("density"), state) / S
        if "force" in pieces:
            res["force"] = timed(sweep_chain("force"), state) / S

        tot = sum(res.values())
        rows.append((combo, miss, res, tot))
        parts = " ".join(f"{k}={v * 1e3:7.2f}ms" for k, v in res.items())
        print(f"{combo:>12}  miss={miss:6d}  {parts}  "
              f"sum={tot * 1e3:7.2f}ms", flush=True)

    best = min(rows, key=lambda r: r[3])
    print(f"best: {best[0]}  sum={best[3] * 1e3:.2f}ms")


if __name__ == "__main__":
    main()
