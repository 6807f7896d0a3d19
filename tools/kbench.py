#!/usr/bin/env python
"""Microbenchmark neighbor-sweep pair-function variants on the real chip.

Usage: python tools/kbench.py --n 1048576 --variant v0 [--block 88]

Times ONE sweep (density or force) with the window plan built once, steps
chained in a fori_loop with a data dependence. Variants live in
tools/kvariants.py so the production module stays clean while measuring.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2 ** 20)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--block", type=int, default=None)
    ap.add_argument("--win", type=int, default=None)
    ap.add_argument("--variants", default="f0")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import nereus_tpu as nt
    from nereus_tpu import scene
    from nereus_tpu.solvers.pallas_common import build_pallas_ctx
    from nereus_tpu.utils import enable_compilation_cache
    import kvariants

    enable_compilation_cache()
    kw = {}
    if args.block is not None:
        kw["sweep_block"] = args.block
    if args.win is not None:
        kw["sweep_win"] = args.win
    cfg = nt.SimConfig(**kw)
    params = nt.make_params()
    state, grid, boundary = scene.dam_break(
        params, cfg, n_target=args.n, with_boundary=False)
    n = int(state.num_active)
    S = args.steps
    print(f"n={n} block={cfg.sweep_block or 'auto'} steps={S} "
          f"device={jax.devices()[0].platform}", flush=True)

    for name in args.variants.split(","):
        run_fn = kvariants.build(name, cfg, params, grid)

        @jax.jit
        def chain(s, _run=run_fn):
            ctx = build_pallas_ctx(s, params, grid, cfg, None)

            def body(i, carry):
                q_extra, acc = carry
                r = _run(ctx, q_extra)
                return (r * 1e-30, acc + jnp.sum(r[::997]))
            return jax.lax.fori_loop(
                0, S, body,
                (jnp.zeros((ctx.cb,), jnp.float32), jnp.float32(0)))[1]

        out = chain(state)
        np.asarray(out)  # compile + warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(chain(state))
            best = min(best, time.perf_counter() - t0)
        per = best / S
        print(f"{name:>8}: {per * 1e3:8.2f} ms/sweep   "
              f"({n / per / 1e6:7.2f} M q/s)", flush=True)


if __name__ == "__main__":
    main()
