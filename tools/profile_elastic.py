#!/usr/bin/env python
"""Piece-timing for the elastic step at scale (round-5 verdict item 2:
verify the 'static-plan elastic step has ~zero per-step ctx' claim).

The elastic step contains NO per-step sort or plan by construction (the
neighbor problem is solved once at body creation, `make_elastic_solid`);
this probe measures the remainder: the three static-plan sweeps
(deformation gradient F, force, hourglass) and the batched 3x3
constitutive+integration math, against the full step.

Usage: python tools/profile_elastic.py [--n-side 80] [--steps 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-side", type=int, default=80)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    S = args.steps

    import nereus_tpu as nt
    from nereus_tpu.ops import pallas_sph as PS
    from nereus_tpu.solvers.elastic_pallas import f_gradient_sweep
    from nereus_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = nt.SimConfig(engine="pallas")
    params = nt.make_params(dt=1e-4)
    h = float(np.asarray(params.interaction_radius))
    sp = 0.5 * h
    side = (args.n_side - 1) * sp
    pts = nt.sample_box_solid((0.0, 0.5 * sp, 0.0),
                              (side + 0.1 * sp, 0.5 * sp + side + 0.1 * sp,
                               side + 0.1 * sp), sp)
    ep = nt.elastic_params(2e5, 0.3, damping=5.0, floor_y=0.0)
    estate, statics, grid = nt.make_elastic_solid(pts, params, cfg, sp)
    n = statics.n
    print(f"# n={n} win={statics.win or 'default'}", file=sys.stderr)

    def timed(fn, arg):
        out = fn(arg)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(arg)
            jax.tree_util.tree_map(lambda x: np.asarray(x), out)
            best = min(best, time.perf_counter() - t0)
        return best / S

    @jax.jit
    def chain_step(e):
        def body(i, carry):
            st, acc = carry
            st2, d = nt.elastic_step(st, statics, params, ep, grid, cfg)
            return (st2, acc + d.max_speed)
        return jax.lax.fori_loop(0, S, body, (e, jnp.float32(0)))[1]

    @jax.jit
    def chain_fgrad(e):
        # the F-gradient sweep alone (1 of the 3 per-step sweeps)
        def body(i, carry):
            x, acc = carry
            raw = f_gradient_sweep(statics, estate.pos + x * 1e-20,
                                   params, grid, cfg)
            return (acc * 1e-30 + jnp.sum(raw[::997]), acc)
        return jax.lax.fori_loop(0, S, body,
                                 (jnp.float32(0), jnp.float32(0)))[1]

    from nereus_tpu.ops.pallas_neighbors import pack_source_wide
    from nereus_tpu.solvers.elastic_pallas import (_layout, _pad_cols,
                                                   _queries, _sweep)
    rows_local, block, win = _layout(cfg, grid, statics.win)
    from nereus_tpu.ops.pallas_neighbors import round_up
    cb = round_up(n, block)
    xcols = [statics.x0[:, k] for k in range(3)]
    xq = _pad_cols(xcols, cb, 1e9)
    pvec = PS.build_pvec(params, cfg, grid)

    def chain_wide(which):
        @jax.jit
        def c(e):
            def body(i, carry):
                x, acc = carry
                cols = [statics.x0[:, 0] + x * 1e-20] \
                    + [statics.x0[:, k] for k in (1, 2)] \
                    + [jnp.zeros((n,), jnp.float32)] * 9
                if which == "force":
                    q = _queries(xq + _pad_cols(cols[3:12], cb, 0.0), 12)
                    src = pack_source_wide(tuple(cols[:3]),
                                           statics.hash_f32, cols[3:12],
                                           rows=16, win=win)
                    outv = _sweep(statics, PS.elastic_force_pair, q, src,
                                  pvec, grid, cfg, 4)
                else:
                    q = _queries(xq + _pad_cols(cols[:3], cb, 1e9)
                                 + _pad_cols(cols[3:12], cb, 0.0), 16)
                    src = pack_source_wide(tuple(cols[:3]),
                                           statics.hash_f32, cols,
                                           rows=16, win=win)
                    outv = _sweep(statics, PS.elastic_hourglass_pair, q,
                                  src, pvec, grid, cfg, 4)
                return (acc * 1e-30 + jnp.sum(outv[::997, 0]), acc)
            return jax.lax.fori_loop(0, S, body,
                                     (jnp.float32(0), jnp.float32(0)))[1]
        return c

    out = {"n": n,
           "step_ms": 1e3 * timed(chain_step, estate),
           "fgrad_sweep_ms": 1e3 * timed(chain_fgrad, estate),
           "force_sweep_ms": 1e3 * timed(chain_wide("force"), estate),
           "hourglass_sweep_ms": 1e3 * timed(chain_wide("hg"), estate)}
    out["non_sweep_ms"] = (out["step_ms"] - out["fgrad_sweep_ms"]
                           - out["force_sweep_ms"]
                           - out["hourglass_sweep_ms"])
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
