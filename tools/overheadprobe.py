#!/usr/bin/env python
"""Sweep-engine overhead decomposition (round-5 verdict lever 1b prep).

Times the SAME production plan/pack at 1M with pair functions of
decreasing weight, isolating what a sweep costs before any pair math:

  density  — the real density pair (reference point, ~18.6 ms round 4)
  maskonly — geometry + hash-validity mask + one masked reduce
             (what a "cheap first pass" of any two-stage compaction
             scheme must pay at minimum)
  touch    — one reduce over a single source row per window
             (fixed grid-step cost + window DMA, no per-slot math)

If (density − maskonly) ≪ density, per-slot pair math is NOT the
bottleneck and occupancy work (fewer slots) can't pay; if
maskonly ≈ touch, the hash mask is free and a compaction pre-pass costs
~touch. Usage: python tools/overheadprobe.py [--n 1048576] [--steps 10]
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


def maskonly_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    from nereus_tpu.ops.pallas_sph import PV_H2, _pair_geometry
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    return jnp.sum(okf, axis=1, keepdims=True)


def touch_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    row = jnp.sum(src_ref[0:1, :], axis=1, keepdims=True)
    return q_ref[:, 0:1] * 0.0 + row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2 ** 20)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    S = args.steps

    import nereus_tpu as nt
    from nereus_tpu import scene
    from nereus_tpu.ops import pallas_sph as PS
    from nereus_tpu.solvers.pallas_common import build_pallas_ctx
    from nereus_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = nt.SimConfig()
    params = nt.make_params()
    state, grid, _ = scene.dam_break(params, cfg, n_target=args.n,
                                     with_boundary=False)
    n = int(state.num_active)

    def chain(which):
        @jax.jit
        def c(s):
            ctx = build_pallas_ctx(s, params, grid, cfg, None)
            cb, cc = ctx.cb, ctx.c
            psi = jnp.full((cc,), 1.0, ctx.dtype) * params.particle_mass
            src = ctx.pack(slot6=psi)

            def body(i, carry):
                q_extra, acc = carry
                q = jnp.stack([ctx.px + q_extra * 1e-20, ctx.py, ctx.pz,
                               jnp.zeros((cb,), ctx.dtype)], axis=0).T
                if which == "density":
                    out = PS.density_sweep(cfg, q, src, ctx.anchors,
                                           ctx.pvec, ctx.gsize,
                                           n_rows=ctx.n_rows,
                                           interpret=ctx.interp)
                else:
                    fn = {"maskonly": maskonly_pair,
                          "touch": touch_pair}[which]
                    out = PS.generic_sweep(
                        cfg, fn, q, src, ctx.anchors, ctx.pvec, ctx.gsize,
                        out_width=1, n_rows=ctx.n_rows,
                        interpret=ctx.interp)[:, 0]
                return (out * 1e-30, acc + jnp.sum(out[::997]))
            return jax.lax.fori_loop(
                0, S, body, (jnp.zeros((cb,), ctx.dtype),
                             jnp.float32(0)))[1]
        return c

    out = {"n": n}
    for which in ("density", "maskonly", "touch"):
        f = chain(which)
        float(np.asarray(f(state)))          # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(state)))
            best = min(best, time.perf_counter() - t0)
        out[which + "_ms"] = 1e3 * best / S
        print(f"# {which}: {out[which + '_ms']:.2f} ms", file=sys.stderr,
              flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
