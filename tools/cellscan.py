#!/usr/bin/env python
"""Cell-size scan (round-5 verdict lever 1a): bench the 1M WCSPH
dam-break with the hash grid binned at cell = f·h for f ≥ 1.

Cells ≥ h are neighbor-complete with the existing ±1-cell window plan,
so this needs zero engine changes. The fused-window arithmetic predicts
coarser cells LOSE: per dz-window the contiguous span covers ~2 full
x-rows of fluid (∝ f² particles) plus the 9-cell core (∝ f³), while the
dz-window count stays 3 — so slots/query grow ≈ f²..f³ and the sweeps
are compute-bound on slots. This tool measures it for the record.

Usage:  python tools/cellscan.py [--n 1048576] [--steps 10]
                                 [--factors 1.0,1.26,1.59,2.0]
One JSON line per factor.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def run(factor: float, n_target: int, steps: int, win: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import nereus_tpu as nt
    from nereus_tpu import scene
    from nereus_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = nt.SimConfig(**({"sweep_win": win} if win else {}))
    params = nt.make_params()
    state, grid, _ = scene.dam_break(params, cfg, n_target=n_target,
                                     with_boundary=False)
    h = float(np.asarray(params.interaction_radius))
    if factor != 1.0:
        cell = float(np.asarray(grid.cell).reshape(-1)[0])
        lo = np.asarray(grid.origin, np.float64)
        hi = lo + np.asarray(grid.size, np.float64) * cell
        grid = nt.fit_grid(lo, hi, factor * h)
    n = int(np.asarray(state.num_active))

    step = lambda s: nt.wcsph_step(s, params, grid, cfg, None)  # noqa: E731

    @jax.jit
    def chain(s):
        def body(i, carry):
            st, ovf = carry
            st2, d = step(st)
            return (st2, ovf + d.seg_overflow)
        return jax.lax.fori_loop(0, steps, body, (s, jnp.int32(0)))

    st, ovf = chain(state)
    float(np.asarray(ovf))
    t0 = time.perf_counter()
    st, ovf = chain(state)
    ovf_v = float(np.asarray(ovf))
    dt = time.perf_counter() - t0
    sps = steps / dt * n
    return {"factor": factor, "cells": [int(v) for v in grid.size],
            "n": n, "particle_steps_per_sec": sps,
            "ms_per_step": 1e3 * dt / steps, "seg_overflow": ovf_v,
            "win": win or 0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2 ** 20)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--factors", default="1.0,1.26,1.59,2.0")
    ap.add_argument("--win", type=int, default=0,
                    help="sweep_win override (0 = auto default)")
    ap.add_argument("--one", default=None,
                    help="run a single factor in THIS process")
    args = ap.parse_args()
    if args.one is not None:
        print(json.dumps(run(float(args.one), args.n, args.steps,
                             args.win)), flush=True)
        return
    # one subprocess per factor: a wedged TPU client must not poison the
    # following rows (CLAUDE.md tunnel rules)
    import subprocess
    for f in args.factors.split(","):
        r = subprocess.run(
            [sys.executable, __file__, "--one", f, "--n", str(args.n),
             "--steps", str(args.steps), "--win", str(args.win)],
            capture_output=True, text=True)
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        print(lines[-1] if lines else json.dumps(
            {"factor": f, "error": r.stderr.strip()[-300:]}), flush=True)


if __name__ == "__main__":
    main()
