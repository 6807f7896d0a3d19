#!/usr/bin/env python
"""HBM accounting for the WCSPH step at scale (round-5 verdict item 5:
wcsph_20M OOMed at 19.95G vs 15.75G with no buffer breakdown).

Compiles (does NOT run) the 10-step bench chain at a given particle
count and prints XLA's memory analysis — argument/output/temp/alias
bytes — with and without input donation, so the real single-chip
ceiling is derived instead of bisected. Donation lets XLA write the new
state over the old state's buffers instead of holding both live across
the step.

Usage: python tools/memaudit.py [--n 16000000] [--steps 10] [--run]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16_000_000)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--win", type=int, default=640)
    ap.add_argument("--run", action="store_true",
                    help="after the analysis, actually execute the "
                         "donated chain and report throughput")
    args = ap.parse_args()
    # --steps 1 compiles a single donated step (no fori carry
    # double-buffer) — the lowest-peak stepping mode a python-loop user
    # gets; the 10-step chain is the bench-harness mode

    import jax
    import jax.numpy as jnp
    import numpy as np
    import nereus_tpu as nt
    from nereus_tpu import scene
    from nereus_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = nt.SimConfig(sweep_win=args.win)
    params = nt.make_params()
    state, grid, _ = scene.dam_break(params, cfg, n_target=args.n,
                                     with_boundary=False)
    n = int(np.asarray(state.num_active))
    S = args.steps

    def chain(s):
        def body(i, carry):
            st, ovf = carry
            st2, d = nt.wcsph_step(st, params, grid, cfg, None)
            return (st2, ovf + d.seg_overflow)
        return jax.lax.fori_loop(0, S, body, (s, jnp.int32(0)))

    out = {"n": n, "cells": [int(v) for v in grid.size]}
    for name, jitted in (
            ("plain", jax.jit(chain)),
            ("donated", jax.jit(chain, donate_argnums=0))):
        try:
            compiled = jitted.lower(state).compile()
            ma = compiled.memory_analysis()
            out[name] = {
                "argument_gb": ma.argument_size_in_bytes / 2 ** 30,
                "output_gb": ma.output_size_in_bytes / 2 ** 30,
                "temp_gb": ma.temp_size_in_bytes / 2 ** 30,
                "alias_gb": ma.alias_size_in_bytes / 2 ** 30,
                "total_gb": (ma.argument_size_in_bytes
                             + ma.output_size_in_bytes
                             + ma.temp_size_in_bytes
                             - ma.alias_size_in_bytes) / 2 ** 30,
            }
            print(f"# {name}: {json.dumps(out[name])}", file=sys.stderr,
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report per-variant
            out[name] = {"error": repr(e)[:2500]}

    if args.run and "error" not in out.get("donated", {}):
        import time
        jitted = jax.jit(chain, donate_argnums=0)
        st, ovf = jitted(state)
        float(np.asarray(ovf))
        # the donated input is gone; time a second chain on the result
        t0 = time.perf_counter()
        st, ovf = jitted(st)
        ovf_v = float(np.asarray(ovf))
        dt = time.perf_counter() - t0
        out["run"] = {"particle_steps_per_sec": S / dt * n,
                      "ms_per_step": 1e3 * dt / S,
                      "seg_overflow": ovf_v}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
