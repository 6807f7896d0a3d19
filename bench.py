#!/usr/bin/env python
"""Headline benchmark: WCSPH particle-steps/sec at ~1M particles, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference (Mathiasb17/Nereus) publishes no numbers (BASELINE.md); its hard
particle cap is 150k (`sph/sph.h:19`) and its demo renders at interactive
rates, so the operative baseline is taken as 1e7 particle-steps/sec — a
generous estimate of the CUDA build at its 150k cap running ~66 fps with the
per-step PCIe round-trip it performs (`sph/sph.cpp:233-234,283-284`).
``vs_baseline`` = measured / 1e7.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_PARTICLE_STEPS_PER_SEC = 1.0e7


def run(n_target=2 ** 20, n_time_steps=10, seg_window=64):
    import jax.numpy as jnp
    import numpy as np
    import nereus_tpu as nt
    from nereus_tpu import scene
    from nereus_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    cfg = nt.SimConfig(seg_window=seg_window)
    params = nt.make_params()
    state, grid, boundary = scene.dam_break(
        params, cfg, n_target=n_target, with_boundary=False)
    n = int(state.num_active)

    # All steps chained inside ONE jit (lax.fori_loop) and the result
    # forced to host — per-step dispatch latency over a remote/tunneled
    # runtime otherwise dominates and block_until_ready alone is not a
    # reliable fence there.
    @jax.jit
    def chain(s):
        def body(i, carry):
            st, ovf, derr = carry
            st2, d = nt.wcsph_step(st, params, grid, cfg)
            return (st2, ovf + d.seg_overflow,
                    derr + d.mean_density_error)
        return jax.lax.fori_loop(
            0, n_time_steps, body,
            (s, jnp.int32(0), jnp.float32(0)))

    st, ovf, derr = chain(state)           # compile + warm run
    float(np.asarray(derr))
    t0 = time.perf_counter()
    st, ovf, derr = chain(state)
    derr_total = float(np.asarray(derr))   # forces completion
    t1 = time.perf_counter()

    value = n_time_steps / (t1 - t0) * n
    return value, n, float(np.asarray(ovf)), derr_total / n_time_steps


def main():
    try:
        value, n, overflow, derr = run()
        print(json.dumps({
            "metric": "wcsph_particle_steps_per_sec_1M",
            "value": value,
            "unit": "particle-steps/sec",
            "vs_baseline": value / BASELINE_PARTICLE_STEPS_PER_SEC,
        }))
        print(f"# n={n} seg_overflow={overflow} mean_density_err={derr:.4f} "
              f"device={jax.devices()[0].platform}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — always emit the JSON line
        print(json.dumps({
            "metric": "wcsph_particle_steps_per_sec_1M",
            "value": 0.0,
            "unit": "particle-steps/sec",
            "vs_baseline": 0.0,
        }))
        print(f"# bench failed: {e!r}", file=sys.stderr)
        raise


if __name__ == "__main__":
    main()
