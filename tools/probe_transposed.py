#!/usr/bin/env python
"""Probe the TRANSPOSED sweep layout at realistic scale.

Layout under test: sources as a (M, 8) row-major matrix (particles along
SUBLANES — window starts need only 8-alignment, so windows shrink to
span+slack≈8 instead of span+128-slack); queries along lanes (B=128);
pair tiles (WS, B); 9 rows x N_PASS windows fetched per grid step as
Element BlockSpecs; force-pair-weight compute (~50 VPU ops/slot).

Prints G slots/s and the equivalent per-query cost to compare against the
production engine (current: ~38.7 G slots/s, 3500 slots/query at 1M).

Usage: python tools/probe_transposed.py [--m 1048576] [--ws 192]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ROWS = 9
N_PASS = 2
B = 128       # queries per block (lane dim)
F = 8         # source fields (x y z vx vy vz psi hash)
FQ = 8        # query fields


def kernel(anchors_ref, q_ref, *refs, ws, nb):
    srcs, out_ref = refs[:-1], refs[-1]
    b = pl.program_id(0)
    out_ref[:] = jnp.zeros_like(out_ref)
    qx = q_ref[0:1, :]
    qy = q_ref[1:2, :]
    qz = q_ref[2:3, :]
    qvx, qvy, qvz = q_ref[3:4, :], q_ref[4:5, :], q_ref[5:6, :]
    qpd = q_ref[7:8, :]
    acc_x = jnp.zeros((1, B), jnp.float32)
    acc_y = jnp.zeros((1, B), jnp.float32)
    acc_z = jnp.zeros((1, B), jnp.float32)
    for r in range(N_ROWS):
        lo = qx * 0.5 + float(r)       # stand-in rank-1 bounds
        hi = lo + 30.0
        for p in range(N_PASS):
            src = srcs[r * N_PASS + p]
            a_enc = anchors_ref[(b * N_ROWS + r) * N_PASS + p]

            @pl.when(a_enc > 0)
            def _w(src=src, lo=lo, hi=hi):
                sx = src[:, 0:1]
                sy = src[:, 1:2]
                sz = src[:, 2:3]
                svx, svy, svz = src[:, 3:4], src[:, 4:5], src[:, 5:6]
                dens_j = jnp.maximum(src[:, 6:7], 1e-12)
                shash = src[:, 7:8]
                valid = (shash >= lo) & (shash <= hi)
                dx = qx - sx
                dy = qy - sy
                dz = qz - sz
                r2 = dx * dx + dy * dy + dz * dz
                inv = jax.lax.rsqrt(jnp.maximum(r2, 1e-24))
                rl = r2 * inv
                okf = (valid & (r2 < 0.0021)).astype(jnp.float32)
                inv_dens = 1.0 / dens_j
                inv3 = inv * inv * inv
                c = (950.0 - rl * 3.1e5 - inv3 * 0.023)
                bden = r2 + 2.1e-5
                cvisc = (inv_dens * 1e-7) * ((c * r2) / bden) * okf
                ratio = dens_j * 1e-3
                r2a = ratio * ratio
                p_j = 800.0 * (r2a * r2a * r2a * ratio - 1.0)
                pd2_j = p_j * inv_dens * inv_dens
                hr = jnp.maximum(0.0457 - rl, 0.0)
                sp = (hr * hr) * inv * -2.4e1
                cpd = (qpd + pd2_j) * sp
                dpo = jnp.maximum(0.0021 - r2, 0.0)
                w = dpo * dpo * dpo * 6.8e9
                w_eff = jnp.where(r2 > 1.6e-3, w, 0.11)
                cpd = (cpd - 0.08 * w_eff) * okf
                dvx = qvx - svx
                dvy = qvy - svy
                dvz = qvz - svz
                fx = cvisc * dvx + cpd * dx
                fy = cvisc * dvy + cpd * dy
                fz = cvisc * dvz + cpd * dz
                out_ref[0:1, :] = out_ref[0:1, :] + jnp.sum(
                    fx, axis=0, keepdims=True)
                out_ref[1:2, :] = out_ref[1:2, :] + jnp.sum(
                    fy, axis=0, keepdims=True)
                out_ref[2:3, :] = out_ref[2:3, :] + jnp.sum(
                    fz, axis=0, keepdims=True)


def build(m, ws):
    nb = m // B
    src = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (m + ws + 8, F)), jnp.float32)
    q = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (FQ, m)), jnp.float32)
    # plausible monotonic anchors (8-row units), ~85% non-sentinel
    rng = np.random.default_rng(2)
    base = (np.arange(nb) * B) // 8
    anchors = np.zeros((nb, N_ROWS, N_PASS), np.int32)
    for r in range(N_ROWS):
        off = rng.integers(-4, 4, nb)
        anchors[:, r, 0] = np.clip(base + off, 0, m // 8) + 1
        anchors[:, r, 1] = np.where(rng.random(nb) < 0.3,
                                    anchors[:, r, 0] + ws // 8, 0)
    anchors = jnp.asarray(anchors.reshape(-1))

    def win_spec(r, p):
        return pl.BlockSpec(
            (pl.Element(ws), pl.Element(F)),
            lambda b, a, _r=r, _p=p:
            (jnp.maximum(a[(b * N_ROWS + _r) * N_PASS + _p] - 1, 0) * 8,
             0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((FQ, B), lambda b, a: (0, b)),
            *[win_spec(r, p) for r in range(N_ROWS)
              for p in range(N_PASS)],
        ],
        out_specs=pl.BlockSpec((4, B), lambda b, a: (0, b)),
    )
    f = pl.pallas_call(
        functools.partial(kernel, ws=ws, nb=nb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, m), jnp.float32),
    )

    @jax.jit
    def sweep10(q, src):
        def body(i, carry):
            qq, acc = carry
            out = f(anchors, qq, *([src] * (N_ROWS * N_PASS)))
            return (qq + out[0:1].reshape(FQ // FQ, -1).sum() * 1e-30,
                    acc + out[0, ::997].sum())
        return jax.lax.fori_loop(0, 10, body, (q, jnp.float32(0)))[1]

    return sweep10, q, src, nb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2 ** 20)
    ap.add_argument("--ws", type=int, default=192)
    args = ap.parse_args()
    sweep10, q, src, nb = build(args.m, args.ws)
    np.asarray(sweep10(q, src))  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(sweep10(q, src))
        best = min(best, time.perf_counter() - t0)
    per = best / 10
    # non-sentinel windows: pass0 always, pass1 ~30%
    slots = nb * N_ROWS * 1.3 * args.ws * B
    print(f"m={args.m} ws={args.ws}: {per * 1e3:.2f} ms/sweep, "
          f"{slots / per / 1e9:.1f} G slots/s, "
          f"{args.m / per / 1e6:.2f} M q/s")


if __name__ == "__main__":
    main()
