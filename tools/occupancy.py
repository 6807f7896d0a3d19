#!/usr/bin/env python
"""Measure window-sweep occupancy: true pairs / computed slots.

The sweep engine computes a full (block, win) tile per non-sentinel
window; only slots whose source passes the in-kernel hash mask (and the
r < h cutoff) contribute physics. This tool quantifies the waste —
the structural number behind the engine's throughput ceiling:

  slots/query    — computed (B, WIN) lanes per query particle
  hash-valid     — fraction of slots inside the query's row hash bounds
  radius-true    — fraction of slots that are real SPH pairs (r² < h²)

Slot counts are decoded from the anchor plan on the host (a non-sentinel
window = block·win computed slots; pass-ownership masking trims *validity*,
not compute). Valid/true pair counts run one counting sweep on device.

Usage: python tools/occupancy.py --n 1048576 [--block 176 --win 256]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def count_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Per-query [hash-valid slots, radius-true pairs, 0, 0]."""
    from nereus_tpu.ops import pallas_sph as PS
    _, _, _, r2 = PS._pair_geometry(q_ref, src_ref, pv)
    vf = valid.astype(q_ref.dtype)
    tf = (valid & (r2 < pv[PS.PV_H2])).astype(q_ref.dtype)
    zero = jnp.zeros_like(vf[:, :1])
    return jnp.concatenate(
        [jnp.sum(vf, axis=1, keepdims=True),
         jnp.sum(tf, axis=1, keepdims=True), zero, zero], axis=1)


def decode_windows(anchors, nb, n_rows, pack16):
    """Non-sentinel window count per (block, row) from the packed plan."""
    from nereus_tpu.ops.pallas_neighbors import N_PASS, N_WORDS
    words = N_WORDS if pack16 else N_PASS
    a = np.asarray(anchors).reshape(nb, n_rows, words)
    if pack16:
        enc = np.stack([(a[..., p // 2] >> (16 * (p % 2))) & 0xFFFF
                        for p in range(N_PASS)], axis=-1)
    else:
        enc = a
    return (enc != 0).sum(axis=-1)          # (nb, n_rows)


def measure(n, block=None, win=None, scene_name="dam_break"):
    import nereus_tpu as nt
    from nereus_tpu import scene
    from nereus_tpu.ops import pallas_sph as PS
    from nereus_tpu.ops.pallas_neighbors import anchors_pack16
    from nereus_tpu.solvers.pallas_common import (build_pallas_ctx,
                                                  padded_len)
    from nereus_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    kw = {}
    if block is not None:
        kw["sweep_block"] = block
    if win is not None:
        kw["sweep_win"] = win
    cfg = nt.SimConfig(**kw)
    params = nt.make_params()
    state, grid, boundary = scene.dam_break(params, cfg, n_target=n,
                                            with_boundary=False)
    n_act = int(np.asarray(state.num_active).sum())

    @jax.jit
    def run(s):
        ctx = build_pallas_ctx(s, params, grid, cfg, None)
        q = ctx.queries(width=4)
        out = PS.generic_sweep(cfg, count_pair, q, ctx.pack(),
                               ctx.anchors, ctx.pvec, ctx.gsize,
                               out_width=4, n_rows=ctx.n_rows,
                               interpret=ctx.interp)
        return (jnp.sum(out[:, 0]), jnp.sum(out[:, 1]), ctx.anchors,
                ctx.miss)

    hv, true, anchors, miss = run(state)
    hv, true = float(np.asarray(hv)), float(np.asarray(true))
    from nereus_tpu.ops.pallas_neighbors import rows3_supported
    rows3 = cfg.sweep_fused_rows and rows3_supported(grid.size)
    blk = cfg.resolve_block(rows3)
    swin = cfg.resolve_win(rows3)
    rloc = 3 if rows3 else 9
    cb = -(-state.capacity // blk) * blk
    nb = cb // blk
    pack16 = anchors_pack16(padded_len(state.capacity, swin), swin)
    wcount = decode_windows(anchors, nb, rloc, pack16)
    slots = int(wcount.sum()) * blk * swin
    print(f"n={n_act} block={blk} win={swin} "
          f"miss={int(np.asarray(miss))}")
    print(f"windows/block-row: mean={wcount.mean():.2f} "
          f"(of {3}); blocks={nb}")
    print(f"slots/query      : {slots / n_act:10.1f}")
    print(f"hash-valid/query : {hv / n_act:10.1f}  "
          f"({100 * hv / slots:.2f}% of slots)")
    print(f"true pairs/query : {true / n_act:10.1f}  "
          f"({100 * true / slots:.2f}% of slots)")
    return dict(n=n_act, slots=slots, hash_valid=hv, true=true,
                windows=int(wcount.sum()))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2 ** 20)
    ap.add_argument("--block", type=int, default=None)
    ap.add_argument("--win", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    measure(args.n, args.block, args.win)
