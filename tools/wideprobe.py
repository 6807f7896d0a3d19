#!/usr/bin/env python
"""Isolate the wide-hash (bitcast-int32) sweep defect on real hardware.

Wide mode normally engages only past 2**24 cells, where the f32 engine has
no exact oracle on-chip. This probe FORCES wide mode on a small grid
(monkeypatching ``wide_hash_needed``), where the narrow f32 engine is
bit-exact — giving a same-chip, same-plan, same-scene A/B:

  narrow   : production f32 hash row + f32 bounds (exact < 2**24 cells)
  wide     : bitcast-int32 payload + int32 bounds (the failing mode)
  convert  : plain f32 payload value-converted to int32 in-kernel + int32
             bounds (``WIDE_BITCAST = False``) — separates payload
             transport (DMA/bitcast of denormal/NaN float bit patterns)
             from integer bounds/compare lowering.

Counting sweeps (hash-valid slots + radius-true pairs per query) are
compared per query; any deficit is localized to sorted indices, window
rows (--per-row doctors the anchor plan to one row at a time), and z
position. Run with --cpu first: interpret mode must show zero diffs.

Usage: python tools/wideprobe.py --n 150000 [--cpu] [--per-row]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def cellcheck(state, params, grid, cfg):
    """Compare the kernel's in-VPU cell coords (floor((v-o)*inv_cell),
    _sweep_kernel.cellc) against the host plan's grid.cell_coords_cols for
    every active query. Any mismatch means the plan's hash bounds and the
    kernel's disagree about the query's cell — dropping/adding whole CELLS
    of sources (deficits in multiples of the cell occupancy) with zero
    plan-side misses."""
    import jax.experimental.pallas as pl
    from nereus_tpu import grid as gridlib
    from nereus_tpu.ops import pallas_sph as PS
    from nereus_tpu.ops.pallas_neighbors import round_up
    from nereus_tpu.solvers.pallas_common import (build_pallas_ctx,
                                                  interpret_mode)

    from nereus_tpu.ops.pallas_neighbors import rows3_supported
    block = cfg.resolve_block(cfg.sweep_fused_rows
                              and rows3_supported(grid.size))
    gx, gy, gz = grid.size

    def kern(pvec_ref, q_ref, out_ref):
        ox, oy, oz = (pvec_ref[PS.PV_OX], pvec_ref[PS.PV_OY],
                      pvec_ref[PS.PV_OZ])
        inv_cell = pvec_ref[PS.PV_INVCELL]

        def cellc(v, o, g):
            c = jnp.floor((v - o) * inv_cell)
            return jnp.clip(c, 0.0, float(g - 1))

        out_ref[:, 0:1] = cellc(q_ref[:, 0:1], ox, gx)
        out_ref[:, 1:2] = cellc(q_ref[:, 1:2], oy, gy)
        out_ref[:, 2:3] = cellc(q_ref[:, 2:3], oz, gz)
        out_ref[:, 3:4] = jnp.zeros_like(q_ref[:, 0:1])

    @jax.jit
    def run(s):
        ctx = build_pallas_ctx(s, params, grid, cfg, None)
        q = ctx.queries(width=4)
        n = q.shape[0]
        from jax.experimental.pallas import tpu as pltpu
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // block,),
            in_specs=[pl.BlockSpec((block, 4), lambda b, pv: (b, 0))],
            out_specs=pl.BlockSpec((block, 4), lambda b, pv: (b, 0)),
        )
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, 4), q.dtype),
            interpret=ctx.interp,
        )(ctx.pvec.astype(q.dtype), q)
        hx, hy, hz = gridlib.cell_coords_cols(grid, ctx.px, ctx.py, ctx.pz)
        return out, hx, hy, hz, ctx.active

    out, hx, hy, hz, act = run(state)
    out = np.asarray(out)
    act = np.asarray(act)
    host = np.stack([np.asarray(hx), np.asarray(hy), np.asarray(hz)],
                    axis=1)
    kerncoords = out[:, :3].astype(np.int64)
    diff = (kerncoords != host) & act[:, None]
    n_bad = int(diff.any(axis=1).sum())
    print(f"[cellcheck] mismatched queries: {n_bad} / {int(act.sum())} "
          f"(per-axis {diff.sum(axis=0).tolist()})")
    if n_bad:
        idx = np.nonzero(diff.any(axis=1))[0][:10]
        for i in idx:
            print(f"  idx {i}: kernel {kerncoords[i].tolist()} host "
                  f"{host[i].tolist()}")
    return n_bad


def count_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    from nereus_tpu.ops import pallas_sph as PS
    _, _, _, r2 = PS._pair_geometry(q_ref, src_ref, pv)
    vf = valid.astype(q_ref.dtype)
    tf = (valid & (r2 < pv[PS.PV_H2])).astype(q_ref.dtype)
    zero = jnp.zeros_like(vf[:, :1])
    return jnp.concatenate(
        [jnp.sum(vf, axis=1, keepdims=True),
         jnp.sum(tf, axis=1, keepdims=True), zero, zero], axis=1)


def make_runner(state, params, grid, cfg, n_rows_expect):
    """Build a fresh jitted counting-sweep fn (fresh identity per mode so
    jit caching never crosses monkeypatched modes)."""
    from nereus_tpu.ops import pallas_sph as PS
    from nereus_tpu.solvers.pallas_common import build_pallas_ctx

    def run(s, row_keep):
        ctx = build_pallas_ctx(s, params, grid, cfg, None)
        anchors = ctx.anchors
        if row_keep is not None:
            nb = ctx.cb // cfg.resolve_block(ctx.rows_local == 3)
            w = anchors.size // (nb * ctx.n_rows)
            keep = jnp.asarray(row_keep, jnp.int32)[None, :, None]
            anchors = (anchors.reshape(nb, ctx.n_rows, w) * keep
                       ).reshape(-1)
        q = ctx.queries(width=4)
        out = PS.generic_sweep(cfg, count_pair, q, ctx.pack(),
                               anchors, ctx.pvec, ctx.gsize,
                               out_width=4, n_rows=ctx.n_rows,
                               interpret=ctx.interp)
        return (out[:, 0], out[:, 1], ctx.miss, ctx.pz,
                ctx.active, ctx.sorted_hash)

    return jax.jit(run, static_argnums=(1,))


import contextlib


@contextlib.contextmanager
def force_mode(mode):
    """Force a wide-payload mode (or leave "narrow" untouched)."""
    from nereus_tpu.ops import pallas_neighbors as PN
    orig_need, orig_mode = PN.wide_hash_needed, PN.WIDE_MODE
    orig_bias = PN.WIDE_BIAS
    if mode in ("wide", "full", "convert", "raw", "mod"):
        PN.wide_hash_needed = lambda gsize: True
        PN.WIDE_MODE = {"wide": "slice", "full": "full",
                        "convert": "convert", "raw": "slice",
                        "mod": "mod"}[mode]
        if mode == "raw":   # unbiased payload: denormal/NaN bit patterns
            PN.WIDE_BIAS = 0
    try:
        yield
    finally:
        PN.wide_hash_needed = orig_need
        PN.WIDE_MODE = orig_mode
        PN.WIDE_BIAS = orig_bias


def steps_ab(args, state, params, grid, cfg, n_act):
    """Physics-level A/B: run --steps full WCSPH steps per forced mode and
    compare final positions against an exact reference — the narrow
    Pallas engine when the grid fits f32 hashes, else the jnp segments
    oracle (int32 hashes: exact at ANY cell count, just slow). Mode "mod"
    may legitimately accept aliased far sources past 2²⁴ cells; they
    contribute exactly 0, so physics must match to summation-order noise
    (bit-exactly when the reference is the narrow engine)."""
    import nereus_tpu as nt
    from nereus_tpu.ops.pallas_neighbors import wide_hash_needed
    from nereus_tpu.solvers.wcsph_pallas import wcsph_step_pallas

    def drive(fn, tag):
        step = jax.jit(lambda s: fn(s, params, grid, cfg, None))
        s = state
        for _ in range(args.steps):
            s, d = step(s)
        pos = np.asarray(s.pos[:n_act])
        print(f"[steps {tag}] seg_overflow={int(np.asarray(d.seg_overflow))}"
              f" nan={int(np.isnan(pos).sum())}"
              f" max_density={float(np.asarray(d.max_density)):.2f}")
        return pos[np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))]

    wide_native = wide_hash_needed(grid.size)
    if wide_native:
        ref = drive(nt.wcsph_step, "segments-oracle")
    else:
        with force_mode("narrow"):
            ref = drive(wcsph_step_pallas, "narrow")
    for mode in args.modes.split(","):
        with force_mode(mode):
            pos = drive(wcsph_step_pallas, mode)
        d = np.abs(pos - ref)
        exact = "" if wide_native else " (expect 0 exactly)"
        print(f"[steps {mode} vs ref] max|dpos|={d.max():.3e}"
              f" mean|dpos|={d.mean():.3e}{exact}")


def run_mode(mode, state, params, grid, cfg, rows_local, per_row):
    """Returns dict row_key -> (hv, true, miss) numpy arrays."""
    from nereus_tpu.ops import pallas_neighbors as PN
    orig_need, orig_mode = PN.wide_hash_needed, PN.WIDE_MODE
    orig_bias = PN.WIDE_BIAS
    if mode in ("wide", "full", "convert", "raw", "mod"):
        PN.wide_hash_needed = lambda gsize: True
        PN.WIDE_MODE = {"wide": "slice", "full": "full",
                        "convert": "convert", "raw": "slice",
                        "mod": "mod"}[mode]
        if mode == "raw":   # unbiased payload: denormal/NaN bit patterns
            PN.WIDE_BIAS = 0
    try:
        runner = make_runner(state, params, grid, cfg, rows_local)
        keys = ["all"] + (list(range(rows_local)) if per_row else [])
        res = {}
        for key in keys:
            keep = None
            if key != "all":
                keep = tuple(1 if r == key else 0
                             for r in range(rows_local))
            hv, true, miss, pz, act, sh = runner(state, keep)
            res[key] = (np.asarray(hv), np.asarray(true),
                        int(np.asarray(miss)))
            res["_meta"] = (np.asarray(pz), np.asarray(act),
                            np.asarray(sh))
    finally:
        PN.wide_hash_needed = orig_need
        PN.WIDE_MODE = orig_mode
        PN.WIDE_BIAS = orig_bias
    return res


def expected_hv(state, params, grid, cfg, rows_local):
    """Host-side (numpy, exact int64) hash-valid slot count per sorted
    query: for each window row, the number of sorted sources whose hash
    falls inside the query's row bounds — what the kernel's hv count MUST
    equal when plan coverage misses are 0 (windows cover every needed
    source and pass ownership never double-counts). Valid at any grid
    size, including past 2**24 cells where no on-chip f32 narrow baseline
    exists."""
    from nereus_tpu import grid as gridlib
    from nereus_tpu.solvers.pallas_common import build_pallas_ctx

    @jax.jit
    def ctx_arrays(s):
        ctx = build_pallas_ctx(s, params, grid, cfg, None)
        return ctx.sorted_hash, ctx.px, ctx.py, ctx.pz, ctx.active, ctx.miss

    sh, px, py, pz, act, miss = (np.asarray(a) for a in ctx_arrays(state))
    origin = np.asarray(grid.origin, np.float32)
    inv = np.float32(1.0) / np.asarray(grid.cell, np.float32)
    gx, gy, gz = grid.size
    coords = []
    for v, o, iv, g in zip((px, py, pz), origin, inv, grid.size):
        c = np.floor((v.astype(np.float32) - o) * iv)
        coords.append(np.clip(c, 0, g - 1).astype(np.int64))
    x, y, z = coords
    hv = np.zeros(len(x), np.int64)
    for r in range(rows_local):
        if rows_local == 3:
            zz = z + (r - 1)
            base = (zz * gy + y) * gx
            lo = base + (np.maximum(x - 1, 0) - gx)
            hi = base + (np.minimum(x + 1, gx - 1) + gx)
            ok = (zz >= 0) & (zz < gz)
        else:
            dy, dz = r % 3 - 1, r // 3 - 1
            yy, zz = y + dy, z + dz
            base = (zz * gy + yy) * gx
            lo = base + np.maximum(x - 1, 0)
            hi = base + np.minimum(x + 1, gx - 1)
            ok = (yy >= 0) & (yy < gy) & (zz >= 0) & (zz < gz)
        cnt = (np.searchsorted(sh, hi + 1, side="left")
               - np.searchsorted(sh, lo, side="left"))
        hv += np.where(ok, cnt, 0)
    return hv, act, sh, int(miss)


def report(name, base, test, meta, n_act):
    pz, act, sh = meta
    for key in [k for k in base if k != "_meta"]:
        hv0, t0, m0 = base[key]
        hv1, t1, m1 = test[key]
        d_hv = (hv0 - hv1)[act]
        d_t = (t0 - t1)[act]
        bad = np.nonzero(d_hv != 0)[0]
        line = (f"[{name}][row {key}] miss {m0}->{m1}  "
                f"hv_deficit={d_hv.sum():.0f} true_deficit={d_t.sum():.0f} "
                f"affected={bad.size}/{n_act}")
        if bad.size:
            vals, cnts = np.unique(d_hv[bad], return_counts=True)
            line += (f"\n    deficit values: "
                     f"{dict(zip(vals.tolist(), cnts.tolist()))}"
                     f"\n    sorted-idx range: [{bad.min()}, {bad.max()}]"
                     f" (n_act={n_act})"
                     f"\n    first 12 idx: {bad[:12].tolist()}"
                     f"\n    their hashes: {sh[bad[:12]].tolist()}")
        print(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=150_000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--per-row", action="store_true")
    ap.add_argument("--block", type=int, default=0)
    ap.add_argument("--win", type=int, default=0)
    ap.add_argument("--fused", type=int, default=1,
                    help="0 = legacy 9-row windows")
    ap.add_argument("--modes", default="wide,convert")
    ap.add_argument("--pad-below", type=int, default=0,
                    help="extra empty cell planes below the fluid (z): "
                    "reproduces the >2**24-cell wide regime with the "
                    "fluid at the hash-space top")
    ap.add_argument("--cellcheck", action="store_true",
                    help="compare in-kernel vs host cell coords only")
    ap.add_argument("--steps", type=int, default=0,
                    help="physics A/B: run K full WCSPH steps per mode "
                    "and compare positions against an exact reference "
                    "instead of counting sweeps")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import nereus_tpu as nt
    from nereus_tpu import scene
    from nereus_tpu.grid import Grid
    from nereus_tpu.ops.pallas_neighbors import (rows3_supported,
                                                 wide_hash_needed)
    from nereus_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = nt.SimConfig(sweep_block=args.block, sweep_win=args.win,
                       sweep_fused_rows=bool(args.fused))
    params = nt.make_params()
    state, grid, _ = scene.dam_break(params, cfg, n_target=args.n,
                                     with_boundary=False)
    if args.pad_below:
        k = args.pad_below
        origin = np.asarray(grid.origin, np.float64)
        cell = float(np.asarray(grid.cell)[0])
        origin[2] -= k * cell
        gsz = (grid.size[0], grid.size[1], grid.size[2] + k)
        grid = Grid(origin=jnp.asarray(origin, grid.origin.dtype),
                    size=gsz, cell=grid.cell)
        print(f"pad-below {k}: cells={grid.num_cells} "
              f"wide={wide_hash_needed(grid.size)}")
    n_act = int(np.asarray(state.num_active))

    if args.cellcheck:
        cellcheck(state, params, grid, cfg)
        return
    if args.steps:
        steps_ab(args, state, params, grid, cfg, n_act)
        return
    rows_local = 3 if (args.fused and rows3_supported(grid.size)) else 9
    print(f"n={n_act} grid={grid.size} cells={grid.num_cells} "
          f"rows_local={rows_local} block={cfg.resolve_block(rows_local==3)}"
          f" win={cfg.resolve_win(rows_local==3)} "
          f"backend={jax.default_backend()}")

    if wide_hash_needed(grid.size):
        # no exact on-chip narrow baseline past 2**24 cells — compare the
        # device hv counts against the host-side expected counts
        exp, act, sh, miss = expected_hv(state, params, grid, cfg,
                                         rows_local)
        print(f"[expected] miss={miss} hv/query={exp[act].mean():.2f}")
        for mode in args.modes.split(","):
            test = run_mode(mode, state, params, grid, cfg, rows_local,
                            False)
            hv1, t1, m1 = test["all"]
            d = (exp - hv1)[act]
            bad = np.nonzero(d != 0)[0]
            line = (f"[{mode} vs expected] miss={m1} "
                    f"hv_deficit={d.sum():.0f} affected={bad.size}/{n_act}")
            if bad.size:
                vals, cnts = np.unique(d[bad], return_counts=True)
                line += (f"\n    deficit values: "
                         f"{dict(zip(vals.tolist(), cnts.tolist()))}"
                         f"\n    sorted-idx range: [{bad.min()}, "
                         f"{bad.max()}] (n_act={n_act})"
                         f"\n    first 12 idx: {bad[:12].tolist()}"
                         f"\n    their hashes: {sh[bad[:12]].tolist()}")
            print(line)
        return

    base = run_mode("narrow", state, params, grid, cfg, rows_local,
                    args.per_row)
    hv, t, m = base["all"]
    act = base["_meta"][1]
    print(f"[narrow] miss={m} hv/query={hv[act].mean():.2f} "
          f"true/query={t[act].mean():.2f}")
    # cross-check the narrow baseline itself against host-expected counts
    exp, act2, _, _ = expected_hv(state, params, grid, cfg, rows_local)
    d0 = (exp - hv.astype(np.int64))[act]
    print(f"[narrow vs expected] deficit={d0.sum():.0f} "
          f"affected={int((d0 != 0).sum())}/{n_act}")
    for mode in args.modes.split(","):
        test = run_mode(mode, state, params, grid, cfg, rows_local,
                        args.per_row)
        report(mode, base, test, base["_meta"], n_act)


if __name__ == "__main__":
    main()
