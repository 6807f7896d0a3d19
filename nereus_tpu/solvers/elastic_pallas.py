"""Elastic-solid step on the Pallas window-sweep engine (TPU hot path).

Total-Lagrangian SPH makes the neighbor problem STATIC: every sweep's pair
geometry, r² cutoff and in-kernel hash masks read the reference
configuration, so the hash sort and window plan from
:func:`build_elastic_plan` are computed once per body and reused for its
whole lifetime (``ElasticStatics.anchors``). A step is three window sweeps
(deformation gradient → forces → hourglass control) plus batched 3×3
constitutive math — no per-step ctx at all, where the fluid solvers pay a
sort + plan every step. Physics identical to the jnp oracle in
:mod:`.elastic` (equivalence-tested, ``tests/test_elastic.py``).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from .. import grid as gridlib
from ..ops import pallas_sph as PS
from ..ops.pallas_neighbors import (anchors_pack16, neighbor_sweep,
                                    pack_source_wide, plan_windows,
                                    round_up, rows3_supported)
from ..params import SimConfig, SimParams
from .pallas_common import check_pallas_dtype, interpret_mode, padded_len


def _layout(cfg: SimConfig, grid, win_override: int = 0):
    rows3 = cfg.sweep_fused_rows and rows3_supported(grid.size)
    rows_local = 3 if rows3 else 9
    win = win_override if win_override else cfg.resolve_win(rows3)
    return rows_local, cfg.resolve_block(rows3), win


def build_elastic_plan(x0, sorted_hash, grid, cfg: SimConfig,
                       win_override: int = 0):
    """Window plan over the (already hash-sorted) reference configuration.
    Built once per body; returns ``(anchors, miss)``. ``win_override``
    widens the windows past the SimConfig default — solid lattices
    (spacing h/2, ~8 particles/cell) outgrow the fluid defaults at
    scale; make_elastic_solid escalates until the plan is exact."""
    check_pallas_dtype(cfg, grid)
    rows_local, block, win = _layout(cfg, grid, win_override)
    n = x0.shape[0]
    cb = round_up(n, block)
    cols = _pad_cols([x0[:, k] for k in range(3)], cb, 1e9)
    coords = gridlib.cell_coords_cols(grid, *cols)
    active = jnp.arange(cb) < n
    return plan_windows(sorted_hash, coords, grid.size, block,
                        padded_len(n, win), active_mask=active, win=win,
                        pack16=anchors_pack16(padded_len(n, win), win),
                        rows_local=rows_local)


def _pad_cols(cols, cb, fill):
    n = cols[0].shape[0]
    if cb == n:
        return list(cols)
    return [jnp.concatenate([c, jnp.full((cb - n,), fill, c.dtype)])
            for c in cols]


def _queries(cols, width: int):
    cols = list(cols)
    z = jnp.zeros_like(cols[0])
    cols += [z] * (width - len(cols))
    return jnp.stack(cols, axis=0).T


def _sweep(statics, pair_fn, queries, src, params_pvec, grid, cfg,
           out_width):
    rows_local, block, win = _layout(cfg, grid, statics.win)
    out = neighbor_sweep(
        functools.partial(pair_fn, kernel_set=cfg.kernel_set),
        queries=queries, src=src, anchors=statics.anchors,
        pvec=params_pvec, gsize=grid.size, out_width=out_width,
        block=block, win=win, n_rows=rows_local, kfold=cfg.sweep_kfold,
        grid_geom_idx=PS.PV_OX, interpret=interpret_mode())
    return out[:statics.n]


def f_gradient_sweep(statics, cur, params: SimParams, grid, cfg):
    """Σ_j (x_j − x_i) ⊗ ∇W(X_ij) — the raw deformation-gradient
    accumulator, (n, 9). Also used at body creation with cur = X to
    compute the correction matrices."""
    rows_local, block, win = _layout(cfg, grid, statics.win)
    cb = round_up(statics.n, block)
    pvec = PS.build_pvec(params, cfg, grid)
    xcols = [statics.x0[:, k] for k in range(3)]
    ccols = [cur[:, k] for k in range(3)]
    q = _queries(_pad_cols(xcols, cb, 1e9) + _pad_cols(ccols, cb, 1e9), 8)
    src = pack_source_wide(tuple(xcols), statics.hash_f32, ccols,
                           rows=8, win=win)
    return _sweep(statics, PS.elastic_f_pair, q, src, pvec, grid, cfg, 9)


def elastic_step_pallas(state, statics, params: SimParams, ep,
                        grid, cfg: SimConfig, f_ext=None):
    """One elastic step; see :func:`nereus_tpu.solvers.elastic.elastic_step`."""
    from .elastic import _integrate, stress_pc
    n = statics.n
    rows_local, block, win = _layout(cfg, grid, statics.win)
    cb = round_up(n, block)
    vol = statics.vol
    pvec = PS.build_pvec(params, cfg, grid)
    xcols = [statics.x0[:, k] for k in range(3)]
    xq = _pad_cols(xcols, cb, 1e9)

    raw = f_gradient_sweep(statics, state.pos, params, grid, cfg)
    f = jnp.einsum("nab,nbc->nac", vol * raw.reshape(n, 3, 3), statics.corr)
    pc, e, pl = stress_pc(f, statics.corr, ep, state.plastic, params.dt)

    pc_cols = [pc.reshape(n, 9)[:, k] for k in range(9)]
    q_f = _queries(xq + _pad_cols(pc_cols, cb, 0.0), 12)
    src_f = pack_source_wide(tuple(xcols), statics.hash_f32, pc_cols,
                             rows=16, win=win)
    f_el = (vol * vol) * _sweep(statics, PS.elastic_force_pair, q_f, src_f,
                                pvec, grid, cfg, 4)[:, :3]

    ccols = [state.pos[:, k] for k in range(3)]
    f_cols = [f.reshape(n, 9)[:, k] for k in range(9)]
    q_h = _queries(xq + _pad_cols(ccols, cb, 1e9)
                   + _pad_cols(f_cols, cb, 0.0), 16)
    src_h = pack_source_wide(tuple(xcols), statics.hash_f32,
                             ccols + f_cols, rows=16, win=win)
    f_hg = (ep.hourglass * vol * vol) * _sweep(
        statics, PS.elastic_hourglass_pair, q_h, src_h, pvec, grid, cfg,
        4)[:, :3]

    force = f_el + f_hg if f_ext is None else f_el + f_hg + f_ext
    return _integrate(state, statics, params, ep, force, f, e,
                      statics.miss, plastic=pl)
