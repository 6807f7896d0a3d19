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


def _cols9(mat):
    """(n, 3, 3) → 9 (n,) columns. ONE relayout pass — on TPU a rank-3
    array tiles its trailing (3, 3) to a full (8, 128) tile, so every
    elementwise op over it physically moves ~340× the logical bytes
    (≈2.1 GB per op at 512k, measured: the 'negligible' batched 3×3
    constitutive math was 130 of the 138 ms step). Column form is the
    round-3 SoA lesson applied to the solid solver."""
    m9 = mat.reshape(mat.shape[0], 9)
    return [m9[:, k] for k in range(9)]


def _mm(a, b):
    """C = A @ B on 9-column lists (row-major index: m[3i+j] = m_ij)."""
    return [sum(a[3 * i + k] * b[3 * k + j] for k in range(3))
            for i in range(3) for j in range(3)]


def _mmT(a, b):
    """C = A @ Bᵀ on 9-column lists."""
    return [sum(a[3 * i + k] * b[3 * j + k] for k in range(3))
            for i in range(3) for j in range(3)]


def _tmm(a, b):
    """C = Aᵀ @ B on 9-column lists."""
    return [sum(a[3 * k + i] * b[3 * k + j] for k in range(3))
            for i in range(3) for j in range(3)]


_DIAG = (0, 4, 8)


def _constitutive_cols(raw9, corr9, ep, plastic9, dt, vol):
    """Column form of ``elastic.stress_pc`` (+ ``plastic_flow``): Green
    strain, optional von Mises radial return, StVK stress, and the
    force-ready PC = P·Cᵀ — all on (n,) columns. Returns
    ``(pc9, f9, e9, p_new9)`` with the same math as the (n,3,3) oracle
    path (equivalence tests unchanged)."""
    f9 = _mm([vol * r for r in raw9], corr9)
    ftf = _tmm(f9, f9)
    e9 = [0.5 * (ftf[k] - (1.0 if k in _DIAG else 0.0)) for k in range(9)]
    p_new9 = None
    if plastic9 is not None:
        eps = 1e-20
        e_el9 = [e9[k] - plastic9[k] for k in range(9)]
        tr3 = (e_el9[0] + e_el9[4] + e_el9[8]) / 3.0
        dev9 = [e_el9[k] - (tr3 if k in _DIAG else 0.0) for k in range(9)]
        mag = jnp.sqrt(jnp.maximum(
            sum(d * d for d in dev9), eps))
        over = jnp.maximum(mag - ep.yield_strain, 0.0)
        rate = jnp.where(jnp.isfinite(ep.creep),
                         jnp.minimum(ep.creep * dt, 1.0), 1.0)
        grow = rate * over / mag
        p_new9 = [plastic9[k] + grow * dev9[k] for k in range(9)]
        pmag = jnp.sqrt(jnp.maximum(
            sum(p * p for p in p_new9), eps))
        scale = jnp.minimum(ep.max_plastic / pmag, 1.0)
        p_new9 = [scale * p for p in p_new9]
        e9 = [e9[k] - p_new9[k] for k in range(9)]
    tr = e9[0] + e9[4] + e9[8]
    s9 = [2.0 * ep.mu * e9[k] + (ep.lam * tr if k in _DIAG else 0.0)
          for k in range(9)]
    pc9 = _mmT(_mm(f9, s9), corr9)
    return pc9, f9, e9, p_new9


def elastic_step_pallas(state, statics, params: SimParams, ep,
                        grid, cfg: SimConfig, f_ext=None):
    """One elastic step; see :func:`nereus_tpu.solvers.elastic.elastic_step`.

    The constitutive math runs in COLUMN form (:func:`_cols9` note);
    the only per-step (n,3,3) traffic left is reading ``state.plastic``
    and restacking its update."""
    from .elastic import ElasticDiagnostics, ElasticState
    n = statics.n
    rows_local, block, win = _layout(cfg, grid, statics.win)
    cb = round_up(n, block)
    vol = statics.vol
    pvec = PS.build_pvec(params, cfg, grid)
    xcols = [statics.x0[:, k] for k in range(3)]
    xq = _pad_cols(xcols, cb, 1e9)

    raw = f_gradient_sweep(statics, state.pos, params, grid, cfg)
    raw9 = [raw[:, k] for k in range(9)]
    corr9 = _cols9(statics.corr)
    plastic9 = (None if state.plastic is None
                else _cols9(state.plastic))
    pc_cols, f_cols, e9, p_new9 = _constitutive_cols(
        raw9, corr9, ep, plastic9, params.dt, vol)

    q_f = _queries(xq + _pad_cols(pc_cols, cb, 0.0), 12)
    src_f = pack_source_wide(tuple(xcols), statics.hash_f32, pc_cols,
                             rows=16, win=win)
    f_el = (vol * vol) * _sweep(statics, PS.elastic_force_pair, q_f, src_f,
                                pvec, grid, cfg, 4)[:, :3]

    ccols = [state.pos[:, k] for k in range(3)]
    q_h = _queries(xq + _pad_cols(ccols, cb, 1e9)
                   + _pad_cols(f_cols, cb, 0.0), 16)
    src_h = pack_source_wide(tuple(xcols), statics.hash_f32,
                             ccols + f_cols, rows=16, win=win)
    f_hg = (ep.hourglass * vol * vol) * _sweep(
        statics, PS.elastic_hourglass_pair, q_h, src_h, pvec, grid, cfg,
        4)[:, :3]

    force = f_el + f_hg if f_ext is None else f_el + f_hg + f_ext

    # --- integrate (the oracle _integrate's math; diagnostics computed
    # from the columns instead of (n,3,3) arrays) -------------------------
    dt = params.dt
    g = params.gravity
    acc = force / statics.mass + g[None, :]
    depth = jnp.maximum(ep.floor_y - state.pos[:, 1], 0.0)
    omega = 0.2 / dt
    acc = acc.at[:, 1].add(omega * omega * depth)
    acc = acc + (omega * omega) * (
        jnp.maximum(ep.box_lo[None, :] - state.pos, 0.0)
        - jnp.maximum(state.pos - ep.box_hi[None, :], 0.0))
    nv = (state.vel + dt * acc) / (1.0 + ep.damping * dt)
    nv = jnp.where(statics.fixed[:, None], 0.0, nv)
    np_ = state.pos + dt * nv

    tr = e9[0] + e9[4] + e9[8]
    ee = sum(c * c for c in e9)
    energy = vol * jnp.sum(ep.mu * ee + 0.5 * ep.lam * tr * tr)
    stretch = jnp.max(jnp.stack(
        [jnp.max(jnp.abs(f_cols[k] - (1.0 if k in _DIAG else 0.0)))
         for k in range(9)]))
    plastic_new = (None if p_new9 is None
                   else jnp.stack(p_new9, axis=1).reshape(n, 3, 3))
    diag = ElasticDiagnostics(
        elastic_energy=energy, max_stretch=stretch,
        max_speed=jnp.sqrt(jnp.max(jnp.sum(nv * nv, axis=1))),
        seg_overflow=statics.miss)
    return ElasticState(pos=np_, vel=nv, plastic=plastic_new), diag
