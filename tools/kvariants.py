"""Pair-function variants for tools/kbench.py (Müller + Becker, fp32).

Each build(name, ...) returns run(ctx, q_extra)->(cb,) so kbench can chain
it. Variants:

  d0 — production density sweep
  d1 — trimmed density: self-pair included (W(0) term free), radius test
       folded into the max(h²−r², 0) clamp, constants folded rank-1
  f0 — production fused force sweep (visc + pressure + Becker ST)
  f1 — trimmed direct: no wheres (eps-clamped rsqrt keeps everything
       finite, masked-out slots multiply to exact 0), constants folded
       into rank-1 precomputes, single mask cast
  f2 — f1 with factorized reductions: Σc·(q−s) = q·Σc − Σc·s via two
       (B,WIN)@(WIN,4) MXU matmuls; per-block recentering for precision
"""

import functools

import jax
import jax.numpy as jnp

from nereus_tpu.ops import pallas_sph as PS
from nereus_tpu.ops.pallas_neighbors import neighbor_sweep

_EPS = 1e-12
PV = PS


def density_pair_v1(q_ref, src_ref, valid, pv, **_):
    qx, qy, qz = q_ref[:, 0:1], q_ref[:, 1:2], q_ref[:, 2:3]
    dx = qx - src_ref[0:1, :]
    dy = qy - src_ref[1:2, :]
    dz = qz - src_ref[2:3, :]
    r2 = dx * dx + dy * dy + dz * dz
    d = jnp.maximum(pv[PV.PV_H2] - r2, 0.0)     # 0 outside cutoff
    psi_k = src_ref[6:7, :] * pv[PV.PV_KPOLY]   # rank-1
    w = d * d * d
    contrib = (w * psi_k) * valid.astype(q_ref.dtype)
    return jnp.sum(contrib, axis=1, keepdims=True)


def _force_coeffs(q_ref, src_ref, valid, pv):
    """Shared trimmed coefficient computation: returns (cvisc, cpd,
    dx, dy, dz, r2)."""
    qx, qy, qz = q_ref[:, 0:1], q_ref[:, 1:2], q_ref[:, 2:3]
    sx, sy, sz = src_ref[0:1, :], src_ref[1:2, :], src_ref[2:3, :]
    dx = qx - sx
    dy = qy - sy
    dz = qz - sz
    r2 = dx * dx + dy * dy + dz * dz
    inv = jax.lax.rsqrt(jnp.maximum(r2, _EPS * _EPS))
    rl = r2 * inv
    okf = (valid & (r2 < pv[PV.PV_H2])).astype(q_ref.dtype)

    dens_j = jnp.maximum(src_ref[6:7, :], _EPS)          # (1, WIN)
    inv_dens = 1.0 / dens_j                              # rank-1 division

    # viscosity: cvisc = K·(c·r²)/(r²+0.01h²)·inv_dens
    inv3 = inv * inv * inv
    c = ((2.0 / pv[PV.PV_H2]) - rl * (3.0 / pv[PV.PV_KVISC_DEN])
         - inv3 * (pv[PV.PV_H] * 0.5))
    kv = (2.0 * pv[PV.PV_PM] * pv[PV.PV_VISC] * pv[PV.PV_PM]
          * pv[PV.PV_KVISC]) * inv_dens                  # rank-1
    bden = r2 + 0.01 * pv[PV.PV_H2]
    cvisc = kv * ((c * r2) / bden) * okf

    # pressure (Tait EOS of the neighbor density — all rank-1)
    ratio = dens_j * (1.0 / pv[PV.PV_RD])
    ratio2 = ratio * ratio
    p_j = pv[PV.PV_K] * (ratio2 * ratio2 * ratio2 * ratio - 1.0)
    pd2_j = p_j * inv_dens * inv_dens                    # rank-1
    hr = jnp.maximum(pv[PV.PV_H] - rl, 0.0)
    sp = (hr * hr) * inv * (-pv[PV.PV_PM] * pv[PV.PV_PM]
                            * pv[PV.PV_KPRESS])
    cpd = (q_ref[:, 7:8] + pd2_j) * sp

    # Becker surface tension
    dpo = jnp.maximum(pv[PV.PV_H2] - r2, 0.0)
    w = dpo * dpo * dpo * pv[PV.PV_KPOLY]
    w_eff = jnp.where(r2 > pv[PV.PV_DIAM2], w, pv[PV.PV_WDIAM])
    cpd = (cpd - pv[PV.PV_KAPPA] * w_eff) * okf
    return cvisc, cpd, dx, dy, dz, r2


def force_pair_v1(q_ref, src_ref, valid, pv, **_):
    cvisc, cpd, dx, dy, dz, _ = _force_coeffs(q_ref, src_ref, valid, pv)
    dvx = q_ref[:, 3:4] - src_ref[3:4, :]
    dvy = q_ref[:, 4:5] - src_ref[4:5, :]
    dvz = q_ref[:, 5:6] - src_ref[5:6, :]
    fx = cvisc * dvx + cpd * dx
    fy = cvisc * dvy + cpd * dy
    fz = cvisc * dvz + cpd * dz
    zero = jnp.zeros_like(fx[:, :1])
    return jnp.concatenate(
        [jnp.sum(fx, axis=1, keepdims=True),
         jnp.sum(fy, axis=1, keepdims=True),
         jnp.sum(fz, axis=1, keepdims=True), zero], axis=1)


def force_pair_v2(q_ref, src_ref, valid, pv, **_):
    cvisc, cpd, dx, dy, dz, _ = _force_coeffs(q_ref, src_ref, valid, pv)
    # factorized: Σ c·(q − s) = q·Σc − Σ c·s  (two MXU matmuls)
    win = src_ref.shape[1]
    ones = jnp.ones((1, win), q_ref.dtype)
    # recenter sources about the block's first query for precision
    cx, cy, cz = q_ref[0:1, 0:1], q_ref[0:1, 1:2], q_ref[0:1, 2:3]
    rhs_p = jnp.concatenate([ones, src_ref[0:1, :] - cx,
                             src_ref[1:2, :] - cy,
                             src_ref[2:3, :] - cz], axis=0).T   # (WIN, 4)
    rhs_v = jnp.concatenate([ones, src_ref[3:4, :], src_ref[4:5, :],
                             src_ref[5:6, :]], axis=0).T
    mp = jnp.dot(cpd, rhs_p, preferred_element_type=jnp.float32)
    mv = jnp.dot(cvisc, rhs_v, preferred_element_type=jnp.float32)
    fx = (q_ref[:, 0:1] - cx) * mp[:, 0:1] - mp[:, 1:2] \
        + q_ref[:, 3:4] * mv[:, 0:1] - mv[:, 1:2]
    fy = (q_ref[:, 1:2] - cy) * mp[:, 0:1] - mp[:, 2:3] \
        + q_ref[:, 4:5] * mv[:, 0:1] - mv[:, 2:3]
    fz = (q_ref[:, 2:3] - cz) * mp[:, 0:1] - mp[:, 3:4] \
        + q_ref[:, 5:6] * mv[:, 0:1] - mv[:, 3:4]
    zero = jnp.zeros_like(fx)
    return jnp.concatenate([fx, fy, fz, zero], axis=1)


def build(name, cfg, params, grid):
    import nereus_tpu as nt

    def density_like(pair_fn, _unused=None):
        def run(ctx, q_extra):
            cb, c = ctx.cb, ctx.c
            pm = params.particle_mass
            psi = jnp.full((c,), 1.0, ctx.dtype) * pm
            q = jnp.stack(
                [ctx.px + q_extra * 1e-20, ctx.py, ctx.pz,
                 jnp.zeros((cb,), ctx.dtype)], axis=0).T
            out = neighbor_sweep(
                functools.partial(pair_fn, kernel_set=cfg.kernel_set)
                if pair_fn is PS.density_pair else pair_fn,
                queries=q, src=ctx.pack(slot6=psi), anchors=ctx.anchors,
                pvec=ctx.pvec, gsize=ctx.gsize, out_width=1,
                block=cfg.resolve_block(ctx.rows_local == 3), win=ctx.win,
                grid_geom_idx=PS.PV_OX, n_rows=ctx.n_rows,
                interpret=ctx.interp)
            return out[:, 0]
        return run

    def force_like(pair_fn, _unused=None):
        def run(ctx, q_extra):
            cb = ctx.cb
            dens = jnp.full((cb,), params.rest_density, ctx.dtype)
            q = jnp.stack(
                [ctx.px + q_extra * 1e-20, ctx.py, ctx.pz,
                 ctx.vx, ctx.vy, ctx.vz,
                 dens, jnp.zeros((cb,), ctx.dtype)], axis=0).T
            pf = pair_fn
            if pair_fn is None:
                pf = functools.partial(
                    PS.fluid_force_pair, kernel_set=cfg.kernel_set,
                    st_model=cfg.surface_tension_model)
            vel = (ctx.vx, ctx.vy, ctx.vz)
            out = neighbor_sweep(
                pf, queries=q, src=ctx.pack(vel=vel, slot6=dens),
                anchors=ctx.anchors, pvec=ctx.pvec, gsize=ctx.gsize,
                out_width=4, block=cfg.resolve_block(ctx.rows_local == 3), win=ctx.win,
                grid_geom_idx=PS.PV_OX, n_rows=ctx.n_rows,
                interpret=ctx.interp)
            return out[:, 0]
        return run

    return {
        "d0": density_like(PS.density_pair, True),
        "d1": density_like(density_pair_v1, False),
        "f0": force_like(None, True),
        "f1": force_like(force_pair_v1, False),
        "f2": force_like(force_pair_v2, False),
        "f3": force_like(force_pair_bf16, False),
        "f4": force_like(force_pair_rcp, False),
    }[name]


def force_pair_bf16(q_ref, src_ref, valid, pv, **_):
    """f1 with the (B, WIN) pair math in bfloat16 (MEASURED DEAD END:
    even with per-block recentering, max relative force error vs f32 is
    ~120% and mean ~32% — the h−r and h²−r² cancellations leave bf16's
    8 mantissa bits nothing to work with near the cutoff, and the spiky
    gradient amplifies. Kept as the negative-result record; do not
    productionize)."""
    bf = jnp.bfloat16
    cx, cy, cz = q_ref[0:1, 0:1], q_ref[0:1, 1:2], q_ref[0:1, 2:3]
    qx = (q_ref[:, 0:1] - cx).astype(bf)
    qy = (q_ref[:, 1:2] - cy).astype(bf)
    qz = (q_ref[:, 2:3] - cz).astype(bf)
    sx = (src_ref[0:1, :] - cx).astype(bf)
    sy = (src_ref[1:2, :] - cy).astype(bf)
    sz = (src_ref[2:3, :] - cz).astype(bf)
    dx = qx - sx
    dy = qy - sy
    dz = qz - sz
    r2 = dx * dx + dy * dy + dz * dz
    h2 = pv[PV.PV_H2].astype(bf)
    inv = jax.lax.rsqrt(jnp.maximum(r2, bf(1e-12)))
    rl = r2 * inv
    okf = (valid & (r2 < h2)).astype(bf)

    dens_j = jnp.maximum(src_ref[6:7, :], _EPS)          # rank-1 f32
    inv_dens = 1.0 / dens_j

    inv3 = inv * inv * inv
    c = ((2.0 / pv[PV.PV_H2]).astype(bf) - rl * (3.0 / pv[PV.PV_KVISC_DEN]).astype(bf)
         - inv3 * (pv[PV.PV_H] * 0.5).astype(bf))
    kv = ((2.0 * pv[PV.PV_PM] * pv[PV.PV_VISC] * pv[PV.PV_PM]
           * pv[PV.PV_KVISC]) * inv_dens).astype(bf)     # rank-1
    bden = r2 + (0.01 * pv[PV.PV_H2]).astype(bf)
    cvisc = kv * ((c * r2) / bden) * okf

    ratio = dens_j * (1.0 / pv[PV.PV_RD])
    ratio2 = ratio * ratio
    p_j = pv[PV.PV_K] * (ratio2 * ratio2 * ratio2 * ratio - 1.0)
    pd2_j = (p_j * inv_dens * inv_dens)                  # rank-1 f32
    hr = jnp.maximum(pv[PV.PV_H].astype(bf) - rl, bf(0))
    sp = (hr * hr) * inv * (-pv[PV.PV_PM] * pv[PV.PV_PM]
                            * pv[PV.PV_KPRESS]).astype(bf)
    cpd = (q_ref[:, 7:8].astype(bf) + pd2_j.astype(bf)) * sp

    dpo = jnp.maximum(h2 - r2, bf(0))
    w = dpo * dpo * dpo * pv[PV.PV_KPOLY].astype(bf)
    w_eff = jnp.where(r2 > pv[PV.PV_DIAM2].astype(bf), w,
                      pv[PV.PV_WDIAM].astype(bf))
    cpd = (cpd - pv[PV.PV_KAPPA].astype(bf) * w_eff) * okf

    dvx = (q_ref[:, 3:4] - src_ref[3:4, :]).astype(bf)
    dvy = (q_ref[:, 4:5] - src_ref[4:5, :]).astype(bf)
    dvz = (q_ref[:, 5:6] - src_ref[5:6, :]).astype(bf)
    fx = cvisc * dvx + cpd * dx
    fy = cvisc * dvy + cpd * dy
    fz = cvisc * dvz + cpd * dz
    zero = jnp.zeros((q_ref.shape[0], 1), q_ref.dtype)
    return jnp.concatenate(
        [jnp.sum(fx.astype(q_ref.dtype), axis=1, keepdims=True),
         jnp.sum(fy.astype(q_ref.dtype), axis=1, keepdims=True),
         jnp.sum(fz.astype(q_ref.dtype), axis=1, keepdims=True),
         zero], axis=1)


def force_pair_rcp(q_ref, src_ref, valid, pv, **_):
    """f1 with the viscosity denominator via pl.reciprocal(approx=True)
    instead of a true divide (the only per-slot division left)."""
    from jax.experimental import pallas as pl
    cvisc, cpd, dx, dy, dz, _ = None, None, None, None, None, None
    qx, qy, qz = q_ref[:, 0:1], q_ref[:, 1:2], q_ref[:, 2:3]
    sx, sy, sz = src_ref[0:1, :], src_ref[1:2, :], src_ref[2:3, :]
    dx = qx - sx
    dy = qy - sy
    dz = qz - sz
    r2 = dx * dx + dy * dy + dz * dz
    inv = jax.lax.rsqrt(jnp.maximum(r2, _EPS * _EPS))
    rl = r2 * inv
    okf = (valid & (r2 < pv[PV.PV_H2])).astype(q_ref.dtype)
    dens_j = jnp.maximum(src_ref[6:7, :], _EPS)
    inv_dens = 1.0 / dens_j
    inv3 = inv * inv * inv
    c = ((2.0 / pv[PV.PV_H2]) - rl * (3.0 / pv[PV.PV_KVISC_DEN])
         - inv3 * (pv[PV.PV_H] * 0.5))
    kv = (2.0 * pv[PV.PV_PM] * pv[PV.PV_VISC] * pv[PV.PV_PM]
          * pv[PV.PV_KVISC]) * inv_dens
    bden = r2 + 0.01 * pv[PV.PV_H2]
    cvisc = kv * ((c * r2) * pl.reciprocal(bden, approx=True)) * okf
    ratio = dens_j * (1.0 / pv[PV.PV_RD])
    ratio2 = ratio * ratio
    p_j = pv[PV.PV_K] * (ratio2 * ratio2 * ratio2 * ratio - 1.0)
    pd2_j = p_j * inv_dens * inv_dens
    hr = jnp.maximum(pv[PV.PV_H] - rl, 0.0)
    sp = (hr * hr) * inv * (-pv[PV.PV_PM] * pv[PV.PV_PM] * pv[PV.PV_KPRESS])
    cpd = (q_ref[:, 7:8] + pd2_j) * sp
    dpo = jnp.maximum(pv[PV.PV_H2] - r2, 0.0)
    w = dpo * dpo * dpo * (pv[PV.PV_KPOLY] * pv[PV.PV_KAPPA])
    w_eff = jnp.where(r2 > pv[PV.PV_DIAM2], w,
                      pv[PV.PV_WDIAM] * pv[PV.PV_KAPPA])
    cpd = (cpd - w_eff) * okf
    dvx = q_ref[:, 3:4] - src_ref[3:4, :]
    dvy = q_ref[:, 4:5] - src_ref[4:5, :]
    dvz = q_ref[:, 5:6] - src_ref[5:6, :]
    fx = cvisc * dvx + cpd * dx
    fy = cvisc * dvy + cpd * dy
    fz = cvisc * dvz + cpd * dz
    zero = jnp.zeros_like(fx[:, :1])
    return jnp.concatenate(
        [jnp.sum(fx, axis=1, keepdims=True),
         jnp.sum(fy, axis=1, keepdims=True),
         jnp.sum(fz, axis=1, keepdims=True), zero], axis=1)
