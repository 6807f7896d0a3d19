"""Implicit viscosity: Weiler et al. 2018 (beyond-reference).

The reference's only viscosity is the explicit Müller viscous force —
conditionally stable, so honey/lava-viscosity fluids demand tiny
timesteps. This module solves the backward-Euler viscous system

  (I − dt·ν·∇²) v_new = v*,
  (∇²v)_i = 2(d+2) Σ_j (m_j/ρ_j) (v_ij·x_ij)/(‖x_ij‖² + 0.01h²) ∇W_ij
            + 2(d+2) Σ_b (ψ_b/ρ_i) (v_ib·x_ib)/(…) ∇W_ib      (d = 3)

with matrix-free conjugate gradient: one neighbor sweep per matvec
(``ops.pallas_sph.visc_laplacian_pair`` on the Pallas engine; the same
formula through ``neighbor_reduce`` on the segments oracle), warm-started
at v* and iterated to a relative residual (``SimConfig.visc_cg_tol``,
capped at ``visc_cg_max_iters``) inside ``lax.while_loop`` — fully
on-device, static shapes. Positions/densities are frozen over the solve
so the operator is exactly linear and symmetric enough for CG in
practice (Weiler §4; the m/ρ_j asymmetry is the paper's own).

Boundary samples contribute with their prescribed velocities (zero for
static walls), which damps tangential flow at walls — the implicit
analogue of the explicit path's Akinci friction (both are therefore
disabled together via ``include_viscosity=False`` /
``include_friction=False`` when this solver runs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import kernels as K
from ..ops.neighbors import masked, neighbor_reduce
from ..params import SimConfig, SimParams
from . import common

_EPS = 1e-12


def cg_solve(matvec, b, cfg: SimConfig, dot=None):
    """Matrix-free CG over a pytree of velocity components, warm-started
    at x0 = b. Returns (x, iters, rel_residual).

    ``dot`` overrides the inner product — the sharded path passes a
    psum-reduced, ownership-masked dot so every shard sees the same
    global scalars and the CG loop stays in lockstep."""
    if dot is None:
        def dot(u, v):
            return sum(jnp.sum(ui * vi) for ui, vi in
                       zip(jax.tree_util.tree_leaves(u),
                           jax.tree_util.tree_leaves(v)))

    def axpy(a, x, y):   # a*x + y
        return jax.tree_util.tree_map(lambda xi, yi: a * xi + yi, x, y)

    bnorm2 = jnp.maximum(dot(b, b), _EPS)
    tol2 = (cfg.visc_cg_tol ** 2) * bnorm2

    x0 = b
    r0 = axpy(-1.0, matvec(x0), b)
    rs0 = dot(r0, r0)

    def cond(carry):
        _, _, _, rs, it = carry
        return (rs > tol2) & (it < cfg.visc_cg_max_iters)

    def body(carry):
        x, r, p, rs, it = carry
        ap = matvec(p)
        alpha = rs / jnp.maximum(dot(p, ap), _EPS)
        x = axpy(alpha, p, x)
        r = axpy(-alpha, ap, r)
        rs_new = dot(r, r)
        p = axpy(rs_new / jnp.maximum(rs, _EPS), p, r)
        return (x, r, p, rs_new, it + 1)

    x, r, _, rs, iters = jax.lax.while_loop(
        cond, body, (x0, r0, r0, rs0, jnp.asarray(0, jnp.int32)))
    return x, iters, jnp.sqrt(rs / bnorm2)


def implicit_viscosity_oracle(ctx, params: SimParams, cfg: SimConfig,
                              boundary, dens, v_star):
    """Solve the viscous system on the segments oracle. ``v_star`` is an
    (n, 3) velocity array in ctx (sorted) order; returns the same shape
    plus (iters, rel_residual)."""
    pos = ctx.state.pos
    n = pos.shape[0]
    ir = params.interaction_radius
    pm = params.particle_mass
    nu_dt = params.viscosity * params.dt
    mrho = pm / jnp.maximum(dens, _EPS)
    dens_i = jnp.maximum(dens, _EPS)
    eps_h2 = 0.01 * ir * ir

    def lap(v):
        def pair(i, j, valid):
            rij = i["pos"][:, None, :] - j["pos"]
            r2 = jnp.sum(rij * rij, axis=-1)
            ok = valid & (r2 < ir * ir)
            gr = K.w_default_grad(cfg.kernel_set, rij, params)
            dv = i["vel"][:, None, :] - j["vel"]
            c = 10.0 * j["mr"] * jnp.sum(dv * rij, axis=-1) / (r2 + eps_h2)
            return {"L": masked(ok, c[..., None] * gr)}

        acc = common.fluid_reduce(
            ctx, pair, {"L": jnp.zeros((n, 3), cfg.dtype)},
            {"pos": pos, "vel": v, "mr": mrho},
            {"pos": pos, "vel": v}, cfg)

        def bpair(i, j, valid):
            rij = i["pos"][:, None, :] - j["pos"]
            r2 = jnp.sum(rij * rij, axis=-1)
            ok = valid & (r2 < ir * ir)
            gr = K.w_default_grad(cfg.kernel_set, rij, params)
            dv = (i["vel"][:, None, :] - j["vel"] if "vel" in j
                  else i["vel"][:, None, :])
            c = (10.0 * j["psi"] / i["di"][:, None]
                 * jnp.sum(dv * rij, axis=-1) / (r2 + eps_h2))
            return {"L": masked(ok, c[..., None] * gr)}

        acc = common.boundary_reduce(
            ctx, boundary, bpair, acc,
            {"pos": pos, "vel": v, "di": dens_i}, cfg)
        return acc["L"]

    def matvec(v):
        return v - nu_dt * lap(v)

    return cg_solve(matvec, v_star, cfg)


def implicit_viscosity_pallas(ctx, params: SimParams, cfg: SimConfig,
                              dens, v_star):
    """Solve the viscous system on the Pallas engine. ``v_star`` is a
    tuple of (cb,) velocity columns; returns the same plus
    (iters, rel_residual). Uses the step's fused plan (fluid + boundary
    window groups) — boundary velocities ride the packed source rows."""
    from ..ops import pallas_sph as PS

    pm = params.particle_mass
    nu_dt = params.viscosity * params.dt
    c = ctx.c
    dens_safe = jnp.maximum(dens, _EPS)
    mrho = (pm / dens_safe)[:c]
    pvec, gsize, n_rows = ctx.pvec, ctx.gsize, ctx.n_rows

    def lap(v):
        q8 = ctx.queries(*v, dens, width=8)
        src = ctx.pack(vel=v, slot6=mrho)   # boundary slot6 = ψ
        out = PS.generic_sweep(
            cfg, PS.visc_laplacian_pair, q8, src, ctx.anchors, pvec,
            gsize, out_width=4, n_rows=n_rows, interpret=ctx.interp,
            boundary=False,
            pair_fn_b=(PS.visc_laplacian_pair if n_rows in (6, 18)
                       else None),
            pair_b_kw=dict(boundary=True))
        return tuple(out[:, k] for k in range(3))

    def matvec(v):
        L = lap(v)
        return tuple(v[k] - nu_dt * L[k] for k in range(3))

    return cg_solve(matvec, v_star, cfg)
