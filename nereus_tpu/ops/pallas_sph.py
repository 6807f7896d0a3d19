"""SPH pair functions for the Pallas neighbor engine + sweep drivers.

Mirrors the physics of ``solvers/common.py`` / ``solvers/wcsph.py`` (which
in turn mirror ``sph/sph_kernel_impl.cuh``), expressed as dense masked
(B, WIN) window math. The jnp segment path remains the reference oracle;
``tests/test_pallas.py`` checks agreement to float tolerance.

Parameter scalars reach the kernels through a packed float32 vector
(``build_pvec``) — the Pallas analogue of the reference's ``__constant__
SphSimParams`` upload (``sph/sph_cuda.cu:183-187``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..params import KernelSet, SimConfig, SimParams, SurfaceTensionModel
from .pallas_neighbors import neighbor_sweep

_EPS = 1e-12

# pvec layout
PV_H2 = 0
PV_PM = 1
PV_KPOLY = 2
PV_KPRESS = 3
PV_KVISC = 4
PV_KVISC_DEN = 5
PV_H = 6
PV_KAPPA = 7
PV_WDIAM = 8       # W(2·particle_radius), precomputed for the Becker clamp
PV_DIAM2 = 9       # (2·particle_radius)²
PV_BETA = 10
PV_VISC = 11
PV_CS = 12
PV_RD = 13
PV_K = 14          # Tait gas stiffness (pd2_j recomputed in-kernel)
PV_KSURF1 = 15
PV_KSURF2 = 16
PV_KPOLY_GRAD = 17
PV_OX = 18         # grid geometry: origin x/y/z, 1/cell
PV_OY = 19
PV_OZ = 20
PV_INVCELL = 21
PV_DT = 22
PV_SCORR_S = 23    # PBF anti-clustering: scorr = −(W·s)⁴ with
                   # s = pbf_scorr_k^(1/4) / W(Δq·h) (0 disables)
PV_STX = 24        # multiphase cross-phase cohesion factor (cfg.st_cross)
PV_LEN = 25


def build_pvec(params: SimParams, cfg: SimConfig, grid):
    from .. import kernels as K
    h = params.interaction_radius
    diam = 2.0 * params.particle_radius
    dvec = jnp.stack([diam, jnp.zeros_like(diam), jnp.zeros_like(diam)])
    wdiam = K.w_value(cfg.kernel_set, dvec[None, :], params)[0]
    vals = [None] * PV_LEN
    vals[PV_H2] = h * h
    vals[PV_PM] = params.particle_mass
    vals[PV_KPOLY] = params.kpoly
    vals[PV_KPRESS] = params.kpress_grad
    vals[PV_KVISC] = params.kvisc_grad
    vals[PV_KVISC_DEN] = params.kvisc_denum
    vals[PV_H] = h
    vals[PV_KAPPA] = params.surface_tension
    vals[PV_WDIAM] = wdiam
    vals[PV_DIAM2] = diam * diam
    vals[PV_BETA] = params.beta
    vals[PV_VISC] = params.viscosity
    vals[PV_CS] = params.sound_speed
    vals[PV_RD] = params.rest_density
    vals[PV_K] = params.gas_stiffness
    vals[PV_KSURF1] = params.ksurf1
    vals[PV_KSURF2] = params.ksurf2
    vals[PV_KPOLY_GRAD] = params.kpoly_grad
    vals[PV_OX] = grid.origin[0]
    vals[PV_OY] = grid.origin[1]
    vals[PV_OZ] = grid.origin[2]
    vals[PV_INVCELL] = 1.0 / grid.cell[0]
    vals[PV_DT] = params.dt
    if cfg.pbf_scorr_k > 0.0:
        dqv = jnp.stack([cfg.pbf_scorr_dq * h, jnp.zeros_like(h),
                         jnp.zeros_like(h)])
        wdq = K.w_value(cfg.kernel_set, dqv[None, :], params)[0]
        vals[PV_SCORR_S] = (cfg.pbf_scorr_k ** 0.25) / jnp.maximum(
            wdq, 1e-30)
    else:
        vals[PV_SCORR_S] = jnp.zeros_like(h)
    vals[PV_STX] = jnp.full_like(h, cfg.st_cross)
    return jnp.stack([jnp.asarray(v, cfg.dtype) for v in vals])


# ---------------------------------------------------------------------------
# In-kernel smoothing-kernel math on (B, WIN) tiles
# ---------------------------------------------------------------------------

def _w_value(kernel_set, r2, rl, pv):
    """W(r) on tiles (cutoff applied by the caller's mask)."""
    if kernel_set == KernelSet.MULLER:
        d = jnp.maximum(pv[PV_H2] - r2, 0.0)
        return pv[PV_KPOLY] * d * d * d
    h = pv[PV_H]
    sigma = 1.0 / (4.0 * jnp.pi * h * h * h)
    q = rl / h
    a = jnp.maximum(2.0 - q, 0.0)
    bq = jnp.maximum(1.0 - q, 0.0)
    return sigma * (a * a * a - 4.0 * bq * bq * bq)


def _w_grad_scale_default(kernel_set, r2, rl, pv, invrl=None):
    """Scale s with ∇W = s·r⃗ for the poly6/default gradient."""
    if kernel_set == KernelSet.MULLER:
        d = jnp.maximum(pv[PV_H2] - r2, 0.0)
        return pv[PV_KPOLY_GRAD] * d * d
    return _w_grad_scale_monaghan(rl, pv, invrl)


def _w_grad_scale_press(kernel_set, r2, rl, pv, invrl):
    """Scale for the spiky pressure gradient.

    Finite-by-construction: ``invrl`` must come from :func:`_rl_invrl`
    (eps-clamped rsqrt), so no ``jnp.where`` is needed — the r→0 blow-up
    stays a finite value that the caller's 0 displacement/mask multiplies
    away. Every select removed here is a measured VPU op saved per
    (B, WIN) slot.
    """
    if kernel_set == KernelSet.MULLER:
        hr = jnp.maximum(pv[PV_H] - rl, 0.0)
        return pv[PV_KPRESS] * hr * hr * invrl
    return _w_grad_scale_monaghan(rl, pv, invrl)


def _visc_rdotgrad(kernel_set, r2, rl, pv, invrl):
    """r⃗·∇W_visc = scale·r² for the viscosity kernel. Ordering matters for
    finiteness: the Müller bracket grows like invrl³ ≈ 1e36 at the r²
    floor, so it must multiply r² (→ 0) BEFORE the ~1e4 KVISC constant —
    KVISC·bracket overflows float32 to inf and inf·0 = NaN. (The old
    ``jnp.where(rl > eps, …)`` hid exactly this; see
    :func:`_w_grad_scale_press` for why the selects are gone.)"""
    if kernel_set == KernelSet.MULLER:
        inv3 = invrl * invrl * invrl
        c = ((2.0 / pv[PV_H2]) - rl * (3.0 / pv[PV_KVISC_DEN])
             - inv3 * (pv[PV_H] * 0.5))
        return (c * r2) * pv[PV_KVISC]
    # Monaghan: scalar(q→0) → 0, so scale·r² stays finite by itself
    return _w_grad_scale_monaghan(rl, pv, invrl) * r2


def _w_grad_scale_monaghan(rl, pv, invrl):
    h = pv[PV_H]
    sigma = 1.0 / (4.0 * jnp.pi * h * h * h)
    q = rl / h
    a = jnp.maximum(2.0 - q, 0.0)
    bq = jnp.maximum(1.0 - q, 0.0)
    scalar = -3.0 * a * a + 12.0 * bq * bq
    return (sigma / h) * scalar * invrl


def _pair_geometry(q_ref, src_ref, pv, geom_offset: int = 0):
    """Pair displacement/r² from query columns [geom_offset, geom_offset+3).

    ``geom_offset > 0`` lets a sweep use *different* positions for pair
    geometry than for the in-kernel hash masks (which always read columns
    0-2): the PCISPH predicted-density sweep keeps the start-of-step
    positions in columns 0-2 so its row bounds match the frozen window
    plan, while distances use the predicted positions — otherwise a
    particle whose prediction crosses a cell edge gets bounds the plan
    never covered and pairs drop silently (frozen-neighborhood contract).
    """
    o = geom_offset
    qx, qy, qz = q_ref[:, o:o + 1], q_ref[:, o + 1:o + 2], q_ref[:, o + 2:o + 3]
    dx = qx - src_ref[0:1, :]
    dy = qy - src_ref[1:2, :]
    dz = qz - src_ref[2:3, :]
    r2 = dx * dx + dy * dy + dz * dz
    return dx, dy, dz, r2


def _rl_invrl(r2):
    """|r| and 1/|r| from one rsqrt (VPU-cheap; divisions are multi-cycle).
    Both are exactly 0-safe: inv is clamped via the r² floor."""
    inv = jax.lax.rsqrt(jnp.maximum(r2, _EPS * _EPS))
    return r2 * inv, inv


def _fast_recip(x):
    """Approximate reciprocal inside Pallas kernels (the reference's
    ``--use_fast_math`` analogue); exact 1/x when tracing outside a
    kernel (e.g. a jnp oracle reusing a pair formula) or for non-f32
    operands (the fp64 interpret path: ``pl.reciprocal(approx=True)``
    returns f32 regardless of input, which poisons f64 math)."""
    if jnp.result_type(x) != jnp.float32:
        return 1.0 / x
    try:
        from jax.experimental import pallas as pl
        return pl.reciprocal(x, approx=True)
    except Exception:
        return 1.0 / x


# ---------------------------------------------------------------------------
# Pair functions
# ---------------------------------------------------------------------------

def _maybe_rl(kernel_set, r2):
    """(|r|, 1/|r|) only when the kernel set actually needs them (the
    Müller poly6 / default-gradient formulas are pure functions of r² —
    skipping the rsqrt is a measurable win in the implicit-solver
    sweeps). Returns ``(None, None)`` for Müller."""
    if kernel_set == KernelSet.MULLER:
        return None, None
    return _rl_invrl(r2)


def density_pair(q_ref, src_ref, valid, pv, *, kernel_set, geom_offset=0):
    """ρ contribution: Σ ψ_j·W(r). Fluid sources carry ψ = m in slot 6, so
    one formula serves fluid and boundary sweeps (``computeCellDensity`` /
    ``computeBoundaryCellDensity``, ``sph_kernel_impl.cuh:290-360``).
    ``geom_offset`` — see :func:`_pair_geometry` (PCISPH predicted density)."""
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv, geom_offset)
    if kernel_set == KernelSet.MULLER:
        # poly6 already vanishes outside the cutoff through the clamp, so
        # the radius compare folds away; ψ·kpoly is rank-1 (1, WIN)
        d = jnp.maximum(pv[PV_H2] - r2, 0.0)
        psi_k = src_ref[6:7, :] * pv[PV_KPOLY]
        contrib = (d * d * d) * psi_k * valid.astype(q_ref.dtype)
        return jnp.sum(contrib, axis=1, keepdims=True)
    rl, invrl = _maybe_rl(kernel_set, r2)
    w = _w_value(kernel_set, r2, rl, pv)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    contrib = src_ref[6:7, :] * w * okf
    return jnp.sum(contrib, axis=1, keepdims=True)


def fluid_force_pair(q_ref, src_ref, valid, pv, *, kernel_set, st_model,
                     include_pressure=True, include_viscosity=True):
    """Fused per-pair fluid forces: viscosity + surface tension (+ pressure
    when ``include_pressure`` — the IISPH/PCISPH advection prediction uses
    the same pair with it off), with the trailing scalings of
    ``computeForces`` folded per pair.

    q fields: x y z vx vy vz dens pd2_i ; src fields: same (ψ slot = dens;
    pd2_j is recomputed per pair from the neighbor density via the Tait EOS
    — measured faster than shipping it in a 16-row source, whose doubled
    window fetch costs more than the EOS math saves).
    Output (B, 4): fx fy fz (pad).
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _rl_invrl(r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)

    dens_j = jnp.maximum(src_ref[6:7, :], _EPS)   # (1, WIN)
    inv_dens = 1.0 / dens_j                       # rank-1 division

    # viscosity: 2·m·μ · (m/ρ_j)(r·∇W_v)/(r²+0.01h²) · (v_i − v_j).
    # The denominator uses the fast approximate reciprocal — the only
    # true per-slot division left, measured 7.7% of the whole force sweep
    # at 1M — matching the reference's own `--use_fast_math` build
    # (CMakeLists.txt:85). Interpret mode computes it exactly.
    cvisc = None
    if include_viscosity:
        a = _visc_rdotgrad(kernel_set, r2, rl, pv, invrl)
        kv = (2.0 * pv[PV_PM] * pv[PV_VISC] * pv[PV_PM]) * inv_dens
        bden = r2 + 0.01 * pv[PV_H2]
        cvisc = kv * (a * _fast_recip(bden)) * okf

    # displacement-direction coefficient: pressure + surface tension share
    # the r⃗ factor, so their scales combine into ONE (B, WIN) field before
    # the mask/accumulate — each fold is a VPU op per slot
    cpd = None
    if include_pressure:
        # Tait EOS of the neighbor density — all rank-1 (1, WIN)
        ratio = dens_j * (1.0 / pv[PV_RD])
        ratio2 = ratio * ratio
        p_j = pv[PV_K] * (ratio2 * ratio2 * ratio2 * ratio - 1.0)
        pd2_j = p_j * inv_dens * inv_dens
        sp = _w_grad_scale_press(kernel_set, r2, rl, pv, invrl)
        cpd = (q_ref[:, 7:8] + pd2_j) * (-pv[PV_PM] * pv[PV_PM]) * sp

    if st_model == SurfaceTensionModel.BECKER:
        w = _w_value(kernel_set, r2, rl, pv)
        # the diameter clamp `where(r2 > diam², w, W(diam))` is exactly
        # min(w, W(diam)) for any monotone-decreasing kernel — one VPU op
        # instead of compare+select, bit-identical
        w_eff = jnp.minimum(w, pv[PV_WDIAM])
        cs = w_eff * (-pv[PV_KAPPA])
        cpd = cs if cpd is None else cpd + cs
    elif st_model == SurfaceTensionModel.AKINCI:
        hr = jnp.maximum(pv[PV_H] - rl, 0.0)
        cube = hr * hr * hr * rl * rl * rl
        near = pv[PV_KSURF1] * (2.0 * cube - pv[PV_KSURF2])
        far = pv[PV_KSURF1] * cube
        c = jnp.where((2.0 * rl > pv[PV_H]) & (rl <= pv[PV_H]), far,
                      jnp.where((rl > _EPS) & (2.0 * rl <= pv[PV_H]),
                                near, 0.0))
        kij = 2.0 * pv[PV_RD] / (q_ref[:, 6:7] + dens_j)
        cs = (-pv[PV_KAPPA] * pv[PV_PM] * pv[PV_PM]) * kij * c * invrl
        cpd = cs if cpd is None else cpd + cs

    if cvisc is None and cpd is None:
        zero = jnp.zeros_like(dx[:, :1])
        return jnp.concatenate([zero, zero, zero, zero], axis=1)
    fx = fy = fz = 0.0
    if cvisc is not None:
        dvx = q_ref[:, 3:4] - src_ref[3:4, :]
        dvy = q_ref[:, 4:5] - src_ref[4:5, :]
        dvz = q_ref[:, 5:6] - src_ref[5:6, :]
        fx, fy, fz = cvisc * dvx, cvisc * dvy, cvisc * dvz
    if cpd is not None:
        cpd = cpd * okf
        fx = fx + cpd * dx
        fy = fy + cpd * dy
        fz = fz + cpd * dz

    zero = jnp.zeros_like(fx[:, :1])
    return jnp.concatenate(
        [jnp.sum(fx, axis=1, keepdims=True),
         jnp.sum(fy, axis=1, keepdims=True),
         jnp.sum(fz, axis=1, keepdims=True), zero], axis=1)


def boundary_force_pair(q_ref, src_ref, valid, pv, *, kernel_set,
                        include_pressure=True, moving=False,
                        include_adhesion=True, include_friction=True,
                        pressure_sign=1.0, consistent_pressure=False):
    """Fused boundary forces: Akinci adhesion + friction + boundary pressure
    (``computeCellForces`` boundary loop, ``sph_kernel_impl.cuh:552-602``;
    pressure term scaling per ``compute_pressure_force``).

    src ψ slot (6) = ρ₀·V_b. Output (B, 4): fx fy fz (pad).
    ``moving`` (trace-time switch, beyond-reference): the boundary region
    carries prescribed rigid-motion velocities in src rows 3-5 and the
    friction term uses the relative velocity (v_i − v_b); off, the static
    path compiles with zero extra VPU ops.
    ``include_adhesion=False`` drops the Becker β penalty term — the
    Akinci-2012 pressure+friction contact the rigid-body coupling uses
    (the stiff penalty, ~2000× a light body's weight at close range, is
    wall scenery physics, not dynamic-contact physics).
    ``pressure_sign=-1`` selects the physically repulsive Akinci form
    −mψ(p_i/ρ_i²)∇W: the reference's own boundary pressure term (+1, kept
    for wall parity) points ALONG ∇W — i.e. toward the boundary for
    positive pressure — and is dominated upstream by the β penalty; a
    dynamic body needs the honest sign (same flip the implicit solvers'
    ``grad_pressure_force_pair`` applies via ``boundary_sign``).
    ``consistent_pressure=True`` drops the reference's spurious extra
    mass factor: its m²·ψ·pd2 scale delivers only ~8.5% of the analytic
    buoyancy on a submerged shell (measured; ψ = ρ₀V_b already plays the
    neighbor-mass role, so the physically-consistent Akinci force is
    m·ψ·pd2·∇W — the SPlisHSPlasH scale). Unnoticed upstream because its
    walls are held by the β penalty, ~2000× this term. Walls here keep
    the reference scale for parity; every dynamic body uses consistent.
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    psi = src_ref[6:7, :]                          # rank-1 (1, WIN)
    dens_i = jnp.maximum(q_ref[:, 6:7], _EPS)      # rank-1 (B, 1)

    w = _w_value(kernel_set, r2, rl, pv)
    sd = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)

    # adhesion: β ψ W(r) r⃗  (β·ψ folds rank-1)
    cadh = (pv[PV_BETA] * psi) * w if include_adhesion else 0.0

    # friction: 2·m·μ · (−m ψ Π) ∇W_dflt, Π = −ν·max(v_i·r, 0)/(1+0.01h²)
    # ν is rank-1 in the query; the constants fold into it
    # (include_friction=False drops it — the implicit viscosity solver
    # handles fluid-boundary viscous coupling itself)
    cfric = 0.0
    if include_friction:
        nu = ((2.0 * pv[PV_PM] * pv[PV_PM] * pv[PV_VISC] * pv[PV_VISC]
               * pv[PV_H] * pv[PV_CS]) / (1.0 + 0.01 * pv[PV_H2])) \
            / (dens_i * dens_i)
        if moving:
            vdotr = ((q_ref[:, 3:4] - src_ref[3:4, :]) * dx
                     + (q_ref[:, 4:5] - src_ref[4:5, :]) * dy
                     + (q_ref[:, 5:6] - src_ref[5:6, :]) * dz)
        else:
            vdotr = (q_ref[:, 3:4] * dx + q_ref[:, 4:5] * dy
                     + q_ref[:, 5:6] * dz)
        cfric = nu * jnp.maximum(vdotr, 0.0) * psi * sd

    # boundary pressure: −m · (−m ψ pd2_i) · ∇W_dflt (reference scale),
    # or m·ψ·max(pd2_i, 0)·∇W (consistent scale — see docstring; the
    # clamp kills the unphysical TENSION a negative free-surface Tait
    # pressure exerts on a dynamic body — it sucked surfaced bodies back
    # each bob, measured as sustained ±4 m/s oscillations)
    if include_pressure:
        if consistent_pressure:
            c = cadh + (cfric + (pressure_sign * pv[PV_PM]) * psi
                        * jnp.maximum(q_ref[:, 7:8], 0.0) * sd)
        else:
            c = cadh + (cfric + (pressure_sign * pv[PV_PM] * pv[PV_PM])
                        * psi * q_ref[:, 7:8] * sd)
    else:
        c = cadh + cfric
    c = c * okf
    zero = jnp.zeros_like(dx[:, :1])
    return jnp.concatenate(
        [jnp.sum(c * dx, axis=1, keepdims=True),
         jnp.sum(c * dy, axis=1, keepdims=True),
         jnp.sum(c * dz, axis=1, keepdims=True), zero], axis=1)


def fluid_reaction_pair(q_ref, src_ref, valid, pv, *, kernel_set,
                        include_pressure: bool = True):
    """REVERSE Akinci contact: force ON a boundary-sample query FROM the
    fluid source — the per-sample Newton-third-law reaction of
    :func:`boundary_force_pair` (``moving=True, include_adhesion=False,
    pressure_sign=-1``, the dynamic-body contact). Rigid bodies only need
    the fluid-side sum (central forces → F = −Σf_i); DEFORMABLE bodies
    need the reaction distributed per sample, hence this swapped sweep.
    ``include_pressure=False`` drops the Tait pressure term (friction
    only) — the DFSPH coupling's non-pressure stage, where the stiffness
    solver does the pushing and its reaction ships separately.

    q fields: pos(0-2) vel(3-5) ψ(6); src: the standard 8-row FLUID
    matrix (pos, vel, dens slot 6) — pd2_i is recomputed in-kernel from
    the neighbor density via the Tait EOS like
    :func:`fluid_force_pair` does. Output (B, 4): fx fy fz (pad).

    Sign algebra: the forward force on fluid i is c·r_ib with
    r_ib = x_i − x_b; the reaction is −c·r_ib = +c·d for this sweep's
    d = x_b − x_i, and the coefficient c is invariant under the swap
    (it reads (v_i − v_b)·r_ib = (v_b − v_i)·d) — so the body is the
    forward formula verbatim on swapped roles.
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    psi = q_ref[:, 6:7]                            # rank-1 (B, 1)
    dens_i = jnp.maximum(src_ref[6:7, :], _EPS)    # rank-1 (1, WIN)
    inv_dens = 1.0 / dens_i
    sd = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)

    # friction (forward `moving` branch verbatim: (v_b − v_i)·d ==
    # (v_i − v_b)·r_ib), ν in the FLUID density
    nu = ((2.0 * pv[PV_PM] * pv[PV_PM] * pv[PV_VISC] * pv[PV_VISC]
           * pv[PV_H] * pv[PV_CS]) / (1.0 + 0.01 * pv[PV_H2])) \
        * (inv_dens * inv_dens)
    vdotr = ((q_ref[:, 3:4] - src_ref[3:4, :]) * dx
             + (q_ref[:, 4:5] - src_ref[4:5, :]) * dy
             + (q_ref[:, 5:6] - src_ref[5:6, :]) * dz)
    cfric = nu * jnp.maximum(vdotr, 0.0) * psi * sd

    # repulsive Akinci pressure at the CONSISTENT m·ψ·pd2 scale (see
    # boundary_force_pair's consistent_pressure note — the reference's
    # m² form delivers ~8.5% of analytic buoyancy, measured), pd2_i from
    # the fluid side's Tait EOS
    if include_pressure:
        ratio = dens_i * (1.0 / pv[PV_RD])
        ratio2 = ratio * ratio
        p_i = jnp.maximum(
            pv[PV_K] * (ratio2 * ratio2 * ratio2 * ratio - 1.0), 0.0)
        pd2_i = p_i * inv_dens * inv_dens
        c = (cfric - pv[PV_PM] * psi * pd2_i * sd) * okf
    else:
        c = cfric * okf
    zero = jnp.zeros_like(dx[:, :1])
    return jnp.concatenate(
        [jnp.sum(c * dx, axis=1, keepdims=True),
         jnp.sum(c * dy, axis=1, keepdims=True),
         jnp.sum(c * dz, axis=1, keepdims=True), zero], axis=1)


# ---------------------------------------------------------------------------
# Implicit-solver pair functions (IISPH / PCISPH; all use the default
# (poly6/Monaghan) gradient, as the reference's implicit kernels do)
# ---------------------------------------------------------------------------

def dii_rhoadv_pair(q_ref, src_ref, valid, pv, *, kernel_set, vel_q_offset):
    """Fused IISPH predict terms.

    Per pair: d_ii += −ψ_j·inv_ρ²_i·∇W ; ρ_adv += dt·ψ_j·(v_q − v_j)·∇W,
    where ψ_j = m for fluid sources; ``vel_q_offset`` selects the query
    velocity slots (3 = v_adv for the fluid sweep; 6 = pre-advection v for
    the boundary sweep, whose source velocity slots are zero — matching
    ``rho_adv_boundary``, sph_kernel_impl.cuh:1007-1036).

    q fields: x y z vax vay vaz vx vy vz inv_d2 — out (B, 4): dii, ρ_adv.
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    ok = valid & (r2 < pv[PV_H2])
    okf = ok.astype(q_ref.dtype)
    psi = src_ref[6:7, :]
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)

    cdii = -psi * q_ref[:, 9:10] * s * okf
    o = vel_q_offset
    dvx = q_ref[:, o:o + 1] - src_ref[3:4, :]
    dvy = q_ref[:, o + 1:o + 2] - src_ref[4:5, :]
    dvz = q_ref[:, o + 2:o + 3] - src_ref[5:6, :]
    cr = pv[PV_DT] * psi * s * (dvx * dx + dvy * dy + dvz * dz) * okf
    return jnp.concatenate(
        [jnp.sum(cdii * dx, axis=1, keepdims=True),
         jnp.sum(cdii * dy, axis=1, keepdims=True),
         jnp.sum(cdii * dz, axis=1, keepdims=True),
         jnp.sum(cr, axis=1, keepdims=True)], axis=1)


def aii_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """a_ii += ψ_j·(d_ii − d_ji)·∇W with d_ji = (m/ρ_i²)∇W.

    q fields: x y z diix diiy diiz dpi — out (B, 1).
    Reference: ``compute_aii_cell[_boundary]`` (sph_kernel_impl.cuh:1040-1108).
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    ok = valid & (r2 < pv[PV_H2])
    okf = ok.astype(q_ref.dtype)
    psi = src_ref[6:7, :]
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    dii_dot_r = (q_ref[:, 3:4] * dx + q_ref[:, 4:5] * dy
                 + q_ref[:, 5:6] * dz)
    term = psi * (s * dii_dot_r - q_ref[:, 6:7] * s * s * r2) * okf
    return jnp.sum(term, axis=1, keepdims=True)


def sum_dij_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Σ_j d_ij p_j = −Σ_j m·(p_j/ρ_j²)·∇W (``dijpjcell``, :1224-1253).

    src ψ slot carries p_j/ρ_j² (repacked every Jacobi iteration).
    q fields: x y z — out (B, 4): vector + pad.
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    ok = valid & (r2 < pv[PV_H2])
    okf = ok.astype(q_ref.dtype)
    c = -pv[PV_PM] * src_ref[6:7, :] * \
        _w_grad_scale_default(kernel_set, r2, rl, pv, invrl) * okf
    zero = jnp.zeros_like(dx[:, :1])
    return jnp.concatenate(
        [jnp.sum(c * dx, axis=1, keepdims=True),
         jnp.sum(c * dy, axis=1, keepdims=True),
         jnp.sum(c * dz, axis=1, keepdims=True), zero], axis=1)


def jacobi_fluid_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Jacobi off-diagonal sum (``computePressure`` fluid loop, :1330-1445):

    fsum += m·(Σd_ij p_j − d_jj p_j − (Σd_jk p_k − d_ji p_i))·∇W

    16-row src: rows 3-5 = d_jj, 6 = p_j, 7-9 = Σd_jk p_k, 15 = hash.
    q fields: x y z sdx sdy sdz (Σd_ij p_j) and dpi·p_i. Out (B, 1).
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    ok = valid & (r2 < pv[PV_H2])
    okf = ok.astype(q_ref.dtype)
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    p_j = src_ref[6:7, :]
    ix = q_ref[:, 3:4] - src_ref[3:4, :] * p_j - src_ref[7:8, :]
    iy = q_ref[:, 4:5] - src_ref[4:5, :] * p_j - src_ref[8:9, :]
    iz = q_ref[:, 5:6] - src_ref[5:6, :] * p_j - src_ref[9:10, :]
    inner_dot = s * (ix * dx + iy * dy + iz * dz) \
        + q_ref[:, 6:7] * s * s * r2          # + d_ji·p_i · ∇W
    return jnp.sum(pv[PV_PM] * inner_dot * okf, axis=1, keepdims=True)


def jacobi_boundary_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Jacobi boundary sum: ψ_j·(Σd_ij p_j)·∇W (:1445-1460, with the
    intended boundary segment bounds — SURVEY §5 defect list).
    q fields: x y z sdx sdy sdz. Out (B, 1)."""
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    ok = valid & (r2 < pv[PV_H2])
    okf = ok.astype(q_ref.dtype)
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    dot = s * (q_ref[:, 3:4] * dx + q_ref[:, 4:5] * dy + q_ref[:, 5:6] * dz)
    return jnp.sum(src_ref[6:7, :] * dot * okf, axis=1, keepdims=True)


def alpha_pair(q_ref, src_ref, valid, pv, *, kernel_set,
               include_sq: bool):
    """DFSPH factor accumulators (solvers/dfsph.py, beyond-reference):

    out (B, 4): Σψ∇W (vector) and Σ|ψ∇W|² (scalar; fluid rows only —
    static boundaries contribute to the gradient sum alone, so the
    boundary flavor passes include_sq=False).
    q fields: x y z. src ψ slot6 (m for fluid).
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    ok = valid & (r2 < pv[PV_H2])
    okf = ok.astype(q_ref.dtype)
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    c = src_ref[6:7, :] * s * okf
    if include_sq:
        sq = jnp.sum(c * c * r2, axis=1, keepdims=True)
    else:
        sq = jnp.zeros_like(dx[:, :1])
    return jnp.concatenate(
        [jnp.sum(c * dx, axis=1, keepdims=True),
         jnp.sum(c * dy, axis=1, keepdims=True),
         jnp.sum(c * dz, axis=1, keepdims=True), sq], axis=1)


def xsph_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Monaghan XSPH smoothing sum (beyond-reference, fluid rows only):
    Σ (2m/(ρ_i+ρ_j)) (v_j − v_i) W(r). The self term is exactly 0
    (v_i − v_i), so self-inclusion is free as usual.

    q fields: x y z vx vy vz dens. src rows 3-5 vel, 6 dens.
    Out (B, 4): dvx dvy dvz (pad) — scaled by ε OUTSIDE the sweep, so ε
    may be traced without entering the kernel.
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    w = _w_value(kernel_set, r2, rl, pv)
    denom = jnp.maximum(q_ref[:, 6:7] + src_ref[6:7, :], _EPS)
    c = (2.0 * pv[PV_PM]) * w / denom * okf
    zero = jnp.zeros_like(dx[:, :1])
    return jnp.concatenate(
        [jnp.sum(c * (src_ref[3:4, :] - q_ref[:, 3:4]), axis=1,
                 keepdims=True),
         jnp.sum(c * (src_ref[4:5, :] - q_ref[:, 4:5]), axis=1,
                 keepdims=True),
         jnp.sum(c * (src_ref[5:6, :] - q_ref[:, 5:6]), axis=1,
                 keepdims=True), zero], axis=1)


def multiphase_density_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Multiphase NUMBER density (Solenthaler adapted density): Σ W into
    col 0 — no source scalar at all; the caller multiplies by the query's
    own mass (ρ̃_i = m_i·δ_i; self-inclusion gives W(0) for free).
    Out (B, 4): [δ, 0, 0, 0] — col 1 belongs to the boundary rows
    (:func:`multiphase_density_bpair`), rescaled per query phase."""
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    w = _w_value(kernel_set, r2, rl, pv)
    d = jnp.sum(w * okf, axis=1, keepdims=True)
    zero = jnp.zeros_like(d)
    return jnp.concatenate([d, zero, zero, zero], axis=1)


def multiphase_density_bpair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Boundary rows of the multiphase density sweep: Σ ψ_b·W into col 1,
    kept SEPARATE from the fluid sum so the caller can rescale the baked
    ψ = ρ0_ref·V_b by each query's own ρ0_i/ρ0_ref (Akinci boundary
    handling measures displaced fluid of the querying phase)."""
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    w = _w_value(kernel_set, r2, rl, pv)
    d = jnp.sum(src_ref[6:7, :] * w * okf, axis=1, keepdims=True)
    zero = jnp.zeros_like(d)
    return jnp.concatenate([zero, d, zero, zero], axis=1)


def multiphase_force_pair(q_ref, src_ref, valid, pv, *, kernel_set,
                          st_becker=False):
    """Multiphase fluid ACCELERATION (adapted-density volume form — see
    ``solvers.wcsph.multiphase_accels`` for the discretization):

      a = −inv_m_i (p_i·V_i² + p_j·V_j²) ∇W_press
          + 2μ V_j (r·∇W_visc)/(|r|²+0.01h²) (v_i − v_j)
          [st_becker] − (κ_eff·inv_m_i)·min(W, W_diam)·r⃗,
                        κ_eff = κ·(ρ0_i == ρ0_j ? 1 : st_cross)

    q fields: x y z vx vy vz p_iV_i² inv_m_i m_i inv_ρ̃_i (10 columns;
    with ``st_becker`` col 10 = ρ0_i). src slots: 6 = V_j = 1/δ_j,
    7 = p_j·V_j² (wide 16-row source; the 8-row pack's row 7 is the hash
    row, so two source scalars need the wide format; with ``st_becker``
    row 8 = ρ0_j — an exact f32 copy of the phase column, so the
    same-phase equality compare is sound).
    Out (B, 4): a_x a_y a_z (pad). Self term exactly 0 (grad 0, dv 0;
    Becker's r⃗ factor is 0 at self).
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _rl_invrl(r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)

    vj = src_ref[6:7, :]
    pv2j = src_ref[7:8, :]

    a = _visc_rdotgrad(kernel_set, r2, rl, pv, invrl)
    bden = r2 + 0.01 * pv[PV_H2]
    cvisc = (2.0 * pv[PV_VISC]) * vj * (a * _fast_recip(bden)) * okf

    sp = _w_grad_scale_press(kernel_set, r2, rl, pv, invrl)
    cp = -q_ref[:, 7:8] * (q_ref[:, 6:7] + pv2j) * sp * okf

    if st_becker:
        w_eff = jnp.minimum(_w_value(kernel_set, r2, rl, pv),
                            pv[PV_WDIAM])
        same = (q_ref[:, 10:11] == src_ref[8:9, :]).astype(q_ref.dtype)
        keff = pv[PV_KAPPA] * (same + (1.0 - same) * pv[PV_STX])
        cp = cp - (keff * q_ref[:, 7:8]) * w_eff * okf

    dvx = q_ref[:, 3:4] - src_ref[3:4, :]
    dvy = q_ref[:, 4:5] - src_ref[4:5, :]
    dvz = q_ref[:, 5:6] - src_ref[5:6, :]
    fx = cvisc * dvx + cp * dx
    fy = cvisc * dvy + cp * dy
    fz = cvisc * dvz + cp * dz
    zero = jnp.zeros_like(fx[:, :1])
    return jnp.concatenate(
        [jnp.sum(fx, axis=1, keepdims=True),
         jnp.sum(fy, axis=1, keepdims=True),
         jnp.sum(fz, axis=1, keepdims=True), zero], axis=1)


def multiphase_boundary_pair(q_ref, src_ref, valid, pv, *, kernel_set,
                             moving=False):
    """Boundary rows of the multiphase force sweep — ACCELERATION:

      a_β = (β/m_i) ψ_b W r⃗            (wall penalty; ψ deliberately
                                         unscaled — stiffness, not physics)
      a_f = 2μ m_i ψ_b ν̂ max((v_i−v_b)·r, 0)/(1+0.01h²) ∇W_dflt,
            ν̂ = ν·h·c_s·inv_ρ̃_i²      (same net scalings as the
                                         single-phase friction)

    q fields as :func:`multiphase_force_pair` (7 = 1/m_i, 8 = m_i,
    9 = 1/ρ̃_i); src slot 6 = ψ. The reference's boundary pd2 pressure
    term is dropped (attractive-signed and negligible next to β —
    CLAUDE.md).
    Out (B, 4): a_x a_y a_z (pad).
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    psi = src_ref[6:7, :]
    inv_rho = q_ref[:, 9:10]

    w = _w_value(kernel_set, r2, rl, pv)
    sd = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)

    cadh = (pv[PV_BETA] * psi) * q_ref[:, 7:8] * w

    nu = ((2.0 * pv[PV_VISC] * pv[PV_VISC] * pv[PV_H] * pv[PV_CS])
          / (1.0 + 0.01 * pv[PV_H2])) * q_ref[:, 8:9] \
        * (inv_rho * inv_rho)
    if moving:
        vdotr = ((q_ref[:, 3:4] - src_ref[3:4, :]) * dx
                 + (q_ref[:, 4:5] - src_ref[4:5, :]) * dy
                 + (q_ref[:, 5:6] - src_ref[5:6, :]) * dz)
    else:
        vdotr = (q_ref[:, 3:4] * dx + q_ref[:, 4:5] * dy
                 + q_ref[:, 5:6] * dz)
    cfric = nu * jnp.maximum(vdotr, 0.0) * psi * sd

    c = (cadh + cfric) * okf
    zero = jnp.zeros_like(dx[:, :1])
    return jnp.concatenate(
        [jnp.sum(c * dx, axis=1, keepdims=True),
         jnp.sum(c * dy, axis=1, keepdims=True),
         jnp.sum(c * dz, axis=1, keepdims=True), zero], axis=1)


def multiphase_body_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Dynamic-body contact rows for the MULTIPHASE coupling —
    ACCELERATION (the volume-form analogue of
    :func:`boundary_force_pair` with ``include_adhesion=False,
    pressure_sign=-1, consistent_pressure=True, moving=True``):

      a_p = −bp_i · ψ_b · ∇W_dflt,  bp_i = (ρ0_i/ρ0_ref)·max(p_i,0)/ρ̃_i²
            (Akinci repulsive pressure at the consistent m·ψ·pd2 scale;
             ψ = ρ0_ref·V_b is rescaled per query phase through bp_i —
             displaced fluid of the phase doing the querying; the clamp
             kills free-surface Tait tension, see boundary_force_pair)
      a_f = K · fr_i · ψ_b · max((v_i−v_b)·r, 0) · ∇W_dflt,
            K = 2μ²·h·c_s/(1+0.01h²),  fr_i = m_i/ρ̃_i²
            (same net scalings as the single-phase body friction)

    q fields: x y z vx vy vz bp_i fr_i (8 columns, both per-query
    precomputed); src: the standard 8-row body-shell pack (pos, sample
    velocities v+ω×r in rows 3-5, ψ in slot 6). Reduces EXACTLY to the
    single-phase body contact divided by m_i at uniform phase.
    Out (B, 4): a_x a_y a_z (pad)."""
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    psi = src_ref[6:7, :]
    sd = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)

    cpress = -q_ref[:, 6:7] * psi * sd
    kf = ((2.0 * pv[PV_VISC] * pv[PV_VISC] * pv[PV_H] * pv[PV_CS])
          / (1.0 + 0.01 * pv[PV_H2]))
    vdotr = ((q_ref[:, 3:4] - src_ref[3:4, :]) * dx
             + (q_ref[:, 4:5] - src_ref[4:5, :]) * dy
             + (q_ref[:, 5:6] - src_ref[5:6, :]) * dz)
    cfric = (kf * q_ref[:, 7:8]) * jnp.maximum(vdotr, 0.0) * psi * sd

    c = (cpress + cfric) * okf
    zero = jnp.zeros_like(dx[:, :1])
    return jnp.concatenate(
        [jnp.sum(c * dx, axis=1, keepdims=True),
         jnp.sum(c * dy, axis=1, keepdims=True),
         jnp.sum(c * dz, axis=1, keepdims=True), zero], axis=1)


def multiphase_alpha_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Fluid rows of the multiphase DFSPH factor sweep
    (``solvers.dfsph.alpha_parts_multiphase``): the UNWEIGHTED gradient
    sum G = Σ ∇W and the mass-weighted square sum S = Σ |∇W|²/m_j.
    q: x y z. src slot 6 = 1/m_j. Out (B, 8): [Gx Gy Gz S 0 0 0 0] —
    cols 4-6 belong to the boundary rows (B⃗, scaled by the query's
    s_i/m_i OUTSIDE — the reason it cannot share G's columns)."""
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    c = s * okf
    sq = jnp.sum(src_ref[6:7, :] * c * c * r2, axis=1, keepdims=True)
    zero = jnp.zeros_like(sq)
    return jnp.concatenate(
        [jnp.sum(c * dx, axis=1, keepdims=True),
         jnp.sum(c * dy, axis=1, keepdims=True),
         jnp.sum(c * dz, axis=1, keepdims=True), sq,
         zero, zero, zero, zero], axis=1)


def multiphase_alpha_bpair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Boundary rows of the multiphase DFSPH factor sweep:
    B⃗ = Σ ψ_b ∇W into cols 4-6 (src slot 6 = ψ)."""
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    c = src_ref[6:7, :] * s * okf
    zero = jnp.zeros_like(dx[:, :1])
    return jnp.concatenate(
        [zero, zero, zero, zero,
         jnp.sum(c * dx, axis=1, keepdims=True),
         jnp.sum(c * dy, axis=1, keepdims=True),
         jnp.sum(c * dz, axis=1, keepdims=True), zero], axis=1)


def multiphase_drho_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Fluid rows of the adapted number-density rate dδ̂/dt:
    Σ (v_q − v_j)·∇W — NO mass weight (the adapted δ never smooths over
    neighbor masses). q: x y z vx vy vz. Out (B, 4): [Σ, 0, 0, 0];
    col 1 belongs to the boundary rows (scaled by s_i/m_i outside)."""
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    dvx = q_ref[:, 3:4] - src_ref[3:4, :]
    dvy = q_ref[:, 4:5] - src_ref[4:5, :]
    dvz = q_ref[:, 5:6] - src_ref[5:6, :]
    c = s * (dvx * dx + dvy * dy + dvz * dz) * okf
    d = jnp.sum(c, axis=1, keepdims=True)
    zero = jnp.zeros_like(d)
    return jnp.concatenate([d, zero, zero, zero], axis=1)


def multiphase_drho_bpair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Boundary rows of dδ̂/dt: Σ ψ_b (v_q − v_b)·∇W into col 1 (the
    source vel slots carry the prescribed rigid-motion velocities when
    present, zeros otherwise — same contract as ``drho_pair``)."""
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    dvx = q_ref[:, 3:4] - src_ref[3:4, :]
    dvy = q_ref[:, 4:5] - src_ref[4:5, :]
    dvz = q_ref[:, 5:6] - src_ref[5:6, :]
    c = src_ref[6:7, :] * s * (dvx * dx + dvy * dy + dvz * dz) * okf
    d = jnp.sum(c, axis=1, keepdims=True)
    zero = jnp.zeros_like(d)
    return jnp.concatenate([zero, d, zero, zero], axis=1)


def multiphase_kappa_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Fluid rows of the multiphase stiffness correction: the POSITIVE
    sum Σ (κV̂²_i + κV̂²_j) ∇W (the caller applies v −= dt/m_i · out).
    q: x y z kv2_i qc_i. src slot 6 = κV̂²_j. Out (B, 4): vector + pad."""
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    c = (q_ref[:, 3:4] + src_ref[6:7, :]) * s * okf
    zero = jnp.zeros_like(dx[:, :1])
    return jnp.concatenate(
        [jnp.sum(c * dx, axis=1, keepdims=True),
         jnp.sum(c * dy, axis=1, keepdims=True),
         jnp.sum(c * dz, axis=1, keepdims=True), zero], axis=1)


def multiphase_kappa_bpair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Boundary rows of the multiphase stiffness correction:
    qc_i Σ ψ_b ∇W with qc_i = (s_i/m_i)·κV̂²_i (q col 4), summed into
    the same vector columns as the fluid rows. src slot 6 = ψ."""
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    c = q_ref[:, 4:5] * src_ref[6:7, :] * s * okf
    zero = jnp.zeros_like(dx[:, :1])
    return jnp.concatenate(
        [jnp.sum(c * dx, axis=1, keepdims=True),
         jnp.sum(c * dy, axis=1, keepdims=True),
         jnp.sum(c * dz, axis=1, keepdims=True), zero], axis=1)


def drho_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """DFSPH velocity-divergence term: Σ ψ_j (v_q − v_j)·∇W.

    The boundary rows use the SAME formula — their source velocity slots
    are packed zero (static boundaries), reducing to Σ ψ_b v_q·∇W.
    q fields: x y z vx vy vz. Out (B, 1).
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    ok = valid & (r2 < pv[PV_H2])
    okf = ok.astype(q_ref.dtype)
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    dvx = q_ref[:, 3:4] - src_ref[3:4, :]
    dvy = q_ref[:, 4:5] - src_ref[4:5, :]
    dvz = q_ref[:, 5:6] - src_ref[5:6, :]
    c = src_ref[6:7, :] * s * (dvx * dx + dvy * dy + dvz * dz) * okf
    return jnp.sum(c, axis=1, keepdims=True)


def grad_pressure_force_pair(q_ref, src_ref, valid, pv, *, kernel_set,
                             boundary: bool, boundary_sign: float = 1.0):
    """Implicit-solver pressure force with the default gradient
    (``computePressureForce``, :1497-1620):

    fluid:    F += −m²(pd2_i + pd2_j)·∇W     (src ψ slot = pd2_j)
    boundary: F += boundary_sign·m·ψ·pd2_i·∇W

    q fields: x y z pd2. Out (B, 4): fx fy fz pad.
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    ok = valid & (r2 < pv[PV_H2])
    okf = ok.astype(q_ref.dtype)
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    if boundary:
        c = boundary_sign * pv[PV_PM] * src_ref[6:7, :] * q_ref[:, 3:4] * s
    else:
        c = -pv[PV_PM] * pv[PV_PM] * (q_ref[:, 3:4] + src_ref[6:7, :]) * s
    c = c * okf
    zero = jnp.zeros_like(dx[:, :1])
    return jnp.concatenate(
        [jnp.sum(c * dx, axis=1, keepdims=True),
         jnp.sum(c * dy, axis=1, keepdims=True),
         jnp.sum(c * dz, axis=1, keepdims=True), zero], axis=1)


def pbf_lambda_pair(q_ref, src_ref, valid, pv, *, kernel_set,
                    include_sq: bool):
    """PBF constraint accumulators (solvers/pbf.py, beyond-reference) in
    ONE sweep: out (B, 8) = [ρ, Σψ∇W (vector), Σ|ψ∇W|², 0, 0, 0].

    C_i = ρ_i/ρ₀ − 1 and its denominator Σ_k|∇_k C|² =
    (|Σψ∇W|² + Σ|ψ∇W|²)/ρ₀² are both built from these sums (ψ = m for
    fluid). Boundary shells contribute to ρ and the gradient sum only
    (include_sq=False), like :func:`alpha_pair`.

    Frozen-neighborhood contract: q cols 0-2 = plan positions (hash
    bounds), cols 4-6 = CURRENT iterate positions (pair geometry);
    src rows 0-2 = current source positions, hash row frozen.
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv, geom_offset=4)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    w = _w_value(kernel_set, r2, rl, pv)
    psi = src_ref[6:7, :]
    d = psi * w * okf
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    c = psi * s * okf
    if include_sq:
        sq = jnp.sum(c * c * r2, axis=1, keepdims=True)
    else:
        sq = jnp.zeros_like(dx[:, :1])
    zero = jnp.zeros_like(dx[:, :1])
    return jnp.concatenate(
        [jnp.sum(d, axis=1, keepdims=True),
         jnp.sum(c * dx, axis=1, keepdims=True),
         jnp.sum(c * dy, axis=1, keepdims=True),
         jnp.sum(c * dz, axis=1, keepdims=True),
         sq, zero, zero, zero], axis=1)


def visc_laplacian_pair(q_ref, src_ref, valid, pv, *, kernel_set,
                        boundary: bool):
    """Weiler-2018 viscous Laplacian applied to a velocity field
    (solvers/viscosity.py, beyond-reference):

      L(v)_i = 2(d+2) Σ_j coef_j · (v_ij·x_ij)/(‖x_ij‖² + 0.01h²) ∇W_ij

    with d = 3, coef = m/ρ_j for fluid sources (src slot 6, precomputed)
    and ψ_b/ρ_i for boundary sources (src slot 6 = ψ, ρ_i = q col 6;
    boundary velocities ride src rows 3-5 — zeros when static). Exactly
    linear in v (positions and densities are frozen over the solve), so
    one sweep per CG matvec. q: x y z vx vy vz dens (pad).
    Out (B, 4): Lx Ly Lz (pad).
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    if boundary:
        inv_di = 1.0 / jnp.maximum(q_ref[:, 6:7], _EPS)   # rank-1 (B, 1)
        coef = src_ref[6:7, :] * inv_di
    else:
        coef = src_ref[6:7, :]
    dvdotx = ((q_ref[:, 3:4] - src_ref[3:4, :]) * dx
              + (q_ref[:, 4:5] - src_ref[4:5, :]) * dy
              + (q_ref[:, 5:6] - src_ref[5:6, :]) * dz)
    c = (10.0 * coef * s) * dvdotx * _fast_recip(
        r2 + 0.01 * pv[PV_H2]) * okf
    zero = jnp.zeros_like(dx[:, :1])
    return jnp.concatenate(
        [jnp.sum(c * dx, axis=1, keepdims=True),
         jnp.sum(c * dy, axis=1, keepdims=True),
         jnp.sum(c * dz, axis=1, keepdims=True), zero], axis=1)


def pbf_omega_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """PBF vorticity accumulator (Macklin & Müller 2013 §5):

      ω_i = Σ_j ψ_j (v_j − v_i) × ∇W_ij       (src slot 6 = m/ρ_j)

    q fields: x y z vx vy vz (geometry over the advected configuration —
    per-iteration displacements are a small fraction of h, the same
    approximation the frozen plan already makes). Out (B, 4): ωx ωy ωz
    (pad). The self term is exactly 0 (v_i − v_i).
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    c = src_ref[6:7, :] * s * okf
    dvx = src_ref[3:4, :] - q_ref[:, 3:4]
    dvy = src_ref[4:5, :] - q_ref[:, 4:5]
    dvz = src_ref[5:6, :] - q_ref[:, 5:6]
    return jnp.concatenate(
        [jnp.sum(c * (dvy * dz - dvz * dy), axis=1, keepdims=True),
         jnp.sum(c * (dvz * dx - dvx * dz), axis=1, keepdims=True),
         jnp.sum(c * (dvx * dy - dvy * dx), axis=1, keepdims=True),
         jnp.zeros_like(dx[:, :1])], axis=1)


def pbf_dp_pair(q_ref, src_ref, valid, pv, *, kernel_set,
                boundary: bool):
    """PBF position correction (unscaled by 1/ρ₀ — folded outside):

    fluid:    Δp += m (λ_i + λ_j + scorr)·∇W      (src slot 6 = λ_j)
    boundary: Δp += ψ λ_i·∇W                      (src slot 6 = ψ)

    scorr = −(W·s)⁴ with s from PV_SCORR_S (Macklin & Müller 2013 eq. 13;
    the k^(1/4)/W(Δq) constant folds the whole ratio into one multiply).
    q: cols 0-2 plan positions, col 3 = λ_i, cols 4-6 current positions.
    Out (B, 4): dpx dpy dpz (pad). Signs: λ < 0 under compression and the
    default gradient scale is negative along +r̂, so compressed pairs
    separate; the boundary term pushes fluid OFF the wall with no extra
    flip (same algebra as the fluid term with λ_b = 0).
    """
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv, geom_offset=4)
    rl, invrl = _maybe_rl(kernel_set, r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    s = _w_grad_scale_default(kernel_set, r2, rl, pv, invrl)
    if boundary:
        coef = src_ref[6:7, :] * q_ref[:, 3:4] * s
    else:
        w = _w_value(kernel_set, r2, rl, pv)
        t = w * pv[PV_SCORR_S]
        t2 = t * t
        scorr = -(t2 * t2)
        coef = pv[PV_PM] * (q_ref[:, 3:4] + src_ref[6:7, :] + scorr) * s
    coef = coef * okf
    zero = jnp.zeros_like(dx[:, :1])
    return jnp.concatenate(
        [jnp.sum(coef * dx, axis=1, keepdims=True),
         jnp.sum(coef * dy, axis=1, keepdims=True),
         jnp.sum(coef * dz, axis=1, keepdims=True), zero], axis=1)


# ---------------------------------------------------------------------------
# Elastic-solid pair functions (total-Lagrangian SPH, beyond-reference)
#
# All three sweep the REFERENCE configuration: pair geometry, the r² < h²
# cutoff AND the in-kernel hash masks read reference positions (query cols
# / src rows 0-2), so the window plan is built ONCE from the undeformed
# body and stays exact for its whole lifetime — zero per-step sort/plan
# cost, the TPU answer to per-step neighbor rebuilds. The reference
# gradient g⃗_ij = s·(X_i − X_j) uses the pressure-gradient kernel scale;
# the formulation is invariant under any consistent rescaling of g⃗ (the
# correction matrix C_i = D_i⁻¹ absorbs it).
# ---------------------------------------------------------------------------

def elastic_f_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Deformation-gradient accumulator: Σ_j (x_j − x_i) ⊗ ∇W(X_ij).

    q fields: X(0-2) x(3-5); src fields (8-row): X(0-2) x(3-5) hash(7).
    Output (B, 9) row-major [3α+β]: α indexes the current-offset factor,
    β the reference-gradient factor. The uniform V_j and the per-particle
    correction C_i apply outside the sweep (F_i = V·raw_i · C_i).
    Self-pairs contribute exactly 0 (both factors vanish)."""
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _rl_invrl(r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    s = _w_grad_scale_press(kernel_set, r2, rl, pv, invrl) * okf
    g = (s * dx, s * dy, s * dz)
    dc = (src_ref[3:4, :] - q_ref[:, 3:4],
          src_ref[4:5, :] - q_ref[:, 4:5],
          src_ref[5:6, :] - q_ref[:, 5:6])
    cols = [jnp.sum(dc[a] * g[b], axis=1, keepdims=True)
            for a in range(3) for b in range(3)]
    return jnp.concatenate(cols, axis=1)


def elastic_force_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Variational total-Lagrangian elastic force pair:
    (P_i C_iᵀ + P_j C_jᵀ) · ∇W(X_ij) — pairwise antisymmetric (swapping
    i↔j flips the gradient and keeps the matrix sum), so momentum is
    conserved exactly. V_i·V_j (uniform) applies outside.

    q fields: X(0-2) PC_i(3-11, row-major); src (16-row): X(0-2)
    PC_j(3-11) hash(15). Output (B, 4): fx fy fz pad."""
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _rl_invrl(r2)
    okf = (valid & (r2 < pv[PV_H2])).astype(q_ref.dtype)
    s = _w_grad_scale_press(kernel_set, r2, rl, pv, invrl) * okf
    g = (s * dx, s * dy, s * dz)
    outs = []
    for a in range(3):
        acc = None
        for b in range(3):
            k = 3 * a + b
            m = q_ref[:, 3 + k:4 + k] + src_ref[3 + k:4 + k, :]
            t = m * g[b]
            acc = t if acc is None else acc + t
        outs.append(jnp.sum(acc, axis=1, keepdims=True))
    outs.append(jnp.zeros_like(outs[0]))
    return jnp.concatenate(outs, axis=1)


def elastic_hourglass_pair(q_ref, src_ref, valid, pv, *, kernel_set):
    """Ganzenmüller-2015 (§4) hourglass-control pair, without its α·V²
    prefactor (applied outside):

        f_i += +½ · W(X_ij)/|X_ij|² · (δ_i + δ_j) · x_ij/|x_ij|

    with δ_k = (F_k X_ij − x_ij)·x_ij/|x_ij| the projected deviation of
    the pair from particle k's locally-affine deformation — exactly 0 for
    any affine motion (rigid or uniform-strain), so it never fights the
    corrected-gradient force, only the zero-energy (hourglass) modes the
    per-particle F cannot see. Sign: the penalty energy ½k δ² gives
    f_i = −k δ ∂δ/∂x_i = +k δ x̂_ij (a stretched pair, δ < 0, attracts —
    the NEGATIVE variant anti-restores and detonates on the first
    non-affine deformation, measured on the dropped-cube impact).

    q fields: X(0-2) x(3-5) F_i(6-14); src (16-row): X(0-2) x(3-5)
    F_j(6-14) hash(15). Output (B, 4). Self-pairs are exactly 0: the
    mask multiplies the singular 1/|X|² factor before anything large can
    meet an inf (f32 overflow discipline — see _visc_rdotgrad)."""
    dx, dy, dz, r2 = _pair_geometry(q_ref, src_ref, pv)
    rl, invrl = _rl_invrl(r2)
    okf = (valid & (r2 < pv[PV_H2]) & (r2 > 0)).astype(q_ref.dtype)
    w = _w_value(kernel_set, r2, rl, pv)
    inv_x2 = okf * w * _fast_recip(jnp.maximum(r2, _EPS * _EPS))
    dc = (q_ref[:, 3:4] - src_ref[3:4, :],
          q_ref[:, 4:5] - src_ref[4:5, :],
          q_ref[:, 5:6] - src_ref[5:6, :])
    rc2 = dc[0] * dc[0] + dc[1] * dc[1] + dc[2] * dc[2]
    invrc = jax.lax.rsqrt(jnp.maximum(rc2, _EPS * _EPS))
    dX = (dx, dy, dz)
    raw = None
    for a in range(3):
        fi = (q_ref[:, 6 + 3 * a:7 + 3 * a] * dX[0]
              + q_ref[:, 7 + 3 * a:8 + 3 * a] * dX[1]
              + q_ref[:, 8 + 3 * a:9 + 3 * a] * dX[2])
        fj = (src_ref[6 + 3 * a:7 + 3 * a, :] * dX[0]
              + src_ref[7 + 3 * a:8 + 3 * a, :] * dX[1]
              + src_ref[8 + 3 * a:9 + 3 * a, :] * dX[2])
        t = (fi + fj - 2.0 * dc[a]) * dc[a]
        raw = t if raw is None else raw + t
    # coef = +½ W/|X|² (δi+δj)/|x| · 1/|x|; the masked W/|X|² factor is 0
    # at every excluded slot BEFORE the (clamped, finite) invrc² joins
    coef = 0.5 * inv_x2 * raw * (invrc * invrc)
    zero = jnp.zeros_like(coef[:, :1])
    return jnp.concatenate(
        [jnp.sum(coef * dc[0], axis=1, keepdims=True),
         jnp.sum(coef * dc[1], axis=1, keepdims=True),
         jnp.sum(coef * dc[2], axis=1, keepdims=True), zero], axis=1)


# ---------------------------------------------------------------------------
# Sweep drivers (anchors from pallas_neighbors.plan_windows)
# ---------------------------------------------------------------------------

def density_sweep(cfg: SimConfig, queries_pos, src, anchors, pvec, gsize,
                  *, n_rows=9, geom_offset=0, interpret=False):
    """Density over fluid (and, when ``n_rows=18``, the fused boundary
    region — the ψ-slot formula is identical for both)."""
    pair = functools.partial(density_pair, kernel_set=cfg.kernel_set,
                             geom_offset=geom_offset)
    out = neighbor_sweep(
        pair, queries=queries_pos, src=src, anchors=anchors, pvec=pvec,
        gsize=gsize, out_width=1, n_rows=n_rows,
        win=cfg.resolve_win(n_rows < 9),
        block=cfg.resolve_block(n_rows < 9), kfold=cfg.sweep_kfold, grid_geom_idx=PV_OX, interpret=interpret)
    return out[:, 0]


def fluid_force_sweep(cfg: SimConfig, queries, src, anchors, pvec, gsize,
                      *, include_pressure=True, n_rows=9,
                      moving_boundary=False, include_viscosity=True,
                      interpret=False):
    """WCSPH forces; with ``n_rows=18`` the boundary terms (adhesion +
    friction + boundary pressure) run fused as rows 9-17.
    ``moving_boundary``: see :func:`boundary_force_pair`.
    ``include_viscosity=False`` drops the explicit viscosity term AND the
    boundary friction (the implicit viscosity solver owns both)."""
    pair = functools.partial(fluid_force_pair, kernel_set=cfg.kernel_set,
                             st_model=cfg.surface_tension_model,
                             include_pressure=include_pressure,
                             include_viscosity=include_viscosity)
    pair_b = None
    if n_rows in (6, 18):   # two window groups: rows_local fluid + boundary
        pair_b = functools.partial(boundary_force_pair,
                                   kernel_set=cfg.kernel_set,
                                   include_pressure=include_pressure,
                                   include_friction=include_viscosity,
                                   moving=moving_boundary)
    out = neighbor_sweep(
        pair, queries=queries, src=src, anchors=anchors, pvec=pvec,
        gsize=gsize, out_width=4, n_rows=n_rows,
        win=cfg.resolve_win(n_rows < 9),
        block=cfg.resolve_block(n_rows < 9), kfold=cfg.sweep_kfold, pair_fn_b=pair_b, grid_geom_idx=PV_OX,
        interpret=interpret)
    return out[:, :3]


def boundary_force_sweep(cfg: SimConfig, queries, bsrc, anchors, pvec, gsize,
                         *, include_pressure=True, interpret=False):
    pair = functools.partial(boundary_force_pair, kernel_set=cfg.kernel_set,
                             include_pressure=include_pressure)
    out = neighbor_sweep(
        pair, queries=queries, src=bsrc, anchors=anchors, pvec=pvec,
        gsize=gsize, out_width=4, win=cfg.resolve_win(False),
        grid_geom_idx=PV_OX, interpret=interpret)
    return out[:, :3]


def generic_sweep(cfg: SimConfig, pair_fn, queries, src, anchors, pvec,
                  gsize, *, out_width,
                  pair_fn_b=None, pair_b_kw=None, n_rows=9,
                  interpret=False, **kw):
    """Run any pair function (kernel_set bound automatically); an optional
    second pair function handles the fused boundary rows."""
    pair = functools.partial(pair_fn, kernel_set=cfg.kernel_set, **kw)
    pb = None
    if pair_fn_b is not None:
        pb = functools.partial(pair_fn_b, kernel_set=cfg.kernel_set,
                               **(pair_b_kw or {}))
    return neighbor_sweep(
        pair, queries=queries, src=src, anchors=anchors, pvec=pvec,
        gsize=gsize, out_width=out_width, win=cfg.resolve_win(n_rows < 9),
        block=cfg.resolve_block(n_rows < 9), kfold=cfg.sweep_kfold, pair_fn_b=pb, n_rows=n_rows,
        grid_geom_idx=PV_OX, interpret=interpret)
