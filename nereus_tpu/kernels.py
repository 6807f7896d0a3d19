"""SPH smoothing-kernel library (pure functions, shape-polymorphic).

TPU-native rebuild of the reference's device kernel math
(``common/kernels_impl.cuh:85-247``): Müller-2003 poly6 / spiky / viscosity
kernels, the Monaghan cubic spline, and the Akinci-2013 cohesion and
boundary-adhesion kernels (which are *dead code* in the reference — defined
but never called — and are live, selectable options here).

All functions are branchless ``jnp`` expressions over arbitrary leading batch
dimensions: ``r`` is a displacement vector array ``(..., 3)``, returns are
``(...)`` scalars or ``(..., 3)`` gradients. Compact support is enforced with
``jnp.where`` masks; divisions by ``|r|`` are guarded so gradients are exactly
zero (not NaN) at ``r = 0`` and outside the support radius.

Normalisation constants (kpoly, kpoly_grad, ...) are precomputed in
:func:`nereus_tpu.params.make_params`, mirroring ``sph/sph.cpp:73-86``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .params import KernelSet, SimParams

_EPS = 1e-12


def _sqnorm(r):
    return jnp.sum(r * r, axis=-1)


def _norm(r):
    return jnp.sqrt(_sqnorm(r))


# ---------------------------------------------------------------------------
# Müller et al. 2003 kernel set (KERNEL_SET == MULLER)
# ---------------------------------------------------------------------------

def w_poly6(r, h, kpoly):
    """Poly6 kernel W(r) = kpoly (h² − |r|²)³ for |r| ≤ h.

    Reference: ``Wdefault``, ``common/kernels_impl.cuh:85-98``.
    """
    r2 = _sqnorm(r)
    h2 = h * h
    d = h2 - r2
    return jnp.where(r2 <= h2, kpoly * d * d * d, 0.0)


def w_poly6_grad(r, h, kpoly_grad):
    """∇Poly6 = kpoly_grad · r⃗ · (h² − |r|²)².

    Reference: ``Wdefault_grad``, ``common/kernels_impl.cuh:103-116``.
    """
    r2 = _sqnorm(r)
    h2 = h * h
    d = h2 - r2
    scale = jnp.where(r2 <= h2, kpoly_grad * d * d, 0.0)
    return scale[..., None] * r


def w_spiky_grad(r, h, kpress_grad):
    """Spiky pressure gradient ∇W = kpress_grad · (r⃗/|r|) · (h − |r|)².

    Reference: ``Wpressure_grad``, ``common/kernels_impl.cuh:121-135``.
    Zero at r = 0 (direction undefined) and outside support.
    """
    rl = _norm(r)
    c = (h - rl) * (h - rl)
    scale = jnp.where((rl <= h) & (rl > _EPS), kpress_grad * c / jnp.maximum(rl, _EPS), 0.0)
    return scale[..., None] * r


def w_viscosity_grad(r, h, kvisc_grad, kvisc_denum):
    """Viscosity kernel gradient (Müller 2003).

    ∇W = kvisc_grad · r⃗ · (−3|r|/(2h³) + 2/h² − h/(2|r|³)), with
    kvisc_denum = 2h³. Reference: ``Wviscosity_grad``,
    ``common/kernels_impl.cuh:140-154``.
    """
    rl = _norm(r)
    h2 = h * h
    rl3 = jnp.maximum(rl * rl * rl, _EPS)
    c = -(3.0 * rl / kvisc_denum) + (2.0 / h2) - (h / (2.0 * rl3))
    scale = jnp.where((rl <= h) & (rl > _EPS), kvisc_grad * c, 0.0)
    return scale[..., None] * r


# ---------------------------------------------------------------------------
# Monaghan cubic spline (KERNEL_SET == MONAGHAN)
# ---------------------------------------------------------------------------

def w_monaghan(r, h):
    """Monaghan cubic spline, σ = 1/(4πh³), support radius 2h.

    W = σ((2−q)³ − 4(1−q)³) for q ∈ [0,1), σ(2−q)³ for q ∈ [1,2), else 0,
    with q = |r|/h. Reference: ``Wmonaghan``, ``common/kernels_impl.cuh:159-178``.
    """
    sigma = 1.0 / (4.0 * jnp.pi * h * h * h)
    q = _norm(r) / h
    a = 2.0 - q
    b = 1.0 - q
    inner = a * a * a - 4.0 * b * b * b
    outer = a * a * a
    return sigma * jnp.where(q < 1.0, inner, jnp.where(q < 2.0, outer, 0.0))


def w_monaghan_grad(r, h):
    """Gradient of the Monaghan cubic spline.

    Reference: ``Wmonaghan_grad``, ``common/kernels_impl.cuh:183-203``.
    Zero at r = 0 and beyond 2h.
    """
    sigma = 1.0 / (4.0 * jnp.pi * h * h * h)
    rl = _norm(r)
    q = rl / h
    a = 2.0 - q
    b = 1.0 - q
    s_inner = -3.0 * a * a + 12.0 * b * b
    s_outer = -3.0 * a * a
    scalar = jnp.where(q < 1.0, s_inner, jnp.where(q < 2.0, s_outer, 0.0))
    scale = jnp.where(rl > _EPS, sigma * scalar / (h * jnp.maximum(rl, _EPS)), 0.0)
    return scale[..., None] * r


# ---------------------------------------------------------------------------
# Akinci 2013 cohesion / boundary-adhesion kernels
# (defined-but-dead in the reference: ``common/kernels_impl.cuh:208-247``)
# ---------------------------------------------------------------------------

def c_akinci(r, h, ksurf1, ksurf2):
    """Akinci cohesion kernel C(r) with ksurf1 = 32/(πh⁹), ksurf2 = h⁶/64.

    C = ksurf1 (h−|r|)³|r|³               for 2|r| > h, |r| ≤ h
    C = ksurf1 (2 (h−|r|)³|r|³ − ksurf2)  for 0 < 2|r| ≤ h
    Reference: ``Cakinci``, ``common/kernels_impl.cuh:208-228``.
    """
    rl = _norm(r)
    hr = h - rl
    cube = hr * hr * hr * rl * rl * rl
    near = ksurf1 * (2.0 * cube - ksurf2)
    far = ksurf1 * cube
    return jnp.where(
        (2.0 * rl > h) & (rl <= h), far,
        jnp.where((rl > _EPS) & (2.0 * rl <= h), near, 0.0))


def a_boundary(r, h, bpol):
    """Akinci boundary-adhesion kernel A(r).

    A = bpol (−4|r|²/h + 6|r| − 2h)^(1/4) for h/2 < |r| ≤ h, else 0.
    Reference: ``Aboundary``, ``common/kernels_impl.cuh:233-247``.
    """
    rl = _norm(r)
    arg = -(4.0 * rl * rl) / h + 6.0 * rl - 2.0 * h
    val = bpol * jnp.power(jnp.maximum(arg, 0.0), 0.25)
    return jnp.where((2.0 * rl > h) & (rl <= h), val, 0.0)


# ---------------------------------------------------------------------------
# Kernel-set dispatch (the KERNEL_SET compile-time switch,
# ``CMakeLists.txt:27`` / ``#if KERNEL_SET == ...`` sites in
# ``sph/sph_kernel_impl.cuh``) — resolved statically at trace time.
# ---------------------------------------------------------------------------

def w_value(kernel_set: KernelSet, r, p: SimParams):
    """W(r): density-style kernel value for the configured set."""
    if kernel_set == KernelSet.MULLER:
        return w_poly6(r, p.interaction_radius, p.kpoly)
    return w_monaghan(r, p.interaction_radius)


def w_default_grad(kernel_set: KernelSet, r, p: SimParams):
    """∇W used by density-gradient-style terms (poly6 grad under Müller)."""
    if kernel_set == KernelSet.MULLER:
        return w_poly6_grad(r, p.interaction_radius, p.kpoly_grad)
    return w_monaghan_grad(r, p.interaction_radius)


def w_pressure_grad(kernel_set: KernelSet, r, p: SimParams):
    """∇W used by the WCSPH pressure force (spiky under Müller)."""
    if kernel_set == KernelSet.MULLER:
        return w_spiky_grad(r, p.interaction_radius, p.kpress_grad)
    return w_monaghan_grad(r, p.interaction_radius)


def w_viscosity_grad_set(kernel_set: KernelSet, r, p: SimParams):
    """∇W used by the WCSPH viscosity force."""
    if kernel_set == KernelSet.MULLER:
        return w_viscosity_grad(r, p.interaction_radius, p.kvisc_grad, p.kvisc_denum)
    return w_monaghan_grad(r, p.interaction_radius)
