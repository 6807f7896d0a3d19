"""Unit tests for the smoothing-kernel library (SURVEY §4 level 1):
closed-form values, unit normalisation by quadrature, gradient consistency
with autodiff, and compact support."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nereus_tpu import kernels as K
from nereus_tpu.params import make_params

H = 0.0457
P = make_params(interaction_radius=H, dtype=jnp.float64)


def radial_integral(w_scalar, rmax, n=200_000):
    """∫ W(r) 4π r² dr by midpoint quadrature."""
    r = (np.arange(n) + 0.5) * (rmax / n)
    vecs = np.zeros((n, 3))
    vecs[:, 0] = r
    vals = np.asarray(w_scalar(jnp.asarray(vecs)))
    return float(np.sum(vals * 4.0 * np.pi * r**2) * (rmax / n))


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_poly6_normalisation():
    integral = radial_integral(lambda v: K.w_poly6(v, H, P.kpoly), H)
    assert abs(integral - 1.0) < 1e-4


def test_monaghan_normalisation():
    integral = radial_integral(lambda v: K.w_monaghan(v, H), 2.0 * H)
    assert abs(integral - 1.0) < 1e-4


def test_poly6_closed_form():
    r = jnp.array([[0.01, 0.02, -0.005]])
    r2 = float(jnp.sum(r**2))
    expected = float(P.kpoly) * (H**2 - r2) ** 3
    assert np.isclose(float(K.w_poly6(r, H, P.kpoly)[0]), expected, rtol=1e-12)


def test_compact_support():
    far = jnp.array([[H * 1.01, 0.0, 0.0]])
    assert float(K.w_poly6(far, H, P.kpoly)[0]) == 0.0
    assert np.allclose(np.asarray(K.w_spiky_grad(far, H, P.kpress_grad)[0]), 0.0)
    far2 = jnp.array([[2 * H * 1.01, 0.0, 0.0]])
    assert float(K.w_monaghan(far2, H)[0]) == 0.0
    assert np.allclose(np.asarray(K.w_monaghan_grad(far2, H)[0]), 0.0)


def test_grads_zero_at_origin():
    zero = jnp.zeros((1, 3))
    for g in (K.w_spiky_grad(zero, H, P.kpress_grad),
              K.w_monaghan_grad(zero, H),
              K.w_viscosity_grad(zero, H, P.kvisc_grad, P.kvisc_denum)):
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.allclose(np.asarray(g), 0.0)


def test_poly6_grad_matches_autodiff():
    pts = np.random.RandomState(0).uniform(-H * 0.6, H * 0.6, (32, 3))
    analytic = np.asarray(K.w_poly6_grad(jnp.asarray(pts), H, P.kpoly_grad))
    auto = np.asarray(jax.vmap(jax.grad(
        lambda v: K.w_poly6(v, H, P.kpoly)))(jnp.asarray(pts)))
    assert np.allclose(analytic, auto, rtol=1e-8, atol=1e-10)


def test_monaghan_grad_matches_autodiff():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-H, H, (64, 3))
    pts = pts[np.linalg.norm(pts, axis=1) > 0.05 * H]
    analytic = np.asarray(K.w_monaghan_grad(jnp.asarray(pts), H))
    auto = np.asarray(jax.vmap(jax.grad(lambda v: K.w_monaghan(v, H)))(
        jnp.asarray(pts)))
    assert np.allclose(analytic, auto, rtol=1e-6, atol=1e-8)


def test_akinci_kernels_finite_and_supported():
    rng = np.random.RandomState(2)
    pts = rng.uniform(-1.5 * H, 1.5 * H, (256, 3))
    c = np.asarray(K.c_akinci(jnp.asarray(pts), H, P.ksurf1, P.ksurf2))
    a = np.asarray(K.a_boundary(jnp.asarray(pts), H, P.bpol))
    assert np.all(np.isfinite(c)) and np.all(np.isfinite(a))
    rl = np.linalg.norm(pts, axis=1)
    assert np.all(c[rl > H] == 0.0)
    assert np.all(a[rl > H] == 0.0)
    assert np.all(a[rl < 0.5 * H] == 0.0)
