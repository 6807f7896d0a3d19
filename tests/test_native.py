"""Native C++ components vs their Python reference implementations."""

import numpy as np
import pytest

from nereus_tpu import boundary as bnd
from nereus_tpu import native
from nereus_tpu.params import KernelSet


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_sample_box_matches_python():
    lo, hi, r = (-1.0, -1.0, -1.0), (1.0, 2.0, 1.5), 0.05
    nat = native.sample_box(lo, hi, r)
    ref = bnd.sample_box(lo, hi, r)
    assert nat.shape == ref.shape
    # Same point sets (order-independent).
    key_n = np.lexsort((nat[:, 2], nat[:, 1], nat[:, 0]))
    key_r = np.lexsort((ref[:, 2], ref[:, 1], ref[:, 0]))
    np.testing.assert_allclose(nat[key_n], ref[key_r], atol=1e-9)
    # all points lie on the shell
    on_face = np.zeros(len(nat), bool)
    for a in range(3):
        on_face |= np.isclose(nat[:, a], lo[a]) | np.isclose(nat[:, a], hi[a])
    assert on_face.all()


@pytest.mark.parametrize("kset", [KernelSet.MULLER, KernelSet.MONAGHAN])
def test_compute_vbi_matches_python(kset):
    pts = bnd.sample_box((0, 0, 0), (0.5, 0.5, 0.5), 0.02)
    h = 0.0457
    nat = native.compute_vbi(pts, h, kset.value)

    # NumPy reference: brute-force O(M^2) on a subset for exactness.
    sub = pts[::7]
    nat_sub = native.compute_vbi(sub, h, kset.value)
    d = sub[:, None, :] - sub[None, :, :]
    r2 = np.sum(d * d, axis=-1)
    if kset == KernelSet.MULLER:
        kpoly = 315.0 / (64.0 * np.pi * h**9)
        w = np.where(r2 < h * h, kpoly * np.maximum(h * h - r2, 0.0) ** 3, 0.0)
    else:
        q = np.sqrt(r2) / h
        sigma = 1.0 / (4.0 * np.pi * h**3)
        w = np.where(r2 < h * h,
                     sigma * (np.maximum(2 - q, 0) ** 3
                              - 4 * np.maximum(1 - q, 0) ** 3), 0.0)
    expect = 1.0 / np.maximum(w.sum(axis=1), 1e-12)
    np.testing.assert_allclose(nat_sub, expect, rtol=1e-10)
    assert np.all(nat > 0)


def test_native_rasterizer_runs():
    from nereus_tpu.app.render import Camera, render_frame
    rng = np.random.default_rng(3)
    pos = rng.uniform(0.0, 0.5, (2000, 3))
    vel = rng.normal(size=(2000, 3))
    img = render_frame(pos, vel, width=320, height=240,
                       camera=Camera(eye=(1.2, 0.9, 1.6),
                                     target=(0.25, 0.25, 0.25)))
    assert img.shape == (240, 320, 3)
    background = np.array([0.08, 0.09, 0.12]) * 255
    lit = np.abs(img.astype(float) - background).sum(axis=-1) > 30
    assert lit.sum() > 500
