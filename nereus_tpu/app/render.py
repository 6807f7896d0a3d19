"""Offline point-sprite renderer.

Software rasteriser with the same visual model as the reference's GLSL
point-sprite sphere shader (``main.cpp:68-104``): each particle is splatted
as a screen-aligned disc whose pixels are shaded as a lit sphere
(normal from in-sprite coordinates, diffuse + ambient), with perspective
point sizes and painter's-algorithm depth ordering. Pure NumPy and fully
vectorised (pixel lists are built per size-bucket, concatenated, then
depth-sorted and scattered once), so ~100k particles/frame is practical;
the C++ rasteriser in ``native/`` is the fast path for bigger scenes.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Camera:
    """Look-at perspective camera (the reference's GLM camera,
    ``main.cpp:353-472,593-605``)."""

    eye: tuple = (1.4, 1.0, 2.6)
    target: tuple = (0.25, 0.3, 0.25)
    up: tuple = (0.0, 1.0, 0.0)
    fov_deg: float = 45.0
    near: float = 0.01
    far: float = 100.0

    def view_matrix(self):
        eye = np.asarray(self.eye, dtype=np.float64)
        target = np.asarray(self.target, dtype=np.float64)
        up = np.asarray(self.up, dtype=np.float64)
        f = target - eye
        f /= np.linalg.norm(f)
        s = np.cross(f, up)
        s /= np.linalg.norm(s)
        u = np.cross(s, f)
        m = np.eye(4)
        m[0, :3] = s
        m[1, :3] = u
        m[2, :3] = -f
        m[:3, 3] = -m[:3, :3] @ eye
        return m

    def proj_matrix(self, aspect: float):
        t = 1.0 / np.tan(np.deg2rad(self.fov_deg) / 2.0)
        n, fa = self.near, self.far
        m = np.zeros((4, 4))
        m[0, 0] = t / aspect
        m[1, 1] = t
        m[2, 2] = (fa + n) / (n - fa)
        m[2, 3] = 2 * fa * n / (n - fa)
        m[3, 2] = -1.0
        return m


_LIGHT = np.array([0.3, 0.5, 0.8])
_LIGHT = _LIGHT / np.linalg.norm(_LIGHT)


def _velocity_colors(vel, vmax=3.0):
    """Blue (still) → white (fast) colormap, matching the watery look of the
    reference demo."""
    speed = np.linalg.norm(vel, axis=-1)
    t = np.clip(speed / vmax, 0.0, 1.0)[:, None]
    blue = np.array([0.25, 0.45, 0.95])
    white = np.array([0.95, 0.97, 1.0])
    return blue[None, :] * (1 - t) + white[None, :] * t


def render_frame(pos, vel=None, *, width=1024, height=768,
                 camera: Camera | None = None, particle_radius=0.02,
                 background=(0.08, 0.09, 0.12), point_scale=1.0,
                 max_sprite=48, colors=None):
    """Rasterise particles to an (H, W, 3) uint8 image.

    ``pos``/``vel``: (N, 3) arrays (host). ``colors``: optional (N, 3) in
    [0, 1]; defaults to a velocity colormap.
    """
    cam = camera or Camera()
    pos = np.asarray(pos, dtype=np.float64)
    n = pos.shape[0]
    img = np.empty((height, width, 3), dtype=np.float32)
    img[:] = np.asarray(background, dtype=np.float32)
    if n == 0:
        return (img * 255).astype(np.uint8)

    if colors is None:
        colors = _velocity_colors(np.asarray(vel) if vel is not None
                                  else np.zeros_like(pos))
    colors = np.asarray(colors, dtype=np.float32)

    # Fast path: z-buffered C++ rasterizer (native/nereus_native.cpp).
    from .. import native as native_mod
    img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if native_mod.rasterize(pos, colors, cam.view_matrix(),
                            cam.proj_matrix(width / height), width, height,
                            particle_radius, point_scale, max_sprite,
                            cam.fov_deg, img8):
        return img8

    view = cam.view_matrix()
    proj = cam.proj_matrix(width / height)
    hom = np.concatenate([pos, np.ones((n, 1))], axis=1)
    eye_space = hom @ view.T
    clip = eye_space @ proj.T
    w = clip[:, 3]
    keep = w > cam.near
    ndc = clip[keep, :3] / w[keep, None]
    on_screen = (np.abs(ndc[:, 0]) < 1.2) & (np.abs(ndc[:, 1]) < 1.2)
    idx = np.nonzero(keep)[0][on_screen]
    if idx.size == 0:
        return (img * 255).astype(np.uint8)
    ndc = ndc[on_screen]

    xs = ((ndc[:, 0] + 1) * 0.5 * width).astype(np.int64)
    ys = ((1 - (ndc[:, 1] + 1) * 0.5) * height).astype(np.int64)
    depth = -eye_space[idx, 2]
    # gl_PointSize = radius · scale / dist (main.cpp:79)
    size_px = particle_radius * point_scale * height / \
        (np.tan(np.deg2rad(cam.fov_deg) / 2) * depth)
    radii = np.clip(np.round(size_px).astype(np.int64), 1, max_sprite)
    cols = colors[idx]

    # Build (pixel, depth, rgb) lists bucketed by integer sprite radius,
    # then resolve visibility with one global far→near sort + scatter.
    all_pix, all_depth, all_rgb = [], [], []
    for r in np.unique(radii):
        sel = radii == r
        k = int(np.sum(sel))
        d = np.arange(-r, r + 1)
        dy, dx = np.meshgrid(d, d, indexing="ij")
        rr2 = (dx * dx + dy * dy).astype(np.float64) / (r * r)
        disc = rr2 <= 1.0
        dxf, dyf, rr2f = dx[disc], dy[disc], rr2[disc]
        nz = np.sqrt(np.maximum(1.0 - rr2f, 0.0))
        normal = np.stack([dxf / max(r, 1), -dyf / max(r, 1), nz], axis=-1)
        diffuse = np.maximum(normal @ _LIGHT, 0.0)
        shade = (0.25 + 0.75 * diffuse).astype(np.float32)  # ambient+diffuse

        px = xs[sel][:, None] + dxf[None, :]
        py = ys[sel][:, None] + dyf[None, :]
        ok = (px >= 0) & (px < width) & (py >= 0) & (py < height)
        flat = (py * width + px)[ok]
        dep = np.broadcast_to(depth[sel][:, None], ok.shape)[ok]
        rgb = (cols[sel][:, None, :] * shade[None, :, None])[ok]
        all_pix.append(flat)
        all_depth.append(dep)
        all_rgb.append(rgb)

    flat = np.concatenate(all_pix)
    dep = np.concatenate(all_depth)
    rgb = np.concatenate(all_rgb)
    order = np.argsort(-dep, kind="stable")  # far first, near wins
    img.reshape(-1, 3)[flat[order]] = rgb[order]
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)
