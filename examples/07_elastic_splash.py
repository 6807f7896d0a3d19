"""Fluid-elastic coupling: a soft rubber cube splashes into a tank.

Two-way coupling in one jitted step (``wcsph_elastic_step``): the body's
particles act as a moving Akinci boundary for the fluid, the reaction
comes back per-sample through a reverse sweep, and the body substeps its
stiffer total-Lagrangian dynamics under the frozen reaction. A light
(0.3 rho0) body splashes in, deforms, and bobs back up to float.

Run anywhere (CPU included):  python examples/07_elastic_splash.py
Writes docs/elastic_splash.gif when PIL is available.
"""

import dataclasses

import jax
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))  # noqa: E402 — run from anywhere

import nereus_tpu as nt
from nereus_tpu.boundary import box_boundary
from nereus_tpu.params import calibrate_mass
from nereus_tpu.scene import particle_cube
from nereus_tpu.solvers import elastic as EL

cfg = nt.SimConfig(seg_window=64)    # the h/2 solid lattice is dense
params0 = nt.make_params()
h = float(np.asarray(params0.interaction_radius))
r = float(params0.particle_radius)

# a pool on the resting-block recipe: 0.8h lattice, mass calibrated AT
# that spacing, two-spacing standoff from every wall (seeding against
# the wall reads ~2rho0 and ejects particles — the documented scene
# failure, not a solver property)
spf = 0.8 * h
params = calibrate_mass(params0, cfg, spacing=spf)
ext = np.array([0.4, 0.12, 0.4])
pool = particle_cube((2 * spf + ext[0] / 2, 2 * spf + ext[1] / 2,
                      2 * spf + ext[2] / 2), ext, spf)
lo = np.zeros(3)
hi = np.array([ext[0] + 4 * spf, 0.8, ext[2] + 4 * spf])
grid = nt.fit_grid(lo - h, hi + h, h)
walls = box_boundary(grid, lo, hi, r, params)
state = nt.make_fluid_state(pool)
settle = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg, walls))
for _ in range(150):
    state, _d = settle(state)
surf = float(np.quantile(np.asarray(state.pos)
                         [:int(state.num_active), 1], 0.995))

# a soft, light cube dropped from just above the surface
sp = 0.5 * h
y0 = surf + 1.5 * sp
cube = EL.sample_box_solid((0.18, y0, 0.18),
                           (0.18 + 4 * sp, y0 + 4 * sp, 0.18 + 4 * sp),
                           sp)
ep = nt.elastic_params(young=1e4, poisson=0.3, damping=5.0, floor_y=0.0)
estate, statics, _ = nt.make_elastic_solid(cube, params, cfg, sp,
                                           grid=grid, density=300.0)
psi = nt.elastic_psi(statics, params, cfg)
print(f"fluid {int(state.num_active)}, body {statics.n} "
      f"(0.3 rho0 — it should float)")

step = jax.jit(lambda s, e: nt.wcsph_elastic_step(
    s, params, grid, cfg, e, statics, ep, psi, walls, substeps=4))

frames = []
for k in range(800):
    state, estate, diag = step(state, estate)
    if k % 10 == 0:
        nf = int(state.num_active)
        frames.append((np.asarray(state.pos)[:nf],
                       np.asarray(state.vel)[:nf],
                       np.asarray(estate.pos)))
    if k % 160 == 0:
        print(f"step {k:4d}  body ycom {float(estate.pos[:, 1].mean()):.3f}"
              f"  max rho {float(diag.max_density):.0f}")

assert np.isfinite(np.asarray(estate.pos)).all()
ycom = float(estate.pos[:, 1].mean())
print(f"final body ycom {ycom:.3f} (pool surface ~{surf:.3f}, floor 0) "
      f"— floating near the surface")
assert ycom > 0.6 * surf, (ycom, surf)

try:
    from PIL import Image
    from nereus_tpu.app.render import Camera, render_frame
    cam = Camera(eye=(1.1, 0.7, 1.3), target=(0.27, 0.15, 0.27))
    imgs = []
    body_col = np.array([1.0, 0.55, 0.15])
    for pf, vf, pb in frames:
        pos = np.concatenate([pf, pb])
        from nereus_tpu.app.render import _velocity_colors
        cols = np.concatenate([
            _velocity_colors(vf),
            np.broadcast_to(body_col, (pb.shape[0], 3))])
        img = render_frame(pos, width=480, height=360, camera=cam,
                           particle_radius=r, colors=cols)
        imgs.append(Image.fromarray(img))
    out = _os.path.join(_os.path.dirname(__file__), "..", "docs",
                        "elastic_splash.gif")
    imgs[0].save(out, save_all=True, append_images=imgs[1:], duration=50,
                 loop=0)
    print("wrote", out)
except ImportError:
    print("PIL not available — skipped the GIF")
