"""Arbitrary triangle-mesh geometry: an OBJ obstacle in the flow and a
rigid body built from a mesh with exact polyhedral mass properties.

Run:  python examples/04_mesh_geometry.py
(Writes and reads small OBJ files in the working directory's tmp.)
"""

import os
import tempfile

import jax
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))  # noqa: E402 — run from anywhere

import nereus_tpu as nt
from nereus_tpu.boundary import box_boundary
from nereus_tpu.scene import particle_cube


def box_obj(path, lo, hi):
    """Write a closed outward-wound box mesh as OBJ."""
    lo, hi = np.asarray(lo, float), np.asarray(hi, float)
    v = np.array([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
                  [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
                  [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
                  [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]]])
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                  [0, 1, 5], [0, 5, 4], [3, 6, 2], [3, 7, 6],
                  [0, 4, 7], [0, 7, 3], [1, 2, 6], [1, 6, 5]]) + 1
    with open(path, "w") as fh:
        for x, y, z in v:
            fh.write(f"v {x} {y} {z}\n")
        for a, b, c in f:
            fh.write(f"f {a} {b} {c}\n")


params = nt.make_params()
# the pillar's boundary samples add to the walls' in shared cells —
# give the (CPU) segment engine more window headroom
cfg = nt.SimConfig(seg_window=64)
h = float(params.interaction_radius)
r = float(params.particle_radius)

with tempfile.TemporaryDirectory() as td:
    pillar_path = os.path.join(td, "pillar.obj")
    # base just above the floor so the two sample planes don't stack
    box_obj(pillar_path, (0.28, 0.02, 0.18), (0.38, 0.3, 0.32))
    verts, faces = nt.load_obj(pillar_path)

# mass properties work for ANY closed mesh (concave included)
m, com, inertia = nt.mesh_mass_properties(verts, faces, density=500.0)
print(f"pillar as a solid: mass={m:.3f} kg, com={com.round(3)}")

lo, hi = np.zeros(3), np.array([0.5, 0.8, 0.5])
grid = nt.fit_grid(lo - h, hi + h, h)
walls = box_boundary(grid, lo, hi, r, params)
pillar = nt.mesh_boundary(grid, verts, faces, r, params)
tank = nt.concat_boundaries(grid, walls, pillar)
print(f"tank walls + mesh pillar: {tank.num_boundaries} boundary samples")

# dam breaks against the pillar
state = nt.make_fluid_state(
    particle_cube((0.12, 0.25, 0.25), (0.2, 0.4, 0.3), 2 * r))
step = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg, tank))
for i in range(300):
    state, diag = step(state)
assert int(diag.seg_overflow) == 0
p = np.asarray(state.pos)
print(f"after impact: fluid x-front at {p[:, 0].max():.3f} "
      f"(pillar at 0.28), all finite: {np.isfinite(p).all()}")
