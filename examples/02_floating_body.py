"""Two-way rigid-body coupling: drop a light box onto settled water and
watch it float (Akinci sampling, exact Newton-3rd reaction).

Run:  python examples/02_floating_body.py
"""

import jax
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))  # noqa: E402 — run from anywhere

import nereus_tpu as nt
from nereus_tpu.params import calibrate_mass
from nereus_tpu.scene import resting_block

cfg = nt.SimConfig()
base = nt.make_params()
spacing = 0.8 * float(base.interaction_radius)
params = calibrate_mass(base, cfg, spacing=spacing)

# water block already at rest density on the tank floor
state, grid, walls = resting_block(params, cfg, n_target=1000,
                                   spacing=spacing)
top = np.asarray(state.pos)[:, 1].max()
cx = float(np.asarray(state.pos)[:, 0].mean())

body = nt.make_rigid_box((cx, top + 0.08, cx), (0.08, 0.08, 0.08),
                         float(params.particle_radius),
                         body_density=150.0, params=params)

step = jax.jit(lambda s, b: nt.wcsph_coupled_step(
    s, params, grid, cfg, b, walls))

for i in range(100):                 # settle the water, body frozen
    state, _, _ = step(state, body)
for i in range(1200):                # release: fall, splash, bob, float
    state, body, diag = step(state, body)
    if i % 200 == 199:
        print(f"step {i + 1}: body com_y={float(body.com[1]):.3f} "
              f"|v|={float(np.linalg.norm(np.asarray(body.vel))):.3f}")
print(f"water top ~{top:.3f}; the density-150 box ends up riding the "
      f"(sloshing) surface instead of sinking to the floor")
