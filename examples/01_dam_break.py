"""Quickstart: a dam-break with the WCSPH solver, one jitted step.

Run anywhere (CPU included):  python examples/01_dam_break.py
On a TPU host the step compiles for the TPU automatically.
"""

import jax
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))  # noqa: E402 — run from anywhere

import nereus_tpu as nt
from nereus_tpu import scene as scenelib

params = nt.make_params()                     # reference-default physics
cfg = nt.SimConfig()                          # engine="auto": Pallas on TPU

# the canonical demo scene (reference main.cpp:533-555): a fluid cube
# free-falls inside a big boundary box with floor at y = -1, hits at
# ~step 380 and splashes
state, grid, walls = scenelib.dam_break(params, cfg, n_target=4000)

step = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg, walls))

print(f"{int(state.num_active)} particles, dt={float(params.dt):.1e}")
for i in range(500):
    state, diag = step(state)
    if i % 100 == 99:
        print(f"step {i + 1}: mean compression = "
              f"{float(diag.mean_compression):.4f}, "
              f"max rho = {float(diag.max_density):.1f}")
assert int(diag.seg_overflow) == 0
p = np.asarray(state.pos)[:int(state.num_active)]
assert np.isfinite(p).all()
assert p[:, 1].min() > -1.0, "fluid fell through the tank floor"
print(f"done; splashed on the y=-1 floor, y in [{p[:, 1].min():.3f}, "
      f"{p[:, 1].max():.3f}]")
