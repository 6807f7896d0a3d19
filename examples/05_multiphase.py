"""Multiphase: oil on water, incompressible (DFSPH), beyond-reference.

Two fluids with different rest densities in ONE solve — per-particle
mass/ρ₀ columns, Solenthaler-adapted densities (a sharp density
interface exerts zero spurious pressure), Hu–Adams volume-form forces.
The DFSPH pressure solver holds EACH phase at its own rest density.

Run anywhere (CPU included):  python examples/05_multiphase.py
Swap dfsph_step → wcsph_step for the weakly-compressible variant
(also available slab-sharded, see 03_sharded_multichip.py).
"""

import jax
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))  # noqa: E402 — run from anywhere

import nereus_tpu as nt
from nereus_tpu.boundary import box_boundary
from nereus_tpu.params import SurfaceTensionModel, calibrate_mass
from nereus_tpu.scene import particle_cube

cfg = nt.SimConfig(surface_tension_model=SurfaceTensionModel.NONE)
params = calibrate_mass(nt.dfsph_params(), cfg,
                        spacing=0.8 * float(nt.dfsph_params()
                                            .interaction_radius))
pm = float(params.particle_mass)
rd = float(params.rest_density)          # water: 1000 kg/m^3
h = float(params.interaction_radius)
sp = 0.8 * h

# a water block with an oil block (40% density) stacked on top — seeded
# INVERTED would overturn (Rayleigh-Taylor); this order is stable.
# Every phase seeds on the same lattice with m = m_cal * rho0/rho0_ref so
# each particle starts exactly at its own rest density.
side = 6 * sp
water = particle_cube((side / 2 + 2 * sp,) * 3, (side,) * 3, sp)
oil = water + np.array([0.0, side + sp, 0.0])
pos = np.concatenate([water, oil])
rho0 = np.concatenate([np.full(len(water), rd), np.full(len(oil), 0.4 * rd)])

lo, hi = np.zeros(3), np.array([side + 4 * sp, 3 * side, side + 4 * sp])
grid = nt.fit_grid(lo - h, hi + h, h)
walls = box_boundary(grid, lo, hi, float(params.particle_radius), params)
state = nt.make_fluid_state(pos, masses=pm * rho0 / rd, rest_densities=rho0)
n = int(state.num_active)

step = jax.jit(lambda s: nt.dfsph_step(s, params, grid, cfg, walls))

print(f"{n} particles ({len(water)} water + {len(oil)} oil at 0.4x density)")
for i in range(300):
    state, diag = step(state)
    if i % 100 == 99:
        print(f"step {i + 1}: solver iters = {int(diag.solver_iters)}, "
              f"clamped density error = {float(diag.mean_density_error):.2e}"
              f" (each phase vs its OWN rest density)")
assert int(diag.seg_overflow) == 0

p = np.asarray(state.pos)[:n]
m = np.asarray(state.mass)[:n]
heavy = m > 0.5 * pm
assert np.isfinite(p).all() and p[:, 1].min() > 0.0
assert p[heavy, 1].mean() < p[~heavy, 1].mean(), "stratification lost"
print(f"done; water mean-y = {p[heavy, 1].mean():.3f} < "
      f"oil mean-y = {p[~heavy, 1].mean():.3f} — oil floats on water, "
      f"both phases incompressible")
