"""Multiphase x rigid coupling: a body floats AT a two-phase interface.

The canonical demo of both systems together (round-5): a tank holds two
settled immiscible phases (water below, a 0.3*rho0 light phase above).
A rigid box of density between the two (600 kg/m^3) is dropped in: it
sinks straight through the light phase and comes to rest floating at
the interface, held by the heavy phase's pressure gradient. A second,
heavy box (3000 kg/m^3) dropped the same way punches through both
phases to the floor.

Physics: adapted-density multiphase WCSPH (Solenthaler number densities,
Hu-Adams volume-form pressure) with the consistent Akinci body contact
(`pallas_sph.multiphase_body_pair`): the body pressure term is rescaled
per QUERY phase, so the light phase pushes with its own (small) rest
density and the heavy phase with its own -- exactly what makes the
interface the equilibrium.

Run anywhere (CPU included):  python examples/09_interface_flotation.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))  # noqa: E402 — run from anywhere

import jax
import numpy as np


def main():
    # force local CPU: examples are demos, and probing the tunneled TPU
    # platform here could wedge a concurrently running TPU client
    # (CLAUDE.md tunnel rules). Delete this line to run on the chip.
    jax.config.update("jax_platforms", "cpu")

    import nereus_tpu as nt
    from nereus_tpu.boundary import box_boundary
    from nereus_tpu.params import SurfaceTensionModel, calibrate_mass
    from nereus_tpu.scene import particle_cube

    cfg = nt.SimConfig(surface_tension_model=SurfaceTensionModel.NONE)
    base = nt.make_params()
    spacing = 0.8 * float(base.interaction_radius)
    params = calibrate_mass(base, cfg, spacing=spacing)
    pm = float(params.particle_mass)
    rd = float(params.rest_density)
    h = float(params.interaction_radius)

    # two stacked layers on one lattice, m_i = m_cal * rho0_i / rho0_ref
    side = 8 * spacing
    bot = particle_cube((side / 2 + 2 * spacing,) * 3, (side,) * 3,
                        spacing)
    pos = np.concatenate([bot, bot + np.array([0.0, side + spacing, 0.0])])
    n1 = len(bot)
    rho0 = np.concatenate([np.full(n1, rd),
                           np.full(len(pos) - n1, 0.3 * rd)])
    lo = np.zeros(3)
    hi = np.array([side + 4 * spacing, 3 * side, side + 4 * spacing])
    grid = nt.fit_grid(lo - h, hi + h, h)
    walls = box_boundary(grid, lo, hi, float(params.particle_radius),
                         params)
    state = nt.make_fluid_state(pos, masses=pm * rho0 / rd,
                                rest_densities=rho0)
    n = len(pos)
    print(f"{n} fluid particles (two phases), settling the tank ...")

    settle = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg, walls))
    for _ in range(300):
        state, d = settle(state)
    p = np.asarray(state.pos)[:n]
    m = np.asarray(state.mass)[:n]
    heavy = m > 0.5 * pm
    interface = float(p[heavy, 1].max())
    light_top = float(p[~heavy, 1].max())
    cx, cz = float(p[:, 0].mean()), float(p[:, 2].mean())
    print(f"settled: interface at y={interface:.3f}, "
          f"light surface at y={light_top:.3f}")

    step = jax.jit(lambda s, b: nt.wcsph_coupled_step(
        s, params, grid, cfg, b, walls))

    finals = {}
    for name, density in (("mid (600)", 600.0), ("heavy (3000)", 3000.0)):
        body = nt.make_rigid_box((cx, light_top + 0.05, cz),
                                 (0.06, 0.06, 0.06),
                                 float(params.particle_radius), density,
                                 params)
        st = state
        for _ in range(50):            # frozen-body hydrostatic pre-settle
            st, _b, _d = step(st, body)
        for i in range(500):
            st, body, d = step(st, body)
            assert int(d.seg_overflow) == 0
        y = float(body.com[1])
        finals[name] = y
        print(f"{name:12s} body: final com_y = {y:.3f} "
              f"(interface {interface:.3f})")
    dy = finals["mid (600)"] - finals["heavy (3000)"]
    print(f"the mid-density body rides {dy:.3f} higher — it floats at "
          "the interface while the heavy one keeps sinking")


if __name__ == "__main__":
    main()
