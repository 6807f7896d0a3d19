"""Elastoplastic solid: two identical cubes slam the floor — the ductile
one keeps its dent, beyond-reference.

Von Mises plasticity on the additive Green-strain split (O'Brien,
Bargteil & Hodgins 2002) over the total-Lagrangian elastic solver: when
the deviatoric elastic strain exceeds ``yield_strain``, the excess flows
into an accumulated plastic strain E_p (an optional (N, 3, 3) column on
``ElasticState``; ``None`` is the pure elastic fast path). The flow is
deviatoric, so plastic deformation never changes volume, and it is pure
per-particle batched 3x3 math between the existing static-plan sweeps —
the TPU step cost is unchanged.

Run anywhere (CPU included):  python examples/08_plastic_denting.py
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))  # noqa: E402 — run from anywhere

import nereus_tpu as nt

params = nt.make_params(dt=2e-4, gravity=(0.0, -9.81, 0.0))
cfg = nt.SimConfig(seg_window=64)  # solid lattice (h/2) is dense
h = float(np.asarray(params.interaction_radius))
sp = 0.5 * h

side = 5 * sp
cube = nt.sample_box_solid((0, 0, 0), (side, side, side), sp)

# identical bodies; only the constitutive law differs
ep_elastic = nt.elastic_params(young=5e4, damping=2.0, floor_y=0.0)
ep_ductile = nt.elastic_params(young=5e4, damping=2.0, floor_y=0.0,
                               yield_strain=0.02)

st_e, statics, grid = nt.make_elastic_solid(cube, params, cfg, sp)
st_p, _, _ = nt.make_elastic_solid(cube, params, cfg, sp, plastic=True)

# the same squash impulse: the top face drives down at 2 m/s
v0 = jnp.zeros_like(st_e.vel).at[:, 1].set(
    -2.0 * statics.x0[:, 1] / side)
st_e = dataclasses.replace(st_e, vel=v0)
st_p = dataclasses.replace(st_p, vel=v0)


def drive(state, ep, steps=1500):
    @jax.jit
    def many(s):
        def body(_, c):
            return nt.elastic_step(c[0], statics, params, ep, grid, cfg)
        return jax.lax.fori_loop(
            0, steps - 1, body,
            nt.elastic_step(s, statics, params, ep, grid, cfg))
    return many(state)


def shape_residual(s):
    """Permanent deformation: COM-removed distance from the rest shape."""
    d = (s.pos - s.pos.mean(0)) - (statics.x0 - statics.x0.mean(0))
    return float(jnp.abs(d).max())


se, de = drive(st_e, ep_elastic)
sp_, dp = drive(st_p, ep_ductile)

print(f"elastic cube: shape residual {shape_residual(se):.4f} m "
      f"(springs back), strain energy {float(de.elastic_energy):.2e} J")
print(f"ductile cube: shape residual {shape_residual(sp_):.4f} m "
      f"(permanent dent), max |E_p| {float(jnp.abs(sp_.plastic).max()):.3f}, "
      f"tr E_p {float(jnp.abs(jnp.einsum('naa->n', sp_.plastic)).max()):.1e}"
      f" (volume-preserving flow)")

assert shape_residual(sp_) > 2.0 * shape_residual(se)
assert np.isfinite(np.asarray(sp_.pos)).all()
print("done: same impact, same material stiffness — only the yield "
      "surface differs, and only the ductile cube remembers the hit.")
