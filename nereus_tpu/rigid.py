"""Two-way rigid-body ↔ fluid coupling (beyond-reference).

The upstream framework's boundaries are static scenery (one-way: they push
fluid, feel nothing — ``sph/sph.cpp:391-432``). Here a rigid body is an
Akinci-sampled particle shell with full rigid dynamics, coupled both ways:

* **body → fluid**: the body's shell enters the per-step boundary set with
  per-particle rigid velocities ``v + ω×r`` (the moving-boundary machinery,
  :func:`nereus_tpu.boundary.move_boundary` semantics).
* **fluid → body**: Newton's third law. Every boundary pair force the
  fluid feels from the body (adhesion + friction + boundary pressure) is
  CENTRAL — directed along r̂_ib — so the reaction force AND torque are
  exact when accumulated from the fluid side:

      F_body = −Σ_i f_i,   τ_body = −Σ_i (x_i − c) × f_i

  (for central pair forces, (x_b − c)×f and (x_i − c)×f differ by
  (x_b − x_i)×f ≡ 0). One extra body-only sweep per step computes f_i; no
  scatter, no body-as-query pass.

Rigid state integrates on device (semi-implicit Euler, world-frame inertia
``R I₀ Rᵀ``, rotation matrix re-orthonormalized per step) — the whole
coupled step stays inside one jit. See
:func:`nereus_tpu.solvers.coupled.wcsph_coupled_step`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import grid as gridlib
from .params import KernelSet, SimParams
from .state import BoundaryData


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RigidBody:
    """Rigid-body state + its Akinci sample shell (a pytree; everything
    traced so the coupled step never recompiles as the body moves)."""

    offsets: jax.Array       # (M, 3) body-frame samples, com at origin
    psi: jax.Array           # (M,)   Akinci ψ = ρ₀·V_bi (fluid ρ₀)
    mass: jax.Array          # ()     body mass
    inertia_body: jax.Array  # (3, 3) body-frame inertia about the com
    com: jax.Array           # (3,)
    R: jax.Array             # (3, 3) body→world rotation
    vel: jax.Array           # (3,)   linear velocity
    omega: jax.Array         # (3,)   angular velocity (world frame)

    @property
    def num_samples(self) -> int:
        return self.offsets.shape[0]


def make_rigid_box(center, size, radius, body_density,
                   params: SimParams,
                   kernel_set: KernelSet = KernelSet.MULLER,
                   dtype=jnp.float32) -> RigidBody:
    """Sample a box shell (same lattice as the static boundary sampler) and
    build a :class:`RigidBody` of the given material density.

    ψ uses the FLUID rest density (Akinci boundary handling measures
    displaced fluid); the inertia is the solid box's
    ``I = m/12 · diag(s_y²+s_z², …)``.
    """
    from .boundary import compute_vbi, sample_box

    center = np.asarray(center, np.float64)
    size = np.asarray(size, np.float64)
    pts = sample_box(center - size / 2.0, center + size / 2.0, radius)
    vbi = compute_vbi(pts, float(params.interaction_radius), kernel_set)
    psi = float(params.rest_density) * vbi
    mass = float(body_density) * float(np.prod(size))
    sx, sy, sz = (float(s) for s in size)
    inertia = (mass / 12.0) * np.diag(
        [sy * sy + sz * sz, sx * sx + sz * sz, sx * sx + sy * sy])
    return RigidBody(
        offsets=jnp.asarray(pts - center, dtype),
        psi=jnp.asarray(psi, dtype),
        mass=jnp.asarray(mass, dtype),
        inertia_body=jnp.asarray(inertia, dtype),
        com=jnp.asarray(center, dtype),
        R=jnp.eye(3, dtype=dtype),
        vel=jnp.zeros(3, dtype),
        omega=jnp.zeros(3, dtype),
    )


def body_world(body: RigidBody):
    """World-frame sample positions and rigid velocities ``v + ω×r``."""
    pos = body.com[None, :] + body.offsets @ body.R.T
    r = pos - body.com[None, :]
    vel = body.vel[None, :] + jnp.cross(
        jnp.broadcast_to(body.omega, pos.shape), r)
    return pos, vel


def body_boundary(body: RigidBody, grid) -> BoundaryData:
    """Hash-sorted :class:`BoundaryData` for the body's CURRENT pose —
    rebuilt on device every step (one variadic sort; jit-friendly)."""
    pos, vel = body_world(body)
    h = gridlib.hash_positions(grid, pos)
    cols = ([pos[:, k] for k in range(3)] + [body.psi]
            + [vel[:, k] for k in range(3)])
    sorted_hash, _, out = gridlib.sort_by_hash(h, *cols)
    return BoundaryData(pos=jnp.stack(out[0:3], axis=0).T, psi=out[3],
                        sorted_hash=sorted_hash,
                        vel=jnp.stack(out[4:7], axis=0).T)


def concat_boundaries(grid, a: BoundaryData | None,
                      b: BoundaryData) -> BoundaryData:
    """Merge a (possibly static) boundary set with a per-step one into ONE
    hash-sorted set for the fused fluid sweeps."""
    if a is None or a.num_boundaries == 0:
        return b
    pos = jnp.concatenate([a.pos, b.pos])
    psi = jnp.concatenate([a.psi, b.psi])
    za = jnp.zeros_like(a.pos) if a.vel is None else a.vel
    zb = jnp.zeros_like(b.pos) if b.vel is None else b.vel
    vel = jnp.concatenate([za, zb])
    h = jnp.concatenate([a.sorted_hash, b.sorted_hash])
    cols = ([pos[:, k] for k in range(3)] + [psi]
            + [vel[:, k] for k in range(3)])
    sorted_hash, _, out = gridlib.sort_by_hash(h, *cols)
    return BoundaryData(pos=jnp.stack(out[0:3], axis=0).T, psi=out[3],
                        sorted_hash=sorted_hash,
                        vel=jnp.stack(out[4:7], axis=0).T)


def wall_contact_force(body: RigidBody, walls: BoundaryData,
                       params: SimParams,
                       kernel_set: KernelSet = KernelSet.MULLER,
                       stiffness: float = 1.0, damping: float = 20.0):
    """Body ↔ static-wall contact: Becker-style penalty + normal damping
    over (body sample × wall particle) pairs.

    The sample sets are tiny (tens–hundreds of body samples; the walls'
    shell), so this is a dense jnp pass — no neighbor engine needed.
    ``stiffness`` scales the same β·ψ·W(r)·r̂ penalty the fluid feels from
    walls (the force law that demonstrably holds resting fluid);
    ``damping`` adds −γ·β·ψ·W·(v·r)·r per sample so the body settles
    instead of ringing (γ·|v||r| ~ 1 at ~1 m/s contact speed for the
    default γ — the damping force then matches the penalty and kills the
    bounce). Returns ``(force, torque)`` about the body com.
    """
    from . import kernels as K

    pos, vel = body_world(body)
    rij = pos[:, None, :] - walls.pos[None, :, :]       # (Mb, Mw, 3)
    d2 = jnp.sum(rij * rij, axis=-1)
    ir = params.interaction_radius
    ok = d2 < ir * ir
    w = K.w_value(kernel_set, rij, params)
    # normal damping against the wall-relative sample velocity; the
    # combined coefficient is clamped ≥ 0 — contact may only PUSH (a
    # fast-receding sample must separate freely, not get sucked back)
    vdotr = jnp.sum(vel[:, None, :] * rij, axis=-1)
    coef = jnp.where(ok, params.beta * walls.psi[None, :] * w
                     * jnp.maximum(stiffness - damping * vdotr, 0.0), 0.0)
    f = coef[..., None] * rij
    f_sample = jnp.sum(f, axis=1)                        # (Mb, 3)
    force = jnp.sum(f_sample, axis=0)
    torque = jnp.sum(jnp.cross(pos - body.com[None, :], f_sample), axis=0)
    return force, torque


def body_body_contact(a: RigidBody, b: RigidBody, params: SimParams,
                      kernel_set: KernelSet = KernelSet.MULLER,
                      stiffness: float = 1.0, damping: float = 20.0):
    """Rigid ↔ rigid contact between two shells (same penalty + normal
    damping as :func:`wall_contact_force`, with the RELATIVE sample
    velocities). Every pair force is central, so torques about BOTH
    bodies' centers are exact from the a-side application points.
    Returns ``(F_a, τ_a, F_b, τ_b)`` with ``F_b = −F_a`` (Newton-exact).
    """
    from . import kernels as K

    pa, va = body_world(a)
    pb, vb = body_world(b)
    rij = pa[:, None, :] - pb[None, :, :]
    d2 = jnp.sum(rij * rij, axis=-1)
    ir = params.interaction_radius
    ok = d2 < ir * ir
    w = K.w_value(kernel_set, rij, params)
    dv = va[:, None, :] - vb[None, :, :]
    vdotr = jnp.sum(dv * rij, axis=-1)
    # clamped ≥ 0: contact may only push (see wall_contact_force)
    coef = jnp.where(ok, (params.beta * b.psi[None, :]) * w
                     * jnp.maximum(stiffness - damping * vdotr, 0.0), 0.0)
    f = coef[..., None] * rij                     # on a, per pair
    f_sa = jnp.sum(f, axis=1)                     # (Ma, 3)
    F_a = jnp.sum(f_sa, axis=0)
    tau_a = jnp.sum(jnp.cross(pa - a.com[None, :], f_sa), axis=0)
    # central forces: the b-side torque evaluated at the a-side points
    tau_b = -jnp.sum(jnp.cross(pa - b.com[None, :], f_sa), axis=0)
    return F_a, tau_a, -F_a, tau_b


def _orthonormalize(R):
    """Gram-Schmidt re-orthonormalization (keeps the integrated rotation a
    rotation; cheap and robust at SPH timesteps)."""
    c0 = R[:, 0] / jnp.linalg.norm(R[:, 0])
    c1 = R[:, 1] - jnp.dot(c0, R[:, 1]) * c0
    c1 = c1 / jnp.linalg.norm(c1)
    c2 = jnp.cross(c0, c1)
    return jnp.stack([c0, c1, c2], axis=1)


def _skew(w):
    z = jnp.zeros_like(w[0])
    return jnp.array([[z, -w[2], w[1]],
                      [w[2], z, -w[0]],
                      [-w[1], w[0], z]])


def integrate_rigid(body: RigidBody, force, torque, dt,
                    gravity) -> RigidBody:
    """Semi-implicit Euler for the rigid state (matching the fluid's
    integrator): world-frame inertia ``R I₀ Rᵀ``, Euler's equation with the
    gyroscopic term, rotation update ``R ← orth((I + dt·[ω]×) R)``."""
    g = jnp.asarray(gravity, body.vel.dtype)
    v = body.vel + dt * (force / body.mass + g)
    com = body.com + dt * v
    Iw = body.R @ body.inertia_body @ body.R.T
    wdot = jnp.linalg.solve(
        Iw, torque - jnp.cross(body.omega, Iw @ body.omega))
    w = body.omega + dt * wdot
    R = _orthonormalize((jnp.eye(3, dtype=body.R.dtype)
                         + dt * _skew(w)) @ body.R)
    return dataclasses.replace(body, com=com, R=R, vel=v, omega=w)
