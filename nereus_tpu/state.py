"""Particle state pytrees.

The reference keeps particle state as ~20 flat SoA device arrays with a fixed
capacity ``MAX_PARTICLE_NUMBER = 150000`` and a live count ``m_numParticles``
(``sph/sph.h:19,100-118``). The TPU-native analogue is a single pytree of
``(capacity, ...)`` float arrays plus a traced ``num_active`` count: shapes
stay static for XLA while the live count may change per step (particle
dropping, ``main.cpp:499-521``). Inactive slots are hashed to a sentinel so
every sort pushes them to the tail and segment windows never touch them.

Solver scratch (IISPH's 12 extra arrays, ``iisph.h:28-41``; PCISPH's 5,
``pcisph.h:28-34``) is *not* carried in the state: it is recomputed inside
the jitted step, where XLA materialises it only transiently.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FluidState:
    """Dynamic fluid-particle state. Arrays are (capacity, ...).

    ``mass``/``rho0`` (optional, beyond-reference) carry per-particle
    masses and rest densities for MULTIPHASE scenes (oil on water —
    several fluids with different densities in one solve). ``None`` (the
    default) is a trace-time switch: the solvers compile the single-phase
    fast path with the scalar ``SimParams.particle_mass``/``rest_density``
    and zero extra work. Both are set together (``make_fluid_state``
    enforces it); multiphase is supported by the WCSPH solver (both
    engines) — the other solvers refuse it explicitly.
    """

    pos: jax.Array        # (C, 3)
    vel: jax.Array        # (C, 3)
    pressure: jax.Array   # (C,)  carried across steps: IISPH seeds p0 = p_prev/2
    num_active: jax.Array # () int32
    mass: jax.Array | None = None   # (C,) per-particle mass (multiphase)
    rho0: jax.Array | None = None   # (C,) per-particle rest density

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    @property
    def multiphase(self) -> bool:
        """Static trace-time switch: per-particle mass/ρ₀ present."""
        return self.mass is not None

    def active_mask(self):
        return jnp.arange(self.capacity) < self.num_active


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BoundaryData:
    """Rigid boundary particles, sorted by cell hash.

    Analogue of the boundary arrays built by ``SPH::updateGpuBoundaries``
    (``sph/sph.cpp:391-432``): positions + Akinci ψ = ρ₀·V_bi per particle
    (ψ use sites: ``sph_kernel_impl.cuh:349,573``). ``sorted_hash`` replaces
    the boundary cellStart/cellEnd tables — fluid particles binary-search it
    per step for their 9 boundary row segments.

    ``vel`` (optional, beyond-reference) carries prescribed rigid-motion
    velocities for moving boundaries (wavemaker piston, moving gate — see
    :func:`nereus_tpu.boundary.move_boundary`). ``None`` means a static
    boundary (the reference's only mode); the solvers then compile the
    zero-velocity fast path. With velocities present they enter every
    velocity-dependent boundary term: WCSPH friction Π ∝ max((v_i−v_b)·r, 0),
    the IISPH ρ_adv divergence, and the DFSPH Δρ divergence.
    """

    pos: jax.Array         # (M, 3) sorted by cell hash
    psi: jax.Array         # (M,)   rest_density * vbi, sorted
    sorted_hash: jax.Array # (M,)   int32, ascending
    vel: jax.Array | None = None   # (M, 3) prescribed velocities, sorted

    @property
    def num_boundaries(self) -> int:
        return self.pos.shape[0]


def _append_phase_cols(state: FluidState, k: int, start, masses, rho0s):
    """New (mass, rho0) columns with k entries written at ``start``;
    defaults to the first live particle's values (same-phase emission)."""
    if state.mass is None:
        if masses is not None or rho0s is not None:
            raise ValueError(
                "per-particle masses on a single-phase state — build the "
                "state with make_fluid_state(..., masses=, rest_densities=)")
        return None, None
    m_new = jnp.full((k,), masses if masses is not None else state.mass[0],
                     state.mass.dtype)
    r_new = jnp.full((k,), rho0s if rho0s is not None else state.rho0[0],
                     state.rho0.dtype)
    return (jax.lax.dynamic_update_slice(state.mass, m_new, (start,)),
            jax.lax.dynamic_update_slice(state.rho0, r_new, (start,)))


def add_particles(state: FluidState, positions, velocities=None,
                  masses=None, rest_densities=None) -> FluidState:
    """Append live particles into free capacity slots.

    The analogue of the demo's particle dropping
    (``drop_more_particles``/``addNewParticle``, ``main.cpp:499-521`` /
    ``sph/sph.cpp:341-368``) — which, upstream, can silently run past
    ``MAX_PARTICLE_NUMBER`` (SURVEY §5 defect list); here exceeding the
    static capacity raises.
    """
    positions = jnp.asarray(positions, dtype=state.pos.dtype)
    k = positions.shape[0]
    n = int(state.num_active)
    if n + k > state.capacity:
        raise ValueError(
            f"adding {k} particles exceeds capacity "
            f"{state.capacity} (live: {n})")
    if velocities is None:
        velocities = jnp.zeros_like(positions)
    velocities = jnp.broadcast_to(
        jnp.asarray(velocities, dtype=state.vel.dtype), positions.shape)
    m2, r2 = _append_phase_cols(state, k, n, masses, rest_densities)
    return FluidState(
        pos=jax.lax.dynamic_update_slice(state.pos, positions, (n, 0)),
        vel=jax.lax.dynamic_update_slice(state.vel, velocities, (n, 0)),
        pressure=state.pressure,
        num_active=state.num_active + k,
        mass=m2, rho0=r2,
    )


def add_particles_traced(state: FluidState, positions, velocities=None):
    """Jit-friendly emission: ``add_particles`` with a traced live count.

    Inside a jitted step (or a ``lax.fori_loop``-chained run) the host
    ``int(num_active)`` sync and the Python ``raise`` of
    :func:`add_particles` are unavailable; this version writes the k new
    particles at slots ``[n, n+k)`` with ``dynamic_update_slice`` and, when
    they would not fit, emits NOTHING and reports it — returns
    ``(new_state, overflow)`` where overflow is the number of particles
    that could not be emitted (0 on success), an on-device diagnostic in
    the same spirit as ``seg_overflow``.
    """
    positions = jnp.asarray(positions, dtype=state.pos.dtype)
    k = positions.shape[0]
    if velocities is None:
        velocities = jnp.zeros_like(positions)
    velocities = jnp.broadcast_to(
        jnp.asarray(velocities, dtype=state.vel.dtype), positions.shape)
    n = state.num_active
    ok = n + k <= state.capacity
    # clamp the write start so the slice stays in bounds even when the
    # emission is rejected (the select below discards the write then)
    start = jnp.minimum(n, state.capacity - k).astype(jnp.int32)
    pos2 = jax.lax.dynamic_update_slice(state.pos, positions, (start, 0))
    vel2 = jax.lax.dynamic_update_slice(state.vel, velocities, (start, 0))
    m2, r2 = _append_phase_cols(state, k, start, None, None)
    new = FluidState(
        pos=jnp.where(ok, pos2, state.pos),
        vel=jnp.where(ok, vel2, state.vel),
        pressure=state.pressure,
        num_active=jnp.where(ok, n + k, n).astype(n.dtype),
        mass=jnp.where(ok, m2, state.mass) if m2 is not None else None,
        rho0=jnp.where(ok, r2, state.rho0) if r2 is not None else None,
    )
    overflow = jnp.where(ok, 0, k).astype(jnp.int32)
    return new, overflow


def remove_particles(state: FluidState, keep) -> FluidState:
    """Deactivate particles where ``keep`` is False (open-boundary
    outflow, drains — beyond-reference: the upstream app only ever ADDS
    particles, ``sph/sph.cpp:341-368``).

    Fully traced and jit-friendly (``num_active`` is already a traced
    value, so a changing live count never recompiles): ONE stable variadic
    sort moves the keepers to the front in their original relative order
    (the same no-gather pattern as ``grid.sort_by_hash``), the dropped
    slots are parked at the sentinel position, and the live count drops to
    the number of keepers.

    ``keep`` — (capacity,) bool; slots already inactive stay inactive.
    """
    import jax.numpy as _jnp
    keep = _jnp.asarray(keep, bool) & state.active_mask()
    key = (~keep).astype(_jnp.int32)   # keepers (0) sort before dropped (1)
    ops = (key,
           state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
           state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
           state.pressure)
    if state.mass is not None:
        ops += (state.mass, state.rho0)
    out = jax.lax.sort(ops, num_keys=1, is_stable=True)
    new_n = _jnp.sum(keep).astype(state.num_active.dtype)
    live = _jnp.arange(state.capacity) < new_n
    pos = _jnp.where(live[:, None], _jnp.stack(out[1:4], axis=0).T, 1e9)
    vel = _jnp.where(live[:, None], _jnp.stack(out[4:7], axis=0).T, 0.0)
    pres = _jnp.where(live, out[7], 0.0)
    return FluidState(pos=pos.astype(state.pos.dtype),
                      vel=vel.astype(state.vel.dtype),
                      pressure=pres.astype(state.pressure.dtype),
                      num_active=new_n,
                      mass=out[8] if state.mass is not None else None,
                      rho0=out[9] if state.mass is not None else None)


def make_fluid_state(positions, velocities=None, capacity=None,
                     dtype=jnp.float32, masses=None,
                     rest_densities=None) -> FluidState:
    """Build a FluidState from host arrays, padding to ``capacity``.

    Pad slots are parked at a large coordinate so they also stay out of the
    way of any brute-force reference computation in tests.

    ``masses``/``rest_densities`` (both together, scalar or (n,)) build a
    MULTIPHASE state: per-particle mass and rest density enter the WCSPH
    density/EOS/force discretization (see ``solvers/wcsph.py``). Seed each
    phase at ITS OWN rest spacing (m = ρ₀·spacing³ per the same mass
    calibration single-phase scenes use) or the initial imbalance is real
    compression the solver will eject.
    """
    positions = np.asarray(positions, dtype=np.float64)
    n = positions.shape[0]
    if velocities is None:
        velocities = np.zeros_like(positions)
    velocities = np.broadcast_to(np.asarray(velocities, dtype=np.float64),
                                 positions.shape)
    if capacity is None:
        capacity = n
    assert capacity >= n, "capacity smaller than particle count"
    if (masses is None) != (rest_densities is None):
        raise ValueError("masses and rest_densities must be set together")
    pos = np.full((capacity, 3), 1e9, dtype=np.float64)
    vel = np.zeros((capacity, 3), dtype=np.float64)
    pos[:n] = positions
    vel[:n] = velocities
    mass = rho0 = None
    if masses is not None:
        m = np.broadcast_to(np.asarray(masses, np.float64), (n,))
        r0 = np.broadcast_to(np.asarray(rest_densities, np.float64), (n,))
        # pad slots take the first particle's phase (they never enter any
        # sum; a finite value keeps pair math NaN-free by construction)
        mass = np.full((capacity,), m[0] if n else 1.0)
        rho0 = np.full((capacity,), r0[0] if n else 1.0)
        mass[:n] = m
        rho0[:n] = r0
        mass = jnp.asarray(mass, dtype=dtype)
        rho0 = jnp.asarray(rho0, dtype=dtype)
    return FluidState(
        pos=jnp.asarray(pos, dtype=dtype),
        vel=jnp.asarray(vel, dtype=dtype),
        pressure=jnp.zeros((capacity,), dtype=dtype),
        num_active=jnp.asarray(n, dtype=jnp.int32),
        mass=mass, rho0=rho0,
    )
