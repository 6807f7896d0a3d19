"""Checkpoint / resume.

The reference has no persistence at all (SURVEY §5.4 — its only "output" is
an ffmpeg video pipe). Because the whole simulation state here is a pytree
of arrays plus a frozen parameter dataclass, checkpointing is a flat
``.npz`` dump with a small JSON header — readable anywhere, no framework
dependency — with orbax available for users who want async/multi-host
checkpointing of the same pytree.
"""

from __future__ import annotations


import json

import jax
import jax.numpy as jnp
import numpy as np

from ..state import FluidState

# v2 = carries the physics-identifying config header in ``extra``
# (app.cli._run_desc); v1 files load fine but cannot be verified against
# the resuming run's config.
_FORMAT_VERSION = 2


# Per-body arrays serialized under ``body{i}_{field}`` keys. Additive to
# the v2 layout: readers that don't know about bodies simply never touch
# the extra keys, and ``num_bodies`` in the header makes their presence
# formally detectable (no probing).
_BODY_FIELDS = ("offsets", "psi", "mass", "inertia_body", "com", "R",
                "vel", "omega")


def save_checkpoint(path: str, state: FluidState, *, step: int = 0,
                    extra: dict | None = None, bodies=None) -> None:
    """Write the fluid state (host-gathered) and metadata to ``path``.

    ``bodies`` (optional) is a :class:`~nereus_tpu.rigid.RigidBody` or a
    sequence of them — a coupled run's dynamic bodies are part of the
    physical state and resume mid-trajectory (pose, velocities, AND the
    Akinci shell, so a resumed run needs no scene rebuild to agree
    bit-for-bit)."""
    if bodies is not None and not isinstance(bodies, (tuple, list)):
        bodies = (bodies,)
    bodies = bodies or ()
    header = {
        "format_version": _FORMAT_VERSION,
        "step": int(step),
        "num_active": int(state.num_active) if state.num_active.ndim == 0
        else None,
        "num_bodies": len(bodies),
        "extra": extra or {},
    }
    arrays = {
        "pos": np.asarray(state.pos),
        "vel": np.asarray(state.vel),
        "pressure": np.asarray(state.pressure),
        "num_active": np.asarray(state.num_active),
        "__header__": np.frombuffer(
            json.dumps(header).encode(), dtype=np.uint8),
    }
    if state.multiphase:
        # multiphase phase columns — additive like the bodies (readers
        # that don't know them never touch the keys)
        arrays["mass"] = np.asarray(state.mass)
        arrays["rho0"] = np.asarray(state.rho0)
    for i, b in enumerate(bodies):
        for f in _BODY_FIELDS:
            arrays[f"body{i}_{f}"] = np.asarray(getattr(b, f))
    np.savez_compressed(path, **arrays)


def save_checkpoint_orbax(path: str, state: FluidState, *, step: int = 0,
                          extra: dict | None = None) -> None:
    """Orbax-backed checkpoint (async-capable, multi-host-aware) of the
    same pytree; ``path`` must be an absolute directory path."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {
            "state": {"pos": state.pos, "vel": state.vel,
                      "pressure": state.pressure,
                      "num_active": state.num_active},
            "meta": {"step": jnp.asarray(step, jnp.int32)},
        }, force=True)


def load_checkpoint_orbax(path: str):
    """Returns ``(FluidState, step)`` from :func:`save_checkpoint_orbax`."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    s = tree["state"]
    state = FluidState(pos=jnp.asarray(s["pos"]), vel=jnp.asarray(s["vel"]),
                       pressure=jnp.asarray(s["pressure"]),
                       num_active=jnp.asarray(s["num_active"]))
    return state, int(tree["meta"]["step"])


def load_checkpoint(path: str, *, return_bodies: bool = False):
    """Returns ``(FluidState, header_dict)``; with ``return_bodies=True``,
    ``(FluidState, header_dict, bodies_tuple)`` — empty tuple for
    checkpoints written without bodies (``num_bodies`` absent or 0)."""
    from ..rigid import RigidBody

    with np.load(path) as z:
        header = json.loads(bytes(z["__header__"]).decode())
        if header["format_version"] > _FORMAT_VERSION:
            raise ValueError(
                f"checkpoint format {header['format_version']} is newer than "
                f"supported {_FORMAT_VERSION}")
        state = FluidState(
            pos=jnp.asarray(z["pos"]),
            vel=jnp.asarray(z["vel"]),
            pressure=jnp.asarray(z["pressure"]),
            num_active=jnp.asarray(z["num_active"]),
            mass=jnp.asarray(z["mass"]) if "mass" in z else None,
            rho0=jnp.asarray(z["rho0"]) if "rho0" in z else None,
        )
        if not return_bodies:
            return state, header
        bodies = tuple(
            RigidBody(**{f: jnp.asarray(z[f"body{i}_{f}"])
                         for f in _BODY_FIELDS})
            for i in range(header.get("num_bodies", 0)))
    return state, header, bodies
