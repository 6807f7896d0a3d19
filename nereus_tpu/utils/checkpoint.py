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
                    extra: dict | None = None, bodies=None,
                    elastic=None) -> None:
    """Write the fluid state (host-gathered) and metadata to ``path``.

    ``bodies`` (optional) is a :class:`~nereus_tpu.rigid.RigidBody` or a
    sequence of them — a coupled run's dynamic bodies are part of the
    physical state and resume mid-trajectory (pose, velocities, AND the
    Akinci shell, so a resumed run needs no scene rebuild to agree
    bit-for-bit).

    ``elastic`` (optional) is one ``(ElasticState, ElasticStatics)`` pair
    or a sequence of them. Only the DYNAMIC state (pos, vel) plus the
    statics' reference configuration ``x0`` are stored: unlike a rigid
    shell, :class:`~nereus_tpu.solvers.elastic.ElasticStatics` is a
    deterministic function of the reference lattice / grid / config, so
    the resuming run rebuilds it and ``x0`` serves as an ALIGNMENT
    WITNESS — the restored (pos, vel) rows are hash-sorted by the
    reference configuration, and a resume under a different grid could
    silently permute them; callers must verify ``x0`` matches the rebuilt
    statics bit-for-bit (the CLI does)."""
    if bodies is not None and not isinstance(bodies, (tuple, list)):
        bodies = (bodies,)
    bodies = bodies or ()
    if elastic is not None and not isinstance(elastic[0], (tuple, list)):
        elastic = (elastic,)
    elastic = elastic or ()
    header = {
        "format_version": _FORMAT_VERSION,
        "step": int(step),
        "num_active": int(state.num_active) if state.num_active.ndim == 0
        else None,
        "num_bodies": len(bodies),
        "num_elastic": len(elastic),
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
    for i, (es, st) in enumerate(elastic):
        arrays[f"elastic{i}_pos"] = np.asarray(es.pos)
        arrays[f"elastic{i}_vel"] = np.asarray(es.vel)
        arrays[f"elastic{i}_x0"] = np.asarray(st.x0)
        if es.plastic is not None:  # additive key — absent = elastic body
            arrays[f"elastic{i}_plastic"] = np.asarray(es.plastic)
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


def load_checkpoint(path: str, *, return_bodies: bool = False,
                    return_elastic: bool = False):
    """Returns ``(FluidState, header_dict)``; with ``return_bodies=True``,
    appends ``bodies_tuple`` — empty tuple for checkpoints written without
    bodies (``num_bodies`` absent or 0); with ``return_elastic=True``,
    further appends a tuple of ``(ElasticState, x0_ndarray)`` pairs — the
    caller rebuilds :class:`ElasticStatics` from its scene and MUST verify
    the rebuilt ``statics.x0`` equals the stored ``x0`` bit-for-bit before
    using the restored state (row alignment witness; see
    :func:`save_checkpoint`)."""
    from ..rigid import RigidBody
    from ..solvers.elastic import ElasticState

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
        if not return_bodies and not return_elastic:
            return state, header
        out = [state, header]
        if return_bodies:
            out.append(tuple(
                RigidBody(**{f: jnp.asarray(z[f"body{i}_{f}"])
                             for f in _BODY_FIELDS})
                for i in range(header.get("num_bodies", 0))))
        if return_elastic:
            out.append(tuple(
                (ElasticState(pos=jnp.asarray(z[f"elastic{i}_pos"]),
                              vel=jnp.asarray(z[f"elastic{i}_vel"]),
                              plastic=(jnp.asarray(z[f"elastic{i}_plastic"])
                                       if f"elastic{i}_plastic" in z
                                       else None)),
                 np.asarray(z[f"elastic{i}_x0"]))
                for i in range(header.get("num_elastic", 0))))
    return tuple(out)
