"""Scene construction: particle seeding and canonical demo scenes.

Rebuilds the reference's host-side seeding (``SPH::generateParticleCube`` /
``addNewParticle``, ``sph/sph.cpp:341-386``) and the demo scene of
``main.cpp:533-555`` (IISPH + 0.5³ fluid cube + box boundary shell).
"""

from __future__ import annotations

import numpy as np

from . import boundary as bnd
from . import grid as gridlib
from .params import SimConfig, SimParams
from .state import make_fluid_state


def particle_cube(center, size, spacing):
    """Lattice of particles filling an axis-aligned cube.

    Mirrors ``generateParticleCube`` (``sph/sph.cpp:373-386``): inclusive
    loops from center−size/2 to center+size/2 at the given spacing (the demo
    uses spacing = interactionRadius − 0.005, ``sph.cpp:375``).
    """
    center = np.asarray(center, dtype=np.float64)
    size = np.asarray(size, dtype=np.float64)
    axes = [np.arange(c - s / 2.0, c + s / 2.0 + spacing * 0.5, spacing)
            for c, s in zip(center, size)]
    xx, yy, zz = np.meshgrid(*axes, indexing="ij")
    return np.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=-1)


def resting_block(params: SimParams, cfg: SimConfig, *,
                  n_target: int | None = None,
                  side: float | None = None,
                  capacity: int | None = None,
                  boundary_radius: float = 0.02,
                  spacing: float | None = None,
                  compress: float = 0.003,
                  impact_velocity: float = 0.0):
    """A fluid block at rest-density packing on the floor of a boundary box.

    The free-fall dam-break starts with nothing opposing gravity, so an
    implicit pressure solve has (almost) no work for its first dozens of
    steps — benchmarks seeded from it price the predict phase plus the
    configured minimum iterations only. Here the block sits on the floor
    at lattice spacing ``spacing`` (default 0.8·h) compressed by
    ``compress`` in *density* (spacing × (1+compress)^(−⅓)): real
    compression exists from the very first predicted advection, so
    IISPH/PCISPH iterate for real — the situation the reference's host
    loop was written for (``sph/sph_cuda.cu:736-823``).

    IMPORTANT: pass ``calibrate_mass(params, cfg, spacing=spacing)``
    params so the uncompressed lattice sums to exactly ρ₀. With the raw
    reference masses the lattice is percent-level off rest density and an
    incompressible solver ejects the imbalance at hundreds of m/s in the
    first steps (measured: particles leave the grid, clamp into edge
    cells and overflow the boundary window plan). ``compress = 0.003``
    keeps the initial correction velocities ~1 m/s.

    The box hugs the block: walls TWO spacings outside the fluid on every
    face (see the gap comment below — one spacing is measured unstable),
    headroom of half a block above. The solve work therefore comes from
    the seeded compression and the impact velocity, with floor contact
    developing over the first steps. Returns ``(state, grid, boundary)``.
    """
    if spacing is None:
        spacing = 0.8 * float(params.interaction_radius)
    spacing = spacing * float(1.0 + compress) ** (-1.0 / 3.0)
    if side is None:
        side = spacing * ((n_target or 8000) ** (1.0 / 3.0))
    # Two lattice spacings of standoff between fluid and every wall —
    # measured, not arbitrary: at one spacing the floor is inside the
    # kernel support from step 0 and the wall term stacks onto the
    # lattice compression, the 100-iteration cap can't solve it and the
    # block destabilizes within 10 steps (CPU probe: vmax 600+ m/s,
    # floor penetration). At two spacings the compression wave (and the
    # optional impact velocity) does the solver work while contact
    # develops over the first steps.
    gap = 2.0 * spacing
    box_min = (0.0, 0.0, 0.0)
    box_max = (side + 2 * gap, 1.5 * side + gap, side + 2 * gap)
    cube_center = (gap + side / 2.0, gap + side / 2.0, gap + side / 2.0)
    pts = particle_cube(cube_center, (side, side, side), spacing)
    grid = gridlib.fit_grid(box_min, box_max,
                            float(params.interaction_radius),
                            dtype=cfg.dtype)
    # A downward bulk velocity makes the pressure solve SUSTAINED: a
    # settled hydrostatic state with warm-started pressure genuinely
    # converges in ~min iters after the first step; an impact in progress
    # sends a compression wave up the column that the solver fights every
    # step (the dam-break-impact regime the reference's host loop was
    # written for).
    vel = None
    if impact_velocity:
        vel = np.broadcast_to(
            np.asarray([0.0, impact_velocity, 0.0]), pts.shape)
    state = make_fluid_state(pts, velocities=vel, capacity=capacity,
                             dtype=cfg.dtype)
    boundary = bnd.box_boundary(grid, box_min, box_max, boundary_radius,
                                params, cfg.kernel_set, dtype=cfg.dtype)
    return state, grid, boundary


def dam_break(params: SimParams, cfg: SimConfig, *,
              n_target: int | None = None,
              cube_center=(-0.4, 0.04, 0.5),
              cube_size=(0.5, 0.5, 0.5),
              box_min=(-1.0, -1.0, -1.0),
              box_max=(3.0, 3.0, 3.0),
              with_boundary: bool = True,
              capacity: int | None = None,
              capacity_factor: float = 1.0,
              boundary_radius: float = 0.02):
    """The demo scene (``main.cpp:533-555``): a fluid cube inside a boundary
    box. If ``n_target`` is given, the cube is scaled (at fixed spacing) to
    hit roughly that particle count — used by the staged BASELINE configs.

    Returns ``(state, grid, boundary_or_none)``.
    """
    spacing = float(params.interaction_radius) - 0.005
    if n_target is not None:
        side = spacing * (n_target ** (1.0 / 3.0))
        cube_size = (side, side, side)
        lo = np.minimum(np.asarray(cube_center) - side / 2.0 - 4 * spacing,
                        np.asarray(box_min))
        hi = np.maximum(np.asarray(cube_center) + side / 2.0 + 4 * spacing,
                        np.asarray(box_max))
        box_min, box_max = tuple(lo), tuple(hi)
    pts = particle_cube(cube_center, cube_size, spacing)
    grid = gridlib.fit_grid(box_min, box_max, float(params.interaction_radius),
                            dtype=cfg.dtype)
    if capacity is None and capacity_factor > 1.0:
        capacity = int(len(pts) * capacity_factor)
    state = make_fluid_state(pts, capacity=capacity, dtype=cfg.dtype)
    boundary = None
    if with_boundary:
        boundary = bnd.box_boundary(grid, box_min, box_max, boundary_radius,
                                    params, cfg.kernel_set, dtype=cfg.dtype)
    return state, grid, boundary
