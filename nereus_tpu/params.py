"""Simulation parameters for the Nereus-TPU SPH framework.

TPU-native analogue of the reference's single POD parameter block
(``common/sph_kernel.cuh:13-59``, struct SphSimParams) that the CUDA build
uploads to ``__constant__`` memory before every step (``sph/sph_cuda.cu:183-187``).

Here the split is idiomatic JAX:

* :class:`SimConfig` — *static* (hashable) compile-time switches. These mirror
  the reference's CMake-injected ``#define``s (``CMakeLists.txt:25-28``):
  ``KERNEL_SET`` (Monaghan vs Müller), ``USE_SURFACE_TENSION``,
  ``DOUBLE_PRECISION`` — plus the static capacities a static-shape program
  needs (candidate-window size, solver iteration caps).
* :class:`SimParams` — a pytree of scalars traced into ``jit``, so physics
  parameters (dt, stiffness, gravity, ...) can change without recompilation.
  Derived smoothing-kernel normalisation constants are precomputed on the host
  exactly like the reference does at construction (``sph/sph.cpp:73-86``).
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class KernelSet(enum.Enum):
    """Smoothing-kernel family switch (reference: ``common/common.h:14-15``)."""

    MONAGHAN = 0
    MULLER = 1


class SurfaceTensionModel(enum.Enum):
    """Which surface-tension formulation the force pass uses.

    The reference hard-wires an inline Becker-style term
    (``sph/sph_kernel_impl.cuh:535-546``) behind ``USE_SURFACE_TENSION``; its
    Akinci cohesion kernels exist but are dead code
    (``common/kernels_impl.cuh:208-247``). We implement both as live options.
    """

    NONE = 0
    BECKER = 1
    AKINCI = 2


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static compilation switches. Hashable; closed over by jit."""

    kernel_set: KernelSet = KernelSet.MULLER
    surface_tension_model: SurfaceTensionModel = SurfaceTensionModel.BECKER
    dtype: jnp.dtype = jnp.float32
    # Neighbor-engine selection: "segments" = jnp windowed gathers (correct
    # everywhere, slow on TPU); "pallas" = the gather-free Pallas window
    # kernels (ops/pallas_neighbors.py); "auto" = pallas on TPU backends,
    # segments elsewhere.
    engine: str = "auto"
    # Particles per Pallas sweep block (multiple of 8) and window width
    # (multiple of 128 lanes; 0 = auto per row mode). Scan-tuned on the
    # real chip at 1M (bigger blocks amortize the span's ±1-cell fringe
    # and alignment waste, but past ~256 the force pair's live
    # temporaries spill) — retune after kernel changes.
    sweep_block: int = 0
    sweep_win: int = 0
    # Fused 3-row windows: one contiguous window per dz covering all 3
    # y-rows (~0.55× slots, ~0.27× window DMAs at 1M vs the 9-row plan).
    # Auto-falls back to 9-row on grids too small for the non-overlap
    # guarantee (ops/pallas_neighbors.rows3_supported).
    sweep_fused_rows: bool = True
    # Query sub-blocks folded into one Mosaic grid step (the per-grid-step
    # fixed cost is shared by the group; lets small high-occupancy blocks
    # win — see ops/pallas_neighbors._sweep_kernel and tools/occupancy.py).
    sweep_kfold: int = 1
    # Candidate-window size per 3-cell row segment (static shape for the
    # 27-cell gather; see ops/neighbors.py). Must be >= the longest run of
    # particles in any 3 consecutive x-cells; overflow is detected at runtime.
    seg_window: int = 32
    # Same, for gathers against the static boundary-particle set.
    boundary_seg_window: int = 48
    # IISPH relaxed-Jacobi caps (the reference's host loop has no max;
    # ``sph/sph_cuda.cu:736-741`` enforces min 2 iterations).
    iisph_min_iters: int = 2
    iisph_max_iters: int = 100
    # PCISPH predictive-corrective iteration count (reference intended this
    # loop but left it a stub: ``sph/sph_cuda.cu:944-952``).
    pcisph_min_iters: int = 3
    pcisph_max_iters: int = 100
    # Warm-start the corrective loop from half the previous step's
    # converged pressure (state.pressure) — one extra pressure-force
    # sweep before the loop buys several iterations (= 2 sweeps each)
    # on settled scenes. Half, not full: the loop only ever ADDS
    # non-negative increments (Solenthaler's clamped ρ*−ρ₀), so an
    # overshoot could never relax back down. First step (pressure 0)
    # is identical to cold.
    pcisph_warm_start: bool = True
    # Warm-start fraction of the previous converged pressure. 0.5 is the
    # safe default (the loop only ADDS — see above); the settled bench
    # row measures the higher-risk fractions before any default change.
    pcisph_warm_frac: float = 0.5
    # DFSPH (beyond-reference solver, Bender & Koschier 2015/2017):
    # constant-density and divergence-free loop caps.
    dfsph_min_iters: int = 2
    dfsph_max_iters: int = 100
    dfsph_min_iters_v: int = 1
    dfsph_max_iters_v: int = 100
    # Warm-start the constant-density solve with half the previous step's
    # accumulated stiffness (Bender & Koschier 2017 §3.3): one extra κ
    # application before the loop, typically saving ≥1 iteration (= two
    # sweeps) per settled step. state.pressure carries the accumulated κ.
    dfsph_warm_start: bool = True
    # PBF (beyond-reference solver, Macklin & Müller 2013): fixed Jacobi
    # iteration count (the real-time convention — no tolerance loop),
    # anti-clustering pressure scorr = −k·(W/W(Δq·h))⁴ (k = 0 disables),
    # and the λ-denominator relaxation ε. k default 0.001, NOT the
    # paper's 0.1: scorr acts even at rest (it's what inflates the
    # lattice slightly past rest spacing), and with this framework's
    # sparse-neighborhood convention (rest spacing 0.75h, not the
    # paper's ~0.5h) k=0.1 shoves a free-falling cube's edges 8× the
    # ½gt² drop (measured; k=0.001 → 1.4× on the edge-most particle,
    # rest density error < 0.01%).
    pbf_iters: int = 4
    pbf_scorr_k: float = 0.001
    pbf_scorr_dq: float = 0.2
    pbf_eps: float = 100.0
    # Strong fluid–rigid coupling (beyond-reference, Gissler et al. 2019
    # flavoured): add each rigid body's MOBILITY to the DFSPH factor's
    # diagonal — per particle i and body k, pm·(|g|²/M + t·I⁻¹·t) with
    # g = Σ_b ψ_b ∇W_ib and t = (x_i − com)×g (central impulses). The
    # static-source α overestimates the achievable correction when the
    # body yields, which is the classic added-mass divergence for light
    # floaters (added/body mass ≳ 10); the mobility term restores the
    # true diagonal. Costs nothing: g is already computed per body.
    dfsph_strong_coupling: bool = True
    # Viscosity model for the DFSPH non-pressure stage (beyond-reference):
    # "explicit" = the reference's Müller viscous force; "implicit" =
    # Weiler et al. 2018's matrix-free CG solve of (I − dt·ν∇²)v = v* —
    # unconditionally stable for high viscosity (honey/lava regimes where
    # the explicit term demands tiny dt). params.viscosity is read as the
    # kinematic viscosity ν in implicit mode.
    viscosity_model: str = "explicit"
    visc_cg_max_iters: int = 100
    visc_cg_tol: float = 1e-4   # relative residual ‖r‖/‖b‖
    # Multiphase surface tension (beyond-reference): with BECKER + phase
    # columns, the pairwise cohesion −κ·min(W, W_diam)·r⃗ applies at full
    # strength within a phase and scaled by ``st_cross`` across phases
    # (same-phase iff ρ0_i == ρ0_j — the columns are bit-identical
    # copies, exact compare is sound). 0 = fully immiscible cohesion
    # (sharp interfaces, beading); 1 = phase-blind (the single-phase
    # term). Reduces EXACTLY to single-phase BECKER at uniform phase for
    # any value. AKINCI stays single-phase-only (its 2ρ₀/(ρi+ρj)
    # curvature correction has no per-phase meaning).
    st_cross: float = 0.0

    def __post_init__(self):
        object.__setattr__(self, "dtype", jnp.dtype(self.dtype))

    def __hash__(self):
        return hash((self.kernel_set, self.surface_tension_model,
                     str(self.dtype), self.seg_window, self.boundary_seg_window,
                     self.iisph_min_iters, self.iisph_max_iters,
                     self.pcisph_min_iters, self.pcisph_max_iters,
                     self.pcisph_warm_start, self.pcisph_warm_frac,
                     self.dfsph_min_iters, self.dfsph_max_iters,
                     self.dfsph_min_iters_v, self.dfsph_max_iters_v,
                     self.dfsph_warm_start, self.pbf_iters,
                     self.pbf_scorr_k, self.pbf_scorr_dq, self.pbf_eps,
                     self.viscosity_model, self.visc_cg_max_iters,
                     self.visc_cg_tol, self.dfsph_strong_coupling,
                     self.engine, self.sweep_block, self.sweep_win,
                     self.sweep_kfold, self.sweep_fused_rows,
                     self.st_cross))

    def resolve_win(self, rows3: bool) -> int:
        """Effective window width: an explicit ``sweep_win`` wins; auto is
        512 for fused 3-row windows (mean span ≈ 450 at block 176/1M — one
        pass covers most windows) and 256 for the 9-row plan. Fused spans
        scale with the grid's x-extent: past ~190³ grids the 3×512
        coverage can miss (surfaced as ``seg_overflow`` > 0, measured at
        8M/10M dam-break) — set 640 there (bench.py does)."""
        if self.sweep_win:
            return self.sweep_win
        return 512 if rows3 else 256

    def resolve_block(self, rows3: bool) -> int:
        """Effective sweep block: an explicit ``sweep_block`` wins; auto
        is the real-chip 1M scan optimum per row mode (152 fused — the
        wider fused windows shift the force pair's live-temporary spill
        point down from the 9-row mode's 176)."""
        if self.sweep_block:
            return self.sweep_block
        return 152 if rows3 else 176

    def use_pallas(self) -> bool:
        import jax
        if self.engine == "pallas":
            return True
        if self.engine == "segments":
            return False
        return jax.default_backend() == "tpu"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SimParams:
    """Dynamic physics parameters — a pytree of scalars traced into jit.

    Field-for-field analogue of ``SphSimParams`` (``common/sph_kernel.cuh:13-59``)
    minus the grid block (which lives in :class:`nereus_tpu.grid.Grid`).
    """

    gas_stiffness: jax.Array      # Tait EOS k            (sph.cpp:37)
    rest_density: jax.Array       # rho0                  (sph.cpp:38)
    particle_radius: jax.Array    #                       (sph.cpp:39)
    dt: jax.Array                 # timestep              (sph.cpp:40)
    viscosity: jax.Array          #                       (sph.cpp:41)
    surface_tension: jax.Array    # kappa                 (sph.cpp:42)
    gravity: jax.Array            # (3,)                  (sph.cpp:44-47)
    interaction_radius: jax.Array # smoothing length h    (sph.cpp:49)
    particle_mass: jax.Array      #                       (sph.cpp:50)
    beta: jax.Array               # boundary adhesion     (sph.cpp:52)
    sound_speed: jax.Array        #                       (sph.cpp:57-60)
    # Precomputed smoothing-kernel normalisation constants (sph.cpp:73-86).
    kpoly: jax.Array
    kpoly_grad: jax.Array
    kpress_grad: jax.Array
    kvisc_grad: jax.Array
    kvisc_denum: jax.Array
    ksurf1: jax.Array
    ksurf2: jax.Array
    bpol: jax.Array


def make_params(
    *,
    gas_stiffness: float = 800.0,
    rest_density: float = 1000.0,
    particle_radius: float = 0.02,
    dt: float = 1e-3,
    viscosity: float = 0.005,
    surface_tension: float = 0.01,
    gravity: Tuple[float, float, float] = (0.0, -9.81, 0.0),
    interaction_radius: float = 0.0457,
    particle_mass: float | None = None,
    mass_factor: float = 0.5,
    beta: float = 450.0,
    sound_speed: float | None = None,
    dtype=jnp.float32,
) -> SimParams:
    """Build :class:`SimParams` with WCSPH defaults (``sph/sph.cpp:29-93``).

    ``particle_mass`` defaults to ``mass_factor * h**3 * rho0`` (sph.cpp:50;
    PCISPH uses mass_factor=1.0, ``sph/pcisph/pcisph.cpp:49``). The default
    ``sound_speed`` follows the WCSPH eta/H derivation at ``sph.cpp:57-60``.
    Kernel normalisations are precomputed in float64 on the host, then cast.
    """
    h = float(interaction_radius)
    if particle_mass is None:
        particle_mass = mass_factor * h**3 * rest_density
    if sound_speed is None:
        eta, height = 0.01, 0.1
        vf = math.sqrt(2.0 * 9.81 * height)
        sound_speed = vf / math.sqrt(eta)

    pi = math.pi
    consts = dict(
        kpoly=315.0 / (64.0 * pi * h**9),
        kpoly_grad=-945.0 / (32.0 * pi * h**9),
        kpress_grad=-45.0 / (pi * h**6),
        kvisc_grad=15.0 / (2.0 * pi * h**3),
        kvisc_denum=2.0 * h**3,
        ksurf1=32.0 / (pi * h**9),
        ksurf2=h**6 / 64.0,
        bpol=0.007 / h**3.25,
    )

    def s(x):
        return jnp.asarray(x, dtype=dtype)

    return SimParams(
        gas_stiffness=s(gas_stiffness),
        rest_density=s(rest_density),
        particle_radius=s(particle_radius),
        dt=s(dt),
        viscosity=s(viscosity),
        surface_tension=s(surface_tension),
        gravity=s(np.asarray(gravity)),
        interaction_radius=s(h),
        particle_mass=s(particle_mass),
        beta=s(beta),
        sound_speed=s(sound_speed),
        **{k: s(v) for k, v in consts.items()},
    )


def calibrate_mass(params: SimParams, cfg: "SimConfig",
                   spacing: float | None = None) -> SimParams:
    """Return params with particle mass set so a rest lattice sums to ρ₀.

    m = ρ₀ / Σ_k W(r_k) over a cubic prototype lattice of the given spacing
    (default: one particle diameter), including the self term. The reference
    never calibrates: its PCISPH mass m = h³ρ₀ (``pcisph.cpp:48-51``) makes
    the poly6 *self-contribution alone* 1.566·ρ₀, which is unusable by any
    density-error-driven solver — unnoticed upstream because its PCISPH solve
    is an empty stub (``sph/sph_cuda.cu:944-952``). Density-consistent mass
    is required for the full predictive-corrective loop we implement.
    """
    from . import kernels as K  # local import to avoid a cycle

    h = float(params.interaction_radius)
    if spacing is None:
        spacing = 2.0 * float(params.particle_radius)
    support = h if cfg.kernel_set == KernelSet.MULLER else 2.0 * h
    k = int(math.ceil(support / spacing)) + 1
    ax = np.arange(-k, k + 1) * spacing
    xx, yy, zz = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=-1)
    r2 = np.sum(pts * pts, axis=-1)
    pts = pts[r2 <= support * support]  # includes the origin (self term)
    w_sum = float(np.sum(np.asarray(
        K.w_value(cfg.kernel_set, jnp.asarray(pts, params.kpoly.dtype), params))))
    m = float(params.rest_density) / w_sum
    return dataclasses.replace(
        params, particle_mass=jnp.asarray(m, params.particle_mass.dtype))


def iisph_params(**overrides) -> SimParams:
    """IISPH default parameter set (``sph/iisph/iisph.cpp:37-80``)."""
    defaults = dict(
        viscosity=0.01,
        surface_tension=0.01,
        interaction_radius=0.0537,
        beta=1050.0,
        mass_factor=0.5,
    )
    defaults.update(overrides)
    return make_params(**defaults)


def dfsph_params(**overrides) -> SimParams:
    """DFSPH default parameter set (beyond-reference solver; physical
    parameters follow the IISPH defaults, ``sph/iisph/iisph.cpp:37-80``,
    since DFSPH replaces only the pressure solve)."""
    defaults = dict(
        viscosity=0.01,
        surface_tension=0.01,
        interaction_radius=0.0537,
        beta=1050.0,
        mass_factor=0.5,
    )
    defaults.update(overrides)
    return make_params(**defaults)


def pbf_params(**overrides) -> SimParams:
    """PBF default parameter set (beyond-reference solver; physical
    parameters follow the IISPH defaults like :func:`dfsph_params` —
    PBF replaces only the pressure projection). ALWAYS calibrate the
    mass (``calibrate_mass``): the density constraint C = ρ/ρ₀ − 1 is
    meaningless on a lattice that doesn't sum to ρ₀ (the CLI does this
    automatically for ``--solver pbf``)."""
    defaults = dict(
        viscosity=0.01,
        surface_tension=0.01,
        interaction_radius=0.0537,
        beta=1050.0,
        mass_factor=0.5,
    )
    defaults.update(overrides)
    return make_params(**defaults)


def pcisph_params(**overrides) -> SimParams:
    """PCISPH default parameter set (``sph/pcisph/pcisph.cpp:37-80``).

    Note the reference's PCISPH mass has no 0.5 factor (pcisph.cpp:49).
    """
    defaults = dict(
        viscosity=0.005,
        surface_tension=0.0001,
        interaction_radius=0.0537,
        beta=650.0,
        mass_factor=1.0,
    )
    defaults.update(overrides)
    return make_params(**defaults)
