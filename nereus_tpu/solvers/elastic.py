"""Elastic solids: total-Lagrangian corrected SPH (beyond-reference).

The reference simulates fluids only; this module adds deformable elastic
bodies — the classic next SPH model family — as total-Lagrangian SPH
(Ganzenmüller 2015, "An hourglass control algorithm for Lagrangian smooth
particle hydrodynamics"; the formulation behind SPlisHSPlasH's elasticity
and LAMMPS' ``smd/tlsph``):

- Neighborhoods, kernels and kernel gradients live in the REFERENCE
  (undeformed) configuration, so the neighbor problem is solved ONCE at
  body creation — on TPU that means one hash sort + one window plan for
  the body's whole lifetime and a per-step cost of pure Pallas sweeps
  (:class:`ElasticStatics`). No tensile instability (it is an artifact of
  updated-Lagrangian SPH), no per-step ctx.
- Per particle, a corrected deformation gradient
  ``F_i = V Σ_j (x_j − x_i) ⊗ ∇W(X_ij) · C_i`` with the Randles–Libersky
  correction ``C_i = D_i⁻¹``, ``D_i = V Σ_j (X_j − X_i) ⊗ ∇W(X_ij)`` —
  exact for every affine deformation (rigid motions give F = R exactly,
  even on ragged boundary neighborhoods).
- St. Venant–Kirchhoff constitutive law on the Green strain
  ``E = ½(FᵀF − I)``: ``S = 2µE + λ tr(E) I``, ``P = F S`` — rotation
  invariant by construction (no polar decomposition needed).
- Variational forces ``f_i = V² Σ_j (P_i C_iᵀ + P_j C_jᵀ) ∇W(X_ij)`` —
  the exact negative gradient of the total strain energy, pairwise
  antisymmetric (momentum conserved to float rounding).
- Ganzenmüller hourglass control: the per-particle F is blind to
  zero-energy (hourglass) modes where pairs deviate from the local affine
  field; a penalty proportional to that deviation's projection suppresses
  them and vanishes identically for affine motion.

Both engines: this jnp segment oracle and the Pallas window-sweep path
(:mod:`.elastic_pallas`), equivalence-tested. Single-phase fluid coupling
is future work (couple through the Akinci boundary machinery).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import grid as gridlib
from .. import kernels as K
from ..ops.neighbors import neighbor_reduce
from ..params import SimConfig, SimParams


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ElasticParams:
    """Material + regularization parameters (traced floats).

    Build with :func:`elastic_params` from an engineering (E, ν) pair.
    ``hourglass`` is Ganzenmüller's α (his stable range 1–50; default 10);
    ``damping`` is a mass-proportional Rayleigh coefficient (1/s) applied
    as ``v ← v/(1 + damping·dt)`` after the force update."""

    mu: jax.Array         # first Lamé / shear modulus µ
    lam: jax.Array        # second Lamé λ
    hourglass: jax.Array  # hourglass-control α
    damping: jax.Array    # mass-proportional damping (1/s)
    floor_y: jax.Array    # ground plane (−inf = none): a conservative
                          # penalty spring — the BOUNCE of a dropped body
                          # is its own strain energy unloading, not a
                          # restitution coefficient
    box_lo: jax.Array     # (3,) tank AABB walls (±inf = none): the same
    box_hi: jax.Array     # conservative penalty spring on all 6 faces,
                          # so a floating body stays inside the tank
                          # (composes with floor_y; the fluid contact
                          # keeps it off the walls in water — these catch
                          # dry contact and splash-out)
    yield_strain: jax.Array  # von Mises yield threshold γ_y on
                             # ‖dev(E_el)‖_F (inf = pure elastic)
    creep: jax.Array         # plastic flow rate ν (1/s); ν·dt ≥ 1 is an
                             # instantaneous radial return to the yield
                             # surface, smaller values creep toward it
    max_plastic: jax.Array   # cap γ_max on ‖E_p‖_F (inf = unbounded)


def elastic_params(young: float, poisson: float = 0.3, *,
                   hourglass: float = 10.0, damping: float = 0.0,
                   floor_y: float = -jnp.inf, box_lo=None, box_hi=None,
                   yield_strain: float = jnp.inf, creep: float = jnp.inf,
                   max_plastic: float = jnp.inf,
                   dtype=jnp.float32) -> ElasticParams:
    """Lamé constants from Young's modulus / Poisson ratio.

    ``yield_strain``/``creep``/``max_plastic`` parameterize the additive
    Green-strain plasticity (O'Brien, Bargteil & Hodgins 2002, "Graphical
    modeling and animation of ductile fracture" §3; von Mises flow). They
    only act on bodies built with ``make_elastic_solid(plastic=True)``."""
    e, nu = float(young), float(poisson)
    mu = e / (2.0 * (1.0 + nu))
    lam = e * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    s = lambda v: jnp.asarray(v, dtype)  # noqa: E731
    inf3 = jnp.full((3,), jnp.inf, dtype)
    return ElasticParams(mu=s(mu), lam=s(lam), hourglass=s(hourglass),
                         damping=s(damping), floor_y=s(floor_y),
                         box_lo=-inf3 if box_lo is None else s(box_lo),
                         box_hi=inf3 if box_hi is None else s(box_hi),
                         yield_strain=s(yield_strain), creep=s(creep),
                         max_plastic=s(max_plastic))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ElasticState:
    """Dynamic elastic-body state (arrays are (N, ...), hash-sorted by the
    REFERENCE configuration at creation — the order never changes)."""

    pos: jax.Array   # (N, 3) current positions
    vel: jax.Array   # (N, 3)
    plastic: Optional[jax.Array] = None  # (N, 3, 3) accumulated plastic
    # Green strain E_p (traceless by construction — von Mises flow is
    # deviatoric, so volumetric response stays elastic). None = the pure
    # elastic fast path (no per-step constitutive extra work at all).

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ElasticStatics:
    """Everything solved once at body creation: the reference-configuration
    neighbor problem (sorted hashes + window plan) and the corrected
    kernel-gradient matrices. Pass alongside the state to every step."""

    x0: jax.Array           # (N, 3) reference positions, hash-sorted
    sorted_hash: jax.Array  # (N,) int32 ascending (oracle segments)
    hash_f32: jax.Array     # (N,) Pallas hash payload
    anchors: jax.Array      # static window plan (Pallas)
    miss: jax.Array         # () int32 plan-coverage misses (0 = exact)
    corr: jax.Array         # (N, 3, 3) C_i = D_i⁻¹ gradient correction
    fixed: jax.Array        # (N,) bool — kinematically pinned particles
    vol: jax.Array          # () particle rest volume V = spacing³
    mass: jax.Array         # () particle mass = ρ₀ V
    # Window width the static plan was built with (0 = the SimConfig
    # default). Solid lattices (spacing h/2, 8/cell) outgrow the fluid
    # defaults at scale — make_elastic_solid escalates until the plan
    # covers every reference pair and records the width here so the
    # sweeps fetch matching windows.
    win: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def n(self) -> int:
        return self.x0.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ElasticDiagnostics:
    elastic_energy: jax.Array   # Σ V ψ(E) — StVK strain energy
    max_stretch: jax.Array      # max_i ‖F_i − I‖_∞ (deformation magnitude)
    max_speed: jax.Array
    seg_overflow: jax.Array     # oracle window truncation / plan misses


def sample_box_solid(lo, hi, spacing: float) -> np.ndarray:
    """Cubic-lattice particle block for an elastic body (host-side)."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    counts = np.maximum((np.floor((hi - lo) / spacing)).astype(int) + 1, 1)
    axes = [lo[k] + spacing * np.arange(counts[k]) for k in range(3)]
    g = np.meshgrid(*axes, indexing="ij")
    return np.stack([a.reshape(-1) for a in g], axis=1).astype(np.float32)


def _inv3(m, eps: float = 1e-6):
    """Batched closed-form 3×3 inverse with identity fallback for
    (near-)singular matrices (isolated particles, degenerate sheets).
    D is dimensionless and O(1) for healthy interiors, so an absolute
    determinant floor is meaningful."""
    a = m
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = (a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02)
    adj = jnp.stack([
        jnp.stack([c00, c10, c20], axis=-1),
        jnp.stack([c01, c11, c21], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ], axis=-2)
    ok = jnp.abs(det) > eps
    inv = adj / jnp.where(ok, det, 1.0)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=m.dtype), m.shape)
    return jnp.where(ok[..., None, None], inv, eye)


def plastic_flow(e_total, plastic, ep: ElasticParams, dt):
    """Von Mises plastic flow on the additive Green-strain split
    ``E = E_el + E_p`` (O'Brien/Bargteil/Hodgins 2002 §3): when the
    deviatoric elastic strain exceeds ``yield_strain``, the excess flows
    into ``E_p`` at rate ``creep`` (ν·dt ≥ 1 = instantaneous radial
    return), capped at ``max_plastic``. The increment is deviatoric, so
    ``tr(E_p) = 0`` for all time — volume change stays elastic. Returns
    ``(E_el, E_p_new)``; per-particle batched 3×3 math, no sweeps."""
    eye = jnp.eye(3, dtype=e_total.dtype)
    eps = jnp.asarray(1e-20, e_total.dtype)
    e_el = e_total - plastic
    dev = e_el - (jnp.einsum("naa->n", e_el) / 3.0)[:, None, None] * eye
    mag = jnp.sqrt(jnp.maximum(jnp.einsum("nab,nab->n", dev, dev), eps))
    over = jnp.maximum(mag - ep.yield_strain, 0.0)   # γ_y = inf → 0
    # creep=inf (instant radial return) with dt=0 would mint inf*0=NaN
    rate = jnp.where(jnp.isfinite(ep.creep),
                     jnp.minimum(ep.creep * dt, 1.0), 1.0)
    p_new = plastic + (rate * over / mag)[:, None, None] * dev
    pmag = jnp.sqrt(jnp.maximum(
        jnp.einsum("nab,nab->n", p_new, p_new), eps))
    scale = jnp.minimum(ep.max_plastic / pmag, 1.0)  # γ_max = inf → 1
    p_new = scale[:, None, None] * p_new
    return e_total - p_new, p_new


def stress_pc(f, corr, ep: ElasticParams, plastic=None, dt=None):
    """Per-particle constitutive update (batched 3×3 — negligible next to
    the sweeps): Green strain E, StVK stress P = F(2µE_el + λ tr(E_el) I),
    and the force-ready product PC = P·Cᵀ. With ``plastic`` (the (N,3,3)
    accumulated plastic strain) the stress reads the return-mapped elastic
    part E_el = E − E_p′ (:func:`plastic_flow`). Returns
    ``(PC, E_el, E_p′)`` (``E_p′`` is None on the elastic fast path)."""
    eye = jnp.eye(3, dtype=f.dtype)
    e = 0.5 * (jnp.einsum("nba,nbc->nac", f, f) - eye)
    p_new = None
    if plastic is not None:
        e, p_new = plastic_flow(e, plastic, ep, dt)
    tr = jnp.einsum("naa->n", e)
    s = 2.0 * ep.mu * e + (ep.lam * tr)[:, None, None] * eye
    p = jnp.einsum("nab,nbc->nac", f, s)
    pc = jnp.einsum("nab,ncb->nac", p, corr)
    return pc, e, p_new


def strain_energy(e, ep: ElasticParams, vol):
    """Total StVK strain energy Σ V (µ E:E + λ/2 tr²E)."""
    ee = jnp.einsum("nab,nab->n", e, e)
    tr = jnp.einsum("naa->n", e)
    return vol * jnp.sum(ep.mu * ee + 0.5 * ep.lam * tr * tr)


def make_elastic_solid(positions, params: SimParams, cfg: SimConfig,
                       spacing: float, *, grid: Optional[gridlib.Grid] = None,
                       fixed=None, density=None, plastic: bool = False):
    """Build an elastic body: hash-sort the reference configuration, plan
    its (lifetime-static) neighbor windows, and precompute the gradient
    corrections. Returns ``(state, statics, grid)``.

    ``positions``: (N, 3) reference lattice (see :func:`sample_box_solid`);
    ``spacing``: its lattice constant (sets V = spacing³, m = ρ₀V);
    ``fixed``: optional (N,) bool of kinematically pinned particles;
    ``density``: optional body density (defaults to the fluid ρ₀ —
    neutrally buoyant under coupling);
    ``grid``: optional — default fits the reference AABB (the plan lives in
    reference space, so the body may MOVE arbitrarily far outside it)."""
    pos = jnp.asarray(positions, cfg.dtype)
    n = pos.shape[0]
    if grid is None:
        h = float(np.asarray(params.interaction_radius))
        grid = gridlib.fit_grid(np.asarray(pos).min(0), np.asarray(pos).max(0),
                                h, margin=2.0 * h, dtype=cfg.dtype)
    fx = (jnp.zeros((n,), bool) if fixed is None
          else jnp.asarray(fixed, bool))
    hashes = gridlib.hash_positions(grid, pos,
                                    jnp.ones((n,), bool))
    px, py, pz = (pos[:, k] for k in range(3))
    sorted_hash, _, (px, py, pz, fxs) = gridlib.sort_by_hash(
        hashes, px, py, pz, fx.astype(cfg.dtype))
    x0 = jnp.stack([px, py, pz], axis=1)
    vol = jnp.asarray(spacing, cfg.dtype) ** 3
    mass = (params.rest_density if density is None
            else jnp.asarray(density, cfg.dtype)) * vol

    from ..ops.pallas_neighbors import hash_payload
    from .elastic_pallas import build_elastic_plan, f_gradient_sweep
    anchors, miss = build_elastic_plan(x0, sorted_hash, grid, cfg)
    # The plan is lifetime-static and built host-side, so a coverage gap
    # is checkable NOW (a fluid plan's misses are per-step diagnostics —
    # here they would silently drop reference pairs forever, and a
    # truncated pair set breaks force antisymmetry, the exponential-
    # rest-noise failure documented for the segment engine below).
    # Solid lattices at spacing h/2 pack ~8 particles/cell — 4× the
    # fluid the SimConfig window defaults assume — so escalate the
    # window width until coverage is exact. (measured: the 80³ block at
    # the fluid defaults missed 35k reference pairs per sweep.)
    win_used = 0
    if int(np.asarray(miss)) > 0:
        from ..ops.pallas_neighbors import rows3_supported
        base = cfg.resolve_win(
            cfg.sweep_fused_rows and rows3_supported(grid.size))
        # escalate in 128-lane increments: the plan is built once per
        # body, but every per-step sweep pays the chosen width in slots
        # — the smallest covering window is worth a few extra host-side
        # plan builds (a 1024 window where 640 suffices is +60% slots
        # on the three sweeps that dominate the elastic step)
        win_try = base
        while True:
            win_try += 128
            anchors, miss = build_elastic_plan(x0, sorted_hash, grid, cfg,
                                               win_override=win_try)
            if int(np.asarray(miss)) == 0:
                win_used = win_try
                break
            if win_try >= 8192:
                raise ValueError(
                    f"elastic reference plan still misses "
                    f"{int(np.asarray(miss))} pairs at window width "
                    f"{win_try} — reference lattice too dense for the "
                    "window engine; use a coarser spacing")
    statics = ElasticStatics(
        x0=x0, sorted_hash=sorted_hash,
        hash_f32=hash_payload(sorted_hash, cfg.dtype, grid.size),
        anchors=anchors, miss=miss,
        corr=jnp.broadcast_to(jnp.eye(3, dtype=cfg.dtype), (n, 3, 3)),
        fixed=fxs > 0.5, vol=vol, mass=mass, win=win_used)

    if not cfg.use_pallas():
        # The segment oracle's window is a STATIC capacity; solid lattices
        # (spacing ~h/2) are denser than the fluid seeding the default 32
        # assumes. Truncation would not just drop pairs — it breaks the
        # force pairs' antisymmetry (i sees j, j's window misses i) and the
        # resulting non-conservative ghost forces grow rest-state noise
        # EXPONENTIALLY (measured: 1e-7 perturbation → joules in 0.05 s).
        seg_s, seg_e = _segments(statics, grid)
        need = int(jnp.max(seg_e - seg_s))
        if need > cfg.seg_window:
            raise ValueError(
                f"elastic reference neighborhoods need seg_window >= "
                f"{need} (cfg has {cfg.seg_window}): build with "
                f"SimConfig(seg_window={need}) for the segment engine")

    # D_i via the same accumulator that computes F per step, evaluated at
    # x = X (identity correction) — then C = D⁻¹ makes F(rest) = I exactly.
    if cfg.use_pallas():
        raw = f_gradient_sweep(statics, x0, params, grid, cfg)
    else:
        raw = _f_gradient_oracle(statics, x0, params, grid, cfg)
    d = vol * raw.reshape(n, 3, 3)
    statics = dataclasses.replace(statics, corr=_inv3(d))
    state = ElasticState(
        pos=x0, vel=jnp.zeros_like(x0),
        plastic=jnp.zeros((n, 3, 3), cfg.dtype) if plastic else None)
    return state, statics, grid


# ---------------------------------------------------------------------------
# jnp segment oracle
# ---------------------------------------------------------------------------

def _segments(statics: ElasticStatics, grid: gridlib.Grid):
    coords = gridlib.cell_coords(grid, statics.x0)
    return gridlib.row_segments(grid, statics.sorted_hash, coords)


def _grad_w(cfg: SimConfig, params: SimParams, dX):
    """∇W(X_ij) vectors, (N, K, 3)."""
    return K.w_pressure_grad(cfg.kernel_set, dX, params)


def _f_gradient_oracle(statics, cur, params, grid, cfg):
    """Σ_j (x_j − x_i) ⊗ ∇W(X_ij) over reference segments, (N, 9)."""
    seg_s, seg_e = _segments(statics, grid)
    x0 = statics.x0

    def pair(i, j, valid):
        dX = i["x0"][:, None, :] - j["x0"]              # (N, K, 3)
        g = _grad_w(cfg, params, dX)
        dc = j["x"] - i["x"][:, None, :]
        out = dc[..., :, None] * g[..., None, :]        # (N, K, 3, 3)
        m = valid[..., None, None]
        return {"f": jnp.where(m, out, 0.0).reshape(*out.shape[:2], 9)}

    acc = neighbor_reduce(
        pair, {"f": jnp.zeros((x0.shape[0], 9), cfg.dtype)},
        seg_s, seg_e, {"x0": x0, "x": cur},
        {"x0": x0, "x": cur}, window=cfg.seg_window)
    return acc["f"]


def _force_oracle(statics, pc, params, grid, cfg):
    seg_s, seg_e = _segments(statics, grid)
    x0 = statics.x0

    def pair(i, j, valid):
        dX = i["x0"][:, None, :] - j["x0"]
        g = _grad_w(cfg, params, dX)
        m = (i["pc"][:, None, :, :] + j["pc"])          # (N, K, 3, 3)
        f = jnp.einsum("nkab,nkb->nka", m, g)
        return {"f": jnp.where(valid[..., None], f, 0.0)}

    acc = neighbor_reduce(
        pair, {"f": jnp.zeros_like(x0)},
        seg_s, seg_e, {"x0": x0, "pc": pc},
        {"x0": x0, "pc": pc}, window=cfg.seg_window)
    return acc["f"]


def _hourglass_oracle(statics, cur, f_mat, params, grid, cfg):
    seg_s, seg_e = _segments(statics, grid)
    x0 = statics.x0
    eps2 = 1e-24

    def pair(i, j, valid):
        dX = i["x0"][:, None, :] - j["x0"]              # X_i − X_j
        r2 = jnp.sum(dX * dX, axis=-1)
        w = K.w_value(cfg.kernel_set, dX, params)
        dc = i["x"][:, None, :] - j["x"]                # x_i − x_j
        rc2 = jnp.sum(dc * dc, axis=-1)
        invrc = jax.lax.rsqrt(jnp.maximum(rc2, eps2))
        fi = jnp.einsum("nab,nkb->nka", i["f"], dX)
        fj = jnp.einsum("nkab,nkb->nka", j["f"], dX)
        raw = jnp.sum((fi + fj - 2.0 * dc) * dc, axis=-1)
        ok = valid & (r2 > 0)
        coef = jnp.where(ok, 0.5 * w / jnp.maximum(r2, eps2) * raw
                         * invrc * invrc, 0.0)
        return {"f": coef[..., None] * dc}

    acc = neighbor_reduce(
        pair, {"f": jnp.zeros_like(x0)},
        seg_s, seg_e, {"x0": x0, "x": cur, "f": f_mat},
        {"x0": x0, "x": cur, "f": f_mat}, window=cfg.seg_window)
    return acc["f"]


def elastic_step(state: ElasticState, statics: ElasticStatics,
                 params: SimParams, ep: ElasticParams,
                 grid: gridlib.Grid, cfg: SimConfig, f_ext=None):
    """One symplectic-Euler elastic step; returns ``(state, diagnostics)``.

    ``f_ext`` (optional (N, 3)): external per-particle forces held fixed
    over the step — the fluid→solid reaction of the coupled step.
    Dispatches to the Pallas engine per ``SimConfig.engine`` (this jnp
    segment path is the everywhere-correct oracle)."""
    if cfg.use_pallas():
        from .elastic_pallas import elastic_step_pallas
        return elastic_step_pallas(state, statics, params, ep, grid, cfg,
                                   f_ext=f_ext)
    n = statics.n
    vol = statics.vol
    raw = _f_gradient_oracle(statics, state.pos, params, grid, cfg)
    f = jnp.einsum("nab,nbc->nac", vol * raw.reshape(n, 3, 3), statics.corr)
    pc, e, pl = stress_pc(f, statics.corr, ep, state.plastic, params.dt)
    f_el = (vol * vol) * _force_oracle(statics, pc, params, grid, cfg)
    f_hg = (ep.hourglass * vol * vol) * _hourglass_oracle(
        statics, state.pos, f, params, grid, cfg)
    seg_s, seg_e = _segments(statics, grid)
    seg_over = gridlib.segment_overflow(seg_s, seg_e, cfg.seg_window)
    force = f_el + f_hg if f_ext is None else f_el + f_hg + f_ext
    return _integrate(state, statics, params, ep, force, f, e, seg_over,
                      plastic=pl)


def _integrate(state, statics, params, ep, force, f_mat, e, seg_over,
               plastic=None):
    dt = params.dt
    mass = statics.mass
    g = params.gravity
    acc = force / mass + g[None, :]
    # ground plane as a conservative penalty spring with ω·dt = 0.2 (auto-
    # stable under symplectic Euler; static penetration g·dt²/0.04 ≈ µm).
    # A position PROJECTION here is an energy pump — each contact step it
    # does work against the loaded contact layer (measured: a dropped cube
    # gained 300× its potential energy) — while the spring is exactly
    # conservative: the bounce is strain energy unloading, dissipation is
    # the material damping's job.
    depth = jnp.maximum(ep.floor_y - state.pos[:, 1], 0.0)
    omega = 0.2 / dt
    acc = acc.at[:, 1].add(omega * omega * depth)
    # tank AABB walls: the identical conservative spring on all 6 faces
    # (±inf defaults make both terms exactly 0 — max(-inf-x, 0) = 0)
    acc = acc + (omega * omega) * (
        jnp.maximum(ep.box_lo[None, :] - state.pos, 0.0)
        - jnp.maximum(state.pos - ep.box_hi[None, :], 0.0))
    nv = (state.vel + dt * acc) / (1.0 + ep.damping * dt)
    nv = jnp.where(statics.fixed[:, None], 0.0, nv)
    np_ = state.pos + dt * nv
    eye = jnp.eye(3, dtype=f_mat.dtype)
    diag = ElasticDiagnostics(
        elastic_energy=strain_energy(e, ep, statics.vol),
        max_stretch=jnp.max(jnp.abs(f_mat - eye)),
        max_speed=jnp.sqrt(jnp.max(jnp.sum(nv * nv, axis=1))),
        seg_overflow=seg_over)
    return ElasticState(pos=np_, vel=nv, plastic=plastic), diag
