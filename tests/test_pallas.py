"""Pallas neighbor engine vs the jnp segment oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nereus_tpu as nt
from nereus_tpu import scene
from nereus_tpu.ops.pallas_neighbors import plan_windows
from nereus_tpu.solvers.wcsph_pallas import wcsph_step_pallas


def _scene(with_boundary, kernel_set=nt.KernelSet.MULLER,
           st=nt.SurfaceTensionModel.BECKER):
    cfg = nt.SimConfig(seg_window=48, kernel_set=kernel_set,
                       surface_tension_model=st)
    params = nt.make_params(dt=5e-4)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=with_boundary, boundary_radius=0.04)
    return cfg, params, state, grid, boundary


def test_plan_windows_covers_everything():
    cfg, params, state, grid, _ = _scene(False)
    from nereus_tpu import grid as gridlib
    from nereus_tpu.ops.pallas_neighbors import (ALIGN, DEF_BLOCK, N_WORDS, WIN, round_up)
    mask = state.active_mask()
    h = gridlib.hash_positions(grid, state.pos, mask)
    sh, _, (pos,) = gridlib.sort_by_hash(h, state.pos)
    c = pos.shape[0]
    cb = round_up(c, DEF_BLOCK)
    pos = jnp.concatenate([pos, jnp.full((cb - c, 3), 1e9, pos.dtype)])
    coords = gridlib.cell_coords(grid, pos)
    active = jnp.arange(cb) < state.num_active
    anchors, miss = plan_windows(sh, coords, grid.size, DEF_BLOCK,
                                 round_up(c, ALIGN) + WIN,
                                 active_mask=active)
    assert int(miss) == 0
    assert anchors.shape == (cb // DEF_BLOCK * 9 * N_WORDS,)


@pytest.mark.parametrize("with_boundary", [False, True])
@pytest.mark.parametrize("kernel_set,st", [
    (nt.KernelSet.MULLER, nt.SurfaceTensionModel.BECKER),
    (nt.KernelSet.MONAGHAN, nt.SurfaceTensionModel.AKINCI),
])
def test_pallas_step_matches_segments(with_boundary, kernel_set, st):
    cfg, params, state, grid, boundary = _scene(with_boundary, kernel_set, st)
    n = int(state.num_active)

    s_ref, d_ref = jax.jit(
        lambda s: nt.wcsph_step(s, params, grid, cfg, boundary))(state)
    s_pal, d_pal = jax.jit(
        lambda s: wcsph_step_pallas(s, params, grid, cfg, boundary))(state)

    assert int(d_pal.seg_overflow) == 0
    assert int(d_ref.seg_overflow) == 0

    def key(a):
        a = np.asarray(a)
        return np.lexsort((a[:, 2], a[:, 1], a[:, 0]))

    k_ref = key(s_ref.pos[:n])
    k_pal = key(s_pal.pos[:n])
    np.testing.assert_allclose(np.asarray(s_pal.pos[:n])[k_pal],
                               np.asarray(s_ref.pos[:n])[k_ref],
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_pal.vel[:n])[k_pal],
                               np.asarray(s_ref.vel[:n])[k_ref],
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(float(d_pal.mean_density_error),
                               float(d_ref.mean_density_error),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(d_pal.max_density),
                               float(d_ref.max_density), rtol=1e-4)


def test_pallas_multi_step_stability():
    cfg, params, state, grid, boundary = _scene(True)
    step = jax.jit(lambda s: wcsph_step_pallas(s, params, grid, cfg,
                                               boundary))
    for _ in range(20):
        state, diag = step(state)
    assert int(diag.seg_overflow) == 0
    assert not bool(jnp.isnan(diag.mean_density_error))
    assert np.isfinite(np.asarray(state.pos[:int(state.num_active)])).all()


def test_chunked_sweeps_match(monkeypatch):
    """Force the SMEM anchor budget tiny so sweeps split into many
    pallas_calls; results must be identical to the unchunked step."""
    from nereus_tpu.ops import pallas_neighbors as PN
    cfg, params, state, grid, boundary = _scene(True)
    s_ref, d_ref = jax.jit(
        lambda s: wcsph_step_pallas(s, params, grid, cfg, boundary))(state)
    monkeypatch.setattr(PN, "SMEM_ANCHOR_BUDGET", 3 * 18 * PN.N_WORDS * 4)
    s_chk, d_chk = jax.jit(
        lambda s: wcsph_step_pallas(s, params, grid, cfg, boundary))(state)
    assert int(d_chk.seg_overflow) == 0
    np.testing.assert_allclose(np.asarray(s_chk.pos), np.asarray(s_ref.pos),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(s_chk.vel), np.asarray(s_ref.vel),
                               rtol=0, atol=0)


@pytest.mark.parametrize("win,block", [(384, 104), (128, 48)])
def test_pallas_step_nondefault_window(win, block):
    """Non-default (sweep_win, sweep_block) combinations stay equivalent —
    the window width threads through the plan, the packers' region
    padding/gap and the kernel's ownership rule together."""
    cfg = nt.SimConfig(seg_window=48, sweep_win=win, sweep_block=block)
    params = nt.make_params(dt=5e-4)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)
    n = int(state.num_active)
    s_ref, d_ref = jax.jit(
        lambda s: nt.wcsph_step(s, params, grid, cfg, boundary))(state)
    s_pal, d_pal = jax.jit(
        lambda s: wcsph_step_pallas(s, params, grid, cfg, boundary))(state)
    assert int(d_pal.seg_overflow) == 0

    def key(a):
        a = np.asarray(a)
        return np.lexsort((a[:, 2], a[:, 1], a[:, 0]))

    k_ref = key(s_ref.pos[:n])
    k_pal = key(s_pal.pos[:n])
    np.testing.assert_allclose(np.asarray(s_pal.pos[:n])[k_pal],
                               np.asarray(s_ref.pos[:n])[k_ref],
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_pal.vel[:n])[k_pal],
                               np.asarray(s_ref.vel[:n])[k_ref],
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("kfold", [2, 4])
def test_kfold_sweeps_match(kfold):
    """sweep_kfold folds k query sub-blocks into one Mosaic grid step
    (sharing the per-grid-step fixed cost); each sub-block sweeps its
    windows in the same order as the unfolded kernel, so results must be
    bit-identical to kfold=1 — including when nb is not a kfold multiple
    (the equal-shape chunk path pads with sentinel blocks)."""
    cfg, params, state, grid, boundary = _scene(True)
    s_ref, d_ref = jax.jit(
        lambda s: wcsph_step_pallas(s, params, grid, cfg, boundary))(state)
    cfg_k = nt.SimConfig(seg_window=48, sweep_kfold=kfold)
    s_chk, d_chk = jax.jit(
        lambda s: wcsph_step_pallas(s, params, grid, cfg_k, boundary))(state)
    assert int(d_chk.seg_overflow) == 0
    np.testing.assert_allclose(np.asarray(s_chk.pos), np.asarray(s_ref.pos),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(s_chk.vel), np.asarray(s_ref.vel),
                               rtol=0, atol=0)


def test_wide_anchor_format_matches(monkeypatch):
    """Force the 32-bit anchor format (the one giant >8.38M-element
    sources use, where 16-bit packed anchors would wrap) on a small scene
    — fluid+boundary fused — and require bit-identical results to the
    default 16-bit plan."""
    from nereus_tpu.ops import pallas_neighbors as PN
    cfg, params, state, grid, boundary = _scene(True)
    s_ref, d_ref = jax.jit(
        lambda s: wcsph_step_pallas(s, params, grid, cfg, boundary))(state)
    monkeypatch.setattr(PN, "anchors_pack16", lambda *a, **k: False)
    s_chk, d_chk = jax.jit(
        lambda s: wcsph_step_pallas(s, params, grid, cfg, boundary))(state)
    assert int(d_chk.seg_overflow) == 0
    np.testing.assert_allclose(np.asarray(s_chk.pos), np.asarray(s_ref.pos),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(s_chk.vel), np.asarray(s_ref.vel),
                               rtol=0, atol=0)


def test_fused_rows_pair_sets_identical():
    """The fused 3-row windows admit extra between-cell slots that the
    pair functions' r² < h² cutoff must zero — the *contributing* pair
    set has to be exactly the 9-row one. Counting pairs (integer-valued
    sums are order-independent in f32) makes the comparison exact for
    both the fluid and the boundary window groups."""
    from nereus_tpu.ops import pallas_sph as PS
    from nereus_tpu.solvers.pallas_common import build_pallas_ctx

    def count_pair(q_ref, src_ref, valid, pv, *, kernel_set):
        _, _, _, r2 = PS._pair_geometry(q_ref, src_ref, pv)
        ok = (valid & (r2 < pv[PS.PV_H2])).astype(q_ref.dtype)
        return jnp.sum(ok, axis=1, keepdims=True)

    counts = {}
    for fused in (True, False):
        cfg = nt.SimConfig(seg_window=48, sweep_fused_rows=fused)
        params = nt.make_params(dt=5e-4)
        state, grid, boundary = scene.dam_break(
            params, cfg, cube_size=(0.25, 0.25, 0.25),
            cube_center=(-0.3, 0.05, 0.5),
            box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
            with_boundary=True, boundary_radius=0.04)

        @jax.jit
        def run(s):
            ctx = build_pallas_ctx(s, params, grid, cfg, boundary)
            q4 = ctx.queries(width=4)
            psi = jnp.full((ctx.c,), 1.0, ctx.dtype)
            src = ctx.pack(slot6=psi)
            out = PS.generic_sweep(
                cfg, count_pair, q4, src, ctx.anchors, ctx.pvec,
                ctx.gsize, out_width=1, n_rows=ctx.n_rows,
                pair_fn_b=count_pair, interpret=ctx.interp)
            return out[:, 0], ctx.miss

        c, miss = run(state)
        assert int(miss) == 0
        # compare active rows only: the two modes resolve different auto
        # sweep blocks, so the padded tail lengths differ
        counts[fused] = np.asarray(c)[:int(state.num_active)]
    np.testing.assert_array_equal(counts[True], counts[False])


def test_fused_rows_step_matches_legacy():
    """Full WCSPH step: fused 3-row windows vs the 9-row plan, with the
    fluid cube seeded IN CONTACT with the floor so boundary pairs are
    active from step one (the fused-mode regression that slipped the
    airborne scenes: ``fluid_force_sweep`` keyed its boundary pair
    function on ``n_rows > 9``, which the fused-with-boundary value 6
    fails — the fluid Tait EOS then ran over boundary ψ slots). Pair
    sets are identical; only the accumulation order differs, so
    positions/velocities must agree to float tolerance across steps."""
    cfg9 = nt.SimConfig(seg_window=48, sweep_fused_rows=False)
    params = nt.make_params(dt=5e-4)
    h = float(params.interaction_radius)
    state0, grid, boundary = scene.dam_break(
        params, cfg9, cube_size=(0.25, 0.25, 0.25),
        # bottom face ~0.02 above the y=-0.3 floor: contact from step one
        cube_center=(-0.3, -0.3 + 0.125 + 0.02, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)
    # the regression needs real boundary pairs: bottom row within h
    assert float(jnp.min(state0.pos[:int(state0.num_active), 1])) \
        < -0.3 + h
    cfg3 = nt.SimConfig(seg_window=48, sweep_fused_rows=True)
    step9 = jax.jit(
        lambda s: wcsph_step_pallas(s, params, grid, cfg9, boundary))
    step3 = jax.jit(
        lambda s: wcsph_step_pallas(s, params, grid, cfg3, boundary))
    s9 = s3 = state0
    for _ in range(5):
        s9, d9 = step9(s9)
        s3, d3 = step3(s3)
    assert int(d9.seg_overflow) == 0
    assert int(d3.seg_overflow) == 0
    np.testing.assert_allclose(np.asarray(s3.pos), np.asarray(s9.pos),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s3.vel), np.asarray(s9.vel),
                               rtol=0, atol=1e-3)


@pytest.mark.parametrize("mode", ["mod", "slice"])
def test_wide_hash_mode_matches(monkeypatch, mode):
    """Past 2²⁴ cells the engine ships cell hashes either as mod-2²⁴
    residues compared by exact f32 wraparound ("mod", production) or as
    bitcast int32 compared in integer arithmetic ("slice", debug) —
    hash_payload / _sweep_kernel wide mode. Forcing wide mode on a small
    scene must be BIT-identical to the exact-f32 path: the mask truth
    values are the same, so every accumulation is the same in the same
    order."""
    from nereus_tpu.ops import pallas_neighbors as PN

    cfg, params, state0, grid, boundary = _scene(True)

    def run():
        step = jax.jit(
            lambda s: wcsph_step_pallas(s, params, grid, cfg, boundary))
        s = state0
        for _ in range(3):
            s, d = step(s)
        return s, d

    s_ref, d_ref = run()
    monkeypatch.setattr(PN, "wide_hash_needed", lambda gsize: True)
    monkeypatch.setattr(PN, "WIDE_MODE", mode)
    s_wide, d_wide = run()
    assert int(d_wide.seg_overflow) == 0
    np.testing.assert_allclose(np.asarray(s_wide.pos),
                               np.asarray(s_ref.pos), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(s_wide.vel),
                               np.asarray(s_ref.vel), rtol=0, atol=0)


def test_wide_mod_alias_is_harmless(monkeypatch):
    """The mod wide payload intentionally ALIASES: any source whose hash
    differs from a row bound by a multiple of the modulus passes the
    in-kernel mask. Correctness rests on the plane bound
    2·gx·gy + 5·gx + 6 ≤ WIDE_MOD: close pairs then reproduce their true
    h − lo verbatim, and every aliased acceptance is ≥ one cell away so
    the r² < h² cutoff zeroes it. Shrinking WIDE_MOD to 2048 on a scene
    whose hashes span far beyond it forces heavy aliasing while keeping
    the plane bound satisfied — the result must stay BIT-identical."""
    from nereus_tpu.ops import pallas_neighbors as PN

    cfg, params, state0, grid, boundary = _scene(True)
    gx, gy, gz = grid.size
    assert grid.num_cells > 2048, "scene too small to force aliasing"
    assert 2 * gx * gy + 5 * gx + 6 <= 2048, "plane bound violated"

    def run():
        step = jax.jit(
            lambda s: wcsph_step_pallas(s, params, grid, cfg, boundary))
        s = state0
        for _ in range(3):
            s, d = step(s)
        return s, d

    s_ref, _ = run()
    monkeypatch.setattr(PN, "wide_hash_needed", lambda gsize: True)
    monkeypatch.setattr(PN, "WIDE_MODE", "mod")
    monkeypatch.setattr(PN, "WIDE_MOD", 2048)
    s_wide, d_wide = run()
    assert int(d_wide.seg_overflow) == 0
    np.testing.assert_allclose(np.asarray(s_wide.pos),
                               np.asarray(s_ref.pos), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(s_wide.vel),
                               np.asarray(s_ref.vel), rtol=0, atol=0)
