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
