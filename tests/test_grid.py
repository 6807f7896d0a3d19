"""Neighbor-engine tests (SURVEY §4 level 1): the 9-segment structure must
yield exactly the 27-cell neighborhood membership that a brute-force
computation gives."""

import jax.numpy as jnp
import numpy as np

import nereus_tpu as nt
from nereus_tpu import grid as G


def _random_setup(n=400, seed=0):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(-1.0, 1.0, (n, 3))
    grid = G.fit_grid(pos.min(axis=0), pos.max(axis=0), 0.12)
    return pos, grid


def test_cell_coords_in_range():
    pos, grid = _random_setup()
    c = np.asarray(G.cell_coords(grid, jnp.asarray(pos)))
    size = np.asarray(grid.size)
    assert np.all(c >= 0) and np.all(c < size)


def test_sort_by_hash_orders_hashes():
    pos, grid = _random_setup()
    h = G.hash_positions(grid, jnp.asarray(pos))
    sh, perm, (ps,) = G.sort_by_hash(h, jnp.asarray(pos), return_perm=True)
    sh = np.asarray(sh)
    assert np.all(np.diff(sh) >= 0)
    assert np.allclose(np.asarray(ps), pos[np.asarray(perm)])


def test_segments_cover_exact_27cell_membership():
    pos, grid = _random_setup(n=500, seed=3)
    h = G.hash_positions(grid, jnp.asarray(pos))
    sh, perm, (ps,) = G.sort_by_hash(h, jnp.asarray(pos), return_perm=True)
    coords = G.cell_coords(grid, ps)
    seg_s, seg_e = G.row_segments(grid, sh, coords)
    seg_s, seg_e = np.asarray(seg_s), np.asarray(seg_e)

    coords_np = np.asarray(coords)
    n = pos.shape[0]
    for i in range(0, n, 17):
        got = set()
        for k in range(9):
            got.update(range(seg_s[k, i], seg_e[k, i]))
        # brute force: all j whose cell is within the 3x3x3 stencil of i
        diff = np.abs(coords_np - coords_np[i])
        want = set(np.nonzero(np.all(diff <= 1, axis=1))[0].tolist())
        assert got == want, f"particle {i}: segments {got ^ want} mismatch"


def test_segments_no_duplicates():
    pos, grid = _random_setup(n=300, seed=4)
    h = G.hash_positions(grid, jnp.asarray(pos))
    sh, _, (ps,) = G.sort_by_hash(h, jnp.asarray(pos))
    coords = G.cell_coords(grid, ps)
    seg_s, seg_e = G.row_segments(grid, sh, coords)
    seg_s, seg_e = np.asarray(seg_s), np.asarray(seg_e)
    for i in range(0, 300, 23):
        all_idx = []
        for k in range(9):
            all_idx.extend(range(seg_s[k, i], seg_e[k, i]))
        assert len(all_idx) == len(set(all_idx))


def test_inactive_particles_sorted_to_tail_and_unreachable():
    pos, grid = _random_setup(n=100, seed=5)
    mask = jnp.arange(100) < 80
    h = G.hash_positions(grid, jnp.asarray(pos), mask)
    sh, _, (ps,) = G.sort_by_hash(h, jnp.asarray(pos))
    sh = np.asarray(sh)
    assert np.all(sh[80:] == np.iinfo(np.int32).max)
    coords = G.cell_coords(grid, ps[:80])
    _, seg_e = G.row_segments(grid, sh, coords)
    assert np.max(np.asarray(seg_e)) <= 80


def test_overflow_detection():
    # 50 coincident particles in one cell with a window of 8 must overflow.
    pos = np.zeros((50, 3))
    grid = G.make_grid((-1.0, -1.0, -1.0), (4, 4, 4), 0.5)
    h = G.hash_positions(grid, jnp.asarray(pos))
    sh, _, (ps,) = G.sort_by_hash(h, jnp.asarray(pos))
    coords = G.cell_coords(grid, ps)
    seg_s, seg_e = G.row_segments(grid, sh, coords)
    assert int(G.segment_overflow(seg_s, seg_e, 8)) == 42
    assert int(G.segment_overflow(seg_s, seg_e, 64)) == 0


def test_fit_grid_covers_domain():
    grid = G.fit_grid((-1.0, -1.0, -1.0), (3.0, 3.0, 3.0), 0.0537)
    # domain extent 4.0 + margin → at least 75 cells per axis
    assert np.all(np.asarray(grid.size) >= 75)
    c = G.cell_coords(grid, jnp.asarray([[2.99, 2.99, 2.99]]))
    assert np.all(np.asarray(c) < np.asarray(grid.size))


def test_fit_grid_margin_pads_both_faces():
    """The margin contract holds on the hi faces too: a particle at
    ``hi + margin/2`` (and one at ``lo − margin/2``) must land inside the
    grid WITHOUT clamping — i.e. in a cell computed from its true
    position, not an edge cell it was clipped into."""
    lo, hi, margin, cell = -1.0, 2.0, 0.1, 0.0537
    grid = G.fit_grid((lo,) * 3, (hi,) * 3, cell, margin=margin)
    for p in (hi + margin / 2, lo - margin / 2):
        pos = jnp.asarray([[p, p, p]])
        raw = np.floor((np.asarray([p] * 3) - np.asarray(grid.origin))
                       / np.asarray(grid.cell)).astype(np.int32)
        c = np.asarray(G.cell_coords(grid, pos))[0]
        np.testing.assert_array_equal(c, raw)  # unclamped == clamped
        assert np.all(c >= 0) and np.all(c < np.asarray(grid.size))


def test_refit_grid_covers_live_particles():
    import nereus_tpu as nt
    import numpy as np
    rng = np.random.default_rng(0)
    state = nt.make_fluid_state(rng.uniform(-2.0, 3.0, (200, 3)),
                                capacity=256)
    g = nt.refit_grid(state, 0.1)
    lo = np.asarray(g.origin)
    hi = lo + np.asarray(g.size) * np.asarray(g.cell)
    pos = np.asarray(state.pos)[:200]
    assert (pos > lo).all() and (pos < hi).all()
    # parked capacity slots (1e9) must NOT blow up the grid
    assert max(g.size) < 100


def test_refit_and_rehash_preserve_physics():
    """A step's physics must be invariant to the grid frame: refitting the
    grid to the live AABB (new origin/size) and re-sorting the boundary
    set (boundary.rehash_boundary) must reproduce the same next state as
    the original, larger grid — the correctness contract behind the CLI's
    --refit-every cadence."""
    import jax

    from nereus_tpu import scene
    from nereus_tpu.boundary import rehash_boundary

    cfg = nt.SimConfig(seg_window=48)
    params = nt.make_params(dt=5e-4)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.2, 0.2, 0.2), cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)
    n = int(state.num_active)

    # frame 1: a deliberately oversized grid (the situation --refit-every
    # fixes); frame 2: the refit to the live fluid+boundary AABB. Both
    # must produce identical physics. (Refitting WITHOUT the boundary is
    # the known-bad move: the shell clamps into edge cells, densifies
    # them past window coverage, and seg_overflow reports the misses.)
    ir = float(params.interaction_radius)
    g1 = nt.fit_grid(np.asarray((-0.8, -0.3, 0.0)) - 0.7,
                     np.asarray((0.2, 0.7, 1.0)) + 0.7, ir)
    b1 = rehash_boundary(boundary, g1)
    g2 = nt.refit_grid(state, ir, boundary=boundary)
    b2 = rehash_boundary(boundary, g2)
    assert tuple(g2.size) != tuple(g1.size)  # actually different frames

    s1, d1 = jax.jit(lambda s: nt.wcsph_step(s, params, g1, cfg,
                                             b1))(state)
    s2, d2 = jax.jit(lambda s: nt.wcsph_step(s, params, g2, cfg, b2))(state)
    assert int(d1.seg_overflow) == 0 and int(d2.seg_overflow) == 0

    def key(a):
        a = np.asarray(a)
        return np.lexsort((a[:, 2], a[:, 1], a[:, 0]))

    k1, k2 = key(s1.pos[:n]), key(s2.pos[:n])
    np.testing.assert_allclose(np.asarray(s2.pos[:n])[k2],
                               np.asarray(s1.pos[:n])[k1],
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.vel[:n])[k2],
                               np.asarray(s1.vel[:n])[k1],
                               rtol=0, atol=1e-5)


def test_positions_in_sorted_matches_searchsorted():
    """The hierarchical positioning path (coarse merge + two-row-gather
    refine) serves ALL production runs; it must agree exactly with
    searchsorted(side='left') — including capacities NOT divisible by
    128, where it pads the sorted input with INT32_MAX internally (a
    silent regression here corrupts window plans and only surfaces as
    seg_overflow on real hardware)."""
    from nereus_tpu.ops.pallas_neighbors import positions_in_sorted

    rng = np.random.RandomState(7)
    for c in (1024, 1153, 4096, 4223, 8191):
        data = np.sort(rng.randint(0, 5000, size=c)).astype(np.int32)
        # inactive tail sentinel, as production sorted hashes carry
        data[-c // 10:] = np.iinfo(np.int32).max
        data = np.sort(data)
        queries = rng.randint(0, 6000, size=777).astype(np.int32)
        got = np.asarray(positions_in_sorted(jnp.asarray(data),
                                             jnp.asarray(queries)))
        want = np.searchsorted(data, queries, side="left")
        np.testing.assert_array_equal(got, want, err_msg=f"c={c}")
