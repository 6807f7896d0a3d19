"""Pallas TPU neighbor-sweep engine: gather-free SPH pair reductions.

The jnp segment engine (``ops/neighbors.py``) expresses each SPH pass as 9
windowed gathers per particle — correct everywhere, but XLA lowers both the
gathers and the per-particle ``searchsorted`` segment queries to row/element
gathers that run ~100× below HBM bandwidth on TPU, making them >95% of step
time. This engine eliminates both, using one observation about the
hash-sorted particle array (hash = (z·gy + y)·gx + x, x fastest):

  For a *block* of B consecutive sorted particles and one (dy, dz) row
  offset, the union of the particles' neighbor ranges is a contiguous span
  of the sorted source array of size ≈ B + O(cell occupancy) — consecutive
  query rows map to consecutive source rows. The only discontinuity is a
  z-plane crossing inside the block, which splits the span in two.

Per (block, row-offset) the plan locates that span with **block-level**
positioning (one batched sort-merge pass — hundreds of times fewer
lookups than per-particle searchsorted) and covers it with up to
``N_PASS`` lane-aligned windows. Windows are fetched by the Mosaic
pipeline through a scalar-prefetched, data-dependent ``pl.Element``
BlockSpec (the block-sparse-attention pattern), and pair validity is
decided **inside the kernel** by comparing each source's cell hash
(shipped as a window field) against per-query row hash bounds recomputed
from the query's position — no per-particle segment arrays exist at all:

    grid = (num_blocks, n_rows row offsets)
    src windows (rows, WIN)·N_PASS at element columns anchor(b, r, p)·ALIGN
                (one BlockSpec per pass; swept in-kernel by a python loop)
    query block (B, Fq)  at row b·B   (revisited across r)
    out block   (B, Fo)  at row b·B   (accumulated across r)

The pass dimension deliberately lives INSIDE the kernel, not in the grid:
each Mosaic grid step costs ~1 µs of fixed overhead (measured at 1M
particles) and most passes beyond the first are sentinel-skipped, so a
(nb · rows · pass) grid paid that overhead three times per (block, row).
Each pass only owns columns ≥ the previous pass's window end, so
overlapping windows never double-count a pair; unused passes carry a
sentinel and skip all compute (their BlockSpec fetches a dummy window at
column 0). Sources a block needs that fall outside every window are
*counted* by the plan and surfaced through the step diagnostics
(``seg_overflow``) — never silently dropped.

Sources are packed field-major with the cell hash (as float32 — exact for
grids up to 2²⁴ cells) in the last row; default layout (8, M): x, y, z,
vx, vy, vz, dens-or-ψ, hash. With a boundary set, a *fused* source
concatenates a fluid region and a boundary region separated by a ≥ WIN
gap of invalid-hash columns; rows 0-8 of the (then 18-row) plan address
the fluid region and rows 9-17 the boundary region, each with its own
pair formula, in one kernel launch. Anchor plans are 16-bit-packed into
the ~1MB SMEM scalar-prefetch budget; beyond it, sweeps transparently
chunk into multiple calls over disjoint query-block ranges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 256          # window width (lanes; multiple of the 128-lane tile)
ALIGN = 128        # Mosaic requires window starts aligned to the lane tile
DEF_BLOCK = 176    # particles per block (sublanes; multiple of 8)
N_PASS = 3         # windows per (block, row); unused ones sentinel-skip
N_WORDS = (N_PASS + 1) // 2   # anchors are 16-bit-packed, 2 per int32
N_ROWS = 9
SMEM_ANCHOR_BUDGET = 800 * 1024   # anchor-plan bytes per pallas_call (SMEM)
PARK_LIMIT = 1e8   # positions beyond this are parked/inactive slots


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Row hash bounds (shared definition: jnp plan + in-kernel masks)
# ---------------------------------------------------------------------------

def _coords_xyz(coords):
    """Accept cell coords as an (..., 3) int32 array or an (x, y, z) tuple
    of columns (the lane-padding-free form the solver ctx uses)."""
    if isinstance(coords, tuple):
        return coords
    return coords[..., 0], coords[..., 1], coords[..., 2]


def row_hash_bounds(coords, gsize, r):
    """[lo, hi] cell-hash bounds of row offset ``r`` for query cells.

    coords: (..., 3) int32 or (x, y, z) column tuple; gsize: (gx, gy, gz)
    python ints; r: row index 0..8 mapping to (dy, dz) = (r%3−1, r//3−1).
    Out-of-grid rows return lo > hi (empty).
    """
    gx, gy, gz = gsize
    dy = r % 3 - 1
    dz = r // 3 - 1
    x, y, z = _coords_xyz(coords)
    yy = y + dy
    zz = z + dz
    base = (zz * gy + yy) * gx
    lo = base + jnp.maximum(x - 1, 0)
    hi = base + jnp.minimum(x + 1, gx - 1)
    invalid = (yy < 0) | (yy >= gy) | (zz < 0) | (zz >= gz)
    lo = jnp.where(invalid, 1, lo)
    hi = jnp.where(invalid, 0, hi)
    return lo, hi


def row3_hash_bounds(coords, gsize, r):
    """[lo, hi] hash SPAN of fused row ``r`` (dz = r−1): all 3 y-rows of
    one z-plane in a single contiguous window.

    The span [(zz·gy + y − 1)·gx + xlo, (zz·gy + y + 1)·gx + xhi] covers
    the 9 neighbor cells of plane zz *plus* the between-cells of the two
    full x-rows in between. Admitting those extras is exact: every pair
    function applies the ``r² < h²`` radius cutoff (or the equivalent
    poly6 clamp), and any particle in a non-neighbor cell is ≥ one cell
    size (= h) away, so its contribution is exactly 0 — the contributing
    pair set is identical to the 9-row mask. y is deliberately NOT
    clamped at grid edges: the wrapped hash ranges only ever admit
    geometrically-far sources (again 0), and a clamp would cost two more
    per-slot selects in the kernel.

    Correctness requires the per-query spans of adjacent dz to not
    overlap — gx·gy ≥ 2·gx + 3 (:func:`rows3_supported`) — so no pair
    can be admitted by two windows; within one window the multi-pass
    ownership rule already prevents double counting.
    """
    gx, gy, gz = gsize
    dz = r - 1
    x, y, z = _coords_xyz(coords)
    zz = z + dz
    base = (zz * gy + y) * gx
    lo = base + (jnp.maximum(x - 1, 0) - gx)
    hi = base + (jnp.minimum(x + 1, gx - 1) + gx)
    invalid = (zz < 0) | (zz >= gz)
    lo = jnp.where(invalid, 1, lo)
    hi = jnp.where(invalid, 0, hi)
    return lo, hi


def rows3_supported(gsize) -> bool:
    """Fused 3-row windows need adjacent-dz spans (width 2·gx+3, separated
    by gx·gy) to never overlap for one query — else a real pair lands in
    two windows and double-counts."""
    gx, gy, _ = gsize
    return gx * gy >= 2 * gx + 3


def wide_hash_needed(gsize) -> bool:
    """True when cell hashes (and the fused-row span bounds, which reach
    ``hash + 2·gx + 3``) exceed the 2²⁴ exact-integer range of float32 —
    the kernel then compares hashes as int32 (:func:`hash_payload`)."""
    gx, gy, gz = gsize
    return gx * gy * gz + 2 * gx + 3 > 2 ** 24


WIDE_BIAS = 1 << 23   # added to every wide payload (and, in-kernel, to
                      # the int32 bounds — compares are shift-invariant):
                      # with the sentinel clamp below, every bit pattern
                      # in the bitcast hash row lands in
                      # [0x00800000, 0x20800000] — strictly normal,
                      # positive, finite floats. Unbiased payloads put
                      # hashes < 2²³ in denormal space and the inactive
                      # INT32_MAX sentinel at a NaN (0x7FFFFFFF): any
                      # DMA/relayout stage that flushes denormals or
                      # canonicalizes NaNs silently corrupts the mask.
                      # Settable to 0 (tools/wideprobe.py "raw" mode) to
                      # measure the unbiased path on real hardware.
_WIDE_CLAMP = 1 << 29  # inactive-sentinel clamp before biasing; must
                       # exceed every possible row bound, enforced by
                       # check_pallas_dtype (and already the plan's
                       # sort-merge _KEY_CAP)


WIDE_MOD = 1 << 24    # modulus of the "mod" wide mode: payloads are
                      # h mod 2²⁴ — every value an ordinary small-integer
                      # float32 (exact, no denormal/NaN bit patterns can
                      # exist), unlike the bitcast modes below whose raw
                      # int bits dropped pairs on real hardware (round-4
                      # tail-deficit incident, CLAUDE.md).

WIDE_MODE = "mod"     # wide-payload strategy past 2²⁴ cells; the non-"mod"
                      # values are debug knobs (tools/wideprobe.py) kept
                      # for bisecting on real hardware:
                      #   "mod"     — production: ship h mod 2²⁴ as plain
                      #               f32; the kernel accepts a slot iff
                      #               ((h_m − lo mod 2²⁴) mod 2²⁴) ≤ hi−lo.
                      #               EXACT for every pair that can
                      #               contribute: a close pair's true
                      #               h − lo is reproduced verbatim by the
                      #               mod arithmetic whenever
                      #               2·gx·gy + 5·gx + 6 ≤ 2²⁴ (enforced by
                      #               check_pallas_dtype — a bound on the
                      #               xy PLANE only; total cells are free
                      #               to the 2²⁹ plan cap), and any aliased
                      #               acceptance is ≥ one cell size away so
                      #               its contribution is exactly 0 through
                      #               the r² < h² cutoff (the fused-row
                      #               between-cell argument).
                      #   "slice"   — bitcast int32: slice the (1, WIN)
                      #               hash row, then bitcast it to int32
                      #   "full"    — bitcast the whole (rows, WIN) block
                      #               to int32, then slice the hash row
                      #               (dodges a (1, WIN) slice+bitcast
                      #               lowering if that is the defect)
                      #   "convert" — ship a plain float payload (exact
                      #               < 2²⁴ only) and value-convert it
                      #               in-kernel; isolates bitcast-payload
                      #               transport from int32 compare/bounds


def hash_payload(sorted_hash, dtype, gsize):
    """Cell-hash row for the packed source matrix.

    Below 2²⁴ cells the int32 hash converts exactly to float32 (f64 is
    exact to 2⁵³ — never wide). Past it, the default "mod" mode ships
    ``h mod 2²⁴`` — exact small-integer floats; the kernel reconstructs
    each slot's true ``h − lo`` by modular wraparound (see ``WIDE_MODE``).
    The bitcast modes instead ride the int32 BITS on the float32 row
    (kernel bitcasts back, compares in int32); no arithmetic may ever
    touch a bitcast payload as float — many hash bit patterns are
    denormal/NaN floats, and real hardware was observed dropping a
    subset of them in transit (round-4 tail-deficit incident).
    """
    if dtype == jnp.float32 and wide_hash_needed(gsize):
        if WIDE_MODE == "mod":
            hm = jnp.bitwise_and(sorted_hash.astype(jnp.int32),
                                 jnp.int32(WIDE_MOD - 1))
            return hm.astype(dtype)
        if WIDE_MODE == "convert":
            return sorted_hash.astype(dtype)
        h = sorted_hash.astype(jnp.int32)
        if WIDE_BIAS:
            # clamp the INT32_MAX inactive sentinel below the bias
            # headroom, then shift every payload into normal-float bit
            # space (see WIDE_BIAS) — the kernel biases its bounds to
            # match
            h = jnp.minimum(h, jnp.int32(_WIDE_CLAMP)) + jnp.int32(
                WIDE_BIAS)
        return jax.lax.bitcast_convert_type(h, jnp.float32)
    return sorted_hash.astype(dtype)


# ---------------------------------------------------------------------------
# Window planning
# ---------------------------------------------------------------------------

_MERGE_THRESHOLD = 8_192    # above this, (hierarchical) sort-merge beats
                            # searchsorted's ~log2(N) element-gather rounds
_KEY_CAP = jnp.int32(2 ** 29)


def _positions_merge(sorted_hash, queries):
    """``searchsorted(sorted_hash, queries, side='left')`` via sort-merge.

    TPU lowers ``searchsorted`` to ~log₂N rounds of element gathers at a few
    GB/s; for large query batches one combined sort + scan is several times
    faster. Query keys are doubled-and-even so ties sort *before* equal data
    (= side='left'); I32_MAX sentinels clamp above the key cap so positions
    always land before the inactive tail. Hash values must stay below 2²⁹
    (≈ 5.4e8 cells — far beyond any realistic grid).
    """
    c = sorted_hash.shape[0]
    data_keys = jnp.minimum(sorted_hash, _KEY_CAP) * 2 + 1
    q_keys = jnp.clip(queries, 0, _KEY_CAP - 1) * 2
    order = jnp.argsort(jnp.concatenate([data_keys, q_keys]))
    isq = (order >= c).astype(jnp.int32)
    qrank = jax.lax.associative_scan(jnp.add, isq)   # inclusive
    data_before = (jnp.arange(order.shape[0], dtype=jnp.int32)
                   - qrank + 1)
    inv = jnp.argsort(order)
    return data_before[inv[c:]]


_COARSE = 128   # hierarchical positioning: data stride per coarse entry


def positions_in_sorted(sorted_hash, queries):
    """``searchsorted(sorted_hash, queries, side='left')``, hierarchical.

    The plain sort-merge pays two argsorts of (data + queries); when the
    data array dwarfs the query batch (1M sorted hashes vs ~220k plan
    bounds), subsample the data at stride 128 instead: merge the queries
    against the 128× smaller coarse array, then refine with ONE contiguous
    two-row gather per query — every element before coarse row ``pc−1`` is
    provably < q, so the exact position is ``(pc−1)·128`` plus a masked
    count over rows pc−1 and pc. Row gathers are the fast kind of gather
    (~0.165 G rows/s); the element-gather searchsorted stays unthinkably
    slow (CLAUDE.md).
    """
    c = sorted_hash.shape[0]
    if c < 8 * _COARSE:
        return _positions_merge(sorted_hash, queries)
    pad = (-c) % _COARSE
    if pad:
        # Pad to a row multiple with INT32_MAX (the same sentinel the
        # inactive tail already carries): pad keys sort after every
        # clamped query key, so side='left' positions are unchanged.
        # Without this, any capacity not divisible by 128 silently fell
        # back to the full-array sort-merge (two ~1.3M argsorts at 1M).
        sorted_hash = jnp.concatenate(
            [sorted_hash,
             jnp.full((pad,), jnp.iinfo(jnp.int32).max, sorted_hash.dtype)])
    rows = (c + pad) // _COARSE
    h2 = sorted_hash.reshape(rows, _COARSE)
    # one extra I32_MAX row so `base + 1` never clamps onto a real row
    # (a clamp would double-count that row)
    h2 = jnp.concatenate(
        [h2, jnp.full((1, _COARSE), jnp.iinfo(jnp.int32).max,
                  sorted_hash.dtype)])
    coarse = h2[:rows, 0]
    pc = _positions_merge(coarse, queries)           # # coarse < q
    base = jnp.maximum(pc - 1, 0)
    w = jnp.concatenate([h2[base], h2[base + 1]], axis=1)  # (nq, 2·128)
    cnt = jnp.sum((w < queries[:, None]).astype(jnp.int32), axis=1)
    return base * _COARSE + cnt


def _positions(sorted_hash, queries):
    if queries.size >= _MERGE_THRESHOLD:
        return positions_in_sorted(sorted_hash, queries).astype(jnp.int32)
    return jnp.searchsorted(sorted_hash, queries,
                            side="left").astype(jnp.int32)

def _cover_miss(s, e, anchors_elem, win):
    """Sources in [s, e) not covered by the union of windows
    [aₚ, aₚ+win); anchors ascending. Interval arithmetic, int32 arrays."""
    total = jnp.maximum(e - s, 0)
    covered = jnp.zeros_like(total)
    prev_end = None
    for a in anchors_elem:
        w_s, w_e = a, a + win
        if prev_end is not None:
            w_s = jnp.maximum(w_s, prev_end)  # don't double-count overlap
        covered = covered + jnp.maximum(
            jnp.minimum(e, w_e) - jnp.maximum(s, w_s), 0)
        prev_end = w_e
    return jnp.maximum(total - covered, 0)


def anchors_pack16(src_len_padded: int, win: int = WIN) -> bool:
    """True when every anchor of a source this long fits the 16-bit
    packed format (encoded value a+1 ≤ 0xFFFF, a in ALIGN units). Sources
    beyond ~8.38M elements (65534·128 + win) need the 32-bit format —
    measured: a 8.49M single-chip scene silently wrapped 16-bit anchors
    into garbage windows (67M misses, NaN densities)."""
    a_cap = max(src_len_padded - win, 0) // ALIGN
    return a_cap + 1 <= 0xFFFF


def plan_windows(sorted_hash, coords, gsize, block: int,
                 src_len_padded: int, active_mask=None,
                 pos_offset: int = 0, win: int = WIN,
                 pack16: bool | None = None, rows_local: int = N_ROWS):
    """Plan window anchors per (particle-block, row offset).

    sorted_hash: (M,) ascending source hashes (int32, inactive = INT32_MAX).
    coords: (N, 3) query cell coords (N multiple of ``block``).
    active_mask: (N,) bool — False rows are excluded from span planning
    (their in-kernel masks still work; they simply match nothing real).

    ``pos_offset`` (elements, ALIGN-multiple) shifts all positions — used
    when this source occupies a later region of a fused source matrix.

    ``pack16`` selects the anchor encoding: two 16-bit anchors per int32
    word (default for sources within the 16-bit address space, see
    :func:`anchors_pack16`) or one 32-bit anchor per word (giant
    sources). Plans fused together must use the SAME format — pass the
    format of the WHOLE fused address space to both calls.

    ``rows_local``: 9 = one window row per (dy, dz) offset; 3 = fused
    3-row windows, one per dz (:func:`row3_hash_bounds`) — ~0.55× the
    slots and ~0.27× the window DMAs at 1M (the measured ~0.3 µs/window
    DMA-issue cost dominated the 9-row sweeps).

    Returns ``(anchors (nb·rows_local·words,) int32, miss () int32)``.
    """
    assert pos_offset % ALIGN == 0, pos_offset
    assert win % ALIGN == 0, win
    assert rows_local in (3, N_ROWS), rows_local
    if rows_local == 3:
        assert rows3_supported(gsize), (
            f"grid {gsize} too small for fused 3-row windows")
    if pack16 is None:
        pack16 = anchors_pack16(src_len_padded, win)
    if pack16:
        assert anchors_pack16(src_len_padded, win), (
            f"source of {src_len_padded} elements exceeds the 16-bit "
            "anchor address space; plan with pack16=False")
    bounds_fn = row_hash_bounds if rows_local == N_ROWS else row3_hash_bounds
    zc = _coords_xyz(coords)[2]
    n = zc.shape[0]
    nb = n // block
    big = jnp.int32(2 ** 30)
    a_cap = max(src_len_padded - win, 0) // ALIGN

    # Cluster split: first z-value group vs rest (z-plane crossing).
    z = zc.reshape(nb, block)
    in_a = z == z[:, :1]
    if active_mask is not None:
        act = active_mask.reshape(nb, block)
    else:
        act = jnp.ones_like(in_a)

    # Per-row cluster hash bounds, gathered into ONE batched positioning
    # pass (sort-merge above the threshold — per-row searchsorted is the
    # dominant plan cost at 1M+ particles).
    row_bounds = []
    for r in range(rows_local):
        lo, hi = bounds_fn(coords, gsize, r)
        lo = lo.reshape(nb, block)
        hi = hi.reshape(nb, block)
        ok = act & (hi >= lo)

        def bounds(sel):
            l = jnp.min(jnp.where(sel, lo, big), axis=1)
            h = jnp.max(jnp.where(sel, hi, -1), axis=1)
            return l, h

        la, ha = bounds(ok & in_a)
        lb, hb = bounds(ok & ~in_a)
        row_bounds.append((la, ha, lb, hb))

    all_q = jnp.stack([jnp.stack([jnp.minimum(la, big - 1), ha + 1,
                                  jnp.minimum(lb, big - 1), hb + 1])
                       for la, ha, lb, hb in row_bounds])   # (rows, 4, nb)
    all_pos = _positions(sorted_hash, all_q.reshape(-1)).reshape(
        rows_local, 4, nb)

    anchors = []
    miss = jnp.int32(0)
    for r in range(rows_local):
        la, ha, lb, hb = row_bounds[r]
        s_a, e_a, s_b, e_b = (x + pos_offset for x in all_pos[r])
        has_a = (ha >= 0) & (e_a > s_a)
        has_b = (hb >= 0) & (e_b > s_b)
        s_a = jnp.where(has_a, s_a, 0)
        e_a = jnp.where(has_a, e_a, 0)
        s_b = jnp.where(has_b, s_b, 0)
        e_b = jnp.where(has_b, e_b, 0)
        none = ~has_a & ~has_b

        # anchor 0 at the first needed position; each further anchor at the
        # first needed position the previous windows leave uncovered. A −1
        # sentinel marks an unused window — the kernel skips its compute.
        # Window p always starts at/after window p−1's end region, so the
        # per-pass ownership rule (col ≥ end of previous window) never
        # double-counts.
        s_first = jnp.where(has_a, s_a, s_b)
        a_list = [jnp.clip(s_first // ALIGN, 0, a_cap)]
        sentinel = [none]
        for _ in range(1, N_PASS):
            w_end = a_list[-1] * ALIGN + win
            ua = jnp.where(has_a & (e_a > w_end),
                           jnp.maximum(s_a, w_end), big)
            ub = jnp.where(has_b & (e_b > w_end),
                           jnp.maximum(s_b, w_end), big)
            u_start = jnp.minimum(ua, ub)
            a_list.append(jnp.clip(u_start // ALIGN, 0, a_cap))
            sentinel.append(none | (u_start == big))

        elems = [a * ALIGN for a in a_list]
        m = jnp.where(has_a, _cover_miss(s_a, e_a, elems, win), 0) + \
            jnp.where(has_b, _cover_miss(s_b, e_b, elems, win), 0)
        miss = miss + jnp.sum(m)
        # Encode each anchor as (a+1) (0 = unused sentinel). Default: two
        # 16-bit anchors per int32 word — the scalar-prefetch array lives
        # in SMEM (≈1 MB), which a flat int32-per-anchor layout would
        # overflow earlier at 1M+ particles. Giant sources (pack16=False)
        # store one anchor per word.
        enc = [jnp.where(sent, 0, a + 1) for a, sent in
               zip(a_list, sentinel)]
        if pack16:
            enc += [jnp.zeros_like(enc[0])] * (2 * N_WORDS - N_PASS)
            words = [enc[2 * w] | (enc[2 * w + 1] << 16)
                     for w in range(N_WORDS)]
        else:
            words = enc
        anchors.append(jnp.stack(words, axis=-1))     # (nb, words)

    anchors = jnp.stack(anchors, axis=1)              # (nb, 9, words)
    return anchors.reshape(-1).astype(jnp.int32), miss


def plan_words(pack16: bool) -> int:
    """int32 words per (block, row) for the given anchor format."""
    return N_WORDS if pack16 else N_PASS


def _unpack_anchor(anchors_ref, b, r, p, n_rows=N_ROWS, pack16=True):
    """Decode anchor p of (block b, row r) from the plan words.

    Returns the encoded value: 0 = unused, else anchor+1 (ALIGN units).
    """
    if pack16:
        word = anchors_ref[(b * n_rows + r) * N_WORDS + p // 2]
        return (word >> (16 * (p % 2))) & 0xFFFF
    return anchors_ref[(b * n_rows + r) * N_PASS + p]


def fuse_plans(anchors_f, anchors_b, pack16=True,
               rows_local: int = N_ROWS):
    """Interleave a fluid plan and a boundary plan into one 2-group plan
    (rows [0, rows_local) = fluid source region, the rest = boundary
    region). Both plans must use the same anchor format (``pack16``)."""
    w = plan_words(pack16)
    af = anchors_f.reshape(-1, rows_local, w)
    ab = anchors_b.reshape(-1, rows_local, w)
    return jnp.concatenate([af, ab], axis=1).reshape(-1)


def _pos_cols(pos):
    """Position operand as columns: accepts an (M, 3) array or an
    (x, y, z) tuple of (M,) columns (preferred — no lane-padding reads)."""
    if isinstance(pos, tuple):
        return pos
    return pos[:, 0], pos[:, 1], pos[:, 2]


def pack_source(pos, hash_f32, vel=None, dens_or_psi=None,
                win: int = WIN):
    """Pack source fields into the (8, M_padded) field-major matrix:
    rows x, y, z, vx, vy, vz, dens-or-ψ, cell-hash (as float32).

    Padding columns carry parked positions and hash −1 so stray window
    tails never match a row range nor pass the radius cutoff.
    """
    px, py, pz = _pos_cols(pos)
    zeros = jnp.zeros((px.shape[0],), px.dtype)
    vel = _pos_cols(vel) if vel is not None else (zeros, zeros, zeros)
    cols = [*vel, dens_or_psi if dens_or_psi is not None else zeros]
    return pack_source_wide((px, py, pz), hash_f32, cols, rows=8, win=win)


def pack_source_wide(pos, hash_f32, cols, rows: int = 16,
                     win: int = WIN):
    """Pack an arbitrary source matrix: rows 0-2 = x,y,z, then ``cols``
    (each (M,)), zero filler, and the cell hash in the LAST row
    (``rows−1``). ``rows`` must be a multiple of 8."""
    px, py, pz = _pos_cols(pos)
    return _pack_region((px, py, pz), hash_f32, cols, rows,
                        round_up(px.shape[0], ALIGN) + win)


def _pack_region(pos, hash_f32, cols, rows: int, width: int):
    px, py, pz = _pos_cols(pos)
    m = px.shape[0]
    assert len(cols) <= rows - 4, (len(cols), rows)
    zeros = jnp.zeros((m,), px.dtype)
    fill = [zeros] * (rows - 4 - len(cols))
    src = jnp.stack([px, py, pz, *cols, *fill,
                     hash_f32])                        # (rows, m)
    pad = jnp.full((rows, width - m), 0.0, src.dtype)
    pad = pad.at[:3].set(1e9).at[rows - 1].set(-1.0)
    return jnp.concatenate([src, pad], axis=1)


def fused_offset(mf: int, win: int = WIN) -> int:
    """Start column of the boundary region in a fused source matrix. The
    ≥ win gap of hash −1 columns guarantees fluid-row windows (anchor cap)
    never reach boundary columns and vice versa."""
    return round_up(mf, ALIGN) + win


def pack_source_fused(pos_f, hash_f, cols_f, pos_b, hash_b, cols_b,
                      rows: int = 8, win: int = WIN):
    """One source matrix [fluid region | gap | boundary region | pad].

    Row slots may carry *different fields per region* (e.g. slot 6 = pd2_j
    for fluid, ψ for boundary): fluid sweep rows only ever address fluid
    columns and boundary rows boundary columns, routed by the fused anchor
    plan, so the meanings never mix.
    """
    pos_f, pos_b = _pos_cols(pos_f), _pos_cols(pos_b)
    f = _pack_region(pos_f, hash_f, cols_f, rows,
                     fused_offset(pos_f[0].shape[0], win))
    b = _pack_region(pos_b, hash_b, cols_b, rows,
                     round_up(pos_b[0].shape[0], ALIGN) + win)
    return jnp.concatenate([f, b], axis=1)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _sweep_kernel(anchors_ref, pvec_ref, q_ref, *refs,
                  pair_fn, pair_fn_b, n_rows: int, block: int,
                  gsize, grid_geom_idx: int, src_rows: int,
                  win: int, pack16: bool = True, kfold: int = 1,
                  rows_local: int = N_ROWS, wide: bool = False):
    """Grid = (nb // kfold, n_rows // 9); ALL kfold·9·N_PASS windows of a
    block-group arrive as separate operands (``refs[:-1]``) fetched by
    per-(sub-block, row, pass) BlockSpecs, and python loops sweep them
    inside ONE kernel invocation. Folding the row and pass dimensions out
    of the grid matters twice over: each Mosaic grid step carries ~1 µs of
    fixed cost (measured, 1M particles) — formerly paid (rows·passes)=27×
    per block, mostly on sentinel-skipped passes — and with the row index
    static inside the kernel, each row's (dy, dz) offsets fold into
    compile-time constants. ``kfold`` folds the BLOCK dimension the same
    way: kfold consecutive query sub-blocks share one grid step, so small
    blocks (whose narrower source spans raise window occupancy — the
    structural ~1.2% hash-valid-slots number, tools/occupancy.py) stop
    paying the per-grid-step fixed cost kfold times over. The second grid
    dimension is the row GROUP: 0 = the 9 fluid rows, 1 = the 9 boundary
    rows of a fused plan.
    """
    srcs, out_ref = refs[:-1], refs[-1]
    bg = pl.program_id(0)   # block group (kfold consecutive sub-blocks)
    ro = pl.program_id(1)   # row group (0 = fluid rows, 1 = boundary rows)

    @pl.when(ro == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Query cell coords, once per block group. They use the same
    # multiply-by-1/cell arithmetic as the host-side plan
    # (grid.cell_coords) so bounds and plan agree exactly.
    ox, oy, oz = (pvec_ref[grid_geom_idx], pvec_ref[grid_geom_idx + 1],
                  pvec_ref[grid_geom_idx + 2])
    inv_cell = pvec_ref[grid_geom_idx + 3]
    gx, gy, gz = gsize

    def cellc(v, o, g):
        c = jnp.floor((v - o) * inv_cell)
        return jnp.clip(c, 0.0, float(g - 1))

    for i in range(kfold):
        b = bg * kfold + i
        sub = pl.dslice(i * block, block)
        q_sub = q_ref[sub, :]
        qx, qy, qz = q_sub[:, 0:1], q_sub[:, 1:2], q_sub[:, 2:3]
        cx = cellc(qx, ox, gx)
        cy = cellc(qy, oy, gy)
        cz = cellc(qz, oz, gz)

        # hash-bound arithmetic: float32 is exact below 2²⁴ cells; WIDE
        # mode (hash_payload) computes the same bounds in int32 and
        # bitcasts the source hash row back to int32 — same op count on
        # the VPU, exact to 2³¹ cells
        if wide:
            bx, by, bz = (c.astype(jnp.int32) for c in (cx, cy, cz))
            one, num = jnp.int32(1), (lambda v: jnp.int32(v))
        else:
            bx, by, bz = cx, cy, cz
            one, num = 1.0, (lambda v: float(v))

        for r_local in range(rows_local):
            if rows_local == N_ROWS:
                # static (dy, dz) per unrolled row
                dy = num(r_local % 3 - 1)
                dz = num(r_local // 3 - 1)
                yy = by + dy
                zz = bz + dz
                base = (zz * gy + yy) * gx
                lo = base + jnp.maximum(bx - one, num(0))
                hi = base + jnp.minimum(bx + one, num(gx - 1))
                # fold row validity into the rank-1 bounds (lo > hi matches
                # no hash) instead of AND-ing a (B, WIN) row_ok per slot
                row_ok = ((yy >= num(0)) & (yy < num(gy))
                          & (zz >= num(0)) & (zz < num(gz)))
            else:
                # fused 3-row span per dz (row3_hash_bounds): between-cell
                # sources inside the span are admitted here and zeroed by
                # the pair functions' r² < h² cutoff — exact, see the plan
                # docstring. Same rank-1 bounds shape ⇒ same 3-op per-slot
                # mask as the 9-row mode.
                dz = num(r_local - 1)
                zz = bz + dz
                base = (zz * gy + by) * gx
                lo = base + (jnp.maximum(bx - one, num(0)) - num(gx))
                hi = base + (jnp.minimum(bx + one, num(gx - 1)) + num(gx))
                row_ok = (zz >= num(0)) & (zz < num(gz))
            lo = jnp.where(row_ok, lo, num(1))
            hi = jnp.where(row_ok, hi, num(0))
            if wide and WIDE_MODE == "mod":
                # mod mode: the payload is h mod 2²⁴ (plain f32); reduce
                # the bounds to (lo mod 2²⁴, width = hi − lo) rank-1 f32 —
                # the per-slot test reconstructs h − lo by wraparound.
                # Empty rows keep width = −1 (never matches). The & with
                # 2²⁴−1 is the true mod even for the fused mode's slightly
                # negative lo (two's complement).
                width = (hi - lo).astype(jnp.float32)
                lo = jnp.bitwise_and(
                    lo, jnp.int32(WIDE_MOD - 1)).astype(jnp.float32)
                hi = width
            elif wide and WIDE_MODE != "convert" and WIDE_BIAS:
                # payload rides biased into normal-float bit space
                # (hash_payload); shift the bounds identically — the
                # compare is shift-invariant, empty rows stay empty
                lo = lo + num(WIDE_BIAS)
                hi = hi + num(WIDE_BIAS)
            r = ro * rows_local + r_local

            for p in range(N_PASS):
                src_ref = srcs[(i * rows_local + r_local) * N_PASS + p]
                a_enc = _unpack_anchor(anchors_ref, b, r, p, n_rows,
                                       pack16)

                # 0 sentinel: window unused, skip compute. No inner
                # any(valid) guard: the plan only emits a non-sentinel
                # anchor when the window contains needed sources, so the
                # guard never skipped — it was a pure (B, WIN) reduction +
                # branch per window.
                @pl.when(a_enc > 0)
                def _window(p=p, r=r, src_ref=src_ref, a_enc=a_enc,
                            lo=lo, hi=hi, q_sub=q_sub, sub=sub):
                    a_this = (a_enc - 1) * ALIGN
                    if wide and WIDE_MODE == "full":
                        src_hash = jax.lax.bitcast_convert_type(
                            src_ref[...], jnp.int32)[
                                src_rows - 1:src_rows, :]
                    else:
                        src_hash = src_ref[src_rows - 1:src_rows, :]
                    if wide and WIDE_MODE == "slice":
                        # bitcast payload back to int32 (hash_payload) —
                        # NEVER use the float view arithmetically
                        src_hash = jax.lax.bitcast_convert_type(
                            src_hash, jnp.int32)
                    elif wide and WIDE_MODE == "convert":
                        # debug: plain-float payload, value-convert
                        src_hash = src_hash.astype(jnp.int32)
                    if wide and WIDE_MODE == "mod":
                        # h − lo by modular wraparound: d and d + 2²⁴ are
                        # exact (integer-valued f32, |·| < 2²⁵). Aliased
                        # acceptances are ≥ one cell away → pair fns
                        # contribute exactly 0 (see WIDE_MODE).
                        d = src_hash - lo
                        dw = jnp.where(d < 0.0, d + float(WIDE_MOD), d)
                        valid = dw <= hi
                    else:
                        valid = (src_hash >= lo) & (src_hash <= hi)
                    if p > 0:
                        # end of the previous pass's window — this pass
                        # owns columns at/beyond it (pass 0 owns its whole
                        # window)
                        a_prev = _unpack_anchor(anchors_ref, b, r, p - 1,
                                                n_rows, pack16)
                        a_prev_end = (a_prev - 1) * ALIGN + win
                        col = a_this + jax.lax.broadcasted_iota(
                            jnp.int32, (1, win), 1)
                        valid = valid & (col >= a_prev_end)

                    # NOTE: the query's own source slot is NOT excluded.
                    # Every pair term carries a factor of the displacement
                    # (or r²), which is exactly 0 at self with finite
                    # coefficients (the eps-clamped rsqrt guarantees no
                    # inf), and the density pair's self term ψ·W(0) is the
                    # term the solvers previously added separately — so
                    # self-inclusion is both free and two VPU ops cheaper
                    # per (B, WIN) slot.
                    if pair_fn_b is None:
                        out_ref[sub, :] = out_ref[sub, :] + pair_fn(
                            q_sub, src_ref, valid, pvec_ref)
                    else:
                        # fused sweep: row group 0 = fluid formula,
                        # row group 1 = boundary formula
                        @pl.when(ro == 0)
                        def _fluid():
                            out_ref[sub, :] = out_ref[sub, :] + pair_fn(
                                q_sub, src_ref, valid, pvec_ref)

                        @pl.when(ro > 0)
                        def _bnd():
                            out_ref[sub, :] = out_ref[sub, :] + pair_fn_b(
                                q_sub, src_ref, valid, pvec_ref)


def neighbor_sweep(pair_fn, *, queries, src, anchors, pvec, gsize,
                   out_width: int, block: int = DEF_BLOCK,
                   grid_geom_idx: int, pair_fn_b=None,
                   n_rows: int = N_ROWS, win: int = WIN,
                   kfold: int = 1, interpret: bool = False):
    """Run one Pallas neighbor sweep.

    Args:
      pair_fn: ``(q_ref (B,Fq), src_ref (8,WIN), valid (B,WIN), pvec_ref)
        -> (B, out_width)`` — masked pair terms reduced over the window.
      queries: (N, Fq) query fields, rows 0..2 = position; N % block == 0.
      src: (8, M) packed source matrix from :func:`pack_source`.
      anchors: flat (nb·9·2,) int32 from :func:`plan_windows`.
      pvec: (P,) float32 parameter vector; entries
        [grid_geom_idx .. +3] = (ox, oy, oz, 1/cell).
      gsize: static (gx, gy, gz).
      kfold: query sub-blocks folded into one Mosaic grid step (the
        per-grid-step fixed cost is paid once per group of kfold blocks —
        lets small blocks, whose narrow spans raise window occupancy, run
        without drowning in fixed cost).
    Returns (N, out_width). Self-pairs are included (see the kernel note:
    they contribute the density self term and exactly 0 to everything
    else).
    """
    n, fq = queries.shape
    assert n % block == 0, (n, block)
    nb = n // block
    src_rows = src.shape[0]
    assert src_rows % 8 == 0, src_rows
    # row mode: 9/18 = one row per (dy, dz) offset (plus boundary group);
    # 3/6 = fused 3-row windows, one per dz (row3_hash_bounds)
    assert n_rows in (3, 6, 9, 18), n_rows
    rows_local = N_ROWS if n_rows % N_ROWS == 0 else 3

    # Anchor format is deduced from the plan's words-per-(block,row):
    # 16-bit packed (N_WORDS) for ordinary sources, 32-bit (N_PASS) for
    # giant sources beyond the 16-bit address space (anchors_pack16).
    words = anchors.size // (nb * n_rows)
    assert words in (N_WORDS, N_PASS) and \
        anchors.size == nb * n_rows * words, (anchors.size, nb, n_rows)
    pack16 = words == N_WORDS
    stride = n_rows * words

    # The anchor plan is a scalar-prefetch operand and must fit in ~1MB of
    # SMEM; beyond ~10k blocks (per fused row count) the sweep is chunked
    # into independent pallas_calls over disjoint query-block ranges.
    bytes_per_block = n_rows * words * 4
    max_blocks = max(SMEM_ANCHOR_BUDGET // bytes_per_block, 1)
    max_blocks = max(max_blocks // kfold, 1) * kfold
    if nb > max_blocks or nb % kfold:
        # Equal-shape chunks: pad queries (parked rows) and anchors (all-
        # sentinel blocks) so every chunk is the SAME (nb_c·block, …)
        # pallas_call — identical Mosaic modules compile once and are
        # cache-hits for the remaining chunks, where ragged chunks each
        # paid a full kernel compile (the 4M wall: 3 ragged chunks × 2
        # sweeps of 27-operand kernels). The same padding rounds nb up to
        # a kfold multiple (a group of kfold blocks is one grid step).
        k = -(-nb // max_blocks)
        nb_c = -(-nb // k)
        nb_c = -(-nb_c // kfold) * kfold
        pad_blocks = k * nb_c - nb
        if pad_blocks:
            q_pad = jnp.full((pad_blocks * block, fq), PARK_LIMIT * 10,
                             queries.dtype)
            queries = jnp.concatenate([queries, q_pad])
            anchors = jnp.concatenate(
                [anchors, jnp.zeros((pad_blocks * stride,), anchors.dtype)])
        outs = []
        for i in range(k):
            outs.append(neighbor_sweep(
                pair_fn,
                queries=queries[i * nb_c * block:(i + 1) * nb_c * block],
                src=src,
                anchors=anchors[i * nb_c * stride:(i + 1) * nb_c * stride],
                pvec=pvec, gsize=gsize, out_width=out_width, block=block,
                grid_geom_idx=grid_geom_idx, pair_fn_b=pair_fn_b,
                n_rows=n_rows, win=win, kfold=kfold, interpret=interpret))
        out = jnp.concatenate(outs)
        return out[:n] if pad_blocks else out

    # wide mode must match the caller's hash_payload decision — both key
    # on (dtype, gsize) alone
    wide = queries.dtype == jnp.float32 and wide_hash_needed(gsize)
    kernel = functools.partial(
        _sweep_kernel, pair_fn=pair_fn, pair_fn_b=pair_fn_b, n_rows=n_rows,
        block=block, gsize=gsize,
        grid_geom_idx=grid_geom_idx, src_rows=src_rows, win=win,
        pack16=pack16, kfold=kfold, rows_local=rows_local, wide=wide)

    def win_spec(i, r_local, p):
        # one BlockSpec per (sub-block, row-in-group, pass); a sentinel
        # anchor fetches the dummy window at column 0 (the kernel skips
        # compute)
        return pl.BlockSpec((pl.Element(src_rows), pl.Element(win)),
                            lambda bg, ro, a, pv, _nr=n_rows, _i=i,
                            _rl=r_local, _p=p, _pk=pack16, _k=kfold,
                            _rg=rows_local:
                            (0, jnp.maximum(
                                _unpack_anchor(a, bg * _k + _i,
                                               ro * _rg + _rl,
                                               _p, _nr, _pk) - 1,
                                0) * ALIGN))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # anchors, pvec
        grid=(nb // kfold, n_rows // rows_local),
        in_specs=[
            pl.BlockSpec((kfold * block, fq), lambda bg, ro, a, pv: (bg, 0)),
            *[win_spec(i, rl, p) for i in range(kfold)
              for rl in range(rows_local) for p in range(N_PASS)],
        ],
        out_specs=pl.BlockSpec((kfold * block, out_width),
                               lambda bg, ro, a, pv: (bg, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_width), queries.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(anchors, pvec.astype(queries.dtype), queries,
      *([src] * (kfold * rows_local * N_PASS)))
