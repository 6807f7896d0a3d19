"""The neighbor-reduction primitive all SPH passes are built on.

TPU-native replacement for the reference's one-thread-per-particle 27-cell
gather loops (the ``for z,y,x in -1..1`` + ``[cellStart, cellEnd)`` walks in
every ``__global__`` kernel of ``sph/sph_kernel_impl.cuh``). Here a pass is:

    for each of the 9 contiguous row segments (see nereus_tpu.grid):
        idx   = seg_start + iota(window)           # (N, K) candidate indices
        valid = idx < seg_end [& idx != self]
        j     = gather(source arrays, idx)          # contiguous-window gathers
        acc  += sum_K pair_fn(i, j, valid)

All shapes are static: ``window`` (K) is the compile-time candidate capacity
per 3-cell row (``SimConfig.seg_window``). Segments longer than K truncate;
:func:`nereus_tpu.grid.segment_overflow` detects that. The loop over the 9
segments is a ``lax.scan`` so live gather buffers stay at (N, K) per field.

``pair_fn`` contract: ``pair_fn(i_data, j_data, valid) -> contributions`` —
a pytree of ``(N, K, ...)`` arrays that are already zeroed where ``~valid``
(use :func:`masked` / ``jnp.where``); the reducer sums axis 1 and accumulates.
Pair functions must also apply their own interaction-radius cutoff, mirroring
the reference's ``length(p1p2) < ir`` tests.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def masked(valid, x):
    """Zero out invalid pair slots. ``valid`` is (N, K); x is (N, K) or (N, K, d)."""
    if x.ndim == valid.ndim + 1:
        valid = valid[..., None]
    return jnp.where(valid, x, jnp.zeros_like(x))


def neighbor_reduce(
    pair_fn: Callable,
    init,
    seg_start,
    seg_end,
    src,
    i_data,
    window: int,
    exclude_idx=None,
):
    """Reduce ``pair_fn`` over all candidate neighbors of every query particle.

    Args:
      pair_fn: see module docstring.
      init: pytree of (N, ...) accumulators (zeros).
      seg_start, seg_end: (9, N) int32 from :func:`nereus_tpu.grid.row_segments`.
      src: pytree of (M, ...) source-particle arrays, sorted by cell hash.
      i_data: pytree of (N, ...) query-particle fields, passed to pair_fn.
      window: static candidate capacity K per segment.
      exclude_idx: optional (N,) int32 of each query's own index in the source
        ordering — the self-exclusion ``j != index`` of the reference kernels
        (e.g. ``sph_kernel_impl.cuh:305``). None for cross-set reductions
        (fluid↔boundary), where self never appears.

    Returns:
      pytree of (N, ...) accumulated sums.
    """
    src_leaves = jax.tree_util.tree_leaves(src)
    if not src_leaves:
        return init
    m = src_leaves[0].shape[0]
    if m == 0:
        return init
    iota = jnp.arange(window, dtype=jnp.int32)

    def body(acc, seg):
        s, e = seg
        idx = s[:, None] + iota[None, :]
        valid = idx < e[:, None]
        if exclude_idx is not None:
            valid = valid & (idx != exclude_idx[:, None])
        idx_c = jnp.minimum(idx, m - 1)
        j_data = jax.tree_util.tree_map(lambda a: a[idx_c], src)
        contrib = pair_fn(i_data, j_data, valid)
        acc = jax.tree_util.tree_map(
            lambda a, c: a + jnp.sum(c, axis=1), acc, contrib)
        return acc, None

    acc, _ = jax.lax.scan(body, init, (seg_start, seg_end))
    return acc
