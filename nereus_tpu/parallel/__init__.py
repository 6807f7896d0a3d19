"""Multi-chip domain decomposition (slab sharding + ghost-particle halos)."""

from .domain import (ShardConfig, ShardedDiagnostics,
                     make_sharded_dfsph_coupled_step,
                     make_sharded_dfsph_step, make_sharded_iisph_step,
                     make_sharded_pbf_step,
                     make_sharded_pcisph_step,
                     make_sharded_wcsph_coupled_step,
                     make_sharded_wcsph_elastic_step,
                     make_sharded_wcsph_step, shard_state, slab_counts,
                     unshard_state)

__all__ = [
    "ShardConfig", "ShardedDiagnostics",
    "make_sharded_dfsph_coupled_step", "make_sharded_dfsph_step",
    "make_sharded_pbf_step",
    "make_sharded_iisph_step", "make_sharded_pcisph_step",
    "make_sharded_wcsph_coupled_step",
    "make_sharded_wcsph_elastic_step",
    "make_sharded_wcsph_step", "shard_state", "slab_counts",
    "unshard_state",
]
