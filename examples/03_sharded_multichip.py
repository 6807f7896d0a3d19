"""Multi-chip domain decomposition: the same physics sharded over a
device mesh (z-slabs + ghost halos over ICI collectives).

On a pod this uses the real chips; on CPU it demonstrates the identical
code path on virtual devices:

  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      python examples/03_sharded_multichip.py
"""

import jax
import numpy as np

try:  # force CPU when no accelerator is attached (harmless otherwise)
    if jax.local_device_count() < 2:
        jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

from jax.sharding import Mesh

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))  # noqa: E402 — run from anywhere

import nereus_tpu as nt
from nereus_tpu.boundary import box_boundary
from nereus_tpu.parallel import (ShardConfig, make_sharded_wcsph_step,
                                 shard_state, slab_counts, unshard_state)
from nereus_tpu.scene import particle_cube

# 2 slabs keeps the demo snappy on CPU hosts (XLA's in-process
# collectives rendezvous with a 40 s timeout per op — a loaded
# single-core host can trip it with more virtual devices); on a pod,
# raise this to the chip count
n_dev = min(2, jax.local_device_count())
print(f"sharding over {n_dev} device(s): {jax.devices()[:n_dev]}")

params = nt.make_params()
cfg = nt.SimConfig()
h = float(params.interaction_radius)
r = float(params.particle_radius)
pos = particle_cube((0.25, 0.3, 0.25), (0.3, 0.3, 0.3), 2 * r)
lo, hi = np.zeros(3), np.array([0.5, 0.8, 0.5])
grid = nt.fit_grid(lo - h, hi + h, h)
walls = box_boundary(grid, lo, hi, r, params)
state = nt.make_fluid_state(pos)

mesh = Mesh(np.array(jax.devices()[:n_dev]), ("shards",))
counts = slab_counts(state, grid, n_dev)
scfg = ShardConfig(n_shards=n_dev,
                   local_capacity=int(1.5 * counts.max()) + 256,
                   halo_capacity=4096, migration_capacity=1024)
sstate = shard_state(state, grid, scfg, mesh)
step = make_sharded_wcsph_step(mesh, params, grid, cfg, scfg, walls)

for i in range(100):
    sstate, diag = step(sstate)
assert int(diag.halo_overflow) == 0 and int(diag.migration_overflow) == 0

final = unshard_state(sstate)
p = np.asarray(final.pos)[:int(final.num_active)]
print(f"done: {len(p)} particles, all finite: {np.isfinite(p).all()}, "
      f"mean density err {float(diag.mean_density_error):.4f}")
