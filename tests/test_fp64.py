"""Double-precision support on the jnp segment engine (the reference's
``DOUBLE_PRECISION`` CMake switch, ``common/common.h:23-43``).

``jax_enable_x64`` is process-global, so the fp64 run happens in a
subprocess; the Pallas engine stays fp32 (documented in PARITY.md).
"""

import json
import subprocess
import sys

_SCRIPT = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import json
import numpy as np
import jax.numpy as jnp
import nereus_tpu as nt
from nereus_tpu import scene

cfg = nt.SimConfig(engine="segments", dtype=jnp.float64)
params = nt.make_params(dt=5e-4, dtype=jnp.float64)
state, grid, boundary = scene.dam_break(
    params, cfg, cube_size=(0.2, 0.2, 0.2), cube_center=(-0.3, 0.05, 0.5),
    box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
    with_boundary=True, boundary_radius=0.04)
n = int(state.num_active)
step = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg, boundary))
for _ in range(10):
    state, diag = step(state)
pos = np.asarray(state.pos[:n])
print(json.dumps({
    "dtype": str(state.pos.dtype),
    "finite": bool(np.isfinite(pos).all()),
    "derr": float(diag.mean_density_error),
    "overflow": int(diag.seg_overflow),
}))
"""


def test_fp64_segment_engine():
    out = subprocess.run([sys.executable, "-c", _SCRIPT],
                         capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["dtype"] == "float64"
    assert res["finite"]
    assert res["overflow"] == 0
    assert abs(res["derr"]) < 1.0
