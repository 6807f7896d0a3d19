"""Double-precision support (the reference's ``DOUBLE_PRECISION`` CMake
switch, ``common/common.h:23-43``) on BOTH engines.

``jax_enable_x64`` is process-global, so the fp64 runs happen in a
subprocess. The Pallas engine runs f64 in interpret mode (CPU only —
Mosaic has no f64 vector type on real TPUs; ``check_pallas_dtype``) and is
compared bit-for-tolerance against the jnp segment oracle.
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

params = nt.make_params(dt=5e-4, dtype=jnp.float64)
results = {}
for engine in ("segments", "pallas"):
    cfg = nt.SimConfig(engine=engine, dtype=jnp.float64)
    state, grid, boundary = scene.dam_break(
        params, cfg, cube_size=(0.2, 0.2, 0.2), cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)
    n = int(state.num_active)
    step = jax.jit(lambda s, c=cfg, g=grid, b=boundary:
                   nt.wcsph_step(s, params, g, c, b))
    for _ in range(10):
        state, diag = step(state)
    pos = np.asarray(state.pos[:n])
    results[engine] = {
        "dtype": str(state.pos.dtype),
        "finite": bool(np.isfinite(pos).all()),
        "derr": float(diag.mean_density_error),
        "overflow": int(diag.seg_overflow),
        "pos": pos,
    }

k = lambda a: np.lexsort((a[:, 2], a[:, 1], a[:, 0]))
pa = results["pallas"]["pos"]; po = results["segments"]["pos"]
diff = float(np.max(np.abs(pa[k(pa)] - po[k(po)])))
print(json.dumps({
    "seg": {x: results["segments"][x] for x in
            ("dtype", "finite", "derr", "overflow")},
    "pal": {x: results["pallas"][x] for x in
            ("dtype", "finite", "derr", "overflow")},
    "pos_diff": diff,
}))
"""


def test_fp64_both_engines():
    out = subprocess.run([sys.executable, "-c", _SCRIPT],
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    for eng in ("seg", "pal"):
        assert res[eng]["dtype"] == "float64"
        assert res[eng]["finite"]
        assert res[eng]["overflow"] == 0
        assert abs(res[eng]["derr"]) < 1.0
    # fp64 engines agree far beyond f32 noise
    assert res["pos_diff"] < 1e-9, res["pos_diff"]


def test_fp64_pallas_rejected_on_tpu_backend():
    """On a real TPU backend the f64 Pallas path must be a clear error,
    not a miscompile (Mosaic has no f64 vector type)."""
    import jax
    import jax.numpy as jnp

    import nereus_tpu as nt
    from nereus_tpu.solvers.pallas_common import (check_pallas_dtype,
                                                  interpret_mode)
    if interpret_mode():
        import pytest
        pytest.skip("needs a real TPU backend")
    cfg = nt.SimConfig(engine="pallas", dtype=jnp.float64)
    grid = nt.make_grid((0, 0, 0), (4, 4, 4), 0.1)
    import pytest
    with pytest.raises(ValueError, match="interpret mode"):
        check_pallas_dtype(cfg, grid)
