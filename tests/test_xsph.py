"""Monaghan XSPH velocity smoothing (beyond-reference WCSPH stabilizer)."""

import jax
import jax.numpy as jnp
import numpy as np

import nereus_tpu as nt
from nereus_tpu import scene


def _dam(params, cfg):
    return scene.dam_break(
        params, cfg, cube_size=(0.25, 0.25, 0.25),
        cube_center=(-0.3, 0.05, 0.5),
        box_min=(-0.8, -0.3, 0.0), box_max=(0.2, 0.7, 1.0),
        with_boundary=True, boundary_radius=0.04)


def test_xsph_engine_equivalence():
    params = nt.make_params()
    cfg_o = nt.SimConfig(engine="segments")
    cfg_p = nt.SimConfig(engine="pallas")
    state, grid, bd = _dam(params, cfg_o)
    eps = jnp.float32(0.3)   # traced scalar — no recompile when it changes

    s_o, s_p = state, state
    for it in range(2):
        s_o, _ = jax.jit(lambda s, e: nt.wcsph_step(
            s, params, grid, cfg_o, bd, xsph_eps=e))(s_o, eps)
        s_p, d_p = jax.jit(lambda s, e: nt.wcsph_step(
            s, params, grid, cfg_p, bd, xsph_eps=e))(s_p, eps)
        assert int(d_p.seg_overflow) == 0
        np.testing.assert_allclose(np.asarray(s_o.pos), np.asarray(s_p.pos),
                                   atol=2e-5, err_msg=f"step {it}")
        np.testing.assert_allclose(np.asarray(s_o.vel), np.asarray(s_p.vel),
                                   atol=2e-3, err_msg=f"step {it}")


def test_xsph_eps_zero_matches_off():
    """ε = 0 must reproduce the un-smoothed step exactly (the sum scales
    by ε outside the sweep)."""
    for engine in ("segments", "pallas"):
        cfg = nt.SimConfig(engine=engine)
        params = nt.make_params()
        state, grid, bd = _dam(params, cfg)
        s0, _ = jax.jit(lambda s: nt.wcsph_step(
            s, params, grid, cfg, bd))(state)
        s1, _ = jax.jit(lambda s: nt.wcsph_step(
            s, params, grid, cfg, bd, xsph_eps=jnp.float32(0.0)))(state)
        np.testing.assert_allclose(np.asarray(s0.pos), np.asarray(s1.pos),
                                   atol=1e-7, err_msg=engine)
        np.testing.assert_array_equal(np.asarray(s0.vel),
                                      np.asarray(s1.vel))


def test_xsph_smooths_velocity_field():
    """After a splashy interval, the XSPH run's neighbor-relative velocity
    spread must not exceed the un-smoothed run's (that's the point of the
    smoothing), and the run stays finite."""
    cfg = nt.SimConfig(engine="pallas")
    params = nt.make_params()
    state0, grid, bd = _dam(params, cfg)

    def run(eps):
        st = state0
        step = jax.jit(lambda s, e: nt.wcsph_step(
            s, params, grid, cfg, bd, xsph_eps=e))
        step0 = jax.jit(lambda s: nt.wcsph_step(s, params, grid, cfg, bd))
        for _ in range(120):
            st, d = (step(st, jnp.float32(eps)) if eps is not None
                     else step0(st))
        n = int(st.num_active)
        return np.asarray(st.pos[:n]), np.asarray(st.vel[:n])

    p0, v0 = run(None)
    p1, v1 = run(0.5)
    assert np.isfinite(p1).all() and np.isfinite(v1).all()
    # velocity-field roughness proxy: variance of speed
    assert v1.std() <= v0.std() * 1.05, (v1.std(), v0.std())
