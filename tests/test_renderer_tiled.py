"""Tiled (Pallas, interpret-mode on CPU) renderer vs the jnp oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gm
from gs_slam_analytica_jacobian_tpu.ops import renderer_ref, renderer_tiled

from test_renderer_ref import make_scene, run_oracle


def run_tiled(sc, bg, tau=None, **kw):
    if tau is None:
        tau = jnp.zeros(6)
    return renderer_tiled.render(
        jnp.asarray(sc["means"]),
        gm.build_cov3d(jnp.asarray(sc["scales"]), jnp.asarray(sc["quats"])),
        jnp.asarray(sc["opac"]), jnp.asarray(sc["shs"]), 3,
        jnp.asarray(sc["w2c"]), jnp.asarray(sc["proj"]), tau,
        sc["fx"], sc["fy"], sc["W"], sc["H"], sc["tanfovx"], sc["tanfovy"],
        jnp.asarray(bg), pair_capacity=4096, interpret=True, **kw)


def test_tiled_matches_oracle_forward(rng):
    sc = make_scene(rng, n=25, W=160, H=40)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    ref = run_oracle(sc, bg)
    out = run_tiled(sc, bg)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.opacity),
                               np.asarray(ref.opacity), atol=3e-5)
    np.testing.assert_array_equal(np.asarray(out.n_touched),
                                  np.asarray(ref.n_touched))


def test_tiled_matches_oracle_gradients(rng):
    sc = make_scene(rng, n=15, W=144, H=32)
    bg = np.array([0.05, 0.1, 0.15], np.float32)
    target = rng.uniform(size=(3, sc["H"], sc["W"])).astype(np.float32)
    tgt_d = rng.uniform(size=(1, sc["H"], sc["W"])).astype(np.float32) * 3

    def make_loss(render_fn):
        def loss(tau, means, opac, scales):
            out = render_fn(
                means,
                gm.build_cov3d(scales, jnp.asarray(sc["quats"])),
                opac, jnp.asarray(sc["shs"]), 3,
                jnp.asarray(sc["w2c"]), jnp.asarray(sc["proj"]), tau,
                sc["fx"], sc["fy"], sc["W"], sc["H"],
                sc["tanfovx"], sc["tanfovy"], jnp.asarray(bg))
            return (jnp.mean(jnp.abs(out.color - target))
                    + 0.2 * jnp.mean(jnp.abs(out.depth - tgt_d))
                    + 0.1 * jnp.mean(out.opacity))
        return loss

    args = (jnp.zeros(6), jnp.asarray(sc["means"]), jnp.asarray(sc["opac"]),
            jnp.asarray(sc["scales"]))
    import functools
    tiled_fn = functools.partial(renderer_tiled.render, pair_capacity=4096,
                                 interpret=True)
    g_ref = jax.grad(make_loss(renderer_ref.render), argnums=(0, 1, 2, 3))(*args)
    g_til = jax.grad(make_loss(tiled_fn), argnums=(0, 1, 2, 3))(*args)

    for a, b, name in zip(g_ref, g_til, ["tau", "means", "opac", "scales"]):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b)), name
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=2e-5 + 2e-3 * np.abs(a).max(), err_msg=name)


def test_tile16_matches_oracle_forward(rng):
    """v3 16x16-subtile kernel (2x2 packed per block) vs the oracle."""
    sc = make_scene(rng, n=25, W=160, H=40)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    ref = run_oracle(sc, bg)
    out = run_tiled(sc, bg, tile16=True)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.opacity),
                               np.asarray(ref.opacity), atol=3e-5)
    np.testing.assert_array_equal(np.asarray(out.n_touched),
                                  np.asarray(ref.n_touched))


def test_tile16_matches_oracle_gradients(rng):
    sc = make_scene(rng, n=15, W=144, H=32)
    bg = np.array([0.05, 0.1, 0.15], np.float32)
    target = rng.uniform(size=(3, sc["H"], sc["W"])).astype(np.float32)
    tgt_d = rng.uniform(size=(1, sc["H"], sc["W"])).astype(np.float32) * 3

    def make_loss(render_fn):
        def loss(tau, means, opac, scales):
            out = render_fn(
                means,
                gm.build_cov3d(scales, jnp.asarray(sc["quats"])),
                opac, jnp.asarray(sc["shs"]), 3,
                jnp.asarray(sc["w2c"]), jnp.asarray(sc["proj"]), tau,
                sc["fx"], sc["fy"], sc["W"], sc["H"],
                sc["tanfovx"], sc["tanfovy"], jnp.asarray(bg))
            return (jnp.mean(jnp.abs(out.color - target))
                    + 0.2 * jnp.mean(jnp.abs(out.depth - tgt_d))
                    + 0.1 * jnp.mean(out.opacity))
        return loss

    args = (jnp.zeros(6), jnp.asarray(sc["means"]), jnp.asarray(sc["opac"]),
            jnp.asarray(sc["scales"]))
    import functools
    t16_fn = functools.partial(renderer_tiled.render, pair_capacity=4096,
                               interpret=True, tile16=True)
    g_ref = jax.grad(make_loss(renderer_ref.render),
                     argnums=(0, 1, 2, 3))(*args)
    g_t16 = jax.grad(make_loss(t16_fn), argnums=(0, 1, 2, 3))(*args)

    for a, b, name in zip(g_ref, g_t16, ["tau", "means", "opac", "scales"]):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b)), name
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=2e-5 + 2e-3 * np.abs(a).max(),
            err_msg=name)


def test_mxu_mode_matches_standard(rng):
    """MXU kernel mode (tile_kernel2 mxu: falloff as a (K,6)@(6,P)
    matmul in the tile-local pixel basis + log-space transmittance):
    tracking-only opt-in, expected to agree with the exact VPU path to
    ~1e-4 in alpha (bf16x-pass matmul + log/exp roundtrip) and a few
    1e-5 relative in dL/dtau."""
    sc = make_scene(rng, n=40, W=160, H=64)
    bg = np.array([0.05, 0.1, 0.15], np.float32)

    def rr(mxu):
        return renderer_tiled.render(
            jnp.asarray(sc["means"]),
            gm.build_cov3d(jnp.asarray(sc["scales"]),
                           jnp.asarray(sc["quats"])),
            jnp.asarray(sc["opac"]), jnp.asarray(sc["shs"]), 3,
            jnp.asarray(sc["w2c"]), jnp.asarray(sc["proj"]), jnp.zeros(6),
            sc["fx"], sc["fy"], sc["W"], sc["H"],
            sc["tanfovx"], sc["tanfovy"],
            jnp.asarray(bg), pair_capacity=8192, interpret=True, mxu=mxu,
            need_n_touched=False)

    std, mxu = rr(False), rr(True)
    np.testing.assert_allclose(np.asarray(mxu.color), np.asarray(std.color),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(mxu.depth), np.asarray(std.depth),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(mxu.opacity),
                               np.asarray(std.opacity), atol=1e-3)

    def loss(tau, use_mxu):
        out = renderer_tiled.render(
            jnp.asarray(sc["means"]),
            gm.build_cov3d(jnp.asarray(sc["scales"]),
                           jnp.asarray(sc["quats"])),
            jnp.asarray(sc["opac"]), jnp.asarray(sc["shs"]), 3,
            jnp.asarray(sc["w2c"]), jnp.asarray(sc["proj"]), tau,
            sc["fx"], sc["fy"], sc["W"], sc["H"],
            sc["tanfovx"], sc["tanfovy"],
            jnp.asarray(bg), pair_capacity=8192, interpret=True,
            mxu=use_mxu, need_n_touched=False)
        return (jnp.mean(jnp.abs(out.color))
                + 0.1 * jnp.mean(jnp.abs(out.depth)))

    g0 = jax.grad(lambda t: loss(t, False))(jnp.zeros(6))
    g1 = jax.grad(lambda t: loss(t, True))(jnp.zeros(6))
    rel = (np.abs(np.asarray(g0 - g1)).max()
           / (np.abs(np.asarray(g0)).max() + 1e-12))
    assert rel < 2e-3, rel
