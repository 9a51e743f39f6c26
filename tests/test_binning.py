"""binning2.plan_pairs vs a direct numpy reference.

Checks the static-shape pair plan (scatter-set + cummax slot mapping,
2-key stable sort, chunk-aligned relocation) reproduces the reference
pipeline's per-tile depth-sorted gaussian lists
(cuda_rasterizer/rasterizer_impl.cu:70-138, 327-367).
"""

import jax.numpy as jnp
import numpy as np

from gs_slam_analytica_jacobian_tpu.ops import binning2
from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gm

from test_renderer_ref import make_scene


def _numpy_tile_lists(prep, tile_w, tile_h, n_tx, n_ty):
    """Per-tile gaussian lists sorted stably by depth (emission order for
    ties), mirroring binning2._rect / the CUDA getRect semantics."""
    mx = np.asarray(prep.mean2d)
    rxy = np.asarray(prep.radius_xy)
    pv = np.asarray(prep.valid)
    depth = np.asarray(prep.depth)
    expected = {t: [] for t in range(n_tx * n_ty)}
    order = np.argsort(depth, kind="stable")
    for i in order:
        if not (pv[i] and rxy[i, 0] > 0 and rxy[i, 1] > 0):
            continue
        rx, ry = rxy[i, 0], rxy[i, 1]
        x0 = int(np.clip((mx[i, 0] - rx) // tile_w, 0, n_tx))
        x1 = int(np.clip((mx[i, 0] + rx + tile_w - 1) // tile_w, 0, n_tx))
        y0 = int(np.clip((mx[i, 1] - ry) // tile_h, 0, n_ty))
        y1 = int(np.clip((mx[i, 1] + ry + tile_h - 1) // tile_h, 0, n_ty))
        for ty in range(y0, y1):
            for tx_ in range(x0, x1):
                expected[ty * n_tx + tx_].append(i)
    return expected


def test_plan_pairs_ranges_and_order(rng):
    sc = make_scene(rng, n=30, W=256, H=64)
    tile_w = tile_h = 32
    n_tx, n_ty = 8, 2
    chunk = 128

    prep = gm.preprocess(
        jnp.asarray(sc["means"]),
        gm.build_cov3d(jnp.asarray(sc["scales"]), jnp.asarray(sc["quats"])),
        jnp.asarray(sc["opac"]), jnp.asarray(sc["shs"]), 3,
        jnp.asarray(sc["w2c"]), jnp.asarray(sc["proj"]), jnp.zeros(6),
        sc["fx"], sc["fy"], sc["W"], sc["H"], sc["tanfovx"], sc["tanfovy"])

    plan = binning2.plan_pairs(prep, tile_w, tile_h, n_tx, n_ty,
                               capacity=4096, chunk=chunk, conic_cull=False)
    ranges = np.asarray(plan.ranges)
    gid1 = np.asarray(plan.pair_gid1)
    expected = _numpy_tile_lists(prep, tile_w, tile_h, n_tx, n_ty)

    assert int(plan.overflow) == 0
    total = sum(len(v) for v in expected.values())
    assert int(plan.num_pairs) == total

    for t in range(n_tx * n_ty):
        s, e = ranges[t]
        assert s % chunk == 0
        got = list(gid1[s:e] - 1)
        assert np.all(gid1[s:e] > 0)
        assert got == expected[t], (t, got, expected[t])
        # padding rows up to the aligned capacity are dead (gid1 == 0)
        cap_end = s + ((e - s + chunk - 1) // chunk) * chunk
        assert not np.any(gid1[e:cap_end])


def test_plan_pairs_overflow_counts(rng):
    sc = make_scene(rng, n=64, W=256, H=64)
    prep = gm.preprocess(
        jnp.asarray(sc["means"]),
        gm.build_cov3d(jnp.asarray(sc["scales"]), jnp.asarray(sc["quats"])),
        jnp.asarray(sc["opac"]), jnp.asarray(sc["shs"]), 3,
        jnp.asarray(sc["w2c"]), jnp.asarray(sc["proj"]), jnp.zeros(6),
        sc["fx"], sc["fy"], sc["W"], sc["H"], sc["tanfovx"], sc["tanfovy"])
    full = binning2.plan_pairs(prep, 32, 32, 8, 2, capacity=8192)
    total = int(full.num_pairs)
    assert total > 8
    small_cap = max(128, (total // 2) // 128 * 128)
    clipped = binning2.plan_pairs(prep, 32, 32, 8, 2, capacity=small_cap)
    assert int(clipped.overflow) == total - small_cap
    assert int(clipped.num_pairs) == small_cap


def test_conic_cull_is_semantics_preserving(rng):
    """Per-(gaussian, tile) conic culling (binning2.plan_pairs conic_cull):
    dropped pairs must all be below the kernel's own 1/255 alpha-skip
    threshold over every pixel of their tile, so their contribution is
    exactly zero (forward.cu:496-500 / tile_kernel2.ALPHA_MIN skip those
    cells anyway). The rendered output is equal up to f32 summation
    REGROUPING only: removing dead pairs shifts the survivors across the
    kernel's 128-pair chunk boundaries, which re-associates the (exactly
    zero-contribution) accumulations — a few-ulp effect, not a semantic
    one."""
    from gs_slam_analytica_jacobian_tpu.ops import renderer_tiled

    # elongated splats: large tangent scales with high anisotropy so the
    # AABB emission covers many sub-threshold corner tiles
    sc = make_scene(rng, n=40, W=256, H=96)
    sc = dict(sc)
    scales = np.asarray(sc["scales"]).copy()
    scales[:, 0] += 1.5      # stretch one axis ~4.5x
    sc["scales"] = scales

    prep = gm.preprocess(
        jnp.asarray(sc["means"]),
        gm.build_cov3d(jnp.asarray(sc["scales"]), jnp.asarray(sc["quats"])),
        jnp.asarray(sc["opac"]), jnp.asarray(sc["shs"]), 3,
        jnp.asarray(sc["w2c"]), jnp.asarray(sc["proj"]), jnp.zeros(6),
        sc["fx"], sc["fy"], sc["W"], sc["H"], sc["tanfovx"], sc["tanfovy"])
    n_tx, n_ty = 8, 3

    plans = {
        cull: binning2.plan_pairs(prep, 32, 32, n_tx, n_ty, capacity=8192,
                                  conic_cull=cull)
        for cull in (False, True)
    }
    assert int(plans[True].num_kept) < int(plans[True].num_pairs), \
        "cull dropped nothing on an anisotropic scene"
    assert int(plans[False].num_kept) == int(plans[False].num_pairs)

    # every dropped (gaussian, tile) is sub-threshold at EVERY pixel
    mean2d = np.asarray(prep.mean2d)
    conic = np.asarray(prep.conic)
    opac = np.asarray(prep.opacity)
    for t in range(n_tx * n_ty):
        def tile_list(plan):
            s, e = np.asarray(plan.ranges)[t]
            return list(np.asarray(plan.pair_gid1)[s:e] - 1)
        dropped = set(tile_list(plans[False])) - set(tile_list(plans[True]))
        ty0, tx0 = (t // n_tx) * 32, (t % n_tx) * 32
        pxs, pys = np.meshgrid(np.arange(tx0, tx0 + 32),
                               np.arange(ty0, ty0 + 32))
        for g in dropped:
            dx = mean2d[g, 0] - pxs
            dy = mean2d[g, 1] - pys
            a, b, c = conic[g]
            power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
            peak = opac[g] * np.exp(power).max()
            assert peak < 1.0 / 255.0, (t, g, peak)

    def render_with(plan):
        return renderer_tiled.render(
            jnp.asarray(sc["means"]),
            gm.build_cov3d(jnp.asarray(sc["scales"]),
                           jnp.asarray(sc["quats"])),
            jnp.asarray(sc["opac"]), jnp.asarray(sc["shs"]), 3,
            jnp.asarray(sc["w2c"]), jnp.asarray(sc["proj"]), jnp.zeros(6),
            sc["fx"], sc["fy"], sc["W"], sc["H"],
            sc["tanfovx"], sc["tanfovy"],
            jnp.zeros(3), pair_capacity=8192, interpret=True, plan=plan)

    out_full = render_with(plans[False])
    out_cull = render_with(plans[True])
    np.testing.assert_allclose(np.asarray(out_full.color),
                               np.asarray(out_cull.color), atol=3e-6)
    np.testing.assert_allclose(np.asarray(out_full.depth),
                               np.asarray(out_cull.depth), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_full.opacity),
                               np.asarray(out_cull.opacity), atol=3e-6)
