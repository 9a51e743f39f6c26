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
                               capacity=4096, chunk=chunk)
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
