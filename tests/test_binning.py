"""Aligned tile binning vs a direct numpy reference."""

import jax.numpy as jnp
import numpy as np

from gs_slam_analytica_jacobian_tpu.ops import binning
from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gm
from gs_slam_analytica_jacobian_tpu.ops import camera_math as cm

from test_renderer_ref import make_scene


def test_binning_ranges_and_order(rng):
    sc = make_scene(rng, n=30, W=256, H=64)
    tile_w, tile_h = 128, 8
    n_tx, n_ty = 2, 8
    chunk = 128

    prep = gm.preprocess(
        jnp.asarray(sc["means"]),
        gm.build_cov3d(jnp.asarray(sc["scales"]), jnp.asarray(sc["quats"])),
        jnp.asarray(sc["opac"]), jnp.asarray(sc["shs"]), 3,
        jnp.asarray(sc["w2c"]), jnp.asarray(sc["proj"]), jnp.zeros(6),
        sc["fx"], sc["fy"], sc["W"], sc["H"], sc["tanfovx"], sc["tanfovy"])

    out = binning.bin_gaussians(prep, tile_w, tile_h, n_tx, n_ty,
                                capacity=4096, chunk=chunk)
    ranges = np.asarray(out.ranges)
    gid = np.asarray(out.pair_gid)
    valid = np.asarray(out.pair_valid)
    depth = np.asarray(prep.depth)

    # numpy reference: per-tile gaussian lists sorted by depth
    mx = np.asarray(prep.mean2d)
    r = np.asarray(prep.radius)
    pv = np.asarray(prep.valid)
    expected = {t: [] for t in range(n_tx * n_ty)}
    for i in np.argsort(depth, kind="stable"):
        if not pv[i]:
            continue
        x0 = int(np.clip((mx[i, 0] - r[i]) // tile_w, 0, n_tx))
        x1 = int(np.clip(-((mx[i, 0] + r[i] + tile_w - 1) // -tile_w
                           ) * -1, 0, n_tx))
        x1 = int(np.clip((mx[i, 0] + r[i] + tile_w - 1) // tile_w, 0, n_tx))
        y0 = int(np.clip((mx[i, 1] - r[i]) // tile_h, 0, n_ty))
        y1 = int(np.clip((mx[i, 1] + r[i] + tile_h - 1) // tile_h, 0, n_ty))
        for ty in range(y0, y1):
            for tx_ in range(x0, x1):
                expected[ty * n_tx + tx_].append(i)

    for t in range(n_tx * n_ty):
        s, e = ranges[t]
        assert s % chunk == 0
        got = list(gid[s:e])
        assert np.all(valid[s:e])
        assert got == expected[t], (t, got, expected[t])
        # padding rows up to the aligned capacity are invalid
        cap_end = s + ((e - s + chunk - 1) // chunk) * chunk
        assert not np.any(valid[e:cap_end])
