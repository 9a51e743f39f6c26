"""Keyframe -> new Gaussians seeding (RGBD back-projection + downsample +
k-NN scale init).

Rebuild of reference gaussian_model.py:183-319 (create_pcd_from_image*,
extend_from_pcd_seq). The Open3D RGBD back-projection becomes a jnp pinhole
unproject; the random downsample keeps the reference's 1/downsample_factor
expectation; distCUDA2 becomes ops.knn.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.camera import Camera
from ..models.gaussian_map import ParamBlock, inverse_sigmoid
from ..ops import knn
from ..ops.sh import rgb_to_sh0, num_sh_coeffs


def backproject_depth(
    depth: jnp.ndarray,     # (H, W)
    image: jnp.ndarray,     # (3, H, W)
    cam: Camera,
    w2c: jnp.ndarray,       # (4, 4)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pinhole unproject all pixels with depth in (0, 100] to world points.

    Returns (points (P,3), colors (P,3), valid (P,)) with P = H*W (padded
    semantics: invalid entries are zeros)."""
    H, W = depth.shape
    ys = jnp.arange(H, dtype=jnp.float32) + 0.0
    xs = jnp.arange(W, dtype=jnp.float32) + 0.0
    px, py = jnp.meshgrid(xs, ys)
    z = depth
    # o3d convention: u = (x*fx/z + cx) at pixel centers (integer coords)
    x = (px - cam.cx) / cam.fx * z
    y = (py - cam.cy) / cam.fy * z
    pts_cam = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    valid = (depth > 0).reshape(-1) & (depth <= 100.0).reshape(-1)
    c2w_R = w2c[:3, :3].T
    c2w_t = -c2w_R @ w2c[:3, 3]
    pts_w = pts_cam @ c2w_R.T + c2w_t
    cols = image.reshape(3, -1).T
    return pts_w, cols, valid


@functools.partial(
    jax.jit,
    static_argnames=("downsample_factor", "point_size",
                     "adaptive_pointsize", "max_sh_degree", "isotropic",
                     "max_points"))
def seed_from_frame(
    image: jnp.ndarray,       # (3, H, W) (exposure-corrected upstream)
    depth: jnp.ndarray,       # (H, W) — the frontend's depth_map
    cam: Camera,
    w2c: jnp.ndarray,
    kf_id: int,
    key: jax.Array,
    downsample_factor: float,
    point_size: float,
    adaptive_pointsize: bool,
    max_sh_degree: int,
    isotropic: bool = False,
    max_points: Optional[int] = None,
) -> ParamBlock:
    """Build a padded ParamBlock of new Gaussians for this keyframe.

    Matches create_pcd_from_image_and_depth (gaussian_model.py:209-279):
    random 1/downsample keep, adaptive point size min(0.05, ps*median z),
    scale = log(sqrt(max(meanDist3NN, 1e-7) * point_size)), opacity 0.5,
    identity rotation, DC-only color.

    Jitted as ONE program: the eager version was ~20 separate XLA
    dispatches, and through the axon tunnel every executable pays a
    one-time first-dispatch load — the first keyframe seed measured
    170 s with every compile already in the persistent cache
    (results/tpu_async_r3d/run.log)."""
    H, W = depth.shape
    P = H * W
    if max_points is None:
        max_points = max(int(P / downsample_factor * 2), 1024)
    max_points = min(max_points, P)

    pts, cols, valid = backproject_depth(depth, image, cam, w2c)

    keep = jax.random.uniform(key, (P,)) < (1.0 / downsample_factor)
    valid = valid & keep

    if adaptive_pointsize:
        # median over valid depths
        d = jnp.where(valid, depth.reshape(-1), jnp.nan)
        med = jnp.nanmedian(d)
        ps = jnp.minimum(0.05, point_size * med)
    else:
        ps = jnp.asarray(point_size)

    # compact valid points to the front (stable) and truncate to max_points
    order = jnp.argsort(~valid, stable=True)
    pts_c = pts[order][:max_points]
    cols_c = cols[order][:max_points]
    valid_c = valid[order][:max_points]

    dist2 = jnp.maximum(
        knn.mean_sq_dist_3nn(pts_c, valid_c), 1e-7) * ps
    scales = jnp.log(jnp.sqrt(dist2))[:, None]
    scales = jnp.broadcast_to(scales, (max_points, 3))
    if isotropic:
        scales = scales[:, :1]

    n = max_points
    k_rest = num_sh_coeffs(max_sh_degree) - 1
    return ParamBlock(
        xyz=pts_c.astype(jnp.float32),
        features_dc=rgb_to_sh0(cols_c).reshape(n, 1, 3).astype(jnp.float32),
        features_rest=jnp.zeros((n, k_rest, 3), jnp.float32),
        scaling=scales.astype(jnp.float32),
        rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n, 1)),
        opacity=jnp.full((n, 1), inverse_sigmoid(jnp.asarray(0.5)),
                         jnp.float32),
        kf_id=jnp.full((n,), kf_id, jnp.int32),
        valid=valid_c,
    )
