"""k-NN mean distance for Gaussian scale initialization.

TPU-native equivalent of the reference's simple-knn CUDA module
(submodules/simple-knn/simple_knn.cu:45-221): distCUDA2(points) returns the
mean squared distance to each point's 3 nearest neighbors, used only for
scale init (gaussian_model.py:259-266).

The CUDA version is approximate (10-bit Morton sort + per-1024-point AABB
box rejection + windowed candidate search). Here:

- ``mean_sq_dist_3nn_exact``: O(N^2) tiled exact top-3 — fine for the
  per-keyframe point batches this is actually called on (a few thousand
  points after downsampling).
- ``mean_sq_dist_3nn_morton``: Morton-sorted window search (the CUDA
  algorithm's shape, without the box pass) for large N.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _pairwise_sq_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aa = jnp.sum(a * a, axis=-1)[:, None]
    bb = jnp.sum(b * b, axis=-1)[None, :]
    ab = a @ b.T
    return jnp.maximum(aa + bb - 2.0 * ab, 0.0)


@partial(jax.jit, static_argnames=("chunk",))
def mean_sq_dist_3nn_exact(points: jnp.ndarray, valid=None,
                           chunk: int = 1024) -> jnp.ndarray:
    """Mean squared distance to the 3 nearest neighbors (exact).

    points: (N, 3); valid: optional (N,) bool — invalid points are excluded
    as neighbors and get output 0. Returns (N,)."""
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    big = jnp.float32(1e30)

    pad = (-n) % chunk
    pts_p = jnp.pad(points, ((0, pad), (0, 0)))
    val_p = jnp.pad(valid, (0, pad))
    n_chunks = (n + pad) // chunk
    pts_c = pts_p.reshape(n_chunks, chunk, 3)
    val_c = val_p.reshape(n_chunks, chunk)
    idx_c = jnp.arange(n + pad).reshape(n_chunks, chunk)

    def body(args):
        q, qv, qi = args
        d = _pairwise_sq_dist(q, points)            # (chunk, N)
        d = jnp.where(valid[None, :], d, big)
        # exclude self
        self_mask = qi[:, None] == jnp.arange(n)[None, :]
        d = jnp.where(self_mask, big, d)
        top = -jax.lax.top_k(-d, 3)[0]              # (chunk, 3) smallest
        out = jnp.mean(top, axis=-1)
        return jnp.where(qv, out, 0.0)

    res = jax.lax.map(body, (pts_c, val_c, idx_c))
    return res.reshape(-1)[:n]


def _morton_codes(points: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """10-bit-per-axis Morton codes (simple_knn.cu:45-61)."""
    big = jnp.float32(1e30)
    p = jnp.where(valid[:, None], points, 0.0)
    lo = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], points, -big), axis=0)
    rng = jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip(((p - lo) / rng) * 1023.0, 0, 1023).astype(jnp.uint32)

    def spread(x):
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    code = (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
            | (spread(q[:, 2]) << 2))
    return jnp.where(valid, code, jnp.uint32(0xFFFFFFFF))


@partial(jax.jit, static_argnames=("window",))
def mean_sq_dist_3nn_morton(points: jnp.ndarray, valid=None,
                            window: int = 32) -> jnp.ndarray:
    """Approximate 3-NN via Morton order + +/-window candidate search.

    O(N*window); matches the CUDA algorithm's quality for locality-coherent
    point clouds (backprojected depth maps)."""
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    codes = _morton_codes(points, valid)
    order = jnp.argsort(codes)
    pts_s = points[order]
    val_s = valid[order]

    big = jnp.float32(1e30)
    offsets = jnp.arange(-window, window + 1)
    idx = jnp.arange(n)
    nbr = jnp.clip(idx[:, None] + offsets[None, :], 0, n - 1)   # (N, 2w+1)
    cand = pts_s[nbr]                                           # (N, 2w+1, 3)
    cand_valid = val_s[nbr] & (nbr != idx[:, None])
    d = jnp.sum((cand - pts_s[:, None, :]) ** 2, axis=-1)
    d = jnp.where(cand_valid, d, big)
    top = -jax.lax.top_k(-d, 3)[0]
    out_s = jnp.where(val_s, jnp.mean(top, axis=-1), 0.0)

    inv = jnp.argsort(order)
    return out_s[inv]


def mean_sq_dist_3nn(points: jnp.ndarray, valid=None) -> jnp.ndarray:
    """Dispatch: exact for small N, Morton-window for large."""
    if points.shape[0] <= 16384:
        return mean_sq_dist_3nn_exact(points, valid)
    return mean_sq_dist_3nn_morton(points, valid)
