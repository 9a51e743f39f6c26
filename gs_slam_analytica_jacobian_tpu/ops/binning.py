"""Tile binning for the production renderer (pure XLA, static shapes).

Rebuild of the reference's duplicate-by-tile + radix-sort + tile-range
pipeline (cuda_rasterizer/rasterizer_impl.cu:70-138, 327-367) with XLA
primitives:

- duplicateWithKeys  -> searchsorted-based pair expansion into a fixed
                        capacity buffer (data-dependent num_rendered becomes
                        a padded static B with an overflow counter)
- CUB radix sort     -> jax.lax.sort with (tile_id, depth) as a 2-key sort
                        (stable, so equal keys keep submission order like CUB)
- identifyTileRanges -> searchsorted over the sorted tile ids

The *rendering* tiles here are Pallas-sized (TY x TX, lanes-aligned),
while CUDA-parity visibility still uses the reference's 16x16 rect test —
the per-pair rect bounds ride along in the feature record and the kernel
re-applies the fine test per pixel.

Feature record layout (float32, 16 per pair):
  [0:2]  mean2d (pixels)
  [2:5]  conic (a, b, c)
  [5]    opacity
  [6:9]  color (r, g, b)
  [9]    depth
  [10:14] rect16 (x0, y0, x1, y1) as floats
  [14:16] padding
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gaussian_math import Preprocessed

FEAT_DIM = 16


class Binned(NamedTuple):
    """Sorted pair lists in a CHUNK-ALIGNED layout: each tile's pairs start
    at a multiple of the kernel chunk size K, so the Pallas kernels DMA
    lane-aligned slices and never touch another tile's rows."""

    feat: jnp.ndarray        # (B_al, FEAT_DIM) f32 — aligned pair features
    pair_gid: jnp.ndarray    # (B_al,) int32 gaussian index of each pair
    pair_valid: jnp.ndarray  # (B_al,) bool
    ranges: jnp.ndarray      # (n_tiles, 2) int32 [start, end), start % K == 0
    num_pairs: jnp.ndarray   # () int32 — pairs actually emitted
    overflow: jnp.ndarray    # () int32 — pairs dropped for lack of capacity


def _pallas_rect(prep: Preprocessed, tile_w: int, tile_h: int,
                 n_tx: int, n_ty: int):
    """Coarse rect in Pallas-tile units (same formula as getRect but with
    the Pallas tile size)."""
    mx = prep.mean2d[:, 0]
    my = prep.mean2d[:, 1]
    r = prep.radius
    x0 = jnp.clip(((mx - r) / tile_w).astype(jnp.int32), 0, n_tx)
    y0 = jnp.clip(((my - r) / tile_h).astype(jnp.int32), 0, n_ty)
    x1 = jnp.clip(((mx + r + tile_w - 1) / tile_w).astype(jnp.int32), 0, n_tx)
    y1 = jnp.clip(((my + r + tile_h - 1) / tile_h).astype(jnp.int32), 0, n_ty)
    return x0, y0, x1, y1


@partial(jax.jit, static_argnames=("tile_w", "tile_h", "n_tx", "n_ty",
                                   "capacity", "chunk"))
def bin_gaussians(
    prep: Preprocessed,
    tile_w: int, tile_h: int, n_tx: int, n_ty: int,
    capacity: int,
    chunk: int = 64,
) -> Binned:
    """Expand each valid Gaussian into (tile, depth, gid) pairs, sort by
    (tile, depth), relocate each tile's run to a chunk-aligned offset,
    gather features, compute per-tile ranges."""
    n = prep.depth.shape[0]
    n_tiles = n_tx * n_ty

    x0, y0, x1, y1 = _pallas_rect(prep, tile_w, tile_h, n_tx, n_ty)
    w = x1 - x0
    counts = jnp.where(prep.valid, w * (y1 - y0), 0).astype(jnp.int32)

    offs = jnp.cumsum(counts)                         # inclusive, (N,)
    total = offs[-1]
    starts = offs - counts                            # exclusive offsets
    num_pairs = jnp.minimum(total, capacity)
    overflow = jnp.maximum(total - capacity, 0)

    # pair p -> owning gaussian (first g with offs[g] > p)
    p_idx = jnp.arange(capacity, dtype=jnp.int32)
    gid = jnp.searchsorted(offs, p_idx, side="right").astype(jnp.int32)
    gid = jnp.minimum(gid, n - 1)
    local = p_idx - starts[gid]
    pair_ok = p_idx < num_pairs

    wg = jnp.maximum(w[gid], 1)
    tx = x0[gid] + local % wg
    ty = y0[gid] + local // wg
    tile_id = jnp.where(pair_ok, ty * n_tx + tx, n_tiles)  # invalid -> end

    depth_key = jnp.where(pair_ok, prep.depth[gid], jnp.inf)
    # two-key stable sort: tile asc, depth asc (CUB sorts a fused
    # [tile|depth-bits] 64-bit key — identical order)
    tile_s, _, gid_s = jax.lax.sort(
        (tile_id, depth_key, gid), num_keys=2)

    # per-tile ranges in the dense sorted order
    t_arange = jnp.arange(n_tiles, dtype=jnp.int32)
    range_start = jnp.searchsorted(tile_s, t_arange, side="left"
                                   ).astype(jnp.int32)
    range_end = jnp.searchsorted(tile_s, t_arange, side="right"
                                 ).astype(jnp.int32)
    n_t = range_end - range_start

    # aligned relocation: tile t's run starts at astart[t], a multiple of
    # `chunk`, with ceil(n_t/chunk)*chunk rows reserved
    cap_t = ((n_t + chunk - 1) // chunk) * chunk
    astart = (jnp.cumsum(cap_t) - cap_t).astype(jnp.int32)
    ranges = jnp.stack([astart, astart + n_t], axis=-1)

    B_al = capacity + n_tiles * chunk                  # static upper bound
    tile_clip = jnp.minimum(tile_s, n_tiles - 1)
    rank = p_idx - range_start[tile_clip]
    new_pos = jnp.where(
        tile_s < n_tiles,
        astart[tile_clip] + rank,
        B_al)                                          # dropped by scatter

    pair_gid = jnp.zeros((B_al,), jnp.int32).at[new_pos].set(
        gid_s, mode="drop")
    pair_valid = jnp.zeros((B_al,), bool).at[new_pos].set(
        tile_s < n_tiles, mode="drop")

    feat = build_pair_features(prep, pair_gid, pair_valid)
    return Binned(feat=feat, pair_gid=pair_gid, pair_valid=pair_valid,
                  ranges=ranges, num_pairs=num_pairs, overflow=overflow)


def build_pair_features(prep: Preprocessed, gid: jnp.ndarray,
                        pair_valid: jnp.ndarray) -> jnp.ndarray:
    """Gather the per-pair feature records (differentiable: the vjp of this
    gather is the scatter-add that accumulates per-pair gradients back onto
    Gaussians, replacing the CUDA backward's atomicAdd).

    Every gathered field is masked by pair_valid so that dead rows (and any
    kernel-side garbage in never-written gradient rows beyond the aligned
    ranges) scatter exact zeros in the vjp."""
    B = gid.shape[0]
    v1 = pair_valid[:, None]
    f = jnp.zeros((B, FEAT_DIM), prep.mean2d.dtype)
    f = f.at[:, 0:2].set(jnp.where(v1, prep.mean2d[gid], 0.0))
    f = f.at[:, 2:5].set(jnp.where(v1, prep.conic[gid], 0.0))
    f = f.at[:, 5].set(jnp.where(pair_valid, prep.opacity[gid], 0.0))
    f = f.at[:, 6:9].set(jnp.where(v1, prep.color[gid], 0.0))
    f = f.at[:, 9].set(jnp.where(pair_valid, prep.depth[gid], 0.0))
    rect = jnp.concatenate(
        [prep.rect_min.astype(prep.mean2d.dtype),
         prep.rect_max.astype(prep.mean2d.dtype)], axis=-1)   # (N, 4)
    # invalidate rect for dead pairs so the kernel's rect test fails
    rect_p = jnp.where(v1, rect[gid], -1.0)
    f = f.at[:, 10:14].set(jax.lax.stop_gradient(rect_p))
    return f
