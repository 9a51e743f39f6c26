"""Tile binning v2: TPU-fast pair planning (no searchsorted, no scatter-add).

Rebuild of the reference's duplicate-by-tile + radix-sort + tile-range
pipeline (cuda_rasterizer/rasterizer_impl.cu:70-138, 327-367), redesigned
around measured TPU op costs (scripts/profile_micro.py):

- B-scale gathers cost ~8.5 ns/row, searchsorted over a large table costs
  ~50x that, scatter-ADD is serialized — but sort, cumsum/cummax and
  scatter-SET run at bandwidth. So:
    * emission-slot -> gaussian mapping uses scatter-set + cummax instead
      of searchsorted (the round-1 version spent 258 ms there);
    * per-pair data is packed into ONE gather;
    * tile relocation uses a delta-scatter + cumsum + scatter-set instead
      of a second sort or per-pair searchsorted.
- The plan is separated from the per-iteration feature gather so tracking
  can bin once per frame and reuse the plan for every optimization
  iteration (the CUDA reference re-bins every render because binning is
  ~free there; on TPU it is not, and the pose moves < a pixel per
  iteration — ``radius_pad`` inflates rects to keep coverage while the
  pose drifts within a frame).

The aligned pair layout: each tile's run starts at a multiple of ``chunk``
so the Pallas kernels DMA full-lane slices that never cross tiles.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gaussian_math import Preprocessed

FEAT_DIM = 16


class PairPlan(NamedTuple):
    """Static-shape pair plan, reusable across render iterations.

    B_al = capacity + n_tiles * chunk (aligned buffer size).
    """

    pair_gid1: jnp.ndarray    # (B_al,) int32 gaussian index + 1; 0 = dead
    ranges: jnp.ndarray       # (n_tiles, 2) int32 [start, end), start%K==0
    aligned_of_em: jnp.ndarray  # (capacity,) int32 emission -> aligned pos
                                # (== B_al for dropped slots)
    seg_start: jnp.ndarray    # (N,) int32 emission segment start per gaussian
    seg_end: jnp.ndarray      # (N,) int32 emission segment end (exclusive)
    num_pairs: jnp.ndarray    # () int32 pairs actually emitted (<= capacity)
    overflow: jnp.ndarray     # () int32 pairs dropped for lack of capacity
    num_kept: jnp.ndarray     # () int32 pairs surviving the conic cull


def _rect(mean2d, rx, ry, tile_w, tile_h, n_tx, n_ty):
    """Coarse rect in Pallas-tile units (getRect, auxiliary.h:46-56),
    per-axis tight half-extents (see gaussian_math tight-cull note)."""
    mx = mean2d[:, 0]
    my = mean2d[:, 1]
    x0 = jnp.clip(((mx - rx) / tile_w).astype(jnp.int32), 0, n_tx)
    y0 = jnp.clip(((my - ry) / tile_h).astype(jnp.int32), 0, n_ty)
    x1 = jnp.clip(((mx + rx + tile_w - 1) / tile_w).astype(jnp.int32),
                  0, n_tx)
    y1 = jnp.clip(((my + ry + tile_h - 1) / tile_h).astype(jnp.int32),
                  0, n_ty)
    return x0, y0, x1, y1


@partial(jax.jit, static_argnames=(
    "tile_w", "tile_h", "n_tx", "n_ty", "capacity", "chunk", "conic_cull",
    "opa_growth"))
def plan_pairs(
    prep: Preprocessed,
    tile_w: int, tile_h: int, n_tx: int, n_ty: int,
    capacity: int,
    chunk: int = 128,
    radius_scale: float = 1.0,
    radius_pad: float = 0.0,
    conic_cull: bool = True,
    opa_growth: float = 1.0,
) -> PairPlan:
    """Expand valid Gaussians into depth-sorted, tile-grouped pair slots.

    ``conic_cull``: per-(gaussian, tile) elliptical culling. The rect
    emission (the reference's getRect AABB, auxiliary.h:46-56) covers the
    axis-aligned bounding box of the 2D splat, but the compositing kernel
    skips every cell whose alpha falls below 1/255 (forward.cu:496-500;
    tile_kernel2 ALPHA_MIN) — so a pair whose PEAK alpha over its tile is
    under that threshold contributes exactly zero and can be dropped from
    the plan with bit-identical output. The peak is the exact minimum of
    the conic quadratic form over the tile's pixel box (inflated by
    ``radius_pad``, the same pose-drift budget the rects carry, so plan
    reuse stays safe), evaluated on the four box edges — for the thin
    anisotropic splats of a converged map the AABB's corner tiles are
    mostly sub-threshold, which is where the pair volume (and therefore
    the kernel's pair-cell bill, PERF.md r3 roofline) goes. Culled pairs
    keep their emission slot (capacity and sort length are sized by the
    rect emission) but leave every tile range, so the kernel never walks
    them."""
    prep = jax.tree.map(jax.lax.stop_gradient, prep)
    n = prep.depth.shape[0]
    n_tiles = n_tx * n_ty
    B_al = capacity + n_tiles * chunk

    alive = (prep.valid & (prep.radius_xy[:, 0] > 0.0)
             & (prep.radius_xy[:, 1] > 0.0))
    rx = jnp.where(alive, prep.radius_xy[:, 0] * radius_scale + radius_pad,
                   0.0)
    ry = jnp.where(alive, prep.radius_xy[:, 1] * radius_scale + radius_pad,
                   0.0)
    x0, y0, x1, y1 = _rect(prep.mean2d, rx, ry, tile_w, tile_h, n_tx, n_ty)
    w = x1 - x0
    counts = jnp.where(alive, w * (y1 - y0), 0).astype(jnp.int32)

    offs = jnp.cumsum(counts)                     # inclusive (N,)
    total = offs[-1]
    starts = offs - counts
    num_pairs = jnp.minimum(total, capacity)
    overflow = jnp.maximum(total - capacity, 0)

    # emission slot p -> owning gaussian, via scatter-set + cummax (only
    # gaussians with counts>0 scatter; their starts are distinct).
    g_idx = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.where((counts > 0) & (starts < capacity), starts, capacity)
    gmark = jnp.zeros((capacity,), jnp.int32).at[pos].max(
        g_idx + 1, mode="drop")
    gid = jnp.maximum(jax.lax.cummax(gmark) - 1, 0)          # (capacity,)
    smark = jnp.zeros((capacity,), jnp.int32).at[pos].max(
        starts + 1, mode="drop")
    start_of_p = jnp.maximum(jax.lax.cummax(smark) - 1, 0)

    p_idx = jnp.arange(capacity, dtype=jnp.int32)
    local = p_idx - start_of_p
    pair_ok = p_idx < num_pairs

    # one packed gather for per-pair gaussian data
    cols = [x0.astype(jnp.float32), y0.astype(jnp.float32),
            jnp.maximum(w, 1).astype(jnp.float32), prep.depth]
    if conic_cull:
        cols += [prep.mean2d[:, 0], prep.mean2d[:, 1],
                 prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
                 prep.opacity]
    btab = jnp.stack(cols, axis=1)                           # (N, 4|10)
    bt = btab[gid]                                           # (capacity, .)
    wg = bt[:, 2].astype(jnp.int32)
    tx = bt[:, 0].astype(jnp.int32) + local % wg
    ty = bt[:, 1].astype(jnp.int32) + local // wg
    tile_id = jnp.where(pair_ok, ty * n_tx + tx, n_tiles)

    if conic_cull:
        f32 = jnp.float32
        mx, my = bt[:, 4], bt[:, 5]
        ca = jnp.maximum(bt[:, 6], 1e-12)
        cb = bt[:, 7]
        cc = jnp.maximum(bt[:, 8], 1e-12)
        opa = bt[:, 9]
        # pixel box of the tile (kernel pixel coords are the integers
        # tx*tile_w .. tx*tile_w+tile_w-1), inflated by the pose-drift pad
        pad = radius_pad
        dxlo = (tx * tile_w).astype(f32) - pad - mx
        dxhi = (tx * tile_w + (tile_w - 1)).astype(f32) + pad - mx
        dylo = (ty * tile_h).astype(f32) - pad - my
        dyhi = (ty * tile_h + (tile_h - 1)).astype(f32) + pad - my
        inside = (dxlo <= 0.0) & (0.0 <= dxhi) & (dylo <= 0.0) & (0.0 <= dyhi)

        # exact min of Q(d) = a dx^2 + 2 b dx dy + c dy^2 over the box:
        # 0 if the mean is inside, else the min over the four edges, each
        # a 1D quadratic with a closed-form clamped stationary point.
        def q_edge_x(ex):
            yy = jnp.clip(-cb * ex / cc, dylo, dyhi)
            return ca * ex * ex + 2.0 * cb * ex * yy + cc * yy * yy

        def q_edge_y(ey):
            xx = jnp.clip(-cb * ey / ca, dxlo, dxhi)
            return ca * xx * xx + 2.0 * cb * ey * xx + cc * ey * ey

        qmin = jnp.minimum(
            jnp.minimum(q_edge_x(dxlo), q_edge_x(dxhi)),
            jnp.minimum(q_edge_y(dylo), q_edge_y(dyhi)))
        qmin = jnp.where(inside, 0.0, qmin)
        # keep iff peak alpha = opa * exp(-qmin/2) could reach the
        # kernel's skip threshold; the 0.5 slack absorbs the conic drift
        # the box pad cannot (the pad budgets mean2d motion only).
        # ``opa_growth`` budgets opacity drift under plan reuse: mapping
        # reuses a plan for up to plan_reuse_iters=16 Adam steps at
        # opacity_lr=0.05, so a logit can move ~0.8 and a small (e.g.
        # freshly densified) opacity can grow ~e^0.8 ~ 2.2x before the
        # rebuild — the mapping path passes 2.23 so pairs culled at
        # build time cannot become visible (and silently gradient-
        # dropped) mid-reuse. Tracking plans keep 1.0: gaussian params
        # are frozen within a frame (only the pose moves, which the box
        # pad budgets), and the weaker threshold costs real pairs at
        # 16px granularity.
        opa_eff = jnp.minimum(opa * opa_growth, 1.0)
        qthr = 2.0 * jnp.log(jnp.maximum(opa_eff, 1e-12) * (2.0 * 255.0))
        tile_id = jnp.where(pair_ok & (qmin > qthr), n_tiles, tile_id)

    pair_live = tile_id < n_tiles
    depth_key = jnp.where(pair_live, bt[:, 3], jnp.inf)
    num_kept = jnp.sum(pair_live.astype(jnp.int32))

    # packed [tile | depth-bits] single int32 key — the reference fuses
    # the same pair key into one 64-bit word for its radix sort
    # (rasterizer_impl.cu:70-90); here it turns the 4-operand 2-key
    # comparator sort into a 3-operand 1-key sort (measured on chip:
    # 3.7 -> 3.1 ms per 512k-slot sort, ~15%; the sort is ~25% of the
    # plan build — PERF.md r3). Positive-f32 bit patterns are monotonic
    # in value (depth > 0.2 by preprocess validity; inf for dead slots),
    # so truncating the low mantissa bits preserves depth order up to
    # >= 2^-13 relative ties, which the stable sort breaks by emission
    # order — same tie rule as the reference's truncated float key.
    d_bits = 31 - int(n_tiles).bit_length()   # (n_tiles+1)<<d_bits <= 2^31
    depth_bits = jax.lax.bitcast_convert_type(depth_key, jnp.int32)
    key = (tile_id << d_bits) | (depth_bits >> (31 - d_bits))
    key_s, gid_s, em_s = jax.lax.sort((key, gid, p_idx), num_keys=1)

    # per-tile ranges in sorted order: tile t occupies keys in
    # [t<<d_bits, (t+1)<<d_bits) (few queries -> searchsorted is fine)
    t_ar = jnp.arange(n_tiles, dtype=jnp.int32)
    bounds = jnp.searchsorted(
        key_s, jnp.arange(n_tiles + 1, dtype=jnp.int32) << d_bits,
        side="left").astype(jnp.int32)
    rs, re_ = bounds[:-1], bounds[1:]
    n_t = re_ - rs

    # aligned relocation offsets: tile t starts at astart[t] (mult of chunk)
    cap_t = ((n_t + chunk - 1) // chunk) * chunk
    astart = (jnp.cumsum(cap_t) - cap_t).astype(jnp.int32)
    ranges = jnp.stack([astart, astart + n_t], axis=-1)

    # per-sorted-slot shift via delta scatter + cumsum (empty tiles can
    # share rs positions, so deltas must accumulate -> tiny scatter-add)
    shift = astart - rs                                      # (n_tiles,)
    delta = jnp.diff(shift, prepend=shift[:1] * 0) + jnp.where(
        t_ar == 0, shift[0], 0)
    dpos = jnp.where(rs < capacity, rs, capacity)
    dvec = jnp.zeros((capacity,), jnp.int32).at[dpos].add(delta, mode="drop")
    new_pos = p_idx + jnp.cumsum(dvec)
    new_pos = jnp.where(key_s < (n_tiles << d_bits), new_pos, B_al)

    pair_gid1 = jnp.zeros((B_al,), jnp.int32).at[new_pos].set(
        gid_s + 1, mode="drop")
    aligned_of_em = jnp.full((capacity,), B_al, jnp.int32).at[em_s].set(
        new_pos, mode="drop")

    return PairPlan(pair_gid1=pair_gid1, ranges=ranges,
                    aligned_of_em=aligned_of_em,
                    seg_start=starts, seg_end=offs,
                    num_pairs=num_pairs, overflow=overflow,
                    num_kept=num_kept)
