#!/usr/bin/env python
"""Decompose the renderer backward cost on the real TPU.

Measures separately:
  1. full fwd render
  2. pallas composite fwd only (feat fixed)
  3. pallas composite fwd+bwd (custom_vjp kernel pair, feat fixed)
  4. pair-feature gather fwd + its AD vjp (the scatter-add suspect)
  5. preprocess fwd+bwd
  6. binning alone
  7. full render fwd+bwd
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gm
from gs_slam_analytica_jacobian_tpu.ops import camera_math as cm
from gs_slam_analytica_jacobian_tpu.ops import renderer_tiled
from gs_slam_analytica_jacobian_tpu.ops.binning import (
    bin_gaussians, build_pair_features)
from gs_slam_analytica_jacobian_tpu.ops.pallas.tile_composite import (
    composite_tiles)

print("devices:", jax.devices())

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
PAIR_CAP = 1 << 21
W, H = 1200, 680
fx = fy = 600.0
cx, cy = 599.5, 339.5

rng = np.random.default_rng(0)
means = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
means[:, 2] = rng.uniform(0.5, 6.0, size=N)
scales = np.exp(rng.normal(size=(N, 3)).astype(np.float32) * 0.3 - 4.0)
quats = rng.normal(size=(N, 4)).astype(np.float32)
opac = 1 / (1 + np.exp(-rng.normal(size=N).astype(np.float32)))
shs = (rng.normal(size=(N, 1, 3)) * 0.3).astype(np.float32)
w2c = np.eye(4, dtype=np.float32)
proj = cm.projection_matrix(0.01, 100.0, cx, cy, fx, fy, W, H)
bg = jnp.zeros(3)

cov6 = gm.build_cov3d(jnp.asarray(scales), jnp.asarray(quats))
means = jnp.asarray(means)
opacj = jnp.asarray(opac)
shsj = jnp.asarray(shs)
w2cj = jnp.asarray(w2c)
projj = jnp.asarray(proj)
tanfovx, tanfovy = W / (2 * fx), H / (2 * fy)

TILE_H, TILE_W, CHUNK = (renderer_tiled.TILE_H, renderer_tiled.TILE_W,
                         renderer_tiled.CHUNK)
n_tx, n_ty = renderer_tiled._grid_dims(W, H)


def timed(label, fn, *a, reps=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f"{label:40s} {(time.time()-t0)/reps*1000:10.2f} ms")
    return out


# --- pieces ---
@jax.jit
def prep_fn(means, cov6, opa, shs, tau):
    return gm.preprocess(means, cov6, opa, shs, 0, w2cj, projj, tau,
                         fx, fy, W, H, tanfovx, tanfovy)


prep = timed("preprocess fwd", prep_fn, means, cov6, opacj, shsj,
             jnp.zeros(6))


@jax.jit
def prep_grad(means, cov6, opa, shs, tau):
    def f(means, cov6, opa, shs, tau):
        p = gm.preprocess(means, cov6, opa, shs, 0, w2cj, projj, tau,
                          fx, fy, W, H, tanfovx, tanfovy)
        return (jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(p.color)
                + jnp.sum(p.depth) + jnp.sum(p.opacity))
    return jax.grad(f, argnums=(0, 1, 2, 3, 4))(means, cov6, opa, shs, tau)


timed("preprocess fwd+bwd", prep_grad, means, cov6, opacj, shsj,
      jnp.zeros(6))


@jax.jit
def bin_fn(prep):
    return bin_gaussians(prep, TILE_W, TILE_H, n_tx, n_ty, PAIR_CAP,
                         chunk=CHUNK)


binned = timed("binning", bin_fn, prep)
print("   num_pairs:", int(binned.num_pairs), "overflow:",
      int(binned.overflow), "B_al:", binned.feat.shape[0])


@jax.jit
def gather_fn(prep, gid, valid):
    return build_pair_features(prep, gid, valid)


feat = timed("pair gather fwd", gather_fn, prep, binned.pair_gid,
             binned.pair_valid)


@jax.jit
def gather_grad(mean2d, conic, opacity, color, depth, prep, gid, valid,
                dfeat):
    def f(mean2d, conic, opacity, color, depth):
        p = prep._replace(mean2d=mean2d, conic=conic, opacity=opacity,
                          color=color, depth=depth)
        ft = build_pair_features(p, gid, valid)
        return jnp.vdot(ft, dfeat)
    return jax.grad(f, argnums=(0, 1, 2, 3, 4))(
        mean2d, conic, opacity, color, depth)


dfeat = jnp.ones_like(feat)
timed("pair gather fwd+vjp (scatter-add)", gather_grad, prep.mean2d,
      prep.conic, prep.opacity, prep.color, prep.depth, prep,
      binned.pair_gid, binned.pair_valid, dfeat)

# --- binning internals ---
n_tiles = n_tx * n_ty
capacity = PAIR_CAP


@jax.jit
def bin_counts(prep):
    from gs_slam_analytica_jacobian_tpu.ops.binning import _pallas_rect
    x0, y0, x1, y1 = _pallas_rect(prep, TILE_W, TILE_H, n_tx, n_ty)
    w_ = x1 - x0
    counts = jnp.where(prep.valid, w_ * (y1 - y0), 0).astype(jnp.int32)
    offs = jnp.cumsum(counts)
    return offs, counts


offs, counts = timed("  bin: rect+counts+cumsum", bin_counts, prep)
starts = offs - counts


@jax.jit
def bin_gid(offs):
    p_idx = jnp.arange(capacity, dtype=jnp.int32)
    gid = jnp.searchsorted(offs, p_idx, side="right").astype(jnp.int32)
    return jnp.minimum(gid, N - 1)


gid0 = timed("  bin: searchsorted gid (2M->100k)", bin_gid, offs)


@jax.jit
def bin_sort(tile_id, depth_key, gid):
    return jax.lax.sort((tile_id, depth_key, gid), num_keys=2)


p_idx = jnp.arange(capacity, dtype=jnp.int32)
local = p_idx - starts[gid0]
from gs_slam_analytica_jacobian_tpu.ops.binning import _pallas_rect
x0, y0, x1, y1 = _pallas_rect(prep, TILE_W, TILE_H, n_tx, n_ty)
wg = jnp.maximum((x1 - x0)[gid0], 1)
pair_ok = p_idx < jnp.minimum(offs[-1], capacity)
txp = x0[gid0] + local % wg
typ = y0[gid0] + local // wg
tile_id = jnp.where(pair_ok, typ * n_tx + txp, n_tiles)
depth_key = jnp.where(pair_ok, prep.depth[gid0], jnp.inf)
srt = timed("  bin: 2-key sort (2M)", bin_sort, tile_id, depth_key, gid0)
tile_s, _, gid_s = srt


@jax.jit
def bin_scatter(tile_s, gid_s):
    t_arange = jnp.arange(n_tiles, dtype=jnp.int32)
    range_start = jnp.searchsorted(tile_s, t_arange, side="left"
                                   ).astype(jnp.int32)
    range_end = jnp.searchsorted(tile_s, t_arange, side="right"
                                 ).astype(jnp.int32)
    n_t = range_end - range_start
    cap_t = ((n_t + CHUNK - 1) // CHUNK) * CHUNK
    astart = (jnp.cumsum(cap_t) - cap_t).astype(jnp.int32)
    B_al = capacity + n_tiles * CHUNK
    tile_clip = jnp.minimum(tile_s, n_tiles - 1)
    rank = jnp.arange(capacity, dtype=jnp.int32) - range_start[tile_clip]
    new_pos = jnp.where(tile_s < n_tiles, astart[tile_clip] + rank, B_al)
    pair_gid = jnp.zeros((B_al,), jnp.int32).at[new_pos].set(
        gid_s, mode="drop")
    return pair_gid


timed("  bin: ranges+scatter-relocate", bin_scatter, tile_s, gid_s)


# variant: inverse gather instead of scatter
@jax.jit
def bin_inverse_gather(tile_s, gid_s):
    t_arange = jnp.arange(n_tiles, dtype=jnp.int32)
    range_start = jnp.searchsorted(tile_s, t_arange, side="left"
                                   ).astype(jnp.int32)
    range_end = jnp.searchsorted(tile_s, t_arange, side="right"
                                 ).astype(jnp.int32)
    n_t = range_end - range_start
    cap_t = ((n_t + CHUNK - 1) // CHUNK) * CHUNK
    astart = (jnp.cumsum(cap_t) - cap_t).astype(jnp.int32)
    B_al = capacity + n_tiles * CHUNK
    q = jnp.arange(B_al, dtype=jnp.int32)
    tq = jnp.searchsorted(astart, q, side="right").astype(jnp.int32) - 1
    rank = q - astart[tq]
    ok = rank < n_t[tq]
    src = jnp.minimum(range_start[tq] + rank, capacity - 1)
    return jnp.where(ok, gid_s[src], 0), ok


timed("  bin: ranges+inverse-gather", bin_inverse_gather, tile_s, gid_s)


# variant: packed single-table gather
@jax.jit
def packed_gather(table, gid, valid):
    return jnp.where(valid[:, None], table[gid], 0.0)


table = jnp.concatenate(
    [prep.mean2d, prep.conic, prep.opacity[:, None], prep.color,
     prep.depth[:, None], jnp.zeros((N, 6))], axis=1)
timed("  packed (N,16) table gather", packed_gather, table,
      binned.pair_gid, binned.pair_valid)


# variant: vjp via gather-to-emission-order + cumsum + boundary diff
@jax.jit
def segsum_vjp(dfeat_aligned, new_pos_ok, src_of_pair, offs):
    # dfeat_aligned: (B_al, 16); src_of_pair maps emission order->aligned pos
    g_orig = jnp.where(new_pos_ok[:, None],
                       dfeat_aligned[src_of_pair], 0.0)   # (capacity, 16)
    csum = jnp.cumsum(g_orig, axis=0)
    hi = jnp.clip(offs - 1, 0, capacity - 1)
    lo = jnp.clip(offs - counts - 1, 0, capacity - 1)
    seg = jnp.where((offs - 1 >= 0)[:, None], csum[hi], 0.0) - \
        jnp.where((offs - counts - 1 >= 0)[:, None], csum[lo], 0.0)
    return seg


# build src_of_pair: emission order p (sorted output position) -> aligned pos
t_arange = jnp.arange(n_tiles, dtype=jnp.int32)
range_start = jnp.searchsorted(tile_s, t_arange, side="left").astype(jnp.int32)
range_end = jnp.searchsorted(tile_s, t_arange, side="right").astype(jnp.int32)
n_t = range_end - range_start
cap_t = ((n_t + CHUNK - 1) // CHUNK) * CHUNK
astart = (jnp.cumsum(cap_t) - cap_t).astype(jnp.int32)
tile_clip = jnp.minimum(tile_s, n_tiles - 1)
rank = p_idx - range_start[tile_clip]
new_pos = jnp.where(tile_s < n_tiles,
                    jnp.minimum(astart[tile_clip] + rank,
                                binned.feat.shape[0] - 1), 0)
new_pos_ok = tile_s < n_tiles
timed("  vjp variant: gather+cumsum+segdiff", segsum_vjp,
      jnp.ones_like(feat), new_pos_ok, new_pos, offs)


@jax.jit
def comp_fwd(feat, ranges):
    return composite_tiles(feat, ranges, TILE_H, TILE_W, CHUNK, n_tx, n_ty,
                           W, H)


timed("pallas composite fwd", comp_fwd, feat, binned.ranges)


@jax.jit
def comp_grad(feat, ranges):
    def f(feat):
        o = composite_tiles(feat, ranges, TILE_H, TILE_W, CHUNK, n_tx, n_ty,
                            W, H)
        return (jnp.sum(o.color_sum) + jnp.sum(o.depth_sum)
                + jnp.sum(o.final_T))
    return jax.grad(f)(feat)


timed("pallas composite fwd+bwd", comp_grad, feat, binned.ranges)


@jax.jit
def full_fwd(means, cov6, opa, shs, tau):
    return renderer_tiled.render(
        means, cov6, opa, shs, 0, w2cj, projj, tau, fx=fx, fy=fy,
        width=W, height=H, tanfovx=tanfovx, tanfovy=tanfovy, bg=bg,
        pair_capacity=PAIR_CAP)


timed("full render fwd", full_fwd, means, cov6, opacj, shsj, jnp.zeros(6))


@jax.jit
def full_grad(means, cov6, opa, shs, tau):
    def f(means, cov6, opa, tau):
        o = renderer_tiled.render(
            means, cov6, opa, shs, 0, w2cj, projj, tau, fx=fx, fy=fy,
            width=W, height=H, tanfovx=tanfovx, tanfovy=tanfovy, bg=bg,
            pair_capacity=PAIR_CAP)
        return jnp.mean(jnp.abs(o.color)) + jnp.mean(o.depth) * 0.1
    return jax.grad(f, argnums=(0, 1, 2, 3))(means, cov6, opa, tau)


timed("full render fwd+bwd", full_grad, means, cov6, opacj, shsj,
      jnp.zeros(6))
print("done")
