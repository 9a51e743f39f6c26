"""Production tiled renderer v2: preprocess (XLA+AD) -> pair plan (XLA) ->
packed gather (custom_vjp) -> 32x32 Pallas compositing (custom_vjp).

This is the fast path used by tracking/mapping; ops.renderer_ref is the
semantics oracle it is tested against. The whole function is differentiable
w.r.t. every Gaussian parameter and the pose delta tau:

  preprocess     — jnp; JAX AD supplies the preprocess backward
                   (replaces cuda_rasterizer/backward.cu:150-624)
  plan_pairs     — sort/cummax-based static-shape binning (replaces
                   rasterizer_impl.cu:70-367); non-differentiable structure,
                   REUSABLE across iterations (pass ``plan=``)
  pair_gather    — one packed gather; its VJP is a cumsum segment-reduce
                   (replaces the CUDA backward's atomicAdd accumulation)
  composite32    — Pallas forward/backward kernel pair

Outputs mirror the reference render() dict
(gaussian_splatting/gaussian_renderer/__init__.py:156-164), plus the
binning ``overflow`` diagnostic (pairs dropped for lack of capacity).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .binning2 import FEAT_DIM, PairPlan, plan_pairs
from .gaussian_math import Preprocessed, preprocess
from .pair_gather import pair_gather, segment_reduce_pairs
from .pallas.tile_kernel2 import TPX, TPY, K, composite32, grid_dims
from .pallas.tile_kernel16 import TS, K16, composite16, grid_dims16
from .renderer_ref import RenderOutput

# kept for backward compatibility with round-1 naming
TILE_W = TPX
TILE_H = TPY
CHUNK = K


def _grid_dims(width: int, height: int):
    return grid_dims(width, height)


def pack_table(prep: Preprocessed) -> jnp.ndarray:
    """(N, FEAT_DIM) per-gaussian feature rows for the pair gather.

    Layout: [mean2d(2), conic(3), opacity, color(3), depth, rect16(4),
    pad(2)]. The 16px rect rides along (stop-grad) so the kernel can apply
    the CUDA-parity per-pixel visibility test with CURRENT means even when
    the pair plan is amortized across iterations.
    """
    n = prep.depth.shape[0]
    rect = jnp.concatenate(
        [prep.rect_min.astype(prep.mean2d.dtype),
         prep.rect_max.astype(prep.mean2d.dtype)], axis=-1)   # (N, 4)
    return jnp.concatenate([
        prep.mean2d,
        prep.conic,
        prep.opacity[:, None],
        prep.color,
        prep.depth[:, None],
        jax.lax.stop_gradient(rect),
        jnp.zeros((n, FEAT_DIM - 14), prep.mean2d.dtype),
    ], axis=-1)


def make_plan(
    prep: Preprocessed,
    width: int, height: int,
    pair_capacity: int,
    active: Optional[jnp.ndarray] = None,
    radius_scale: float = 1.0,
    radius_pad: float = 0.0,
    tile16: bool = False,
    opa_growth: float = 1.0,
) -> PairPlan:
    """Bin Gaussians into a reusable PairPlan (non-differentiable).

    ``tile16`` bins at 16x16 for the v4 subtile kernel — ~1.4x the pairs
    at 1/4 the cells each (pallas/tile_kernel16.py); the conic cull is ON
    for this path (the v4 subtile pixel box is exactly the 16px bin box
    the cull tests against, and at 16px granularity the cullable
    sub-threshold rim is most of a splat's AABB)."""
    if active is not None:
        prep = prep._replace(valid=prep.valid & active)
    if tile16:
        n_gx, n_gy = grid_dims16(width, height)
        return plan_pairs(prep, TS, TS, 2 * n_gx, 2 * n_gy, pair_capacity,
                          chunk=K16, radius_scale=radius_scale,
                          radius_pad=radius_pad, opa_growth=opa_growth)
    n_tx, n_ty = grid_dims(width, height)
    return plan_pairs(prep, TPX, TPY, n_tx, n_ty, pair_capacity, chunk=K,
                      radius_scale=radius_scale, radius_pad=radius_pad,
                      opa_growth=opa_growth)


@functools.partial(
    jax.jit,
    static_argnames=("sh_degree", "fx", "fy", "width", "height",
                     "tanfovx", "tanfovy", "pair_capacity", "interpret",
                     "need_n_touched", "bf16", "tile16", "nt_weight", "mxu",
                     "low_pass"))
def render(
    means3d: jnp.ndarray,
    cov6: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    sh_degree: int,
    w2c: jnp.ndarray,
    proj: jnp.ndarray,
    tau: jnp.ndarray,
    fx: float, fy: float, width: int, height: int,
    tanfovx: float, tanfovy: float,
    bg: jnp.ndarray,
    active: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    mean2d_offset: Optional[jnp.ndarray] = None,
    pair_capacity: int = 1 << 19,
    interpret: bool = False,
    plan: Optional[PairPlan] = None,
    need_n_touched: bool = True,
    bf16: bool = False,
    tile16: bool = False,
    nt_weight: bool = False,
    mxu: bool = False,
    low_pass: float = 0.3,
) -> RenderOutput:
    prep = preprocess(
        means3d, cov6, opacities, shs, sh_degree, w2c, proj, tau,
        fx, fy, width, height, tanfovx, tanfovy,
        colors_precomp=colors_precomp, mean2d_offset=mean2d_offset,
        low_pass=low_pass)
    if active is not None:
        prep = prep._replace(
            valid=prep.valid & active,
            radius=jnp.where(active, prep.radius, 0.0),
            tiles_touched=jnp.where(active, prep.tiles_touched, 0))

    if tile16:
        n_gx, n_gy = grid_dims16(width, height)
        if plan is None:
            plan = plan_pairs(prep, TS, TS, 2 * n_gx, 2 * n_gy,
                              pair_capacity, chunk=K16)
        table = pack_table(prep)
        feat = pair_gather(table, plan)
        out = composite16(feat, plan.ranges, n_gx, n_gy, width, height,
                          interpret, need_n_touched, nt_weight)
    else:
        n_tx, n_ty = grid_dims(width, height)
        if plan is None:
            plan = plan_pairs(prep, TPX, TPY, n_tx, n_ty, pair_capacity,
                              chunk=K)
        table = pack_table(prep)
        feat = pair_gather(table, plan)
        out = composite32(feat, plan.ranges, n_tx, n_ty, width, height,
                          interpret, need_n_touched, bf16, nt_weight, mxu)

    color = out.color_sum + out.final_T[None] * bg[:, None, None]
    opacity = 1.0 - out.final_T

    if need_n_touched:
        nt = segment_reduce_pairs(out.n_touched_pairs, plan)
        nt = nt.astype(jnp.int32)
    else:
        nt = jnp.zeros((means3d.shape[0],), jnp.int32)

    return RenderOutput(
        color=color,
        depth=out.depth_sum[None],
        opacity=opacity[None],
        final_T=out.final_T,
        radii=prep.radius,
        n_touched=nt,
        mean2d=prep.mean2d,
        overflow=plan.overflow,
    )
