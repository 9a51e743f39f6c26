"""Production tiled renderer: preprocess (XLA+AD) -> binning (XLA) ->
Pallas compositing (custom_vjp).

This is the fast path used by tracking/mapping; ops.renderer_ref is the
semantics oracle it is tested against. The whole function is differentiable
w.r.t. every Gaussian parameter and the pose delta tau:

  preprocess        — jnp, JAX AD supplies the preprocess backward
                      (replaces cuda_rasterizer/backward.cu:150-624)
  binning + gather  — lax.sort / searchsorted; the gather's transpose is a
                      scatter-add (replaces the CUDA backward's atomics)
  composite_tiles   — Pallas forward/backward kernel pair (custom_vjp)

Outputs mirror the reference render() dict
(gaussian_splatting/gaussian_renderer/__init__.py:156-164).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .binning import bin_gaussians, build_pair_features
from .gaussian_math import Preprocessed, preprocess
from .pallas.tile_composite import composite_tiles
from .renderer_ref import RenderOutput

# Pallas tile geometry: lanes-aligned (sublanes x lanes). CHUNK must be a
# multiple of 128 (pair-chunk DMAs slice whole 128-lane blocks of the
# field-major pair store).
TILE_H = 8
TILE_W = 128
CHUNK = 128


def _grid_dims(width: int, height: int):
    n_tx = (width + TILE_W - 1) // TILE_W
    n_ty = (height + TILE_H - 1) // TILE_H
    return n_tx, n_ty


@functools.partial(
    jax.jit,
    static_argnames=("sh_degree", "fx", "fy", "width", "height",
                     "tanfovx", "tanfovy", "pair_capacity", "interpret"))
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
    pair_capacity: int = 1 << 20,
    interpret: bool = False,
) -> RenderOutput:
    n_tx, n_ty = _grid_dims(width, height)

    prep = preprocess(
        means3d, cov6, opacities, shs, sh_degree, w2c, proj, tau,
        fx, fy, width, height, tanfovx, tanfovy,
        colors_precomp=colors_precomp, mean2d_offset=mean2d_offset)
    if active is not None:
        prep = prep._replace(
            valid=prep.valid & active,
            radius=jnp.where(active, prep.radius, 0.0),
            tiles_touched=jnp.where(active, prep.tiles_touched, 0))

    binned = bin_gaussians(
        jax.tree.map(jax.lax.stop_gradient, prep),
        TILE_W, TILE_H, n_tx, n_ty, pair_capacity, chunk=CHUNK)
    # Differentiable feature gather (binned.feat is built under stop_grad
    # inside the jitted binning; rebuild it so gradients flow).
    feat = build_pair_features(prep, binned.pair_gid, binned.pair_valid)

    out = composite_tiles(
        feat, binned.ranges, TILE_H, TILE_W, CHUNK, n_tx, n_ty,
        width, height, interpret)

    color_sum = out.color_sum[:, :height, :width]
    depth = out.depth_sum[:height, :width]
    final_T = out.final_T[:height, :width]
    color = color_sum + final_T[None] * bg[:, None, None]
    opacity = 1.0 - final_T

    # per-gaussian n_touched: segment-sum of per-pair touch counts
    n = means3d.shape[0]
    nt = jnp.zeros((n,), jnp.float32).at[binned.pair_gid].add(
        jnp.where(binned.pair_valid, out.n_touched_pairs, 0.0), mode="drop")

    return RenderOutput(
        color=color,
        depth=depth[None],
        opacity=opacity[None],
        final_T=final_T,
        radii=prep.radius,
        n_touched=nt.astype(jnp.int32),
        mean2d=prep.mean2d,
    )
