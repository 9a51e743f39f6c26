"""Reference-fidelity differentiable splat renderer (pure jnp oracle).

This is the semantics oracle for the Pallas tiled renderer: an O(N * pixels)
vectorized implementation of the reference's tile rasterizer
(cuda_rasterizer/forward.cu:406-535) whose JAX autodiff reproduces the
hand-written CUDA backward (backward.cu) including the se(3) pose path.

Exact semantics carried over:
- global front-to-back depth order (CUDA radix-sorts [tile|depth] keys with a
  stable sort, so per-tile order == global depth order restricted to the tile);
- a Gaussian touches a pixel only if the pixel's 16x16 tile intersects the
  Gaussian's 3-sigma rect (duplicateWithKeys / getRect);
- skip rules: power > 0, alpha < 1/255, alpha capped at 0.99;
- termination: the first Gaussian whose blend would push T below 1e-4 is
  dropped and everything behind it is skipped (done-flag semantics);
- color = sum(c_i * alpha_i * T_i) + T_final * bg; depth likewise (no bg);
  opacity = 1 - T_final; n_touched counts pixels with test_T > 0.5.

It is deliberately simple; production rendering uses ops.renderer_tiled.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .gaussian_math import BLOCK_X, BLOCK_Y, Preprocessed, preprocess

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


class RenderOutput(NamedTuple):
    color: jnp.ndarray       # (3, H, W)
    depth: jnp.ndarray       # (1, H, W)
    opacity: jnp.ndarray     # (1, H, W)
    final_T: jnp.ndarray     # (H, W)
    radii: jnp.ndarray       # (N,) float (0 for culled)
    n_touched: jnp.ndarray   # (N,) int32
    mean2d: jnp.ndarray      # (N, 2) pixel coords (for densification stats)
    overflow: jnp.ndarray = None  # pairs dropped by the tiled binner
                                  # (0 / None = exact render)


def _composite_rows(
    pix_xy: jnp.ndarray,       # (P, 2) pixel centers (x, y)
    tile_xy: jnp.ndarray,      # (P, 2) int32 tile coords of each pixel
    prep_sorted,               # tuple of sorted per-Gaussian arrays
    bg: jnp.ndarray,           # (3,)
):
    """Composite a chunk of P pixels against all N sorted Gaussians."""
    (mean2d, conic, opacity, color, depth, rect_min, rect_max, valid) = prep_sorted

    d = pix_xy[:, None, :] - mean2d[None, :, :]               # (P, N, 2)
    dx, dy = d[..., 0], d[..., 1]
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    power = -0.5 * (ca[None] * dx * dx + cc[None] * dy * dy) - cb[None] * dx * dy

    tile_ok = (
        (tile_xy[:, None, 0] >= rect_min[None, :, 0])
        & (tile_xy[:, None, 0] < rect_max[None, :, 0])
        & (tile_xy[:, None, 1] >= rect_min[None, :, 1])
        & (tile_xy[:, None, 1] < rect_max[None, :, 1])
    )

    alpha = jnp.minimum(ALPHA_MAX, opacity[None, :] * jnp.exp(power))
    ok = valid[None, :] & tile_ok & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha_eff = jnp.where(ok, alpha, 0.0)                     # (P, N)

    one_minus = 1.0 - alpha_eff
    # T_excl[i] = prod_{j<i} (1 - alpha_eff[j]); T_incl[i] includes i.
    T_incl = jnp.cumprod(one_minus, axis=1)
    T_excl = T_incl / jnp.where(one_minus > 0, one_minus, 1.0)
    # Recompute T_excl robustly (division may drift): shift instead.
    T_excl = jnp.concatenate(
        [jnp.ones_like(T_incl[:, :1]), T_incl[:, :-1]], axis=1)
    T_incl = T_excl * one_minus

    would_term = ok & (T_incl < T_EPS)
    cut = jnp.cumsum(would_term.astype(jnp.int32), axis=1) > 0  # inclusive
    include = ok & ~cut

    w = jnp.where(include, alpha * T_excl, 0.0)               # (P, N)
    final_T = jnp.prod(jnp.where(include, 1.0 - alpha, 1.0), axis=1)  # (P,)

    out_color = w @ color + final_T[:, None] * bg[None, :]    # (P, 3)
    out_depth = w @ depth[:, None]                            # (P, 1)
    out_opacity = 1.0 - final_T

    touched = (include & (T_incl > 0.5)).astype(jnp.int32)    # (P, N)
    n_touched = jnp.sum(touched, axis=0)                      # (N,)
    return out_color, out_depth[:, 0], out_opacity, final_T, n_touched


def render_from_preprocessed(
    prep: Preprocessed,
    width: int, height: int,
    bg: jnp.ndarray,
    row_chunk: int = 16,
):
    """Depth-sort + per-pixel compositing. Differentiable."""
    # Stable sort by depth with invalid Gaussians pushed to the back —
    # matches CUB radix sort order (stable on ties, rasterizer_impl.cu:350-358).
    key = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(key, stable=True)

    prep_sorted = (
        prep.mean2d[order], prep.conic[order], prep.opacity[order],
        prep.color[order], prep.depth[order], prep.rect_min[order],
        prep.rect_max[order], prep.valid[order],
    )

    ys = jnp.arange(height, dtype=prep.mean2d.dtype)
    xs = jnp.arange(width, dtype=prep.mean2d.dtype)
    pix_x, pix_y = jnp.meshgrid(xs, ys)                       # (H, W)
    pix = jnp.stack([pix_x, pix_y], axis=-1)                  # (H, W, 2)
    tiles = jnp.stack(
        [(pix_x / BLOCK_X).astype(jnp.int32),
         (pix_y / BLOCK_Y).astype(jnp.int32)], axis=-1)

    # Pad rows to a multiple of row_chunk and map over chunks to bound memory.
    pad = (-height) % row_chunk
    pix_p = jnp.pad(pix, ((0, pad), (0, 0), (0, 0)))
    tiles_p = jnp.pad(tiles, ((0, pad), (0, 0), (0, 0)))
    n_chunks = (height + pad) // row_chunk
    pix_c = pix_p.reshape(n_chunks, row_chunk * width, 2)
    tiles_c = tiles_p.reshape(n_chunks, row_chunk * width, 2)

    def body(args):
        px, tl = args
        return _composite_rows(px, tl, prep_sorted, bg)

    color_c, depth_c, opac_c, T_c, touched_c = jax.lax.map(
        body, (pix_c, tiles_c))

    Hp = height + pad
    color = color_c.reshape(Hp, width, 3)[:height]
    depth = depth_c.reshape(Hp, width)[:height]
    opac = opac_c.reshape(Hp, width)[:height]
    final_T = T_c.reshape(Hp, width)[:height]
    n_touched_sorted = jnp.sum(touched_c, axis=0)             # (N,)

    inv_order = jnp.argsort(order)
    n_touched = n_touched_sorted[inv_order]

    return RenderOutput(
        color=jnp.transpose(color, (2, 0, 1)),
        depth=depth[None],
        opacity=opac[None],
        final_T=final_T,
        radii=prep.radius,
        n_touched=n_touched,
        mean2d=prep.mean2d,
        overflow=jnp.zeros((), jnp.int32),
    )


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
    row_chunk: int = 16,
) -> RenderOutput:
    """Full oracle render (preprocess + composite). All-jnp, differentiable
    wrt every Gaussian parameter and tau."""
    prep = preprocess(
        means3d, cov6, opacities, shs, sh_degree, w2c, proj, tau,
        fx, fy, width, height, tanfovx, tanfovy,
        colors_precomp=colors_precomp, mean2d_offset=mean2d_offset)
    if active is not None:
        prep = prep._replace(
            valid=prep.valid & active,
            radius=jnp.where(active, prep.radius, 0.0),
            tiles_touched=jnp.where(active, prep.tiles_touched, 0),
        )
    return render_from_preprocessed(prep, width, height, bg, row_chunk)
