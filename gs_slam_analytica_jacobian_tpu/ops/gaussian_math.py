"""Per-Gaussian projection math: cov3D, EWA cov2D, screen projection.

Differentiable jnp rebuild of the rasterizer preprocess
(reference: cuda_rasterizer/forward.cu:76-401, auxiliary.h:41-164).

Gradient-fidelity notes (vs the hand-written CUDA backward):

* The camera pose enters through ``w2c_eff = se3_exp(tau) @ w2c``; at tau=0
  JAX autodiff produces the same dL/dtau chain that backward.cu:150-624
  computes by hand (dp_C/drho = I, dp_C/dtheta = -[p_C]x, plus the
  dW/dtheta = -[R col]x path through the EWA Jacobian).
* The 1.3*tanfov frustum clamp in computeCov2D treats the clamped
  coordinate as a *constant leaf* in the CUDA backward (x_grad_mul = 0 and
  no dtx/dtz term — backward.cu:182-273). We reproduce that exactly with
  stop_gradient on the clamped branch.
* depth = p_view.z (unclamped), so the depth->tau path
  dd/dtau = (0,0,1 | row3 of -[p_C]x) falls out of AD
  (backward.cu:599-613).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import sh as sh_ops
from .lie import quat_to_rotmat, se3_exp

# Tile size used by the reference's binning grid (config.h:16-17). The
# tile-rect visibility semantics (a Gaussian only touches pixels whose tile
# intersects its 3-sigma rect) depend on it.
BLOCK_X = 16
BLOCK_Y = 16


def build_cov3d(scale: jnp.ndarray, quat: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """3D covariance Sigma = R S^2 R^T, returned as (..., 6) upper triangle
    (xx, xy, xz, yy, yz, zz). Reference forward.cu:120-154."""
    R = quat_to_rotmat(quat)                       # (..., 3, 3)
    s = scale_modifier * scale                     # (..., 3)
    M = R * s[..., None, :]                        # R @ diag(s)
    Sigma = M @ jnp.swapaxes(M, -1, -2)
    return jnp.stack(
        [Sigma[..., 0, 0], Sigma[..., 0, 1], Sigma[..., 0, 2],
         Sigma[..., 1, 1], Sigma[..., 1, 2], Sigma[..., 2, 2]], axis=-1)


def cov3d_to_matrix(cov6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) upper triangle -> (..., 3, 3) symmetric."""
    c0, c1, c2, c3, c4, c5 = [cov6[..., i] for i in range(6)]
    return jnp.stack(
        [jnp.stack([c0, c1, c2], -1),
         jnp.stack([c1, c3, c4], -1),
         jnp.stack([c2, c4, c5], -1)], -2)


def clamp_view_point(p_view: jnp.ndarray, tanfovx: float, tanfovy: float):
    """The EWA frustum clamp with CUDA-parity gradients.

    p_view: (..., 3) camera-space points. Returns (..., 3) where x/y have
    been clamped to 1.3*tanfov * z; the clamped branch is a stop_gradient
    constant (matching x_grad_mul/y_grad_mul zeroing and the absence of a
    d(t.x)/d(t.z) term in backward.cu:182-273).
    """
    tx, ty, tz = p_view[..., 0], p_view[..., 1], p_view[..., 2]
    # Guard z for masked-out (behind camera) gaussians to avoid NaN grads.
    tz_safe = jnp.where(jnp.abs(tz) < 1e-8, 1e-8, tz)
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    rx = tx / tz_safe
    ry = ty / tz_safe
    clamped_x = (rx < -limx) | (rx > limx)
    clamped_y = (ry < -limy) | (ry > limy)
    tx_c = jax.lax.stop_gradient(jnp.clip(rx, -limx, limx) * tz)
    ty_c = jax.lax.stop_gradient(jnp.clip(ry, -limy, limy) * tz)
    tx_out = jnp.where(clamped_x, tx_c, tx)
    ty_out = jnp.where(clamped_y, ty_c, ty)
    return jnp.stack([tx_out, ty_out, tz], axis=-1)


def compute_cov2d(p_view: jnp.ndarray, cov6: jnp.ndarray, W_rot: jnp.ndarray,
                  fx: float, fy: float, tanfovx: float, tanfovy: float,
                  low_pass: float = 0.3):
    """EWA 2D covariance (reference forward.cu:76-115).

    ``low_pass``: the screen-space dilation variance (reference hardcodes
    0.3 px^2). Pyramid tracking can scale it per level to match the
    effective blur of a pooled ground-truth image (tracking.py
    _level_low_pass) — at the default the s=2 render is ~2x blurrier
    than 2x2-avg-pooled full-res gt, which biases the coarse-level L1
    photometric fixed point (measured 6 mm on the bench room, PERF.md
    r4).

    Args:
        p_view: (..., 3) camera-space means (w2c applied, BEFORE clamping).
        cov6: (..., 6) 3D covariance upper triangle.
        W_rot: (3, 3) w2c rotation (the EWA 'W' matrix).
    Returns:
        (a, b, c): cov2d entries [0,0], [0,1], [1,1] with the +0.3 low-pass.
    """
    t = clamp_view_point(p_view, tanfovx, tanfovy)
    tx, ty, tz = t[..., 0], t[..., 1], t[..., 2]
    tz_safe = jnp.where(jnp.abs(tz) < 1e-8, 1e-8, tz)
    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z

    # J = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2], [0,0,0]]
    J00 = fx * inv_z
    J02 = -fx * tx * inv_z2
    J11 = fy * inv_z
    J12 = -fy * ty * inv_z2

    # T = J @ W  (rows of T: T0 = J00*W[0] + J02*W[2]; T1 = J11*W[1] + J12*W[2])
    W0, W1, W2 = W_rot[0], W_rot[1], W_rot[2]      # (3,) rows
    T0 = J00[..., None] * W0 + J02[..., None] * W2  # (..., 3)
    T1 = J11[..., None] * W1 + J12[..., None] * W2

    V = cov3d_to_matrix(cov6)                       # (..., 3, 3)
    VT0 = jnp.einsum("...ij,...j->...i", V, T0)
    VT1 = jnp.einsum("...ij,...j->...i", V, T1)
    a = jnp.sum(T0 * VT0, axis=-1) + low_pass
    b = jnp.sum(T0 * VT1, axis=-1)
    c = jnp.sum(T1 * VT1, axis=-1) + low_pass
    return a, b, c


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities (all shape (N, ...))."""

    valid: jnp.ndarray       # (N,) bool — frustum & det & non-empty rect
    depth: jnp.ndarray       # (N,) camera-space z
    mean2d: jnp.ndarray      # (N, 2) pixel coords
    conic: jnp.ndarray       # (N, 3) inverse cov2d (a, b, c)
    cov2d: jnp.ndarray       # (N, 3) cov2d (a, b, c) incl. +0.3
    opacity: jnp.ndarray     # (N,)
    color: jnp.ndarray       # (N, 3) clamped SH color
    radius: jnp.ndarray      # (N,) float radius in pixels (ceil applied)
    radius_xy: jnp.ndarray   # (N, 2) per-axis tight cull half-extents (px)
    rect_min: jnp.ndarray    # (N, 2) int32 tile coords (x, y)
    rect_max: jnp.ndarray    # (N, 2) int32 tile coords (exclusive)
    tiles_touched: jnp.ndarray  # (N,) int32


def preprocess(
    means3d: jnp.ndarray,       # (N, 3) world positions
    cov6: jnp.ndarray,          # (N, 6) 3D covariance (upper tri)
    opacities: jnp.ndarray,     # (N,)
    shs: jnp.ndarray,           # (N, K, 3) SH coefficients
    sh_degree: int,
    w2c: jnp.ndarray,           # (4, 4) base world-to-camera
    proj: jnp.ndarray,          # (4, 4) pure projection (row-major)
    tau: jnp.ndarray,           # (6,) pose delta, normally zeros
    fx: float, fy: float, width: int, height: int,
    tanfovx: float, tanfovy: float,
    colors_precomp: Optional[jnp.ndarray] = None,
    mean2d_offset: Optional[jnp.ndarray] = None,
    low_pass: float = 0.3,
) -> Preprocessed:
    """The rasterizer preprocess stage (forward.cu:157-401), vectorized.

    ``mean2d_offset`` is an all-zeros (N, 2) tensor whose gradient gives the
    screen-space mean gradients used for densification stats (the
    reference's ``screenspace_points`` trick,
    gaussian_renderer/__init__.py:43-52). NOTE: its gradient is in pixel
    units; multiply by (0.5, 0.5) * (W, H)... see models/gaussian_map.py.
    """
    dtype = means3d.dtype
    w2c_eff = se3_exp(tau.astype(dtype)) @ w2c

    R_cw = w2c_eff[:3, :3]
    t_cw = w2c_eff[:3, 3]

    p_view = means3d @ R_cw.T + t_cw               # (N, 3)
    depth = p_view[..., 2]
    in_front = depth > 0.2                          # auxiliary.h:154

    # Projection: p_hom = proj @ [p_view, 1]
    ph = p_view @ proj[:3, :3].T + proj[:3, 3]      # (N, 3) rows 0..2
    pw_row = p_view @ proj[3, :3] + proj[3, 3]      # (N,) row 3
    p_w = 1.0 / (pw_row + 1e-7)
    p_proj_x = ph[..., 0] * p_w
    p_proj_y = ph[..., 1] * p_w

    mean2d = jnp.stack(
        [((p_proj_x + 1.0) * width - 1.0) * 0.5,
         ((p_proj_y + 1.0) * height - 1.0) * 0.5], axis=-1)
    if mean2d_offset is not None:
        mean2d = mean2d + mean2d_offset

    a, b, c = compute_cov2d(p_view, cov6, R_cw, fx, fy, tanfovx,
                            tanfovy, low_pass)

    det = a * c - b * b
    det_valid = det != 0.0
    det_safe = jnp.where(det_valid, det, 1.0)
    det_inv = 1.0 / det_safe
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=-1)

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam, 0.0)))

    # Tight cull half-extents — EXACT-semantics refinement of the CUDA
    # square rect (auxiliary.h:46-56 uses the isotropic 3*sqrt(lam_max)):
    # the render kernel rejects any contribution with alpha < 1/255
    # (forward.cu:505), i.e. Mahalanobis^2 > q = 2*ln(255*opa). The largest
    # |dx| on that ellipse is sqrt(q * cov2d_xx), so a per-axis box of
    # half-extents min(radius, ceil(sqrt(q*a|c))) culls ONLY pixels the
    # alpha threshold would reject anyway — output-identical, with
    # opacity-aware and anisotropy-aware pair savings. opa <= 1/255 makes
    # the box empty (such splats are alpha-rejected everywhere).
    q = jax.lax.stop_gradient(
        jnp.maximum(2.0 * jnp.log(jnp.maximum(255.0 * opacities, 1e-12)),
                    0.0))
    sg_a = jax.lax.stop_gradient(jnp.maximum(a, 0.0))
    sg_c = jax.lax.stop_gradient(jnp.maximum(c, 0.0))
    half_x = jnp.minimum(radius, jnp.ceil(jnp.sqrt(q * sg_a)))
    half_y = jnp.minimum(radius, jnp.ceil(jnp.sqrt(q * sg_c)))
    nonempty = (q > 0.0)

    grid_x = (width + BLOCK_X - 1) // BLOCK_X
    grid_y = (height + BLOCK_Y - 1) // BLOCK_Y
    mx = mean2d[..., 0]
    my = mean2d[..., 1]
    # getRect, auxiliary.h:46-56 (int truncation semantics)
    rect_min_x = jnp.clip(((mx - half_x) / BLOCK_X).astype(jnp.int32), 0, grid_x)
    rect_min_y = jnp.clip(((my - half_y) / BLOCK_Y).astype(jnp.int32), 0, grid_y)
    rect_max_x = jnp.clip(
        ((mx + half_x + BLOCK_X - 1) / BLOCK_X).astype(jnp.int32), 0, grid_x)
    rect_max_y = jnp.clip(
        ((my + half_y + BLOCK_Y - 1) / BLOCK_Y).astype(jnp.int32), 0, grid_y)
    tiles = jnp.where(
        nonempty,
        (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y), 0)

    valid = in_front & det_valid & (tiles > 0)

    if colors_precomp is not None:
        color = colors_precomp
    else:
        # SH view dirs. campos enters the tau-gradient only through the
        # reference's translation-only approximation
        # (backward.cu:141-144: dL_dtau[0:3] += -dL_dmean), reproduced by
        # campos_eff = stop_grad(campos) + rho.
        campos = -jax.lax.stop_gradient(w2c_eff[:3, :3].T @ w2c_eff[:3, 3])
        campos_eff = campos + tau[:3].astype(dtype)
        dirs = means3d - campos_eff
        # eps inside the sqrt: padded rows can sit exactly at the camera
        # center; norm's gradient at 0 is NaN and would leak into dL/dtau
        norm = jnp.sqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True)
                        + 1e-24)
        dirs = dirs / norm
        color = sh_ops.sh_to_color(sh_degree, shs, dirs)

    return Preprocessed(
        valid=valid,
        depth=depth,
        mean2d=mean2d,
        conic=conic,
        cov2d=jnp.stack([a, b, c], axis=-1),
        opacity=opacities,
        color=color,
        radius=jnp.where(valid, radius, 0.0),
        radius_xy=jnp.where(valid[..., None],
                            jnp.stack([half_x, half_y], axis=-1), 0.0),
        rect_min=jnp.stack([rect_min_x, rect_min_y], axis=-1),
        rect_max=jnp.stack([rect_max_x, rect_max_y], axis=-1),
        tiles_touched=jnp.where(valid, tiles, 0).astype(jnp.int32),
    )
