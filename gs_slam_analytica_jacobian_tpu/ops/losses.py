"""SLAM losses and image metrics (pure jnp, differentiable).

Rebuild of reference utils/slam_utils.py:4-142 (Scharr gradients, gradient
masks, tracking/mapping losses, median depth) and
gaussian_splatting/utils/loss_utils.py (l1, window-11 SSIM),
image_utils.py (psnr).

All image tensors are (C, H, W) like the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Image gradients (Scharr) — reference slam_utils.py:4-38
# ---------------------------------------------------------------------------

def _conv2d_same_reflect(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 conv with reflect padding. img: (C, H, W)."""
    c = img.shape[0]
    p = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    k = jnp.broadcast_to(kernel, (c, 1, 3, 3))
    out = jax.lax.conv_general_dilated(
        p[None], k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c)
    return out[0]


def image_gradient(image: jnp.ndarray):
    """Scharr gradients. Returns (grad_v, grad_h), each (C, H, W).

    NOTE: the reference names its x-kernel 'conv_y' and vice versa; we keep
    the reference's *output* semantics (img_grad_v uses the kernel whose
    rows are [3,10,3],[0,0,0],[-3,-10,-3] — slam_utils.py:7-21)."""
    conv_y = jnp.asarray([[3.0, 0, -3], [10, 0, -10], [3, 0, -3]])
    conv_x = jnp.asarray([[3.0, 10, 3], [0, 0, 0], [-3, -10, -3]])
    normalizer = 1.0 / jnp.sum(jnp.abs(conv_y))
    grad_v = normalizer * _conv2d_same_reflect(image, conv_x)
    grad_h = normalizer * _conv2d_same_reflect(image, conv_y)
    return grad_v, grad_h


def image_gradient_mask(image: jnp.ndarray, eps: float = 0.01):
    """3x3 all-valid mask of |img|>eps (reference slam_utils.py:24-38)."""
    ones = jnp.ones((3, 3))
    p = (jnp.abs(image) > eps).astype(image.dtype)
    s_v = _conv2d_same_reflect(p, ones)
    return s_v == 9.0, s_v == 9.0


def depth_reg(depth: jnp.ndarray, gt_image: jnp.ndarray,
              huber_eps: float = 0.1, mask=None) -> jnp.ndarray:
    """Edge-aware depth-smoothness regularizer (reference
    slam_utils.py:41-53): mean of |∂depth| weighted by exp(-10·∂gray²),
    restricted to the 3x3-all-valid depth mask, summed over the v/h
    directions. ``huber_eps``/``mask`` are accepted for reference API
    parity but unused — the reference body never reads them either
    (dead code in the reference: no caller passes them).

    depth: (1, H, W); gt_image: (C, H, W)."""
    del huber_eps, mask
    mask_v, mask_h = image_gradient_mask(depth)
    gray = jnp.mean(gt_image, axis=0, keepdims=True)
    gray_grad_v, gray_grad_h = image_gradient(gray)
    depth_grad_v, depth_grad_h = image_gradient(depth)
    mv = mask_v.astype(depth.dtype)
    mh = mask_h.astype(depth.dtype)
    w_v = jnp.exp(-10.0 * gray_grad_v ** 2)
    w_h = jnp.exp(-10.0 * gray_grad_h ** 2)
    # masked means (the reference boolean-indexes then .mean()s)
    n_v = jnp.maximum(jnp.sum(mv), 1.0)
    n_h = jnp.maximum(jnp.sum(mh), 1.0)
    err = (jnp.sum(w_h * jnp.abs(depth_grad_h) * mh) / n_h
           + jnp.sum(w_v * jnp.abs(depth_grad_v) * mv) / n_v)
    return err


def compute_grad_mask(gray: jnp.ndarray, edge_threshold: float,
                      dataset_type: str = "generic",
                      rows: int = 32, cols: int = 32) -> jnp.ndarray:
    """Edge-intensity mask for tracking (reference camera_utils.py:115-144).

    dataset_type=='replica': per-32x32-block median binarization;
    otherwise: global median threshold. gray: (1, H, W)."""
    gv, gh = image_gradient(gray)
    mv, mh = image_gradient_mask(gray)
    gv = gv * mv
    gh = gh * mh
    intensity = jnp.sqrt(gv * gv + gh * gh)     # (1, H, W)

    if dataset_type == "replica":
        _, H, W = intensity.shape
        bh, bw = H // rows, W // cols
        Hc, Wc = bh * rows, bw * cols
        blocks = intensity[0, :Hc, :Wc].reshape(rows, bh, cols, bw)
        med = jnp.median(blocks, axis=(1, 3), keepdims=True)
        out = (blocks > med * edge_threshold).astype(intensity.dtype)
        out = out.reshape(Hc, Wc)
        full = jnp.zeros_like(intensity[0]).at[:Hc, :Wc].set(out)
        # pixels outside the tiled region keep raw intensity (the reference
        # only overwrites the blocks it visits)
        full = full.at[Hc:, :].set(intensity[0, Hc:, :])
        full = full.at[:, Wc:].set(intensity[0, :, Wc:])
        return full[None]
    med = jnp.median(intensity)
    # intensity is already (1, H, W)
    return (intensity > med * edge_threshold).astype(intensity.dtype)


# ---------------------------------------------------------------------------
# Tracking / mapping losses — reference slam_utils.py:56-128
# ---------------------------------------------------------------------------

def apply_exposure(image: jnp.ndarray, exposure_a, exposure_b) -> jnp.ndarray:
    return jnp.exp(exposure_a) * image + exposure_b


def loss_tracking_rgb(image, gt_image, opacity, grad_mask,
                      rgb_boundary_threshold: float):
    """opacity-weighted masked L1 (slam_utils.py:63-71). image: (3,H,W),
    opacity: (1,H,W), grad_mask: (1,H,W)."""
    rgb_mask = (jnp.sum(gt_image, axis=0, keepdims=True)
                > rgb_boundary_threshold).astype(image.dtype)
    mask = rgb_mask * grad_mask
    l1 = opacity * jnp.abs(image * mask - gt_image * mask)
    return jnp.mean(l1)


def loss_tracking_rgbd(image, depth, gt_image, gt_depth, opacity, grad_mask,
                       rgb_boundary_threshold: float, alpha: float = 0.95):
    """alpha*rgb + (1-alpha)*depth with opacity>0.95 mask
    (slam_utils.py:74-88). depth/gt_depth: (1,H,W)."""
    l1_rgb = loss_tracking_rgb(image, gt_image, opacity, grad_mask,
                               rgb_boundary_threshold)
    depth_mask = ((gt_depth > 0.01) & (opacity > 0.95)).astype(image.dtype)
    l1_depth = jnp.abs(depth * depth_mask - gt_depth * depth_mask)
    return alpha * l1_rgb + (1 - alpha) * jnp.mean(l1_depth)


def loss_mapping_rgb(image, gt_image, rgb_boundary_threshold: float):
    rgb_mask = (jnp.sum(gt_image, axis=0, keepdims=True)
                > rgb_boundary_threshold).astype(image.dtype)
    return jnp.mean(jnp.abs(image * rgb_mask - gt_image * rgb_mask))


def loss_mapping_rgbd(image, depth, gt_image, gt_depth,
                      rgb_boundary_threshold: float, alpha: float = 0.95):
    rgb_mask = (jnp.sum(gt_image, axis=0, keepdims=True)
                > rgb_boundary_threshold).astype(image.dtype)
    depth_mask = (gt_depth > 0.01).astype(image.dtype)
    l1_rgb = jnp.abs(image * rgb_mask - gt_image * rgb_mask)
    l1_depth = jnp.abs(depth * depth_mask - gt_depth * depth_mask)
    return alpha * jnp.mean(l1_rgb) + (1 - alpha) * jnp.mean(l1_depth)


def isotropic_loss(log_scaling: jnp.ndarray, active: jnp.ndarray):
    """10*|s - mean(s)| regularizer over active gaussians
    (slam_backend.py:229-231). log_scaling: (C,3)."""
    s = jnp.exp(log_scaling)
    dev = jnp.abs(s - jnp.mean(s, axis=1, keepdims=True))
    w = active.astype(s.dtype)[:, None]
    denom = jnp.maximum(jnp.sum(w) * 3.0, 1.0)
    return jnp.sum(dev * w) / denom


def median_depth(depth, opacity=None, mask=None):
    """Median of valid rendered depth (slam_utils.py:131-142).
    Uses a masked median via sorting with +inf padding."""
    d = depth.reshape(-1)
    valid = d > 0
    if opacity is not None:
        valid = valid & (opacity.reshape(-1) > 0.95)
    if mask is not None:
        valid = valid & mask.reshape(-1)
    n = jnp.sum(valid)
    sort = jnp.sort(jnp.where(valid, d, jnp.inf))
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    med = 0.5 * (sort[lo] + sort[hi])
    return jnp.where(n > 0, med, 0.0)


# ---------------------------------------------------------------------------
# Metrics: L1 / PSNR / SSIM — reference loss_utils.py, image_utils.py
# ---------------------------------------------------------------------------

def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def psnr(img1, img2):
    mse = jnp.mean((img1 - img2) ** 2)
    return 20 * jnp.log10(1.0 / jnp.sqrt(mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


@partial(jax.jit, static_argnames=("size",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, size: int = 11):
    """Window-11 SSIM (reference loss_utils.py:61-101). imgs: (C, H, W)."""
    c = img1.shape[0]
    win = _gaussian_window(size)
    k = jnp.broadcast_to(win, (c, 1, size, size))

    def conv(x):
        p = size // 2
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p)))
        return jax.lax.conv_general_dilated(
            xp[None], k, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c)[0]

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1 = conv(img1 * img1) - mu1_sq
    sigma2 = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    s = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1 + sigma2 + C2))
    return jnp.mean(s)
