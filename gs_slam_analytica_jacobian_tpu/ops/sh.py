"""Spherical-harmonics evaluation, degrees 0-3 (pure jnp, differentiable).

Rebuild of the reference's SH->RGB conversion
(reference: cuda_rasterizer/forward.cu:22-73, auxiliary.h:22-39,
gaussian_splatting/utils/sh_utils.py). Colors are ``eval_sh + 0.5`` clamped
at zero, with the clamp mask tracked so the backward matches torch's rule
(clamped channels get zero gradient — reference backward.cu:30-35).
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH polynomials.

    Args:
        deg: active SH degree, 0..3 (python int; static under jit).
        sh: (..., K, 3) coefficients with K >= (deg+1)**2.
        dirs: (..., 3) unit view directions.

    Returns:
        (..., 3) raw SH color (before +0.5 offset and clamping).
    """
    result = SH_C0 * sh[..., 0, :]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (
            result - SH_C1 * y * sh[..., 1, :] + SH_C1 * z * sh[..., 2, :]
            - SH_C1 * x * sh[..., 3, :]
        )
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + SH_C2[0] * xy * sh[..., 4, :]
                + SH_C2[1] * yz * sh[..., 5, :]
                + SH_C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + SH_C2[3] * xz * sh[..., 7, :]
                + SH_C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if deg > 2:
                result = (
                    result
                    + SH_C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                    + SH_C3[1] * xy * z * sh[..., 10, :]
                    + SH_C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                    + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                    + SH_C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                    + SH_C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + SH_C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
                )
    return result


def sh_to_color(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH -> clamped RGB, exactly as the rasterizer's computeColorFromSH.

    color = max(eval_sh + 0.5, 0). The clamp's zero-gradient rule for
    negative channels falls out of jnp.maximum's subgradient (0 below),
    matching reference backward.cu:30-35.
    """
    return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)


def rgb_to_sh0(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC band: RGB2SH (reference sh_utils.py)."""
    return (rgb - 0.5) / SH_C0


def sh0_to_rgb(sh0: jnp.ndarray) -> jnp.ndarray:
    return sh0 * SH_C0 + 0.5
