"""SO(3)/SE(3) Lie-group exponentials and helpers (pure jnp, differentiable).

Functional rebuild of the reference's pose algebra
(reference: utils/pose_utils.py:12-93 and cuda_rasterizer/math.h:234-325),
with the same small-angle branches and the same tau ordering convention:

    tau = (rho[3], theta[3])   # translation first, rotation second

``se3_exp(tau) @ T`` is the left-multiplicative pose update used by both the
tracking and mapping optimizers (reference: utils/pose_utils.py:76-93).

All functions are jit/vmap/grad-safe: the angle==0 singularities are handled
with the where-trick so gradients have no NaNs.
"""

from __future__ import annotations

import jax.numpy as jnp

_SMALL = 1e-5


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric (hat) operator. v: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=-1),
            jnp.stack([z, o, -x], axis=-1),
            jnp.stack([-y, x, o], axis=-1),
        ],
        axis=-2,
    )


def _sin_over_x(angle2: jnp.ndarray) -> jnp.ndarray:
    """sin(x)/x with Taylor fallback; angle2 = x**2."""
    angle = jnp.sqrt(jnp.maximum(angle2, 1e-24))
    small = angle < _SMALL
    safe = jnp.where(small, 1.0, angle)
    exact = jnp.sin(safe) / safe
    taylor = 1.0 - angle2 / 6.0
    return jnp.where(small, taylor, exact)


def _one_minus_cos_over_x2(angle2: jnp.ndarray) -> jnp.ndarray:
    """(1-cos(x))/x**2 with Taylor fallback."""
    angle = jnp.sqrt(jnp.maximum(angle2, 1e-24))
    small = angle < _SMALL
    safe = jnp.where(small, 1.0, angle)
    exact = (1.0 - jnp.cos(safe)) / (safe * safe)
    taylor = 0.5 - angle2 / 24.0
    return jnp.where(small, taylor, exact)


def _x_minus_sin_over_x3(angle2: jnp.ndarray) -> jnp.ndarray:
    """(x-sin(x))/x**3 with Taylor fallback."""
    angle = jnp.sqrt(jnp.maximum(angle2, 1e-24))
    small = angle < _SMALL
    safe = jnp.where(small, 1.0, angle)
    exact = (safe - jnp.sin(safe)) / (safe * safe * safe)
    taylor = 1.0 / 6.0 - angle2 / 120.0
    return jnp.where(small, taylor, exact)


def so3_exp(theta: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: exp of so(3). theta: (3,) -> (3, 3).

    Matches reference utils/pose_utils.py:25-40 (Taylor branch below 1e-5).
    """
    W = skew(theta)
    W2 = W @ W
    angle2 = jnp.sum(theta * theta)
    I = jnp.eye(3, dtype=theta.dtype)
    return I + _sin_over_x(angle2) * W + _one_minus_cos_over_x2(angle2) * W2


def so3_V(theta: jnp.ndarray) -> jnp.ndarray:
    """Left-Jacobian V(theta) of SO(3) (reference utils/pose_utils.py:43-58)."""
    W = skew(theta)
    W2 = W @ W
    angle2 = jnp.sum(theta * theta)
    I = jnp.eye(3, dtype=theta.dtype)
    return I + _one_minus_cos_over_x2(angle2) * W + _x_minus_sin_over_x3(angle2) * W2


def se3_exp(tau: jnp.ndarray) -> jnp.ndarray:
    """exp of se(3). tau = (rho, theta): (6,) -> (4, 4) homogeneous transform.

    Matches reference utils/pose_utils.py:61-73.
    """
    rho = tau[:3]
    theta = tau[3:]
    R = so3_exp(theta)
    t = so3_V(theta) @ rho
    T = jnp.eye(4, dtype=tau.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def update_pose(tau: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray):
    """Left-multiplicative retraction: T_w2c <- Exp(tau) @ T_w2c.

    Returns (new_R, new_t, converged) where converged = |tau| < 1e-4,
    mirroring reference utils/pose_utils.py:76-93.
    """
    T = jnp.eye(4, dtype=R.dtype).at[:3, :3].set(R).at[:3, 3].set(t)
    new_T = se3_exp(tau) @ T
    converged = jnp.linalg.norm(tau) < 1e-4
    return new_T[:3, :3], new_T[:3, 3], converged


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-norm quaternion (w, x, y, z) -> rotation matrix. q: (..., 4).

    Normalizes first (reference gaussian_splatting/utils/general_utils.py:113-136).
    """
    # eps INSIDE the sqrt: d(sqrt(x))/dx at x=0 is inf, so a zero
    # quaternion (padded map rows) would emit NaN gradients that poison
    # dL/dtau through 0*NaN even though the row is masked out downstream
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
    q = q / norm
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )
