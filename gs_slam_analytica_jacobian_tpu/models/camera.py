"""Camera pytree (functional replacement of the reference's Camera nn.Module).

Reference: utils/camera_utils.py:8-155. The torch Camera carries learnable
``cam_rot_delta/cam_trans_delta/exposure_a/exposure_b`` parameters and
lazily-built (transposed) torch matrices. Here the camera is an immutable
pytree; the pose delta tau and the exposure live alongside it and are the
explicit optimization variables of the tracking/mapping loops. W/H and
intrinsics-derived scalars that must be static under jit are python floats.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import camera_math


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A single viewpoint.

    R, t: world-to-camera rotation/translation (w2c), row-major, i.e.
    p_cam = R @ p_world + t (same storage as reference getWorld2View2).
    """

    R: jnp.ndarray                     # (3, 3) f32
    t: jnp.ndarray                     # (3,)   f32
    fx: float = dataclasses.field(metadata=dict(static=True))
    fy: float = dataclasses.field(metadata=dict(static=True))
    cx: float = dataclasses.field(metadata=dict(static=True))
    cy: float = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    znear: float = dataclasses.field(default=0.01, metadata=dict(static=True))
    zfar: float = dataclasses.field(default=100.0, metadata=dict(static=True))

    @property
    def tanfovx(self) -> float:
        return self.width / (2.0 * self.fx)

    @property
    def tanfovy(self) -> float:
        return self.height / (2.0 * self.fy)

    @property
    def fovx(self) -> float:
        return 2 * math.atan(self.tanfovx)

    @property
    def fovy(self) -> float:
        return 2 * math.atan(self.tanfovy)

    def w2c(self) -> jnp.ndarray:
        return camera_math.world_to_view(self.R, self.t)

    def projection(self) -> jnp.ndarray:
        return jnp.asarray(
            camera_math.projection_matrix(
                self.znear, self.zfar, self.cx, self.cy, self.fx, self.fy,
                self.width, self.height,
            )
        )

    def center(self) -> jnp.ndarray:
        return camera_math.camera_center(self.w2c())

    def replace(self, **kw) -> "Camera":
        return dataclasses.replace(self, **kw)

    @staticmethod
    def create(
        R: np.ndarray, t: np.ndarray, fx: float, fy: float, cx: float,
        cy: float, width: int, height: int, znear: float = 0.01,
        zfar: float = 100.0, dtype=jnp.float32,
    ) -> "Camera":
        return Camera(
            R=jnp.asarray(R, dtype=dtype), t=jnp.asarray(t, dtype=dtype),
            fx=float(fx), fy=float(fy), cx=float(cx), cy=float(cy),
            width=int(width), height=int(height), znear=float(znear),
            zfar=float(zfar),
        )

    @staticmethod
    def from_w2c(w2c: np.ndarray, fx, fy, cx, cy, width, height, **kw) -> "Camera":
        w2c = np.asarray(w2c)
        return Camera.create(w2c[:3, :3], w2c[:3, 3], fx, fy, cx, cy,
                             width, height, **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoseState:
    """Per-frame optimization state: se(3) delta and affine exposure.

    tau = (rho, theta); render() applies T_eff = Exp(tau) @ T_base so that
    grad-at-tau-zero equals the reference rasterizer's dL/dtau
    (diff_gaussian_rasterization/__init__.py:154-182 splits it into
    grad_rho/grad_theta routed to cam_trans_delta/cam_rot_delta).
    exposure: image_ab = exp(a) * image + b (reference slam_utils.py:57).
    """

    tau: jnp.ndarray         # (6,)
    exposure_a: jnp.ndarray  # ()
    exposure_b: jnp.ndarray  # ()

    @staticmethod
    def zero(dtype=jnp.float32) -> "PoseState":
        return PoseState(
            tau=jnp.zeros((6,), dtype),
            exposure_a=jnp.zeros((), dtype),
            exposure_b=jnp.zeros((), dtype),
        )
