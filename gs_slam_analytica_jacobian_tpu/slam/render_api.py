"""render(): the L2 API over the tiled renderer.

Mirror of reference gaussian_splatting/gaussian_renderer/__init__.py:24-164:
takes the map + a viewpoint (+ pose delta), returns the render dict. The
``viewspace_points`` gradient trick becomes an explicit ``mean2d_offset``
zero input — grad w.r.t. it is the screen-space mean gradient used for
densification stats.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.camera import Camera, PoseState
from ..models.gaussian_map import GaussianMap
from ..ops import renderer_ref, renderer_tiled
from ..ops.renderer_ref import RenderOutput


def render(
    gm: GaussianMap,
    cam: Camera,
    pose: Optional[PoseState] = None,
    bg: Optional[jnp.ndarray] = None,
    scaling_modifier: float = 1.0,
    mean2d_offset: Optional[jnp.ndarray] = None,
    use_oracle: bool = False,
    pair_capacity: int = 1 << 20,
    interpret: bool = False,
    plan=None,
    need_n_touched: bool = True,
    bf16: bool = False,
    tile16: bool = False,
    nt_weight: bool = False,
    mxu: bool = False,
    low_pass: float = 0.3,
) -> RenderOutput:
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    tau = pose.tau if pose is not None else jnp.zeros((6,), jnp.float32)
    kwargs = dict(
        means3d=gm.xyz,
        cov6=gm.get_cov6(scaling_modifier),
        opacities=gm.get_opacity(),
        shs=gm.get_features(),
        sh_degree=gm.active_sh_degree,
        w2c=cam.w2c(),
        proj=cam.projection(),
        tau=tau,
        fx=cam.fx, fy=cam.fy, width=cam.width, height=cam.height,
        tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
        bg=bg,
        active=gm.active,
        mean2d_offset=mean2d_offset,
    )
    if use_oracle:
        return renderer_ref.render(**kwargs)
    return renderer_tiled.render(
        **kwargs, pair_capacity=pair_capacity, interpret=interpret,
        plan=plan, need_n_touched=need_n_touched, bf16=bf16, tile16=tile16,
        nt_weight=nt_weight, mxu=mxu, low_pass=low_pass)


def mark_visible(means3d: jnp.ndarray, w2c: jnp.ndarray,
                 proj: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Frustum-visibility check: (N,) bool, True where the point sits in
    front of the near plane.

    Named equivalent of the reference's
    ``GaussianRasterizer.markVisible(positions)``
    (diff_gaussian_rasterization/__init__.py:206-215 →
    rasterizer_impl.cu checkFrustum → auxiliary.h in_frustum): the CUDA
    path projects the point but the final predicate is solely
    ``p_view.z > 0.2`` (prefiltered=false), so ``proj`` is accepted for
    API parity and unused. The full screen-rect/footprint cull lives in
    ``gaussian_math.preprocess().valid``."""
    del proj
    p_z = means3d @ w2c[2, :3] + w2c[2, 3]
    return p_z > 0.2


def make_render_plan(
    gm: GaussianMap,
    cam: Camera,
    pair_capacity: int = 1 << 20,
    radius_scale: float = 1.0,
    radius_pad: float = 0.0,
    scaling_modifier: float = 1.0,
    tile16: bool = False,
    extra_active=None,
):
    """Bin once for the given pose; reuse via ``render(..., plan=plan)``.

    The pose-optimization inner loop moves the camera by well under a
    pixel per iteration, so a plan built from the frame-start pose with a
    small ``radius_pad`` stays a superset of the exact pair set (the
    kernel's per-pixel 16px rect test is always evaluated with CURRENT
    means, so extra pairs only cost time, never correctness).

    ``extra_active``: optional (capacity,) bool mask ANDed with the map's
    active set — the tracking visibility cull (gaussians with zero
    contribution at the previous frame's pose) plans with this."""
    from ..ops import gaussian_math as gmath
    from ..ops.renderer_tiled import make_plan

    prep = gmath.preprocess(
        gm.xyz, gm.get_cov6(scaling_modifier), gm.get_opacity(),
        gm.get_features(), gm.active_sh_degree, cam.w2c(), cam.projection(),
        jnp.zeros((6,), jnp.float32), cam.fx, cam.fy, cam.width, cam.height,
        cam.tanfovx, cam.tanfovy)
    active = gm.active if extra_active is None else gm.active & extra_active
    return make_plan(prep, cam.width, cam.height, pair_capacity,
                     active=active, radius_scale=radius_scale,
                     radius_pad=radius_pad, tile16=tile16)
