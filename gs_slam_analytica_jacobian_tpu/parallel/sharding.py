"""Multi-chip mapping: data-parallel keyframe sharding over a device mesh.

The reference is single-GPU (SURVEY.md section 2: no DP/TP/PP). The natural
TPU scale-out axis for GS-SLAM mapping is the keyframe/view axis: each chip
renders + differentiates a shard of the window's keyframes against a
replicated Gaussian map, gradients are psum'd over ICI, and the (identical)
Adam update runs replicated. This is classic DP where a "batch element" is
a full rendered view.

Implemented with shard_map over a 1D ('data',) mesh; collectives are XLA
psum over ICI. Works on any device count that divides the frame axis.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.camera import Camera, PoseState
from ..models.gaussian_map import (AdamState, GaussianMap, PARAM_FIELDS,
                                   adam_update)
from ..ops import losses
from .. import ops
from ..slam.render_api import render


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), axis_names=("data",))


def sharded_mapping_step(
    mesh: Mesh,
    gm: GaussianMap,
    gm_adam: AdamState,
    frames_R: jnp.ndarray,      # (F, 3, 3) — F divisible by mesh size
    frames_t: jnp.ndarray,      # (F, 3)
    gt_images: jnp.ndarray,     # (F, 3, H, W)
    gt_depths: jnp.ndarray,     # (F, 1, H, W)
    frames_valid: jnp.ndarray,  # (F,)
    cam_template: Camera,
    bg: jnp.ndarray,
    gm_lrs,
    rgb_boundary_threshold: float = 0.01,
    alpha: float = 0.95,
    use_oracle: bool = False,
    interpret: bool = False,
    pair_capacity: int = 1 << 18,
) -> Tuple[GaussianMap, AdamState, jnp.ndarray]:
    """One data-parallel map optimization step. Returns (gm, adam, loss)."""

    params = {f: getattr(gm, f) for f in PARAM_FIELDS}

    def local_loss(params, R_sh, t_sh, img_sh, dep_sh, val_sh):
        gm_p = gm.replace(**params)

        def frame_loss(carry, xs):
            Rf, tf, gt_i, gt_d, vf = xs
            cam = cam_template.replace(R=Rf, t=tf)
            out = render(gm_p, cam, None, bg, use_oracle=use_oracle,
                         interpret=interpret, pair_capacity=pair_capacity)
            L = losses.loss_mapping_rgbd(
                out.color, out.depth, gt_i, gt_d, rgb_boundary_threshold,
                alpha)
            return carry + jnp.where(vf, L, 0.0), None

        local, _ = jax.lax.scan(
            frame_loss, jnp.zeros(()), (R_sh, t_sh, img_sh, dep_sh, val_sh))
        # global loss on every device -> grad contains the psum'd gradient
        return jax.lax.psum(local, "data")

    def step(params, R_sh, t_sh, img_sh, dep_sh, val_sh):
        loss, g = jax.value_and_grad(local_loss)(
            params, R_sh, t_sh, img_sh, dep_sh, val_sh)
        return loss, g

    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data"),
                  P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    loss, grads = jax.jit(sharded)(
        params, frames_R, frames_t, gt_images, gt_depths, frames_valid)
    new_gm, new_adam = adam_update(gm, grads, gm_adam, gm_lrs)
    return new_gm, new_adam, loss
