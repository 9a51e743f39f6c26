#!/usr/bin/env python
"""Generate the committed 15-Gaussian Jacobian-lab fixture.

Mirrors the reference's fixture setup (Loss_Derivative_script_compare.py
__main__:1354-1424): a small optimized Gaussian set, 640x480 intrinsics
(fx=fy=577.5, cx=319.5, cy=239.5 — the NOCS camera), a ground-truth pose
and a noise transform T_noise = (10 deg z-rotation, 0.15 m translation),
w2c = w2c_gt @ T_noise, plus a gt image/depth/mask to take gradients
against. The reference's actual inputs (optimized_params_small.pt, NOCS
frame 0008) are not shipped in its repo, so this synthesizes an equivalent
fixture and the golden outputs are regenerated from it.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax.numpy as jnp
    from gs_slam_analytica_jacobian_tpu.ops import (camera_math as cm,
                                                    gaussian_math as gm,
                                                    renderer_ref)

    rng = np.random.default_rng(1234)
    N = 15
    W, H = 160, 120         # NOCS aspect, downscaled for a fast test
    fx = fy = 577.5 / 4.0
    cx, cy = 319.5 / 4.0, 239.5 / 4.0

    xyz = rng.normal(size=(N, 3)).astype(np.float32) * 0.12
    xyz[:, 2] += 1.0
    scaling = (rng.normal(size=(N, 3)) * 0.3 - 3.2).astype(np.float32)
    rotation = rng.normal(size=(N, 4)).astype(np.float32)
    rotation /= np.linalg.norm(rotation, axis=1, keepdims=True)
    opacity = rng.normal(size=(N, 1)).astype(np.float32) + 1.0  # logits
    features = np.zeros((N, 16, 3), np.float32)
    features[:, 0] = rng.normal(size=(N, 3)) * 0.6
    features[:, 1:] = rng.normal(size=(N, 15, 3)) * 0.1

    # gt pose: slight offset looking at the cluster
    w2c_gt = np.eye(4, dtype=np.float32)
    w2c_gt[:3, 3] = [0.02, -0.01, 0.05]

    # T_noise: the reference's EXACT noise transform — 10 degree
    # z-rotation + 0.15 m translation on every axis, verbatim from
    # Jacob_test_result/T_noise.txt
    c10, s10 = 9.848077530122081313e-01, 1.736481776669303312e-01
    T_noise = np.array(
        [[c10, -s10, 0.0, 0.15],
         [s10, c10, 0.0, 0.15],
         [0.0, 0.0, 1.0, 0.15],
         [0.0, 0.0, 0.0, 1.0]], np.float32)

    # gt image/depth: render at the GT pose with the oracle (plays the role
    # of the NOCS frame) + a foreground mask
    import jax
    proj = cm.projection_matrix(0.01, 100.0, cx, cy, fx, fy, W, H)
    cov6 = gm.build_cov3d(jnp.exp(jnp.asarray(scaling)),
                          jnp.asarray(rotation))
    out = renderer_ref.render(
        jnp.asarray(xyz), cov6,
        jax.nn.sigmoid(jnp.asarray(opacity))[:, 0],
        jnp.asarray(features), 3,
        jnp.asarray(w2c_gt), jnp.asarray(proj), jnp.zeros(6),
        fx, fy, W, H, W / (2 * fx), H / (2 * fy), jnp.zeros(3))
    gt_color = np.asarray(out.color).transpose(1, 2, 0)
    gt_depth = np.asarray(out.depth)[0]
    mask = np.asarray(out.opacity)[0] > 0.05

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "jacobian_fixture.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(
        path, xyz=xyz, scaling=scaling, rotation=rotation, opacity=opacity,
        features=features, w2c_gt=w2c_gt, T_noise=T_noise,
        gt_color=gt_color, gt_depth=gt_depth, mask=mask,
        fx=fx, fy=fy, cx=cx, cy=cy)
    print("wrote", path)

    # golden outputs (regression targets, like Jacob_test_result/*.npy)
    sys.path.insert(0, os.path.dirname(path))
    from jacobian_test import run, load_fixture
    fix = load_fixture(path)
    res = run(fix, mode="reference", verbose=False)
    gpath = os.path.join(os.path.dirname(path), "jacobian_golden.npz")
    np.savez_compressed(
        gpath,
        dL_dtau=res["total"],
        dL_dtau_autodiff=res["autodiff"],
        grad_mu=np.asarray(res["grads"].grad_mu),
        grad_sigma=np.asarray(res["grads"].grad_sigma),
        grad_depth=np.asarray(res["grads"].grad_depth),
        grad_color=np.asarray(res["grads"].grad_color),
        **{f"part_{k}": v for k, v in res["parts"].items()})
    print("wrote", gpath)
    for k, v in res["parts"].items():
        print(f"  {k}: {v}")
    print("  total:", res["total"])
    print("  autodiff:", res["autodiff"])


if __name__ == "__main__":
    main()
