#!/usr/bin/env python
"""Benchmark: RGB-D tracking FPS on a Replica-scale scene (one chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): >= 30 FPS RGB-D tracking on Replica room0
on a single v5e chip. Replica data is not downloadable in this environment,
so the bench builds a Replica-scale synthetic map (same 1200x680 intrinsics,
same Gaussian count regime) and measures the full tracking optimization —
render + masked tracking loss + backward + Adam + SE(3) retraction,
iterated to the reference's convergence rule — per frame.

Timing: the axon tunnel dedups identical dispatches, so each repetition
perturbs the start pose with a value derived from the previous result
(1e-30-scale, no effect on convergence) and the run is synced by pulling a
scalar to host.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsslam_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gs_slam_analytica_jacobian_tpu.models.camera import Camera
    from gs_slam_analytica_jacobian_tpu.models import gaussian_map as gmap
    from gs_slam_analytica_jacobian_tpu.slam import tracking
    from gs_slam_analytica_jacobian_tpu.slam.render_api import render
    from gs_slam_analytica_jacobian_tpu.ops.lie import se3_exp

    W, H = 1200, 680
    fx = fy = 600.0
    cx, cy = 599.5, 339.5
    N = int(os.environ.get("BENCH_GAUSSIANS", 200_000))
    PAIR_CAP = int(os.environ.get("BENCH_PAIR_CAP", 1 << 20))
    cam = Camera.create(np.eye(3), np.zeros(3), fx, fy, cx, cy, W, H)

    # Replica-scale map: gaussians spread through a room-sized frustum
    rng = np.random.default_rng(0)
    means = np.stack([
        rng.uniform(-4, 4, N), rng.uniform(-2.5, 2.5, N),
        rng.uniform(0.4, 8.0, N)], -1).astype(np.float32)
    gm = gmap.from_numpy(
        xyz=means,
        features_dc=rng.normal(size=(N, 1, 3)).astype(np.float32) * 0.3,
        features_rest=np.zeros((N, 0, 3), np.float32),
        scaling=rng.normal(size=(N, 3)).astype(np.float32) * 0.3 - 4.0,
        rotation=rng.normal(size=(N, 4)).astype(np.float32),
        opacity=rng.normal(size=(N, 1)).astype(np.float32) + 1.0,
        max_sh_degree=0)

    bg = jnp.zeros(3)
    # Ground-truth frame: render from a reference pose
    out_gt = render(gm, cam, None, bg, pair_capacity=PAIR_CAP)
    gt_image = jnp.clip(out_gt.color, 0, 1)
    gt_depth = out_gt.depth
    overflow = int(out_gt.overflow)
    grad_mask = jnp.ones((1, H, W))

    # Start pose: perturbed like an inter-frame motion
    tau = np.zeros(6, np.float32)
    tau[:3] = [0.01, -0.008, 0.012]
    tau[3:] = [0.004, 0.006, -0.003]
    T0 = np.asarray(se3_exp(jnp.asarray(tau)))
    R0 = jnp.asarray(T0[:3, :3], jnp.float32)
    t0 = jnp.asarray(T0[:3, 3], jnp.float32)

    tracker = os.environ.get("BENCH_TRACKER", "pyr")
    track_fn = {"gn": tracking.track_frame_gn,
                "pyr": tracking.track_frame_pyr,
                "adam": tracking.track_frame}[tracker]
    max_iters = 100 if tracker == "adam" else 20

    def run_once(t_start):
        return track_fn(
            gm, cam, R0, t_start,
            gt_image, gt_depth, grad_mask, bg,
            lr_rot=0.003, lr_trans=0.001, rgb_boundary_threshold=0.01,
            max_iters=max_iters, pair_capacity=PAIR_CAP)

    def sync(x):
        return float(jnp.sum(x.ravel()[:1]))

    # warmup/compile
    res = run_once(t0)
    sync(res[0])
    iters = int(res[4])

    n_rep = int(os.environ.get("BENCH_REPS", 5))
    t_start = t0
    t_begin = time.time()
    for _ in range(n_rep):
        res = run_once(t_start)
        # data-dependent chain; 1e-30 perturbation, no convergence effect
        t_start = t0 + res[1] * 1e-30
    sync(res[0])
    dt = (time.time() - t_begin) / n_rep
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "tracking_fps_replica_scale",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "detail": {
            "n_gaussians": N, "resolution": f"{W}x{H}",
            "iters_to_converge": iters,
            "ms_per_frame": round(dt * 1000, 2),
            "ms_per_iter": round(dt * 1000 / max(iters, 1), 3),
            "pair_capacity": PAIR_CAP,
            "gt_render_overflow": overflow,
            "tracker": tracker,
            "final_pose_err_m": round(float(
                np.linalg.norm(np.asarray(res[1]))), 6),
        },
    }))


if __name__ == "__main__":
    main()
