#!/usr/bin/env python
"""Decompose the DEFAULT pyramid tracker's per-frame cost (r3 config:
flow-IRLS all levels, no per-frame polish, adaptive capacity bucket).

Times whole jitted variants of track_frame_pyr on the bench room scene and
differences them, plus the isolated plan/render stages. Chained-dispatch
methodology (see PERF.md): reps are data-chained through the returned pose
and synced with one scalar pull.

Usage: python scripts/profile_track2.py [N] [CAP]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsslam_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench as B
from gs_slam_analytica_jacobian_tpu.models.camera import Camera
from gs_slam_analytica_jacobian_tpu.models import gaussian_map as gmap
from gs_slam_analytica_jacobian_tpu.slam import tracking
from gs_slam_analytica_jacobian_tpu.slam.render_api import (
    make_render_plan, render)
from gs_slam_analytica_jacobian_tpu.ops import losses as loss_ops

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 640 * 1024
W, H = 1200, 680
fx = fy = 600.0
cam = Camera.create(np.eye(3), np.zeros(3), fx, fy, 599.5, 339.5, W, H)
rng = np.random.default_rng(0)
gm = gmap.from_numpy(**B.make_room_map(N, rng), max_sh_degree=0)
bg = jnp.zeros(3)

print("devices:", jax.devices(), flush=True)

out_gt = render(gm, cam, None, bg, pair_capacity=CAP)
gt_img = jnp.clip(out_gt.color, 0, 1)
gt_depth = out_gt.depth
mask = loss_ops.compute_grad_mask(
    gt_img.mean(axis=0, keepdims=True), 1.1, "replica")
jax.block_until_ready(gt_img)


def timeit(label, fn, carry0, reps=10):
    """fn(carry) -> scalar; reps chained through the result AND a
    distinct per-rep constant — consecutive dispatches must differ in
    VALUE, not just buffer identity, or the tunnel dedups them (measured:
    a full tracking call "took" 0.86 ms when chained with a constant
    perturbation)."""
    c = carry0
    r = fn(c)  # warm/compile
    jax.block_until_ready(r)
    t0 = time.time()
    for k in range(reps):
        r = fn(c + (k + 1) * 1e-27)
        c = r * 1e-30
    jax.block_until_ready(r)
    dt = (time.time() - t0) / reps * 1000
    print(f"{label:44s} {dt:8.2f} ms", flush=True)
    return dt


def track_variant(label, levels, iters, exacts, reps=6):
    def fn(eps):
        res = tracking.track_frame_pyr(
            gm, cam, jnp.eye(3), jnp.zeros(3) + eps,
            gt_img, gt_depth, mask, bg,
            0.003, 0.001, 0.01,
            pair_capacity=CAP, curv="flow",
            levels=levels, level_iters=iters, level_exact=exacts,
            plan_pad=4.0)
        return res[1][0]  # t[0] chains
    return timeit(label, fn, jnp.zeros(()), reps)


full = track_variant("default (4,2,1)x(5,3,12) irls", (4, 2, 1), (5, 3, 12),
                     (0, 0, 0))
fine_only = track_variant("fine only (1,)x(12,) irls", (1,), (12,), (0,))
fine3 = track_variant("fine only (1,)x(3,) irls", (1,), (3,), (0,))
fine1 = track_variant("fine only (1,)x(1,) irls", (1,), (1,), (0,))
fine1x = track_variant("fine only (1,)x(1,) exact", (1,), (1,), (1,))

# isolated stages
plan = [None]


def plan_fn(eps):
    p = make_render_plan(gm, cam.replace(t=cam.t + eps), pair_capacity=CAP,
                         radius_scale=1.1, radius_pad=4.0)
    plan[0] = p
    return p.num_pairs.astype(jnp.float32)


t_plan = timeit("plan (fine, cap bucket)", plan_fn, jnp.zeros(3))


def fwd_fn(eps):
    o = render(gm, cam.replace(t=cam.t + eps), None, bg, pair_capacity=CAP,
               plan=plan[0], need_n_touched=False)
    return o.color[0, 0, :1]


t_fwd = timeit("planned forward (no n_touched)", fwd_fn, jnp.zeros(3))


def fwd_nt_fn(eps):
    o = render(gm, cam.replace(t=cam.t + eps), None, bg, pair_capacity=CAP,
               plan=plan[0])
    return o.color[0, 0, :1]


t_fwdnt = timeit("planned forward (+ n_touched)", fwd_nt_fn, jnp.zeros(3))

per_irls = (fine3 - fine1) / 2.0
print("\nderived:", flush=True)
print(f"  coarse+mid levels total        {full - fine_only:8.2f} ms")
print(f"  one fine IRLS iteration        {per_irls:8.2f} ms")
print(f"  fine fixed cost (plan+final)   {fine1 - per_irls:8.2f} ms")
print(f"  exact-vs-irls iteration delta  {fine1x - fine1:8.2f} ms")
