#!/usr/bin/env python
"""Stage-level profile of one tracking iteration at bench scale (real TPU).

Measures, with the tunnel-safe chained-reps methodology (see
profile_micro.py): plan_pairs, preprocess, pair_gather, composite32
forward, and the full tracking-loss value_and_grad — plus the tile
early-exit statistics (chunks available vs processed) that decide whether
per-tile depth truncation has headroom beyond the existing early exit.

Usage: python scripts/profile_kernels.py [N] [stages]
  stages: comma list from {stats,fwd,grad,plan,prep,gather}, default all
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsslam_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_room_map
from gs_slam_analytica_jacobian_tpu.models.camera import Camera, PoseState
from gs_slam_analytica_jacobian_tpu.models import gaussian_map as gmap
from gs_slam_analytica_jacobian_tpu.ops import losses
from gs_slam_analytica_jacobian_tpu.ops import binning2
from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gsm
from gs_slam_analytica_jacobian_tpu.ops import renderer_tiled as rt
from gs_slam_analytica_jacobian_tpu.ops.pallas import tile_kernel2 as tk
from gs_slam_analytica_jacobian_tpu.slam.render_api import (
    make_render_plan, render)

R = 8


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].ravel()[:1].astype(jnp.float32)))


def measure(label, make_fn, args):
    f1, fR = make_fn(1), make_fn(R)
    sync(f1(*args)); sync(fR(*args))
    best = np.inf
    for _ in range(2):
        t0 = time.time(); sync(f1(*args)); t1 = time.time() - t0
        t0 = time.time(); sync(fR(*args)); tR = time.time() - t0
        best = min(best, (tR - t1) / (R - 1))
    print(f"{label:46s} {best*1000:9.2f} ms", flush=True)
    return best * 1000


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    stages = (sys.argv[2].split(",") if len(sys.argv) > 2
              else ["stats", "fwd", "grad", "plan", "prep", "gather"])
    tile16 = os.environ.get("TILE16") == "1"
    W, H = 1200, 680
    fx = fy = 600.0
    cam = Camera.create(np.eye(3), np.zeros(3), fx, fy, 599.5, 339.5, W, H)
    PAIR_CAP = 1 << (21 if tile16 else 20)

    rng = np.random.default_rng(0)
    gm = gmap.from_numpy(**make_room_map(N, rng), max_sh_degree=0)
    bg = jnp.zeros(3)

    print(f"devices={jax.devices()} N={N}", flush=True)

    pad = float(os.environ.get("PAD", "4"))
    plan = make_render_plan(gm, cam, pair_capacity=PAIR_CAP,
                            radius_scale=1.1, radius_pad=pad,
                            tile16=tile16)
    if tile16:
        from gs_slam_analytica_jacobian_tpu.ops.pallas import tile_kernel16
        n_gx, n_gy = tile_kernel16.grid_dims16(W, H)
        n_tx, n_ty = 2 * n_gx, 2 * n_gy
    else:
        n_tx, n_ty = tk.grid_dims(W, H)
    ranges = np.asarray(plan.ranges)
    n_pairs = int(plan.num_pairs)
    n_t = ranges[:, 1] - ranges[:, 0]
    chunk = 128   # tile_kernel16.K16 == tile_kernel2.K == 128
    avail = (n_t + chunk - 1) // chunk
    print(f"pairs={n_pairs} tiles={n_tx*n_ty} "
          f"chunks_avail={int(avail.sum())} "
          f"mean_pairs_per_tile={n_t.mean():.0f}", flush=True)

    # gt render for the loss
    out_gt = render(gm, cam, None, bg, pair_capacity=PAIR_CAP)
    gt_img = jnp.clip(out_gt.color, 0, 1)
    gt_depth = out_gt.depth
    mask = losses.compute_grad_mask(
        gt_img.mean(axis=0, keepdims=True), 1.1, "replica")

    proj = cam.projection()
    w2c = cam.w2c()
    tanx, tany = cam.tanfovx, cam.tanfovy

    def prep_fn(tau):
        return gsm.preprocess(
            gm.xyz, gm.get_cov6(), gm.get_opacity(), gm.get_features(),
            gm.active_sh_degree, w2c, proj, tau, fx, fy, W, H, tanx, tany)

    if "stats" in stages:
        prep = prep_fn(jnp.zeros(6))
        prep = prep._replace(valid=prep.valid & gm.active)
        table = rt.pack_table(prep)
        from gs_slam_analytica_jacobian_tpu.ops.pair_gather import pair_gather
        feat = pair_gather(table, plan)
        if tile16:
            from gs_slam_analytica_jacobian_tpu.ops.pallas import tile_kernel16
            img, _ = tile_kernel16._fwd_impl16(
                feat, plan.ranges, n_gx, n_gy, W, H, False, False)
            stats = np.asarray(tile_kernel16.chunk_stats_from_img16(
                img, n_gx, n_gy))
        else:
            img, _ = tk._fwd_impl(feat, plan.ranges, n_tx, n_ty, W, H,
                                  False, False, False)
            stats = np.asarray(tk.chunk_stats_from_img(img, n_tx, n_ty))
        used = stats.reshape(-1)
        av = avail.astype(np.float64)
        print(f"chunks: avail={av.sum():.0f} used={used.sum():.0f} "
              f"({100*used.sum()/max(av.sum(),1):.1f}%)", flush=True)
        full_tiles = int(((used >= av) & (av > 0)).sum())
        print(f"tiles running ALL chunks (stragglers): {full_tiles} "
              f"of {(av>0).sum():.0f}; their chunk share "
              f"{100*used[(used>=av)&(av>0)].sum()/max(used.sum(),1):.1f}%",
              flush=True)
        hist = np.histogram(used, bins=[0, 1, 2, 3, 4, 6, 8, 12, 100])[0]
        print(f"used-chunk histogram [0,1,2,3,4-5,6-7,8-11,12+]: "
              f"{hist.tolist()}", flush=True)

    def mk_plan(reps):
        @jax.jit
        def f(xyz):
            out = None
            for r in range(reps):
                p = prep_fn(jnp.zeros(6).at[0].set(xyz[0] * 1e-30 * r))
                p = p._replace(valid=p.valid & gm.active)
                out = binning2.plan_pairs(p, tk.TPX, tk.TPY, n_tx, n_ty,
                                          PAIR_CAP, chunk=tk.K)
            return out.ranges[:1, 0].astype(jnp.float32)
        return f

    def mk_prep(reps):
        @jax.jit
        def f(tau):
            acc = jnp.zeros(())
            for r in range(reps):
                p = prep_fn(tau * (1e-30 * r))
                acc = acc + p.mean2d[0, 0]
            return acc
        return f

    def mk_gather(reps):
        from gs_slam_analytica_jacobian_tpu.ops.pair_gather import pair_gather

        @jax.jit
        def f(tau):
            p = prep_fn(tau)
            p = p._replace(valid=p.valid & gm.active)
            table = rt.pack_table(p)
            acc = jnp.zeros(())
            for r in range(reps):
                feat = pair_gather(table + acc * 1e-30, plan)
                acc = acc + feat[0, 0]
            return acc
        return f

    def mk_kern(reps):
        """Time the Pallas compositing call ALONE (pre-gathered feat)."""
        prep0 = prep_fn(jnp.zeros(6))
        prep0 = prep0._replace(valid=prep0.valid & gm.active)
        table0 = rt.pack_table(prep0)
        from gs_slam_analytica_jacobian_tpu.ops.pair_gather import pair_gather
        feat0 = pair_gather(table0, plan)

        @jax.jit
        def f(feat):
            acc = jnp.zeros(())
            for r in range(reps):
                if tile16:
                    from gs_slam_analytica_jacobian_tpu.ops.pallas import (
                        tile_kernel16 as tkk)
                    img, _ = tkk._fwd_impl16(
                        feat + acc * 1e-30, plan.ranges, n_gx, n_gy, W, H,
                        False, False)
                else:
                    img, _ = tk._fwd_impl(
                        feat + acc * 1e-30, plan.ranges, n_tx, n_ty, W, H,
                        False, False)
                acc = acc + img[0, 0, 0]
            return acc
        return lambda feat: f(feat)

    def mk_fwd(reps):
        # reps MUST chain through acc (tau + acc*1e-30): the previous
        # form tau*(1e-30*(r+1)) with tau=0 left every rep's PURE prefix
        # (preprocess/gather) identical, so XLA CSE'd it across reps and
        # the per-rep delta over-attributed to the side-effecting kernel
        # call — the r5 'phantom 50 ms' (PERF.md r5)
        @jax.jit
        def f(tau):
            acc = jnp.zeros(())
            for r in range(reps):
                out = render(gm, cam,
                             PoseState(tau=tau + acc * 1e-30,
                                       exposure_a=jnp.zeros(()),
                                       exposure_b=jnp.zeros(())),
                             bg, pair_capacity=PAIR_CAP, plan=plan,
                             need_n_touched=False, tile16=tile16)
                acc = acc + out.color[0, 0, 0]
            return acc
        return f

    def loss_at(tau):
        out = render(gm, cam,
                     PoseState(tau=tau, exposure_a=jnp.zeros(()),
                               exposure_b=jnp.zeros(())),
                     bg, pair_capacity=PAIR_CAP, plan=plan,
                     need_n_touched=False, tile16=tile16)
        return losses.loss_tracking_rgbd(
            out.color, out.depth, gt_img, gt_depth, out.opacity, mask,
            0.01, 0.95)

    def mk_grad(reps):
        g = jax.grad(loss_at)

        @jax.jit
        def f(tau):
            acc = jnp.zeros((6,))
            for r in range(reps):
                acc = acc + g(tau + acc * 1e-30)
            return acc
        return f

    z6 = jnp.zeros(6)
    if "kern" in stages:
        prep0 = prep_fn(jnp.zeros(6))
        prep0 = prep0._replace(valid=prep0.valid & gm.active)
        from gs_slam_analytica_jacobian_tpu.ops.pair_gather import pair_gather
        feat0 = pair_gather(rt.pack_table(prep0), plan)
        def mk_kern2(reps):
            fn = mk_kern(reps)
            return fn
        measure("compositing kernel only", mk_kern, (feat0,))
    if "fwd" in stages:
        measure("composite fwd (render, no ntouch)", mk_fwd, (z6,))
    if "grad" in stages:
        measure("tracking loss value+grad (fwd+bwd)", mk_grad, (z6,))
    if "plan" in stages:
        measure("plan_pairs (incl. preprocess)", mk_plan,
                (jnp.ones(3),))
    if "prep" in stages:
        measure("preprocess only", mk_prep, (z6,))
    if "gather" in stages:
        measure("pair_gather", mk_gather, (z6,))
    print("done", flush=True)


if __name__ == "__main__":
    main()
