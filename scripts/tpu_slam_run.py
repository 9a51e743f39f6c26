#!/usr/bin/env python
"""Full SLAM end-to-end ON THE REAL TPU: synthetic RGB-D at Replica
resolution. Validates that the complete system — GN tracking, keyframing,
seeding, mapping_steps, densify/prune, eval, headless renders — runs
on-chip, and commits the artifact the reference's slam.py:113-119 FPS
accounting would produce: results/<dir>/{run_summary.json, ate_final.json,
plot/, renders/}.

Usage: python scripts/tpu_slam_run.py [n_frames] [outdir]
Env:   SCENE=room|plane  TILE16=1  FRESH_FPS=1 (second cached-compile pass)
       ASYNC=1 (threaded frontend/backend pipeline — the reference's
       two-process mode, slam.py:103-110: tracking overlaps the host side
       of mapping; the backend maps 10 iters/KF + idle refinement)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsslam_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from gs_slam_analytica_jacobian_tpu.utils.config import load_config
from gs_slam_analytica_jacobian_tpu.utils import eval as eval_utils

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 24
OUT = sys.argv[2] if len(sys.argv) > 2 else None

cfg = load_config("configs/synthetic/test.yaml")
cal = cfg["Dataset"]["Calibration"]
cal["width"], cal["height"] = 1216, 672     # Replica-scale, tile-aligned
cal["fx"] = cal["fy"] = 600.0
cal["cx"], cal["cy"] = 607.5, 335.5
cfg["Dataset"]["n_frames"] = N_FRAMES
cfg["Dataset"]["scene"] = os.environ.get("SCENE", "room")
cfg["Dataset"]["motion_scale"] = float(os.environ.get("MOTION", 0.5))
cfg["Dataset"]["pcd_downsample_init"] = 16
cfg["Dataset"]["pcd_downsample"] = 64
ASYNC = os.environ.get("ASYNC") == "1"
T = cfg["Training"]
T["monocular"] = False
T["single_thread"] = not ASYNC
cfg["Dataset"]["single_thread"] = not ASYNC
# pin the capacity the run ends at: a mid-run grow() recompiles every
# mapping AND tracking program at the new shape — measured 65 s inside
# the frame loop (results/tpu_async_r3b) — and the steady-state map on
# this scene is ~100-150k gaussians
T["initial_capacity"] = 1 << int(os.environ.get("CAP0_LOG2", "18"))
# pair-capacity ceiling: the adaptive ladder STARTS the fine level at
# this value, and pair_gather cost scales with capacity — 2^19 matches
# this scene's observed steady fine caps (524288 held ~271k pairs with
# 2x headroom at the 96-frame map), so the ladder never moves and no
# mid-run tracker compile can trigger
T["pair_capacity"] = 1 << int(os.environ.get(
    "PAIRCAP_LOG2", "21" if os.environ.get("TILE16") == "1" else "19"))
T["tile16"] = os.environ.get("TILE16") == "1"
# pow2 budgets: few distinct mapping_steps compiles
T["init_itr_num"] = 128
T["init_gaussian_update"] = 64
T["init_gaussian_reset"] = 5000
T["tracking_itr_num"] = 20
T["mapping_itr_num"] = 32
T["gaussian_update_every"] = 64
T["gaussian_update_offset"] = 32
T["window_size"] = 6
T["pose_window"] = 3
# pacing: yield the device while a keyframe ack is pending so mapping
# batches get uninterrupted slices at full ingest rate (see
# docs/tpu_full_run_async/README.md round-4 notes)
T["kf_pending_yield_s"] = float(os.environ.get("KF_YIELD", 0.5 if ASYNC
                                               else 0.0))
# cross-frame pair-plan reuse (rebuild every N frames; drift-budget
# gated in the frontend — measured +16% tracking FPS in BENCH r3)
T["plan_reuse_frames"] = int(os.environ.get("PLAN_REUSE", "0"))
# r5 coarse-mapping phase: first 70% of each steady keyframe/idle
# budget renders at s=2 with the blur-matched low-pass, full-res tail
# (VERDICT r4 #3 — the 5.7 s window-6 keyframe wall is full-res
# roofline; at s=2 each coarse iteration renders 1/4 the pixels)
T["map_coarse_frac"] = float(os.environ.get("MAP_COARSE", "0.7"))
T["map_coarse_level"] = 2
# compile + first-dispatch all tracker and mapping variants before the
# frame-loop clock (frontend.prewarm_tracking / backend.prewarm_mapping):
# removes the 9-18 s track_max stalls and the 191 s first-keyframe
# mapping stall measured inside the loop in run_summary_96_paced
T["prewarm_tracking"] = os.environ.get("PREWARM", "1") == "1"
T["prewarm_mapping"] = os.environ.get("PREWARM", "1") == "1"
T["kf_translation"] = 0.01
T["kf_min_translation"] = 0.005
T["kf_overlap"] = 1.0
cfg["opt_params"]["densify_grad_threshold"] = 0.01
cfg["Results"]["save_results"] = True
cfg["Results"]["save_trj"] = True
cfg["Results"]["save_trj_kf_intv"] = 4

from gs_slam_analytica_jacobian_tpu.slam.driver import SLAM

save_dir = OUT or os.path.join(
    "results", "tpu_full", time.strftime("%Y-%m-%d-%H-%M-%S"))
os.makedirs(save_dir, exist_ok=True)

print("devices:", jax.devices(), flush=True)
slam = SLAM(cfg, save_dir=save_dir)
if os.environ.get("PREGEN", "1") == "1":
    # pre-render the synthetic frames into the dataset memo before the
    # clock starts: the host raytrace (~1.5-3.8 s/frame at this
    # resolution) is scene SYNTHESIS, not frame IO — the reference's
    # frame loop pays a ~20 ms PNG decode per frame
    # (utils/dataset.py:124-136), so timing the raytrace inside the
    # frame loop would charge the SLAM system for dataset generation.
    # (Telemetry before this: load = 365 s of the 1222 s frame loop.)
    t_pg = time.time()
    for i in range(N_FRAMES):
        slam.dataset[i]
    print(f"pre-rendered {N_FRAMES} frames in {time.time()-t_pg:.1f}s",
          flush=True)
def run_frames(slam_obj, label=""):
    """Drive the frame loop and return the reference's FPS accounting
    (slam.py:113-119): whole-loop FPS plus, in async mode, the frame-loop
    rate between the first and last completed frame (excluding map-init
    compile and the artifact-generation tail)."""
    t0 = time.time()
    if ASYNC:
        from gs_slam_analytica_jacobian_tpu.parallel.pipeline import \
            run_pipelined

        frame_ts = []

        def _cb(i, _t0=t0):
            frame_ts.append(time.time())
            rec = slam_obj.frontend.frames.get(i)
            terr = (float(np.linalg.norm(rec.t - rec.t_gt))
                    if rec is not None else float("nan"))
            print(f"{label}frame {i}: t={time.time()-_t0:7.1f}s "
                  f"terr={terr:.4f} "
                  f"kfs={len(slam_obj.frontend.kf_indices)}", flush=True)

        run_pipelined(slam_obj.frontend, slam_obj.backend, N_FRAMES,
                      frame_callback=_cb)
    else:
        frame_ts = None
        for idx in range(N_FRAMES):
            t1 = time.time()
            info = slam_obj.frontend.process_frame(idx)
            rec = slam_obj.frontend.frames[idx]
            terr = float(np.linalg.norm(rec.t - rec.t_gt))
            print(f"{label}frame {idx}: {time.time()-t1:6.1f}s "
                  f"kf={info.get('keyframe')} iters={info.get('iters')} "
                  f"terr={terr:.4f}", flush=True)
    wall = time.time() - t0
    res = dict(fps=N_FRAMES / wall, n_frames=N_FRAMES, wall_time=wall)
    if frame_ts and len(frame_ts) > 1:
        res["fps_frame_loop"] = (len(frame_ts) - 1) / (
            frame_ts[-1] - frame_ts[0])
    return res


results = run_frames(slam)
results["ate"] = eval_utils.eval_ate(
    slam.frontend.frames, slam.frontend.kf_indices, save_dir, final=True,
    monocular=False)
if os.environ.get("EVAL_RENDER") == "1":
    # full-resolution rendering eval + color-refinement round trip
    # (reference slam.py:121-187): PSNR/SSIM over every-5th non-KF frame
    # before refinement, then the photometric refinement loop
    # (reference budget 26000, slam_backend.py:323 — REFINE_ITERS scales
    # it; each iteration is one full-res fwd+bwd render, ~0.1 s/iter at
    # this resolution, see PERF.md mapping table), then the same eval
    # after. Populates rendering_before_opt/after_opt in run_summary.
    results["rendering_before_opt"] = slam._eval_rendering("before")
    print("rendering_before_opt:", results["rendering_before_opt"],
          flush=True)
    r_iters = int(os.environ.get("REFINE_ITERS", "26000"))
    if r_iters:
        t_r = time.time()
        slam.backend.color_refinement(r_iters)
        slam.frontend.sync_backend()
        results["refine_iters"] = r_iters
        results["refine_wall_s"] = round(time.time() - t_r, 1)
        results["rendering_after_opt"] = slam._eval_rendering("after")
        print(f"rendering_after_opt ({r_iters} iters, "
              f"{results['refine_wall_s']}s):",
              results["rendering_after_opt"], flush=True)
slam._save_renders()
slam._write_run_summary(results)
print(f"DONE: {N_FRAMES} frames in {results['wall_time']:.1f}s "
      f"({results['fps']:.3f} FPS incl. compile), "
      f"ATE {results['ate']:.4f} m, "
      f"active {int(slam.backend.gm.num_active())}", flush=True)

if os.environ.get("FRESH_FPS") == "1":
    # Steady-state re-run in the same process: every executable is
    # compiled AND has paid the tunnel's one-time first-dispatch load
    # (measured ~10 s per program — PERF.md r3), dataset frames are
    # memoized, so this pass is the honest steady operating point the
    # reference's own wall number reflects (its CUDA kernels ship
    # precompiled). Full artifact set is written to <outdir>/steady.
    steady_dir = os.path.join(save_dir, "steady")
    os.makedirs(steady_dir, exist_ok=True)
    # free pass 1's device state before building the steady instance:
    # two full SLAM states (map + Adam + KF store + window visibility +
    # kept keyframe records) alongside the steady pass's own peak blew
    # HBM on v5e (RESOURCE_EXHAUSTED, results/tpu_async_r3g pass 2)
    lvl_caps = (list(slam.frontend._lvl_caps)
                if slam.frontend._lvl_caps is not None else None)
    seen_caps = set(slam.frontend._seen_caps)
    dataset = slam.dataset
    del slam
    import gc
    gc.collect()
    slam2 = SLAM(cfg, save_dir=steady_dir, dataset=dataset)
    # hand pass 1's adaptive-capacity ladder (and the set of caps tuples
    # already compiled in this process) to the steady pass so it starts
    # on warm program variants instead of re-walking the ladder through
    # fresh compiles
    if lvl_caps is not None:
        slam2.frontend._lvl_caps = lvl_caps
        slam2.frontend._lvl_streaks = [0] * len(lvl_caps)
    slam2.frontend._seen_caps = seen_caps
    results2 = run_frames(slam2, label="steady ")
    results2["ate"] = eval_utils.eval_ate(
        slam2.frontend.frames, slam2.frontend.kf_indices, steady_dir,
        final=True, monocular=False)
    slam2._save_renders()
    slam2._write_run_summary(results2)
    print(f"STEADY: {N_FRAMES} frames in {results2['wall_time']:.1f}s "
          f"({results2['fps']:.3f} FPS whole-run, "
          f"{results2.get('fps_frame_loop', float('nan')):.3f} frame-loop), "
          f"ATE {results2['ate']:.4f} m, "
          f"{len(slam2.frontend.kf_indices)} keyframes", flush=True)
