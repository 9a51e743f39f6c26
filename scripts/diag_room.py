#!/usr/bin/env python
"""Diagnose the frame 10-12 tracking/mapping excursion from the r2_room24
on-chip run (docs/tpu_full_run/README.md) at reduced resolution on CPU.

Prints, per frame: terr right after tracking, terr after backend sync
(keyframes only — isolates whether tracking diverged or the backend's
per-KF pose optimization moved the pose), plus per-KF pose drift applied
by each sync.

Usage: JAX_PLATFORMS=cpu python scripts/diag_room.py [n_frames] [width]
       python scripts/diag_room.py 24 1216        # full res, REAL CHIP
       (on-chip shapes match scripts/tpu_slam_run.py -> cached compiles)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsslam_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from gs_slam_analytica_jacobian_tpu.utils.config import load_config

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 24
W = int(sys.argv[2]) if len(sys.argv) > 2 else 320
H = 672 if W == 1216 else int(round(W * 672 / 1216 / 16) * 16)
ON_CHIP = jax.default_backend() != "cpu"

cfg = load_config("configs/synthetic/test.yaml")
cal = cfg["Dataset"]["Calibration"]
cal["width"], cal["height"] = W, H
scale = W / 1216.0
cal["fx"] = cal["fy"] = 600.0 * scale
cal["cx"], cal["cy"] = W / 2 - 0.5, H / 2 - 0.5
cfg["Dataset"]["n_frames"] = N_FRAMES
cfg["Dataset"]["scene"] = "room"
cfg["Dataset"]["motion_scale"] = float(os.environ.get("MOTION", 0.5))
cfg["Dataset"]["pcd_downsample_init"] = max(1, int(16 * scale * scale))
cfg["Dataset"]["pcd_downsample"] = max(1, int(64 * scale * scale))
T = cfg["Training"]
T["monocular"] = False
T["single_thread"] = True
cfg["Dataset"]["single_thread"] = True
T["initial_capacity"] = 1 << 17
T["pair_capacity"] = 1 << (20 if ON_CHIP else 18)
T["init_itr_num"] = 128
T["init_gaussian_update"] = 64
T["init_gaussian_reset"] = 5000
T["tracking_itr_num"] = 20
T["mapping_itr_num"] = 32
T["gaussian_update_every"] = 64
T["gaussian_update_offset"] = 32
T["window_size"] = 6
T["pose_window"] = int(os.environ.get("POSE_WINDOW", 3))
T["kf_translation"] = 0.01
T["kf_min_translation"] = 0.005
T["kf_overlap"] = 1.0
cfg["opt_params"]["densify_grad_threshold"] = 0.01
cfg["Results"]["save_results"] = False
cfg["Results"]["save_trj"] = False

from gs_slam_analytica_jacobian_tpu.slam.driver import SLAM
from gs_slam_analytica_jacobian_tpu.utils import eval as eval_utils

slam = SLAM(cfg, save_dir=None, interpret=not ON_CHIP)
fe = slam.frontend

orig_track = fe.track
track_err = {}


def track_hook(idx, rec):
    out, iters = orig_track(idx, rec)
    track_err[idx] = float(np.linalg.norm(rec.t - rec.t_gt))
    return out, iters


fe.track = track_hook

orig_sync = fe.sync_backend


def sync_hook(payload=None):
    before = {uid: fe.frames[uid].t.copy() for uid in fe.kf_indices
              if uid in fe.frames}
    orig_sync(payload)
    moved = []
    for uid, t0 in before.items():
        d = float(np.linalg.norm(fe.frames[uid].t - t0))
        if d > 1e-5:
            moved.append((uid, d))
    if moved:
        print("    sync moved KFs: "
              + ", ".join(f"{u}:{d*1000:.1f}mm" for u, d in moved[-6:]),
              flush=True)


fe.sync_backend = sync_hook

if os.environ.get("TIMERS") == "1":
    # stage timers around the backend keyframe path
    import time as _t

    import jax as _jax

    be = slam.backend

    def timed(name, fn):
        def wrap(*a, **k):
            t0 = _t.time()
            r = fn(*a, **k)
            _jax.block_until_ready(be.gm.xyz)
            print(f"      [{name}] {_t.time()-t0:6.2f}s", flush=True)
            return r
        return wrap

    be.add_next_kf = timed("add_next_kf", be.add_next_kf)
    be.map = timed("map", be.map)
    be._densify_and_prune = timed("densify", be._densify_and_prune)
    be._run_batch = timed("run_batch", be._run_batch)

for idx in range(N_FRAMES):
    info = fe.process_frame(idx)
    rec = fe.frames[idx]
    terr = float(np.linalg.norm(rec.t - rec.t_gt))
    te = track_err.get(idx, 0.0)
    print(f"frame {idx:2d} kf={int(bool(info.get('keyframe')))} "
          f"iters={info.get('iters', 0):3} track_terr={te*1000:7.2f}mm "
          f"final_terr={terr*1000:7.2f}mm", flush=True)

ate = eval_utils.eval_ate(fe.frames, fe.kf_indices, None, final=True,
                          monocular=False)
print(f"ATE {ate*1000:.2f} mm over {len(fe.kf_indices)} KFs")
