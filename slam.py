#!/usr/bin/env python
"""SLAM CLI entry point (parity with reference slam.py:201-258).

Usage: python slam.py --config configs/rgbd/replica/room0.yaml [--eval]
"""

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# Persistent compile cache: renderer/tracking/mapping programs take 1-3 min
# each to compile on TPU; the second run of the same config skips them.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("GS_SLAM_COMPILE_CACHE",
                                 "/tmp/jax_cache_gsslam_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gs_slam_analytica_jacobian_tpu.utils.config import load_config
from gs_slam_analytica_jacobian_tpu.utils.logging import Log


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--frames", type=int, default=None,
                        help="limit number of frames (debug)")
    parser.add_argument("--interpret", action="store_true",
                        help="run Pallas kernels in interpreter mode (CPU)")
    parser.add_argument("--live", type=float, default=0.0, metavar="SEC",
                        help="stream headless-viewer PNGs of the evolving "
                             "map to <save_dir>/live every SEC seconds")
    parser.add_argument("--viewer", type=int, default=None, metavar="PORT",
                        help="serve the interactive browser viewer on "
                             "http://127.0.0.1:PORT/ (0 = auto port)")
    args = parser.parse_args()

    config = load_config(args.config)

    if args.eval:
        Log("Running MonoGS-style evaluation mode")
        config["Results"]["save_results"] = True
        config["Results"]["use_gui"] = False
        config["Results"]["eval_rendering"] = True
        config["Results"]["use_wandb"] = False

    save_dir = None
    if config["Results"]["save_results"]:
        stamp = time.strftime("%Y-%m-%d-%H-%M-%S")
        path = config["Dataset"].get("dataset_path", "synthetic").rstrip("/")
        tail = os.path.join(*path.split("/")[-2:]) if "/" in path else path
        save_dir = os.path.join(config["Results"]["save_dir"], tail, stamp)
        os.makedirs(save_dir, exist_ok=True)
        try:
            shutil.copy(args.config, os.path.join(save_dir, "config.yml"))
        except Exception:
            pass
        Log(f"saving results in {save_dir}")

    from gs_slam_analytica_jacobian_tpu.slam.driver import SLAM

    slam = SLAM(config, save_dir=save_dir, interpret=args.interpret,
                live_interval=args.live, viewer_port=args.viewer)
    results = slam.run(
        n_frames=args.frames,
        eval_rendering=config["Results"].get("eval_rendering", False))
    Log("Results:", results)


if __name__ == "__main__":
    main()
