"""End-to-end SLAM smoke test on the synthetic RGB-D dataset (CPU oracle
renderer, tiny iteration budgets). Checks that the full pipeline — init map
seeding, tracking, keyframing, mapping, densify, eval — runs and produces a
sane trajectory (the synthetic camera path is smooth and textures are rich,
so ATE should be small relative to the motion amplitude)."""

import numpy as np
import pytest

from gs_slam_analytica_jacobian_tpu.utils.config import load_config


def small_config(single_thread=True):
    cfg = load_config("configs/synthetic/test.yaml")
    T = cfg["Training"]
    T["renderer"] = "oracle"
    T["init_itr_num"] = 30
    T["init_gaussian_update"] = 20
    T["init_gaussian_reset"] = 5000
    T["tracking_itr_num"] = 12
    T["mapping_itr_num"] = 12
    T["gaussian_update_every"] = 25
    T["gaussian_update_offset"] = 7
    T["window_size"] = 4
    T["pose_window"] = 2
    T["initial_capacity"] = 4096
    T["monocular"] = cfg["Dataset"]["sensor_type"] == "monocular"
    cfg["Dataset"]["single_thread"] = single_thread
    T["single_thread"] = single_thread
    cfg["Dataset"]["n_frames"] = 8
    return cfg


@pytest.mark.slow
def test_slam_synthetic_rgbd_single_thread():
    cfg = small_config()
    cfg["Results"]["save_results"] = False
    from gs_slam_analytica_jacobian_tpu.slam.driver import SLAM

    slam = SLAM(cfg)
    results = slam.run(n_frames=8)
    assert results["n_frames"] == 8
    assert "ate" in results
    # motion amplitude is ~0.2m; with gt depth + rich texture the tracker
    # should do far better than "no tracking at all"
    assert results["ate"] < 0.1, results
    assert int(slam.backend.gm.num_active()) > 100
    assert len(slam.frontend.kf_indices) >= 2
