"""Interactive HTTP viewer (gui/web.py): the displayless counterpart of
the reference's Open3D window (gui/slam_gui.py:34-683). Drives the real
HTTP surface: page, live frame rendering in all three view modes, free
orbit camera, status, and the pause/unpause control grammar."""

import json

import pytest
import urllib.request

import numpy as np

from gs_slam_analytica_jacobian_tpu.utils.config import load_config


def tiny_slam():
    from gs_slam_analytica_jacobian_tpu.slam.driver import SLAM

    cfg = load_config("configs/synthetic/test.yaml")
    cal = cfg["Dataset"]["Calibration"]
    cal["width"], cal["height"] = 64, 48
    cal["fx"] = cal["fy"] = 44.0
    cal["cx"], cal["cy"] = 31.5, 23.5
    cfg["Dataset"]["motion_scale"] = 0.5
    cfg["Dataset"]["n_frames"] = 3
    cfg["Dataset"]["pcd_downsample_init"] = 4
    cfg["Dataset"]["pcd_downsample"] = 8
    cfg["Results"]["save_results"] = False
    T = cfg["Training"]
    T["renderer"] = "tiled"
    T["pair_capacity"] = 1 << 13
    T["init_itr_num"] = 4
    T["init_gaussian_update"] = 4
    T["init_gaussian_reset"] = 5000
    T["tracking_itr_num"] = 3
    T["pyr_iters"] = [2, 2, 2]
    T["mapping_itr_num"] = 2
    T["window_size"] = 3          # F=5 mapping programs (vs default 10)
    T["pose_window"] = 2
    T["initial_capacity"] = 4096
    T["kf_capacity"] = 8
    T["monocular"] = False
    return SLAM(cfg, interpret=True)


def get(url):
    try:
        with urllib.request.urlopen(url, timeout=120) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def post(url):
    req = urllib.request.Request(url, method="POST", data=b"")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


def test_web_viewer_endpoints():
    """Default-lane viewer coverage: page, status, one live render, and
    the pause/unpause control grammar. The depth/normal view modes and
    the free-orbit camera each compile their own render programs on this
    1-CPU image (~90 s cold) — they live in the slow-lane walk below."""
    from gs_slam_analytica_jacobian_tpu.gui.web import WebViewer

    slam = tiny_slam()
    for idx in range(3):
        slam.frontend.process_frame(idx)

    viewer = WebViewer(slam, port=0).start()   # port 0 = auto-assign
    base = f"http://127.0.0.1:{viewer.port}"
    try:
        code, body = get(base + "/")
        assert code == 200 and b"GS-SLAM TPU viewer" in body

        code, body = get(base + "/status")
        st = json.loads(body)
        assert code == 200 and st["frame"] == 2
        assert st["n_gaussians"] > 50 and not st["paused"]

        # follow-camera live render, PNG magic
        code, body = get(base + "/frame.png?mode=color&follow=1")
        assert code == 200 and body[:4] == b"\x89PNG", body[:300]

        # pause/unpause control grammar (Packet_vis2main role)
        code, _ = post(base + "/control?action=pause")
        assert code == 200 and viewer.paused
        code, _ = post(base + "/control?action=unpause")
        assert code == 200 and not viewer.paused

        code, _ = get(base + "/nope")
        assert code == 404
    finally:
        viewer.stop()


@pytest.mark.slow
def test_web_viewer_render_modes():
    """Slow-lane viewer walk: all three view modes (color/depth/normal)
    and the free-orbit camera (mouse-drag role), each a distinct render
    program (gui/web.py rasterise counterpart of slam_gui.py:540-571)."""
    from gs_slam_analytica_jacobian_tpu.gui.web import WebViewer

    slam = tiny_slam()
    for idx in range(3):
        slam.frontend.process_frame(idx)

    viewer = WebViewer(slam, port=0).start()
    base = f"http://127.0.0.1:{viewer.port}"
    try:
        for mode in ("color", "depth", "normal"):
            code, body = get(base + f"/frame.png?mode={mode}&follow=1")
            assert code == 200 and body[:4] == b"\x89PNG", (mode, body[:300])

        code, body = get(
            base + "/frame.png?mode=color&follow=0&yaw=0.7&pitch=-0.3"
                   "&dist=1.5")
        assert code == 200 and body[:4] == b"\x89PNG", body[:300]
    finally:
        viewer.stop()


def test_web_viewer_pause_holds_single_thread_loop():
    """The driver's single-thread pause point: with the viewer paused no
    frame advances; unpausing resumes to completion (the reference
    frontend's per-frame pause poll, slam_frontend.py:333-343)."""
    import threading
    import time

    slam = tiny_slam()
    slam.viewer_port = 0
    done = {}

    def run():
        done["results"] = slam.run(n_frames=3)

    # pre-pause via a viewer attached before run() — run() starts its own
    # viewer, so drive the pause through that one once it exists
    th = threading.Thread(target=run)
    th.start()
    t0 = time.time()
    while slam.web_viewer is None and time.time() - t0 < 60:
        time.sleep(0.01)
    assert slam.web_viewer is not None
    slam.web_viewer.paused = True
    n_before = max(slam.frontend.frames, default=-1)
    time.sleep(0.5)
    n_during = max(slam.frontend.frames, default=-1)
    # allow the one frame that may already have been in flight
    assert n_during <= n_before + 1
    slam.web_viewer.paused = False
    th.join(timeout=300)
    assert not th.is_alive()
    assert np.isfinite(done["results"]["ate"])
