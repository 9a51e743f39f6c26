"""Mock-tree tests for the on-disk dataset parsers.

The real TUM/EuRoC/Replica datasets cannot be downloaded here (zero
egress), so these tests synthesize tiny directory trees with known
geometry and drive the exact production code paths: timestamp
association and frame-rate downsampling (TUMParser._associate/_load,
reference utils/dataset.py:58-101), quaternion order and pose inversion,
the EuRoC cam0 extrinsic chain (reference dataset.py:125-190), cv2
undistortion (dataset.py:236-243), and SGBM stereo depth
(dataset.py:376-383).
"""

import os

import numpy as np
import pytest
from PIL import Image

from gs_slam_analytica_jacobian_tpu.utils import datasets
from gs_slam_analytica_jacobian_tpu.utils.datasets import (
    EuRoCParser, ReplicaParser, TUMParser, load_dataset)


def _quat_wxyz_from_R(R):
    """Rotation matrix -> (w, x, y, z) unit quaternion (w >= 0)."""
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _write_png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


# ---------------------------------------------------------------------------
# TUM
# ---------------------------------------------------------------------------

@pytest.fixture
def tum_tree(tmp_path):
    """A 4-frame TUM tree: rgb/depth/groundtruth with slightly skewed
    timestamps (within the 0.08 s association window), one rgb frame whose
    depth is too far away (must be dropped), and two frames closer than
    1/32 s (one must be downsampled away)."""
    root = tmp_path / "tum"
    root.mkdir()
    H, W = 24, 32
    rng = np.random.default_rng(0)

    # four candidate frames at 1 Hz + one extra only 10 ms after frame 2
    t_rgb = [10.0, 11.0, 12.0, 12.01, 13.0]
    # depths 20 ms later; frame at t=13.0 gets NO depth within 0.08 s
    t_depth = [10.02, 11.02, 12.02, 12.03, 13.5]
    t_pose = [9.99, 10.99, 11.99, 12.04, 12.99]

    with open(root / "rgb.txt", "w") as f:
        f.write("# color images\n# file: x\n# timestamp filename\n")
        for i, t in enumerate(t_rgb):
            f.write(f"{t:.4f} rgb/{i}.png\n")
            img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            # encode the frame id in the corner pixel so association can
            # be verified from loaded pixel data
            img[0, 0] = (i * 10, 0, 0)
            _write_png(str(root / "rgb" / f"{i}.png"), img)
    with open(root / "depth.txt", "w") as f:
        f.write("# depth maps\n")
        for i, t in enumerate(t_depth):
            f.write(f"{t:.4f} depth/{i}.png\n")
            depth = np.full((H, W), 5000 * (i + 1), np.uint16)
            _write_png(str(root / "depth" / f"{i}.png"), depth)
    # groundtruth: "timestamp tx ty tz qx qy qz qw", one header line
    poses_c2w = []
    with open(root / "groundtruth.txt", "w") as f:
        f.write("# ground truth trajectory\n")
        for i, t in enumerate(t_pose):
            R = _rot_z(0.3 * i)
            tr = np.array([0.1 * i, -0.2 * i, 0.05])
            w, x, y, z = _quat_wxyz_from_R(R)
            f.write(f"{t:.4f} {tr[0]} {tr[1]} {tr[2]} {x} {y} {z} {w}\n")
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = tr
            poses_c2w.append(T)
    return root, poses_c2w


def test_tum_parser_association_and_downsample(tum_tree):
    root, poses_c2w = tum_tree
    p = TUMParser(str(root))
    # t=13.0 dropped (no depth within 0.08 s); t=12.01 dropped by the
    # 32 Hz downsample (only 10 ms after t=12.0)
    assert p.n_img == 3
    assert [os.path.basename(c) for c in p.color_paths] == \
        ["0.png", "1.png", "2.png"]
    assert [os.path.basename(d) for d in p.depth_paths] == \
        ["0.png", "1.png", "2.png"]


def test_tum_parser_quaternion_order_and_inversion(tum_tree):
    root, poses_c2w = tum_tree
    p = TUMParser(str(root))
    for i in range(3):
        # parser stores w2c = inv(c2w from the quaternion)
        np.testing.assert_allclose(
            p.poses[i], np.linalg.inv(poses_c2w[i]), atol=1e-9)


def test_tum_dataset_getitem(tum_tree):
    root, _ = tum_tree
    config = {"Dataset": {
        "type": "tum", "dataset_path": str(root),
        "Calibration": dict(fx=30.0, fy=30.0, cx=15.5, cy=11.5,
                            width=32, height=24, depth_scale=5000.0,
                            distorted=False),
    }}
    ds = load_dataset(config)
    assert len(ds) == 3
    img, depth, pose = ds[1]
    assert img.shape == (3, 24, 32) and img.dtype == np.float32
    assert depth.shape == (24, 32) and depth.dtype == np.float32
    # depth png held 5000*(i+1) with depth_scale 5000 -> i+1 metres
    np.testing.assert_allclose(depth, 2.0)
    # frame-id pixel survives the load: frame 1 -> r=10/255
    np.testing.assert_allclose(img[0, 0, 0], 10 / 255.0, atol=1e-6)
    np.testing.assert_allclose(pose, ds.poses[1])


def test_tum_association_rejects_far_pose(tmp_path):
    """A frame whose nearest POSE is outside 0.08 s is dropped too."""
    root = tmp_path / "tum2"
    root.mkdir()
    img = np.zeros((8, 8, 3), np.uint8)
    for i in range(2):
        _write_png(str(root / "rgb" / f"{i}.png"), img)
        _write_png(str(root / "depth" / f"{i}.png"),
                   np.full((8, 8), 100, np.uint16))
    (root / "rgb.txt").write_text("10.0 rgb/0.png\n12.0 rgb/1.png\n")
    (root / "depth.txt").write_text("10.0 depth/0.png\n12.0 depth/1.png\n")
    (root / "groundtruth.txt").write_text(
        "# hdr\n10.0 0 0 0 0 0 0 1\n12.5 0 0 0 0 0 0 1\n")
    p = TUMParser(str(root))
    assert p.n_img == 1
    assert os.path.basename(p.color_paths[0]) == "0.png"


# ---------------------------------------------------------------------------
# Replica
# ---------------------------------------------------------------------------

def test_replica_parser(tmp_path):
    root = tmp_path / "replica"
    (root / "results").mkdir(parents=True)
    rng = np.random.default_rng(1)
    c2w_list = []
    lines = []
    for i in range(3):
        img = rng.integers(0, 255, (16, 20, 3), dtype=np.uint8)
        Image.fromarray(img).save(root / "results" / f"frame{i:06d}.jpg")
        _write_png(str(root / "results" / f"depth{i:06d}.png"),
                   np.full((16, 20), 1000 * (i + 1), np.uint16))
        T = np.eye(4)
        T[:3, :3] = _rot_z(0.1 * i)
        T[:3, 3] = [i * 0.1, 0, 0]
        c2w_list.append(T)
        lines.append(" ".join(str(v) for v in T.reshape(-1)))
    (root / "traj.txt").write_text("\n".join(lines) + "\n")
    p = ReplicaParser(str(root))
    assert p.n_img == 3
    for i in range(3):
        # traj.txt rows are c2w; the parser must inverse to w2c
        np.testing.assert_allclose(p.poses[i],
                                   np.linalg.inv(c2w_list[i]), atol=1e-12)


# ---------------------------------------------------------------------------
# Undistortion (MonocularDataset distorted path)
# ---------------------------------------------------------------------------

def test_undistortion_path(tmp_path):
    """distorted=True builds rectify maps and remaps each frame: with
    all-zero coefficients the remap must be the identity; with a real k1
    the border pixels move."""
    H, W = 48, 64
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    _write_png(str(tmp_path / "f.png"), img)

    def make(dist):
        calib = dict(fx=60.0, fy=60.0, cx=(W - 1) / 2, cy=(H - 1) / 2,
                     width=W, height=H, distorted=True,
                     k1=dist, k2=0.0, p1=0.0, p2=0.0, k3=0.0)
        ds = datasets.MonocularDataset(
            {"Dataset": {"Calibration": calib}})
        ds.color_paths = [str(tmp_path / "f.png")]
        ds.poses = [np.eye(4)]
        ds.num_imgs = 1
        return ds

    out0, depth0, _ = make(0.0)[0]
    assert depth0 is None          # no depth_scale -> monocular
    np.testing.assert_allclose(out0, img.transpose(2, 0, 1) / 255.0,
                               atol=1e-6)
    out1, _, _ = make(-0.3)[0]
    assert not np.allclose(out1, out0)   # distortion actually applied


# ---------------------------------------------------------------------------
# EuRoC
# ---------------------------------------------------------------------------

@pytest.fixture
def euroc_tree(tmp_path):
    """Two-frame EuRoC tree with a known body pose per frame and a
    known-disparity stereo pair: the right image is the left shifted by
    DISP pixels (x_r = x_l - DISP), so SGBM must recover DISP and the
    depth formula must give 47.906/DISP."""
    root = tmp_path / "euroc"
    W, H = 320, 96
    DISP = 8
    rng = np.random.default_rng(3)
    # lightly smoothed noise: aperiodic (no disparity aliasing) and
    # textured enough that SGBM's 20-px blocks correlate uniquely
    import cv2
    base = cv2.GaussianBlur(
        rng.integers(0, 255, (H, W + DISP)).astype(np.uint8), (0, 0), 1.5)
    # stereo geometry: a point at disparity d appears at x in the left
    # image and x - d in the right image
    left = base[:, :-DISP]
    right = base[:, DISP:]       # right[x - DISP] = left[x] -> disp=DISP
    ts = [1403636579763555584, 1403636579813555456]
    body_poses = []
    rows = ["#timestamp,p_x,p_y,p_z,q_w,q_x,q_y,q_z,rest"]
    for i, t in enumerate(ts):
        for cam, imgarr in (("cam0", left), ("cam1", right)):
            _write_png(str(root / "mav0" / cam / "data" / f"{t}.png"),
                       imgarr)
        R = _rot_z(0.2 * i)
        tr = np.array([0.5 * i, 0.1, -0.2])
        w, x, y, z = _quat_wxyz_from_R(R)
        # pose timestamps 1 us off the image stamp (nearest-match path)
        rows.append(f"{t + 1000},{tr[0]},{tr[1]},{tr[2]},{w},{x},{y},{z},0")
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = tr
        body_poses.append(T)
    os.makedirs(root / "mav0" / "state_groundtruth_estimate0")
    (root / "mav0" / "state_groundtruth_estimate0" / "data.csv"
     ).write_text("\n".join(rows) + "\n")
    return root, body_poses, (W, H, DISP)


def test_euroc_parser_pose_chain(euroc_tree):
    root, body_poses, _ = euroc_tree
    p = EuRoCParser(str(root))
    assert p.n_img == 2
    for i in range(2):
        # w2c = inv(T_w_body @ T_i_c0) — the cam0 extrinsic chain
        want = np.linalg.inv(body_poses[i] @ EuRoCParser.T_i_c0)
        np.testing.assert_allclose(p.poses[i], want, atol=1e-9)


def _euroc_config(root, W, H):
    ident = dict(fx=60.0, fy=60.0, cx=(W - 1) / 2, cy=(H - 1) / 2,
                 k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0)
    return {"Dataset": {
        "type": "euroc", "dataset_path": str(root),
        "Calibration": dict(
            width=W, height=H,
            cam0=dict(raw=dict(ident), opt=dict(ident),
                      R=dict(data=np.eye(3).reshape(-1).tolist())),
            cam1=dict(raw=dict(ident), opt=dict(ident),
                      R=dict(data=np.eye(3).reshape(-1).tolist())),
        ),
    }}


def test_euroc_stereo_sgbm_depth(euroc_tree):
    root, _, (W, H, DISP) = euroc_tree
    ds = load_dataset(_euroc_config(root, W, H))
    img, depth, pose = ds[0]
    assert img.shape == (3, H, W) and img.dtype == np.float32
    assert depth.shape == (H, W) and depth.dtype == np.float32
    # gray -> RGB replication
    np.testing.assert_allclose(img[0], img[1])
    # SGBM on the shifted pair recovers the planted disparity where it
    # is confident; the depth formula is baseline*fx / disp (ORB-SLAM2
    # EuRoC constant, reference dataset.py:376-383)
    valid = depth > 0
    assert valid.mean() > 0.2, "SGBM found too few matches"
    med = np.median(depth[valid])
    np.testing.assert_allclose(med, 47.90639384423901 / DISP, rtol=0.15)


# ---------------------------------------------------------------------------
# Compact-upload raw path (u8/u16 h2d + on-device dequantization)
# ---------------------------------------------------------------------------

def test_tum_raw_frame_dequantizes_exactly(tum_tree):
    """File-backed datasets ship their native u8/u16 data; the on-device
    dequantization must reproduce __getitem__ to f32 rounding (the source
    files ARE integers; the only difference is u8 * f32(1/255) vs
    numpy's f64 division — 1 ulp)."""
    import jax.numpy as jnp

    from gs_slam_analytica_jacobian_tpu.slam.frontend import (
        _dequant_depth, _dequant_rgb)

    root, _ = tum_tree
    config = {"Dataset": {
        "type": "tum", "dataset_path": str(root),
        "Calibration": dict(fx=30.0, fy=30.0, cx=15.5, cy=11.5,
                            width=32, height=24, depth_scale=5000.0,
                            distorted=False),
    }}
    ds = load_dataset(config)
    img, depth, pose = ds[0]
    rgb_u8, depth_u16, scale, pose_r = ds.raw_frame(0)
    assert rgb_u8.dtype == np.uint8 and rgb_u8.shape == (24, 32, 3)
    assert depth_u16.dtype == np.uint16
    np.testing.assert_array_equal(pose, pose_r)
    d_img = np.asarray(_dequant_rgb(jnp.asarray(rgb_u8)))
    d_depth = np.asarray(_dequant_depth(jnp.asarray(depth_u16),
                                        jnp.float32(1.0 / scale)))
    np.testing.assert_allclose(d_img, img, rtol=2e-7)
    np.testing.assert_allclose(d_depth, depth, rtol=1e-6)


def test_synthetic_raw_frame_within_quanta():
    cfg = {"Dataset": dict(
        type="synthetic", n_frames=2, seed=0,
        Calibration=dict(fx=40.0, fy=40.0, cx=31.5, cy=23.5,
                         width=64, height=48, depth_scale=1.0,
                         distorted=False))}
    ds = load_dataset(cfg)
    img, depth, pose = ds[1]
    rgb_u8, depth_u16, scale, pose_r = ds.raw_frame(1)
    np.testing.assert_array_equal(pose, pose_r)
    np.testing.assert_allclose(rgb_u8 / 255.0, img.transpose(1, 2, 0),
                               atol=0.5 / 255)
    np.testing.assert_allclose(depth_u16 / scale, depth, atol=0.5 / scale)
