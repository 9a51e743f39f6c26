#!/usr/bin/env python
"""Generate the configs/ tree (same parameter values as the reference's
configs/**, reference configs/rgbd/replica/base_config.yaml etc., organized
with the same inherit_from layering)."""

import os

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    "configs")

COMMON_TRAINING = """\
Training:
  # map initialization (reference Training section values)
  init_itr_num: 1050
  init_gaussian_update: 100
  init_gaussian_reset: 500
  init_gaussian_th: 0.005
  init_gaussian_extent: 30
  # tracking & mapping budgets
  tracking_itr_num: 100
  mapping_itr_num: 150
  gaussian_update_every: 150
  gaussian_update_offset: 50
  gaussian_th: 0.7
  gaussian_extent: 1.0
  gaussian_reset: 2001
  size_threshold: 20
"""

OPT_PARAMS = """\
opt_params:
  iterations: 30000
  position_lr_init: {pos_lr_init}
  position_lr_final: 0.0000016
  position_lr_delay_mult: 0.01
  position_lr_max_steps: 30000
  feature_lr: 0.0025
  opacity_lr: 0.05
  scaling_lr: 0.001
  rotation_lr: 0.001
  percent_dense: 0.01
  lambda_dssim: 0.2
  densification_interval: 100
  opacity_reset_interval: 3000
  densify_from_iter: 500
  densify_until_iter: 15000
  densify_grad_threshold: 0.0002

model_params:
  sh_degree: 0
  source_path: ""
  model_path: ""
  resolution: -1
  white_background: False
  data_device: "tpu"

pipeline_params:
  convert_SHs_python: False
  compute_cov3D_python: False
"""


def write(path, text):
    full = os.path.join(ROOT, path)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "w") as f:
        f.write(text)


def results(save_trj_kf_intv, save_results=True, save_trj=True):
    return f"""\
Results:
  save_results: {save_results}
  save_dir: "results"
  save_trj: {save_trj}
  save_trj_kf_intv: {save_trj_kf_intv}
  use_gui: False
  eval_rendering: False
  use_wandb: False

"""


REPLICA_BASE = results(20) + """\
Dataset:
  sensor_type: 'depth'
  pcd_downsample: 64
  pcd_downsample_init: 32
  adaptive_pointsize: True
  point_size: 0.05
  type: 'replica'
  Calibration:
    fx: 600.0
    fy: 600.0
    cx: 599.5
    cy: 339.5
    k1: 0.0
    k2: 0.0
    p1: 0.0
    p2: 0.0
    k3: 0.0
    width: 1200
    height: 680
    depth_scale: 6553.5
    distorted: False

""" + COMMON_TRAINING + """\
  kf_interval: 4
  window_size: 10
  pose_window: 5
  edge_threshold: 4
  rgb_boundary_threshold: 0.01

  kf_translation: 0.04
  kf_min_translation: 0.02
  kf_overlap: 0.95
  prune_mode: 'slam'
  single_thread: True
  spherical_harmonics: False
  lr:
    cam_rot_delta: 0.003
    cam_trans_delta: 0.001

""" + OPT_PARAMS.format(pos_lr_init=0.00016)

TUM_COMMON = """\
  kf_interval: 5
  window_size: 8
  pose_window: 3
  edge_threshold: 1.1
  rgb_boundary_threshold: 0.01
  alpha: 0.9
  kf_translation: 0.08
  kf_min_translation: 0.05
  kf_overlap: 0.9
  kf_cutoff: 0.3
  prune_mode: 'slam'
  single_thread: False
  spherical_harmonics: False
  lr:
    cam_rot_delta: 0.003
    cam_trans_delta: 0.001

"""

TUM_MONO_BASE = results(10) + """\
Dataset:
  type: 'tum'
  sensor_type: 'monocular'
  pcd_downsample: 64
  pcd_downsample_init: 32
  adaptive_pointsize: True
  point_size: 0.01

""" + COMMON_TRAINING + TUM_COMMON + OPT_PARAMS.format(pos_lr_init=0.0016)

TUM_RGBD_BASE = results(5) + """\
Dataset:
  type: 'tum'
  sensor_type: 'depth'
  pcd_downsample: 128
  pcd_downsample_init: 32
  adaptive_pointsize: True
  point_size: 0.01

""" + COMMON_TRAINING + TUM_COMMON + OPT_PARAMS.format(pos_lr_init=0.00016)

EUROC_BASE = results(5, save_results=False, save_trj=False) + """\
Dataset:
  type: 'euroc'
  sensor_type: 'stereo'
  pcd_downsample: 128
  pcd_downsample_init: 32
  adaptive_pointsize: False
  point_size: 0.1

""" + COMMON_TRAINING + TUM_COMMON + OPT_PARAMS.format(pos_lr_init=0.00016)

SYNTH_BASE = results(5) + """\
Dataset:
  type: 'synthetic'
  sensor_type: 'depth'
  pcd_downsample: 32
  pcd_downsample_init: 16
  adaptive_pointsize: True
  point_size: 0.05
  n_frames: 16
  seed: 0
  Calibration:
    fx: 100.0
    fy: 100.0
    cx: 79.5
    cy: 59.5
    k1: 0.0
    k2: 0.0
    p1: 0.0
    p2: 0.0
    k3: 0.0
    width: 160
    height: 120
    depth_scale: 1.0
    distorted: False

""" + COMMON_TRAINING + """\
  kf_interval: 2
  window_size: 6
  pose_window: 3
  edge_threshold: 1.1
  rgb_boundary_threshold: 0.01
  kf_translation: 0.04
  kf_min_translation: 0.02
  kf_overlap: 0.95
  prune_mode: 'slam'
  single_thread: True
  spherical_harmonics: False
  initial_capacity: 8192
  pair_capacity: 65536
  lr:
    cam_rot_delta: 0.003
    cam_trans_delta: 0.001

""" + OPT_PARAMS.format(pos_lr_init=0.00016)


TUM_CALIBS = {
    "fr1_desk": dict(path="rgbd_dataset_freiburg1_desk", fx=517.306408,
                     fy=516.469215, cx=318.643040, cy=255.313989,
                     k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628,
                     k3=1.163314, distorted=True),
    "fr2_xyz": dict(path="rgbd_dataset_freiburg2_xyz", fx=520.90862,
                    fy=521.007327, cx=325.141442, cy=249.701764,
                    k1=0.2312, k2=-0.7849, p1=-0.0033, p2=-0.0001,
                    k3=0.9172, distorted=True),
    "fr3_office": dict(path="rgbd_dataset_freiburg3_long_office_household",
                       fx=535.4, fy=539.2, cx=320.1, cy=247.6, k1=0.0,
                       k2=0.0, p1=0.0, p2=0.0, k3=0.0, distorted=False),
}


def tum_scene(base_rel, c):
    return f"""\
inherit_from: "{base_rel}"

Dataset:
  dataset_path: "datasets/tum/{c['path']}/"
  Calibration:
    fx: {c['fx']}
    fy: {c['fy']}
    cx: {c['cx']}
    cy: {c['cy']}
    k1: {c['k1']}
    k2: {c['k2']}
    p1: {c['p1']}
    p2: {c['p2']}
    k3: {c['k3']}
    width: 640
    height: 480
    depth_scale: 5000.0
    distorted: {c['distorted']}
"""


EUROC_SCENE = """\
inherit_from: "configs/stereo/euroc/base_config.yaml"

Dataset:
  dataset_path: "datasets/euroc/{scene}/"
  start_idx: {start_idx}
  Calibration:
    cam0:
      raw:
        fx: 458.654
        fy: 457.296
        cx: 367.215
        cy: 248.375
        k1: -0.28340811
        k2: 0.07395907
        p1: 0.00019359
        p2: 1.76187114e-05
        k3: 0.0
      opt:
        fx: 435.2046959714599
        fy: 435.2046959714599
        cx: 367.4517211914062
        cy: 252.2008514404297
        k1: 0.0
        k2: 0.0
        p1: 0.0
        p2: 0.0
        k3: 0.0
      R:
        rows: 3
        cols: 3
        data: [0.999966347530033, -0.001422739138722922, 0.008079580483432283,
          0.001365741834644127, 0.9999741760894847, 0.007055629199258132,
          -0.008089410156878961, -0.007044357138835809, 0.9999424675829176]
    cam1:
      raw:
        fx: 457.587
        fy: 456.134
        cx: 379.999
        cy: 255.238
        k1: -0.28368365
        k2: 0.07451284
        p1: -0.00010473
        p2: 0.00025262
        k3: 0.0
      opt:
        fx: 435.2046959714599
        fy: 435.2046959714599
        cx: 367.4517211914062
        cy: 252.2008514404297
        k1: 0.0
        k2: 0.0
        p1: 0.0
        p2: 0.0
        k3: 0.0
      R:
        rows: 3
        cols: 3
        data: [0.9999633527347896, -0.003625811871560086, 0.007755443660172947,
          0.003680398547259526, 0.9999684752771629, -0.007035845251224894,
          -0.007729688520722713, 0.007064130529506649, 0.999945173484644]
    distorted: True
    width: 752
    height: 480
"""


def main():
    write("rgbd/replica/base_config.yaml", REPLICA_BASE)
    for scene in ["room0", "room1", "room2", "office0", "office1",
                  "office2", "office3", "office4"]:
        write(f"rgbd/replica/{scene}.yaml", f"""\
inherit_from: "configs/rgbd/replica/base_config.yaml"
Dataset:
  dataset_path: "datasets/replica/{scene}/"
  single_thread: False
""")
        write(f"rgbd/replica/{scene}_sp.yaml", f"""\
inherit_from: "configs/rgbd/replica/base_config.yaml"
Dataset:
  dataset_path: "datasets/replica/{scene}/"
  single_thread: True
""")
    write("mono/tum/base_config.yaml", TUM_MONO_BASE)
    write("rgbd/tum/base_config.yaml", TUM_RGBD_BASE)
    for name, c in TUM_CALIBS.items():
        write(f"mono/tum/{name}.yaml",
              tum_scene("configs/mono/tum/base_config.yaml", c))
        write(f"rgbd/tum/{name}.yaml",
              tum_scene("configs/rgbd/tum/base_config.yaml", c))
    write("stereo/euroc/base_config.yaml", EUROC_BASE)
    for scene, start in [("mh01", 600), ("mh02", 800)]:
        write(f"stereo/euroc/{scene}.yaml",
              EUROC_SCENE.format(scene=scene, start_idx=start))
    write("synthetic/test.yaml", SYNTH_BASE)
    print("configs written to", ROOT)


if __name__ == "__main__":
    main()
