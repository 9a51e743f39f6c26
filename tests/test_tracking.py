"""Tracking unit tests (CPU): pyramid helpers + flow-curvature GN
convergence on a small synthetic scene.

The tracker's fixed point is defined by the exact analytic dL/dtau from the
renderer backward; the flow-synthesized curvature (tracking._flow_jacobian)
only preconditions the iteration, so the strongest correctness check is
end-behavior: from a perturbed pose, the tracker must recover the ground
truth pose to well under the reference's convergence tolerance
(reference hot loop: utils/slam_frontend.py:128-196).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gs_slam_analytica_jacobian_tpu.models.camera import Camera
from gs_slam_analytica_jacobian_tpu.models import gaussian_map as gmap
from gs_slam_analytica_jacobian_tpu.slam import tracking
from gs_slam_analytica_jacobian_tpu.slam.render_api import render
from gs_slam_analytica_jacobian_tpu.ops.lie import se3_exp


def test_pyramid_pooling_helpers():
    x = jnp.arange(2 * 8 * 12, dtype=jnp.float32).reshape(2, 8, 12)
    a = tracking._pool_avg(x, 2)
    m = tracking._pool_max(x, 2)
    s = tracking._stride_center(x, 2)
    assert a.shape == (2, 4, 6) and m.shape == (2, 4, 6)
    assert s.shape == (2, 4, 6)
    np.testing.assert_allclose(
        np.asarray(a[0, 0, 0]), np.mean([0, 1, 12, 13]))
    np.testing.assert_allclose(np.asarray(m[0, 0, 0]), 13.0)
    # even s: 2x2 center-block average, aligned with the level camera's
    # pixel center at input offset (s-1)/2 = 0.5
    np.testing.assert_allclose(
        np.asarray(s[0, 0, 0]), np.mean([0, 1, 12, 13]))
    # odd s: exact center sample
    s3 = tracking._stride_center(x[:, :6, :12], 3)
    np.testing.assert_allclose(np.asarray(s3[0, 0, 0]), 13.0)  # (1,1)


def test_cam_level_scaling():
    cam = Camera.create(np.eye(3), np.zeros(3), 80.0, 80.0, 63.5, 47.5,
                        128, 96)
    c2 = tracking._cam_level(cam, 2)
    assert (c2.width, c2.height) == (64, 48)
    assert c2.fx == 40.0 and c2.cx == 31.5
    # tanfov is preserved by intrinsic scaling
    np.testing.assert_allclose(c2.tanfovx, cam.tanfovx)


@pytest.fixture(scope="module")
def small_scene():
    W, H = 96, 64
    cam = Camera.create(np.eye(3), np.zeros(3), 60.0, 60.0,
                        (W - 1) / 2, (H - 1) / 2, W, H)
    rng = np.random.default_rng(3)
    n = 600
    gm = gmap.from_numpy(
        xyz=np.stack([rng.uniform(-1.2, 1.2, n), rng.uniform(-0.8, 0.8, n),
                      rng.uniform(0.5, 4.0, n)], -1).astype(np.float32),
        features_dc=rng.normal(size=(n, 1, 3)).astype(np.float32) * 0.3,
        features_rest=np.zeros((n, 0, 3), np.float32),
        scaling=rng.normal(size=(n, 3)).astype(np.float32) * 0.3 - 2.3,
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
        opacity=rng.normal(size=(n, 1)).astype(np.float32) + 1.0,
        max_sh_degree=0)
    bg = jnp.zeros(3)
    out = render(gm, cam, None, bg, pair_capacity=1 << 13, interpret=True)
    gt_image = jnp.clip(out.color, 0, 1)
    gt_depth = out.depth
    return cam, gm, bg, gt_image, gt_depth


def test_flow_gn_recovers_pose(small_scene):
    cam, gm, bg, gt_image, gt_depth = small_scene
    tau = np.zeros(6, np.float32)
    tau[:3] = [0.015, -0.012, 0.015]
    tau[3:] = [0.005, 0.007, -0.004]
    T0 = np.asarray(se3_exp(jnp.asarray(tau)))
    mask = jnp.ones_like(gt_depth)
    res = tracking.track_frame_pyr(
        gm, cam, jnp.asarray(T0[:3, :3]), jnp.asarray(T0[:3, 3]),
        gt_image, gt_depth, mask, bg,
        lr_rot=0.003, lr_trans=0.001, rgb_boundary_threshold=0.01,
        pair_capacity=1 << 13, levels=(1,), level_iters=(12,), curv="flow",
        interpret=True)
    R, t = np.asarray(res[0]), np.asarray(res[1])
    # ground truth pose is identity; the perturbation is ~2.4 cm
    assert np.linalg.norm(t) < 8e-4, np.linalg.norm(t)
    assert np.linalg.norm(R - np.eye(3)) < 2e-3
    # keyframing render outputs are finite and populated
    assert np.isfinite(float(res[6]))              # median depth
    assert int(jnp.sum(res[5].n_touched)) > 0


@pytest.mark.slow
def test_irls_fwd_only_phase_recovers_pose(small_scene):
    """level_exact < level_iters: most iterations use the fwd-only IRLS
    gradient J^T W r from the FD probe Jacobian; the trailing exact
    iterations polish with the analytic dL/dtau. Must converge like the
    all-exact tracker, and the curvature cache must carry the probe J."""
    cam, gm, bg, gt_image, gt_depth = small_scene
    tau = np.zeros(6, np.float32)
    tau[:3] = [0.015, -0.012, 0.015]
    tau[3:] = [0.005, 0.007, -0.004]
    T0 = np.asarray(se3_exp(jnp.asarray(tau)))
    mask = jnp.ones_like(gt_depth)
    res = tracking.track_frame_pyr(
        gm, cam, jnp.asarray(T0[:3, :3]), jnp.asarray(T0[:3, 3]),
        gt_image, gt_depth, mask, bg,
        lr_rot=0.003, lr_trans=0.001, rgb_boundary_threshold=0.01,
        pair_capacity=1 << 13, levels=(1,), level_iters=(14,),
        level_exact=(3,), curv="fd", interpret=True)
    R, t = np.asarray(res[0]), np.asarray(res[1])
    assert np.linalg.norm(t) < 1e-3, np.linalg.norm(t)
    assert np.linalg.norm(R - np.eye(3)) < 2e-3
    # the cache entry carries (H, Jc, Jd) with the probe J present
    H_entry = res[7][0]
    assert H_entry[0].shape == (8, 8)
    assert H_entry[1] is not None and H_entry[1].shape[0] == 8
    # cross-frame reuse consumes the cached J without re-probing
    res2 = tracking.track_frame_pyr(
        gm, cam, jnp.asarray(T0[:3, :3]), jnp.asarray(T0[:3, 3]),
        gt_image, gt_depth, mask, bg,
        lr_rot=0.003, lr_trans=0.001, rgb_boundary_threshold=0.01,
        pair_capacity=1 << 13, levels=(1,), level_iters=(14,),
        level_exact=(3,), curv="fd", interpret=True, H_in=res[7])
    t2 = np.asarray(res2[1])
    assert np.linalg.norm(t2) < 1e-3, np.linalg.norm(t2)


def test_irls_flow_phase_recovers_pose(small_scene):
    """curv='flow' + level_exact < level_iters: the fwd-only IRLS phase
    assembles BOTH H and g from the flow Jacobian relinearized at every
    iteration — the configuration that wins the r2 on-chip bench."""
    cam, gm, bg, gt_image, gt_depth = small_scene
    tau = np.zeros(6, np.float32)
    tau[:3] = [0.015, -0.012, 0.015]
    tau[3:] = [0.005, 0.007, -0.004]
    T0 = np.asarray(se3_exp(jnp.asarray(tau)))
    mask = jnp.ones_like(gt_depth)
    res = tracking.track_frame_pyr(
        gm, cam, jnp.asarray(T0[:3, :3]), jnp.asarray(T0[:3, 3]),
        gt_image, gt_depth, mask, bg,
        lr_rot=0.003, lr_trans=0.001, rgb_boundary_threshold=0.01,
        pair_capacity=1 << 13, levels=(1,), level_iters=(14,),
        level_exact=(2,), curv="flow", interpret=True)
    R, t = np.asarray(res[0]), np.asarray(res[1])
    assert np.linalg.norm(t) < 1e-3, np.linalg.norm(t)
    assert np.linalg.norm(R - np.eye(3)) < 2e-3


def test_plan_reuse_across_frames_recovers_pose(small_scene):
    """Cross-frame pair-plan reuse (plan_in): a plan built at frame k's
    pose stays a valid superset while the pose drift is under the plan
    pad, so handing it back for frame k+1 must converge to the same
    fixed point while skipping plan_pairs entirely (the frontend's
    plan_reuse_frames knob; PERF.md r3 lever)."""
    cam, gm, bg, gt_image, gt_depth = small_scene
    tau = np.zeros(6, np.float32)
    tau[:3] = [0.015, -0.012, 0.015]
    tau[3:] = [0.005, 0.007, -0.004]
    T0 = np.asarray(se3_exp(jnp.asarray(tau)))
    mask = jnp.ones_like(gt_depth)
    common = dict(
        lr_rot=0.003, lr_trans=0.001, rgb_boundary_threshold=0.01,
        pair_capacity=1 << 13, levels=(1,), level_iters=(12,),
        curv="flow", interpret=True, plan_pad=8.0)
    res = tracking.track_frame_pyr(
        gm, cam, jnp.asarray(T0[:3, :3]), jnp.asarray(T0[:3, 3]),
        gt_image, gt_depth, mask, bg, **common)
    plans = res[11]
    assert plans[0] is not None and int(plans[0].num_pairs) > 0
    # second frame: different start pose, reuse the first frame's plan
    tau2 = tau * np.float32(-0.8)
    T1 = np.asarray(se3_exp(jnp.asarray(tau2)))
    res2 = tracking.track_frame_pyr(
        gm, cam, jnp.asarray(T1[:3, :3]), jnp.asarray(T1[:3, 3]),
        gt_image, gt_depth, mask, bg, plan_in=plans, **common)
    t2 = np.asarray(res2[1])
    assert np.linalg.norm(t2) < 1e-3, np.linalg.norm(t2)
    assert np.linalg.norm(np.asarray(res2[0]) - np.eye(3)) < 2e-3
    # the reused plan is returned unchanged (no rebuild happened)
    np.testing.assert_array_equal(np.asarray(res2[11][0].pair_gid1),
                                  np.asarray(plans[0].pair_gid1))


def test_flow_jacobian_shapes_and_conf_gating(small_scene):
    cam, gm, bg, gt_image, gt_depth = small_scene
    out = render(gm, cam, None, bg, pair_capacity=1 << 13, interpret=True)
    Jc, Jd = tracking._flow_jacobian(cam, out.color, out.depth, out.opacity)
    assert Jc.shape == (8, 3, cam.height, cam.width)
    assert Jd.shape == (8, 1, cam.height, cam.width)
    assert np.all(np.isfinite(np.asarray(Jc)))
    assert np.all(np.isfinite(np.asarray(Jd)))
    # pose columns must vanish where no confident surface exists
    conf = np.asarray(out.opacity[0]) > 0.5
    jpose = np.abs(np.asarray(Jc[:6])).sum(axis=(0, 1))
    assert np.all(jpose[~conf] == 0.0)


def test_grad_mask_shape_all_dataset_types():
    """Regression: the generic/median branch returned (1,1,H,W) — only the
    full-res pyramid path pooled the mask and hit it (r2 on-chip run)."""
    from gs_slam_analytica_jacobian_tpu.ops import losses
    g = jnp.ones((1, 64, 96))
    for t in ("replica", "generic", "synthetic", "tum"):
        m = losses.compute_grad_mask(g, 1.1, t)
        assert m.shape == (1, 64, 96), (t, m.shape)

@pytest.mark.slow
def test_vis_cull_mask_recovers_pose(small_scene):
    """Visibility-culled tracking (track_mask): planning only the
    gaussians that contributed at a nearby pose must cut the pair count
    and still converge to the same fixed point — splats with zero blend
    weight everywhere carry no pose information (the frontend's
    Training.track_vis_cull knob). The mask comes from a refresh render
    with nt_weight=True: the reference's T > 0.5 n_touched rule keeps
    only 78 of these 600 translucent splats and the masked render then
    differs by 0.07 mean |dcolor| — tracking on that mask measured a
    5x-diverged pose, which is why refresh frames count at the
    blend-weight threshold instead."""
    cam, gm, bg, gt_image, gt_depth = small_scene
    tau = np.zeros(6, np.float32)
    tau[:3] = [0.015, -0.012, 0.015]
    tau[3:] = [0.005, 0.007, -0.004]
    T0 = np.asarray(se3_exp(jnp.asarray(tau)))
    mask = jnp.ones_like(gt_depth)
    common = dict(
        lr_rot=0.003, lr_trans=0.001, rgb_boundary_threshold=0.01,
        pair_capacity=1 << 13, levels=(1,), level_iters=(12,),
        curv="flow", interpret=True)
    # full-set frame supplies the visibility mask (the refresh frame)
    res = tracking.track_frame_pyr(
        gm, cam, jnp.asarray(T0[:3, :3]), jnp.asarray(T0[:3, 3]),
        gt_image, gt_depth, mask, bg, nt_weight=True, **common)
    vis = res[5].n_touched > 0
    n_vis = int(jnp.sum(vis))
    assert 0 < n_vis < gm.capacity     # some gaussians must be culled
    full_pairs = int(res[11][0].num_pairs)
    # masked frame: same problem, planned over the visible subset only
    tau2 = tau * np.float32(-0.8)
    T1 = np.asarray(se3_exp(jnp.asarray(tau2)))
    res2 = tracking.track_frame_pyr(
        gm, cam, jnp.asarray(T1[:3, :3]), jnp.asarray(T1[:3, 3]),
        gt_image, gt_depth, mask, bg, track_mask=vis, **common)
    t2 = np.asarray(res2[1])
    assert np.linalg.norm(t2) < 1e-3, np.linalg.norm(t2)
    assert np.linalg.norm(np.asarray(res2[0]) - np.eye(3)) < 2e-3
    masked_pairs = int(res2[11][0].num_pairs)
    assert masked_pairs < full_pairs
    # the masked final render reports n_touched only inside the mask
    touched2 = np.asarray(res2[5].n_touched > 0)
    assert not np.any(touched2 & ~np.asarray(vis))
