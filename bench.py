#!/usr/bin/env python
"""Benchmark: RGB-D tracking FPS on a Replica-scale scene (one chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): >= 30 FPS RGB-D tracking on Replica room0
on a single v5e chip. Replica data is not downloadable in this environment,
so the bench builds a Replica-scale synthetic map (same 1200x680 intrinsics,
same Gaussian count regime) and measures the full tracking optimization —
render + masked tracking loss + backward + Adam + SE(3) retraction,
iterated to the reference's convergence rule — per frame.

Timing: the axon tunnel dedups identical dispatches, so each repetition
perturbs the start pose with a value derived from the previous result
(1e-30-scale, no effect on convergence) and the run is synced by pulling a
scalar to host.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def make_room_map(N, rng):
    """Synthetic CONVERGED-map stand-in: surface-aligned anisotropic
    splats on the interior of a furnished room, procedurally textured.

    A converged MonoGS Replica map is dominated by thin, high-opacity,
    surface-aligned gaussians on walls/floor/objects — transmittance
    saturates within a few dozen splats per ray, anisotropy is high, and
    textures carry multi-scale gradients. The legacy 'blobs' cloud has
    none of those properties and under-represents tile early-exit and
    anisotropic culling. Camera looks +z from the room center wall.
    """
    # (origin, u_vec, v_vec, normal) rectangles, sizes in meters
    surfaces = [
        # back wall z=7
        ((-4.0, -2.5, 7.0), (8.0, 0, 0), (0, 5.0, 0), (0, 0, -1)),
        # left / right walls
        ((-4.0, -2.5, 0.3), (0, 0, 6.7), (0, 5.0, 0), (1, 0, 0)),
        ((4.0, -2.5, 0.3), (0, 0, 6.7), (0, 5.0, 0), (-1, 0, 0)),
        # floor y=+2.5 (y points down in image space) / ceiling y=-2.5
        ((-4.0, 2.5, 0.3), (8.0, 0, 0), (0, 0, 6.7), (0, -1, 0)),
        ((-4.0, -2.5, 0.3), (8.0, 0, 0), (0, 0, 6.7), (0, 1, 0)),
        # furniture: two boxes (front+top faces) and a screen
        ((-2.5, 1.0, 4.0), (1.5, 0, 0), (0, 1.5, 0), (0, 0, -1)),
        ((-2.5, 1.0, 4.0), (1.5, 0, 0), (0, 0, 1.0), (0, -1, 0)),
        ((1.0, 0.5, 5.0), (2.0, 0, 0), (0, 2.0, 0), (0, 0, -1)),
        ((1.0, 0.5, 5.0), (0, 0, 1.2), (0, 2.0, 0), (-1, 0, 0)),
        ((-1.0, -1.0, 6.2), (2.2, 0, 0), (0, 1.4, 0), (0, 0, -1)),
    ]
    areas = np.array([np.linalg.norm(np.cross(u, v))
                      for _, u, v, _ in surfaces])
    counts = (areas / areas.sum() * N).astype(int)
    counts[0] += N - counts.sum()

    xyz, quat, normal_ax = [], [], []
    for (o, u, v, n), c in zip(surfaces, counts):
        a = rng.uniform(size=(c, 1))
        b = rng.uniform(size=(c, 1))
        p = np.asarray(o) + a * np.asarray(u) + b * np.asarray(v)
        # small normal jitter like a real reconstruction
        p = p + np.asarray(n) * rng.normal(0, 0.004, size=(c, 1))
        xyz.append(p)
        # quaternion rotating e_z onto the surface normal
        n = np.asarray(n, np.float64)
        ez = np.array([0.0, 0.0, 1.0])
        axis = np.cross(ez, n)
        s = np.linalg.norm(axis)
        if s < 1e-8:
            q = (np.array([1.0, 0, 0, 0]) if n[2] > 0
                 else np.array([0.0, 1.0, 0, 0]))
        else:
            ang = np.arctan2(s, np.dot(ez, n))
            axis = axis / s
            q = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
        # random in-plane spin composed via quaternion product q * qz(phi)
        phi = rng.uniform(0, np.pi, c)
        qz = np.stack([np.cos(phi / 2), np.zeros(c), np.zeros(c),
                       np.sin(phi / 2)], -1)
        w1, x1, y1, z1 = q
        w2, x2, y2, z2 = qz[:, 0], qz[:, 1], qz[:, 2], qz[:, 3]
        quat.append(np.stack([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2], -1))
        normal_ax.append(np.full(c, 2))
    xyz = np.concatenate(xyz).astype(np.float32)
    quat = np.concatenate(quat).astype(np.float32)

    # surface-disk scales: tangent ~2-5 cm, normal ~3-5 mm (log-normal)
    log_tan = rng.normal(np.log(0.03), 0.35, size=(N, 2))
    log_nrm = rng.normal(np.log(0.004), 0.25, size=(N, 1))
    scaling = np.concatenate([log_tan, log_nrm], -1).astype(np.float32)

    # multi-scale procedural texture: sum of random 3D sinusoids
    col = np.full((N, 3), 0.45, np.float32)
    for _ in range(8):
        omega = rng.normal(size=3)
        omega *= rng.uniform(2.0, 60.0) / np.linalg.norm(omega)
        phase = rng.uniform(0, 2 * np.pi, 3)
        amp = rng.uniform(0.04, 0.11, 3)
        col += amp * np.sin(xyz @ omega[:, None] + phase[None])
    col = np.clip(col, 0.02, 0.98)
    C0 = 0.28209479177387814
    features_dc = ((col - 0.5) / C0)[:, None, :].astype(np.float32)

    # converged-map opacities: sigmoid(N(2.2, 0.7)) ~ 0.9
    opacity = rng.normal(2.2, 0.7, size=(N, 1)).astype(np.float32)
    return dict(xyz=xyz, features_dc=features_dc,
                features_rest=np.zeros((N, 0, 3), np.float32),
                scaling=scaling, rotation=quat, opacity=opacity)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsslam_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gs_slam_analytica_jacobian_tpu.models.camera import Camera
    from gs_slam_analytica_jacobian_tpu.models import gaussian_map as gmap
    from gs_slam_analytica_jacobian_tpu.slam import tracking
    from gs_slam_analytica_jacobian_tpu.slam.render_api import render
    from gs_slam_analytica_jacobian_tpu.ops.lie import se3_exp

    W, H = 1200, 680
    fx = fy = 600.0
    cx, cy = 599.5, 339.5
    N = int(os.environ.get("BENCH_GAUSSIANS", 200_000))
    PAIR_CAP = int(os.environ.get("BENCH_PAIR_CAP", 1 << 20))
    cam = Camera.create(np.eye(3), np.zeros(3), fx, fy, cx, cy, W, H)

    rng = np.random.default_rng(0)
    scene = os.environ.get("BENCH_SCENE", "room")
    if scene == "blobs":
        # legacy round-1/2 scene: an unstructured gaussian cloud. Kept for
        # comparability; a converged SLAM map does not look like this
        # (surfaces saturate transmittance; a cloud never does).
        means = np.stack([
            rng.uniform(-4, 4, N), rng.uniform(-2.5, 2.5, N),
            rng.uniform(0.4, 8.0, N)], -1).astype(np.float32)
        gm = gmap.from_numpy(
            xyz=means,
            features_dc=rng.normal(size=(N, 1, 3)).astype(np.float32) * 0.3,
            features_rest=np.zeros((N, 0, 3), np.float32),
            scaling=rng.normal(size=(N, 3)).astype(np.float32) * 0.3 - 4.0,
            rotation=rng.normal(size=(N, 4)).astype(np.float32),
            opacity=rng.normal(size=(N, 1)).astype(np.float32) + 1.0,
            max_sh_degree=0)
    else:
        gm = gmap.from_numpy(**make_room_map(N, rng), max_sh_degree=0)

    bg = jnp.zeros(3)

    # A short camera TRAJECTORY through the room: per-frame motion
    # ~6 mm + 4 mrad (Replica-like inter-frame magnitude at full frame
    # rate). Each frame is tracked warm-started from the previous
    # ESTIMATE — exactly the frontend's per-frame workload (reference
    # slam_frontend.py:128-196), including cross-frame curvature reuse
    # for the pyr tracker. BENCH_STEP_SCALE stresses larger motions.
    F = int(os.environ.get("BENCH_FRAMES", 5))
    step_scale = float(os.environ.get("BENCH_STEP_SCALE", 1.0))
    tau_step = step_scale * np.array(
        [0.0035, -0.0028, 0.0042, 0.002, 0.003, -0.0015], np.float32)
    poses = [np.eye(4, dtype=np.float32)]
    for k in range(1, F):
        step = tau_step * (1.0 + 0.1 * np.sin(k))
        poses.append(np.asarray(se3_exp(jnp.asarray(step))) @ poses[-1])

    from gs_slam_analytica_jacobian_tpu.ops import losses as loss_ops
    gts = []
    overflow = 0
    for T in poses:
        c = cam.replace(R=jnp.asarray(T[:3, :3]), t=jnp.asarray(T[:3, 3]))
        out_gt = render(gm, c, None, bg, pair_capacity=PAIR_CAP)
        img = jnp.clip(out_gt.color, 0, 1)
        # the reference ALWAYS tracks under the Scharr edge mask
        # (slam_frontend.py:173-175 via camera_utils.py:115-144) — it
        # exists precisely to drop flat-region texture noise from the
        # photometric term
        mask = loss_ops.compute_grad_mask(
            img.mean(axis=0, keepdims=True), edge_threshold=1.1,
            dataset_type="replica")
        gts.append((img, out_gt.depth, mask))
        overflow = max(overflow, int(out_gt.overflow))

    tracker = os.environ.get("BENCH_TRACKER", "pyr")
    track_fn = {"gn": tracking.track_frame_gn,
                "pyr": tracking.track_frame_pyr,
                "adam": tracking.track_frame}[tracker]
    max_iters = 100 if tracker == "adam" else 20

    # r4 default operating point: fine tracking at s=2 with a 2-iteration
    # full-res tail and the final keyframing render at s=2
    # (final_level 2), with the coarse-level EWA low-pass matched to the
    # pooled-gt blur (match_blur; PERF.md r4 — the mismatch biased the
    # s2 fixed point 6 mm AND halved its convergence rate). Measured
    # 10.4 FPS at 0.73 mm mean pose error vs r3's 8.3 at 0.08 mm —
    # spending the accuracy surplus against the <= 1 mm gate
    # (VERDICT r3 #1). The production frontend keeps its (5,3,12)
    # full-res-final defaults (pose floor 0.08 mm); every knob here is
    # config-reachable (Training.pyr_iters [5,12,2],
    # pyr_final_level 2, pyr_match_blur). IRLS fwd-only phases
    # everywhere; the exact analytic polish runs only on keyframe
    # creation in the frontend (tracking.polish_frame).
    kw = {}
    if tracker == "pyr":
        kw["curv"] = "flow"
        kw["level_exact"] = (0, 0, 0)
        kw["level_iters"] = (5, 12, 2)
        kw["final_level"] = 2
        kw["match_blur"] = True
        kw["plan_pad"] = 4.0
        kw["pair_capacity_ceiling"] = PAIR_CAP
        if "BENCH_LEVELS" in os.environ:
            kw["levels"] = tuple(
                int(x) for x in os.environ["BENCH_LEVELS"].split(","))
        if "BENCH_ITERS" in os.environ:
            kw["level_iters"] = tuple(
                int(x) for x in os.environ["BENCH_ITERS"].split(","))
        if "BENCH_EXACT" in os.environ:
            kw["level_exact"] = tuple(
                int(x) for x in os.environ["BENCH_EXACT"].split(","))
        if "BENCH_PROBES" in os.environ:
            kw["probe_levels"] = os.environ["BENCH_PROBES"]
        if "BENCH_CURV" in os.environ:
            kw["curv"] = os.environ["BENCH_CURV"]
        if os.environ.get("BENCH_BF16") == "1":
            kw["kernel_bf16"] = True
        if os.environ.get("BENCH_MATCH_BLUR") == "1":
            # per-level EWA low-pass matched to the pooled-gt blur
            kw["match_blur"] = True
        if os.environ.get("BENCH_MXU") == "1":
            # MXU falloff + log-space transmittance in the fwd kernel
            kw["kernel_mxu"] = True
        if os.environ.get("BENCH_TILE16") == "1":
            kw["tile16"] = True
        if "BENCH_PAD" in os.environ:
            kw["plan_pad"] = float(os.environ["BENCH_PAD"])
        if "BENCH_SIGMA0" in os.environ:
            kw["sigma0"] = float(os.environ["BENCH_SIGMA0"])
        if "BENCH_SIGMA_DECAY" in os.environ:
            kw["sigma_decay"] = float(os.environ["BENCH_SIGMA_DECAY"])
        if "BENCH_SUBSET" in os.environ:
            # per-level IRLS tile-subset fractions, e.g. "1,1,0.5"
            kw["level_subset"] = tuple(
                float(x) for x in os.environ["BENCH_SUBSET"].split(","))
        if "BENCH_FINAL_LEVEL" in os.environ:
            # decimation of the final keyframing render (fine-at-s2
            # schedules run the whole per-frame loop below full res)
            kw["final_level"] = int(os.environ["BENCH_FINAL_LEVEL"])
        # keep level_exact aligned with a custom level count (zip in
        # track_frame_pyr stops at the shortest sequence)
        n_lv = len(kw.get("levels", (4, 2, 1)))
        if len(kw["level_exact"]) != n_lv:
            kw["level_exact"] = (0,) * (n_lv - 1) + (1,)
    reuse_H = (tracker == "pyr"
               and os.environ.get("BENCH_REUSE_H", "1") == "1")
    # cross-frame pair-plan reuse: rebuild plans every K frames, frames
    # in between hand the previous frame's plans back via plan_in (the
    # frontend's plan_reuse_frames knob; plans built with the drift pad
    # stay valid supersets while accumulated flow < pad px)
    # default 2: rebuild every other frame — measured +11% FPS at
    # near-baseline pose error (0.104 vs 0.081 mm mean); deeper reuse
    # (4) is +16% but 4x error from frozen within-tile depth order
    # (PERF.md r3 lever table)
    plan_reuse = (int(os.environ.get("BENCH_PLAN_REUSE", "2"))
                  if tracker == "pyr" else 0)
    # visibility-culled tracking (frontend Training.track_vis_cull):
    # frames plan only the gaussians with n_touched > 0 at the previous
    # full render; every Mth frame re-tracks unmasked and refreshes the
    # mask. 0 disables.
    vis_cull = (int(os.environ.get("BENCH_VISCULL", "0"))
                if tracker == "pyr" else 0)
    # contribution threshold for the vis mask: n_touched >= Q pixels (at
    # the nt_weight blend-weight rule). Q=1 is the r3 "visible at all"
    # mask, which dropped 54% of gaussians but near-zero PAIRS (the
    # planner's alpha/extent cull already starves invisible gaussians);
    # Q>1 additionally drops LOW-CONTRIBUTION gaussians — sub-threshold
    # back-layers and sub-pixel splats — which is what actually cuts the
    # ~N_visible pair floor (PERF.md r4).
    vis_q = int(os.environ.get("BENCH_VISQ", "1"))

    cap_eff = [PAIR_CAP]   # adaptive fine bucket (see frontend.track)
    lvl_caps = [None]      # per-level adaptive buckets (tuple) or None

    def track_one(k, R_start, t_start, H_in, plan_in=None, track_mask=None,
                  nt_weight=False):
        kw_k = dict(kw)
        if tracker == "pyr":
            kw_k["H_in"] = H_in
            kw_k["level_caps"] = lvl_caps[0]
            kw_k["plan_in"] = plan_in
            kw_k["track_mask"] = track_mask
            kw_k["nt_weight"] = nt_weight
        return track_fn(
            gm, cam, R_start, t_start,
            gts[k][0], gts[k][1], gts[k][2], bg,
            lr_rot=0.003, lr_trans=0.001, rgb_boundary_threshold=0.01,
            alpha=float(os.environ.get("BENCH_ALPHA", 0.95)),
            max_iters=max_iters, pair_capacity=cap_eff[0], **kw_k)

    def sync(x):
        return float(jnp.sum(x.ravel()[:1]))

    # warm start: "const_acc" (default, r5) extrapolates the inter-frame
    # delta's CHANGE as well — T_w = (D1 D0^-1) D1 T1 with
    # D_i = T_{i+1} T_i^-1 — halving the warm-start error on smooth
    # trajectories (the iteration count is the other factor of the
    # roofline product, VERDICT r4 #7); "const_vel" composes the last
    # delta only (the r2-r4 default); BENCH_WARMSTART=prev restores the
    # reference's previous-pose-only start (slam_frontend.py:129-130)
    warm_mode = os.environ.get("BENCH_WARMSTART", "const_acc")
    const_vel = warm_mode in ("const_vel", "const_acc")
    const_acc = warm_mode == "const_acc"

    def cv_start(R1, t1, R0, t0):
        """Compose the last inter-frame delta onto the previous estimate:
        T_w = (T1 T0^-1) T1 — pure device math, no host pulls."""
        Rd = R1 @ R0.T
        return Rd @ R1, Rd @ (t1 - t0) + t1

    def ca_start(R1, t1, R0, t0, Rm, tm):
        """Constant-acceleration prediction T_w = (D1 D0^-1) D1 T1 —
        pure device math, no host pulls."""
        Rd1 = R1 @ R0.T
        td1 = t1 - Rd1 @ t0
        Rd0 = R0 @ Rm.T
        td0 = t0 - Rd0 @ tm
        Ra = Rd1 @ Rd0.T
        ta = td1 - Ra @ td0
        Rp = Ra @ Rd1
        tp = Ra @ td1 + ta
        return Rp @ R1, Rp @ t1 + tp

    def run_sequence(eps, collect=False):
        """Track frames 1..F-1 warm-started from the previous estimate.
        ``eps`` injects a data dependence so the tunnel cannot dedup
        repetitions; host pulls (errors/iters) only when ``collect`` —
        the timed passes must stay free of device->host round trips."""
        R_est = jnp.asarray(poses[0][:3, :3])
        t_est = jnp.asarray(poses[0][:3, 3]) + eps
        R_pp = t_pp = None
        R_ppp = t_ppp = None
        H_carry = None
        plan_carry, plan_age = None, 0
        vis_mask, vis_age = None, 0
        errs, iters_tot, npairs = [], 0, None
        easy_flags = []
        for k in range(1, F):
            if const_acc and R_ppp is not None:
                R_ws, t_ws = ca_start(R_est, t_est, R_pp, t_pp,
                                      R_ppp, t_ppp)
            elif const_vel and R_pp is not None:
                R_ws, t_ws = cv_start(R_est, t_est, R_pp, t_pp)
            else:
                R_ws, t_ws = R_est, t_est
            R_ppp, t_ppp = R_pp, t_pp
            R_pp, t_pp = R_est, t_est
            vis_refresh = vis_cull and (vis_mask is None
                                        or vis_age >= vis_cull)
            use_plan = (plan_carry
                        if (plan_reuse and plan_age < plan_reuse
                            and not vis_refresh)
                        else None)
            res = track_one(k, R_ws, t_ws,
                            H_carry if (reuse_H and k > 1) else None,
                            plan_in=use_plan,
                            track_mask=(None if (not vis_cull or vis_refresh)
                                        else vis_mask),
                            nt_weight=bool(vis_cull))
            R_est, t_est = res[0], res[1]
            if tracker == "pyr" and reuse_H:
                H_carry = res[7]
            if vis_cull:
                if vis_refresh:
                    vis_mask, vis_age = res[5].n_touched >= vis_q, 0
                    if collect:
                        vis_frac[0] = float(jnp.sum(vis_mask)) / N
                else:
                    vis_age += 1
            if plan_reuse:
                if use_plan is None:
                    plan_carry, plan_age = res[11], 1
                else:
                    plan_age += 1
            if collect:
                iters_tot += int(res[4])
                errs.append(float(jnp.linalg.norm(
                    t_est - jnp.asarray(poses[k][:3, 3]))))
                if tracker == "pyr" and len(res) > 10:
                    lp = np.asarray(res[10], np.int64)
                    npairs = lp if npairs is None else np.maximum(npairs, lp)
                # warm-start correction and raw motion in image-flow
                # pixels (the frontend's adaptive-schedule hardness
                # signals; motion gates at 4x the correction threshold)
                def _flow(Ra, ta, Rb, tb):
                    dt_ = float(jnp.linalg.norm(ta - tb))
                    ang = float(jnp.arccos(jnp.clip(
                        (jnp.trace(Ra @ Rb.T) - 1) / 2, -1, 1)))
                    return fx * dt_ / med_depth + fx * ang
                easy_flags.append(
                    _flow(R_est, t_est, R_ws, t_ws) < 2.0
                    and _flow(R_est, t_est, R_pp, t_pp) < 8.0)
        return errs, iters_tot, t_est, npairs, easy_flags

    med_depth = float(jnp.median(gts[1][1][gts[1][1] > 0]))
    vis_frac = [None]   # visible fraction under BENCH_VISCULL (telemetry)

    # warmup / compile (both H_in variants) + accuracy collection
    errs, iters_tot, t_last, npairs, easy_flags = run_sequence(
        jnp.zeros(3), collect=True)

    adapted = False

    # adaptive per-level pair-capacity buckets (the frontend's
    # steady-state rule: observed pairs x1.5 headroom, 128k quanta,
    # config cap as ceiling, independently per pyramid level)
    if (tracker == "pyr" and npairs is not None
            and os.environ.get("BENCH_ADAPT", "1") == "1"):
        caps = tuple(
            tracking.pair_capacity_bucket(int(p), PAIR_CAP) if p > 0
            else PAIR_CAP for p in npairs)
        if caps != lvl_caps[0]:
            lvl_caps[0] = caps
            cap_eff[0] = caps[-1]
            adapted = True

    # adaptive level schedule (the frontend's steady-state rule: drop
    # s>=4 coarse iterations after a 3-frame easy streak — warm-start
    # correction < 2 px of flow AND motion < 8 px; a rail-stop
    # re-tracks with the full pyramid)
    if (tracker == "pyr" and len(easy_flags) >= 3
            and all(easy_flags[-3:])
            and "BENCH_ITERS" not in os.environ
            and os.environ.get("BENCH_ADAPT_LEVELS", "1") == "1"):
        lv = kw.get("levels", (4, 2, 1))
        it = kw.get("level_iters", (5, 12, 2))
        kw["level_iters"] = tuple(
            0 if s >= 4 else i for s, i in zip(lv, it))
        if "BENCH_PAD" not in os.environ:
            kw["plan_pad"] = min(kw["plan_pad"], 2.0)
        adapted = True

    if tracker == "pyr" and adapted:
        # re-warm (and re-collect accuracy + pair counts — the adapted
        # pad/schedule changes both) at the adapted configuration
        errs, iters_tot, t_last, npairs, _ = run_sequence(jnp.zeros(3),
                                                          collect=True)

    # final warm passes over the EXACT timed path (collect=False — the
    # collect passes above pull per-frame scalars, so they never exercise
    # the timed loop's burst-dispatch pattern): the first burst execution
    # of a freshly-compiled executable through the tunnel pays a one-time
    # ~10 s load/queue-drain that otherwise lands inside timed rep 1
    # (measured: rep walls [10.77, 0.52, 0.52] without this pass), and a
    # residual ~0.7 s lands in rep 1 unless at least TWO mirrored warm
    # reps run (measured r3: [1.26, 0.53, ...] with one warm pass).
    for wr in range(int(os.environ.get("BENCH_WARM_REPS", 2))):
        _, _, t_warm, _, _ = run_sequence(jnp.full((3,), -(wr + 1) * 3e-6))
        sync(t_warm)

    n_rep = int(os.environ.get("BENCH_REPS", 3))
    # per-rep eps must differ ABOVE the f32 ulp of the pose scale: a
    # 1e-30 chain rounds away inside the program, leaving reps 2..n
    # bit-identical to rep 1 — the tunnel then serves them from its
    # dispatch cache and the reported time divides by n_rep. 3e-6 m
    # start-pose jitter is 0.003 mm (negligible vs the 0.08 mm accuracy
    # floor) but guarantees every dispatch is genuinely distinct.
    rep_walls = []
    t_last = jnp.zeros(3)
    for r in range(n_rep):
        t0_rep = time.time()
        eps = t_last * 1e-30 + (r + 1) * 3e-6
        _, _, t_last, _, _ = run_sequence(eps)
        sync(t_last)
        rep_walls.append(time.time() - t0_rep)
    # median rep wall: the tunnel intermittently charges rep 1 a one-time
    # ~0.7 s queue-drain that no number of warm passes absorbs (r3:
    # [1.26, 0.51, 0.53] with two mirrored warm reps); the median is the
    # steady-state rate and the full rep_walls_s stay in the detail for
    # audit.
    dt = float(np.median(rep_walls)) / (F - 1)
    fps = 1.0 / dt

    # --- achieved-compute estimate (auditable roofline figure) ---------
    # Device time is dominated by the 32x32 compositing kernel; one
    # (pair, pixel) cell costs ~65 VPU ops forward (tile_kernel2:
    # deltas 2 + quadratic form 7 + exp ~8 + clamp/mask logic ~12 +
    # Hillis-Steele transmittance scan 3*log2(64)=18 + weights 4 +
    # rgb+d accumulate 8 + termination reductions ~6). Achieved
    # cells/s x ops/cell over the v5e VPU peak (8x128 lanes x 4 ALUs x
    # ~0.94 GHz ~= 3.85e12 f32 op/s; the MXU is idle in this
    # elementwise mix, so VPU peak is the relevant ceiling) gives the
    # utilization fraction. IRLS iterations are forward-only renders;
    # the keyframing render adds one fwd pass at the fine level. The
    # while_loop stops at convergence, so per-level executed iteration
    # counts are estimated by scaling the schedule to the measured
    # total (iters_per_frame / sum(level_iters)).
    util_est = None
    cells_per_frame = None
    if tracker == "pyr" and npairs is not None:
        it_l = kw.get("level_iters", (5, 12, 2))
        sched = sum(it_l)
        frac = (iters_tot / (F - 1)) / sched if sched else 0.0
        cells_per_frame = 1024.0 * (
            frac * sum(float(p) * it for p, it in zip(npairs, it_l))
            + float(npairs[-1]))       # final keyframing render
        OPS_PER_CELL = 65.0
        VPU_PEAK = 3.85e12
        util_est = cells_per_frame / dt * OPS_PER_CELL / VPU_PEAK

    print(json.dumps({
        "metric": "tracking_fps_replica_scale",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "detail": {
            "n_gaussians": N, "resolution": f"{W}x{H}",
            "frames": F - 1,
            "iters_per_frame": round(iters_tot / (F - 1), 2),
            "ms_per_frame": round(dt * 1000, 2),
            "pair_capacity": cap_eff[0],
            "pair_capacity_ceiling": PAIR_CAP,
            "gt_render_overflow": overflow,
            "tracker": tracker,
            "level_iters": list(kw.get("level_iters", ())),
            "level_caps": list(lvl_caps[0] or ()),
            "reuse_H": reuse_H,
            "plan_reuse": plan_reuse,
            "vis_cull": vis_cull,
            "vis_q": vis_q,
            "vis_frac": (None if vis_frac[0] is None
                         else round(vis_frac[0], 4)),
            "plan_pad": kw.get("plan_pad"),
            "kernel_bf16": bool(kw.get("kernel_bf16", False)),
            "kernel_mxu": bool(kw.get("kernel_mxu", False)),
            "final_level": kw.get("final_level", 1),
            "rep_walls_s": [round(w, 3) for w in rep_walls],
            "warm_start": warm_mode,
            "pose_err_mean_m": round(float(np.mean(errs)), 6),
            "pose_err_max_m": round(float(np.max(errs)), 6),
            "pair_cells_per_frame": (None if cells_per_frame is None
                                     else int(cells_per_frame)),
            "util_est": (None if util_est is None
                         else round(util_est, 4)),
            "util_model": ("pair_cells*65op / 3.85e12 VPU-op/s (v5e)"
                           if util_est is not None else None),
        },
    }))


if __name__ == "__main__":
    main()
