"""Mapping backend driver (host orchestration around the jitted steps).

Rebuild of reference utils/slam_backend.py:16-482 (BackEnd): the message
grammar, the densify/prune/opacity-reset schedule, initial BA, covisibility
pruning and color refinement. Runs either inline (single_thread) or as a
host thread fed by a queue (parallel.pipeline).
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional

_NAN_CHECK = os.environ.get("GS_SLAM_NAN_CHECK") == "1"

# shape families prewarm_mapping has walked in this process (compiles and
# tunnel first-dispatch are per-process one-time costs)
_PREWARMED: set = set()

import jax
import jax.numpy as jnp
import numpy as np

from ..models.camera import Camera
from ..models import gaussian_map as gmap
from ..models.gaussian_map import AdamState, GaussianMap
from ..utils.logging import Log
from . import mapping, seeding
from .mapping import KFStore, PoseAdamState


class BackEnd:
    def __init__(self, config: dict, cam_template: Camera,
                 interpret: bool = False):
        self.config = config
        self.cam = cam_template
        self.interpret = interpret
        self.device = jax.devices()[0]

        T = config["Training"]
        self.monocular = T["monocular"]
        self.init_itr_num = T["init_itr_num"]
        self.init_gaussian_update = T["init_gaussian_update"]
        self.init_gaussian_reset = T["init_gaussian_reset"]
        self.init_gaussian_th = T["init_gaussian_th"]
        self.cameras_extent = 6.0
        self.init_gaussian_extent = (
            self.cameras_extent * T["init_gaussian_extent"])
        self.mapping_itr_num = T["mapping_itr_num"]
        self.gaussian_update_every = T["gaussian_update_every"]
        self.gaussian_update_offset = T["gaussian_update_offset"]
        self.gaussian_th = T["gaussian_th"]
        self.gaussian_extent = self.cameras_extent * T["gaussian_extent"]
        self.gaussian_reset = T["gaussian_reset"]
        self.size_threshold = T["size_threshold"]
        self.window_size = T["window_size"]
        self.pose_window = T["pose_window"]
        self.lr_rot = T["lr"]["cam_rot_delta"]
        self.lr_trans = T["lr"]["cam_trans_delta"]
        self.rgb_boundary_threshold = T["rgb_boundary_threshold"]
        self.alpha = T.get("alpha", 0.95)
        self.single_thread = config["Dataset"].get("single_thread", False)
        self.prune_mode = T.get("prune_mode", "slam")
        # async idle-refinement batch size (parallel.pipeline.backend_loop)
        self.idle_batch = int(T.get("idle_batch", 4))
        # async device scheduling: defer idle refinement while the
        # frontend has a frame in flight (parallel.pipeline); set false
        # to restore free-running idle mapping
        self.frontend_priority = bool(T.get("frontend_priority", True))
        # compile + first-dispatch the keyframe/idle mapping variants
        # right after map init, before the frame loop (prewarm_mapping)
        self.prewarm = bool(T.get("prewarm_mapping", False))
        self.prewarm_wall_s = 0.0     # run-summary itemization
        self.kf_capacity = T.get("kf_capacity", 128)
        self.use_oracle = T.get("renderer", "tiled") == "oracle"
        self.tile16 = bool(T.get("tile16", False))
        self.live_mode = False

        op = config["opt_params"]
        self.opt_params = op
        self.densify_grad_threshold = op["densify_grad_threshold"]
        self.percent_dense = op["percent_dense"]
        self.lambda_dssim = op["lambda_dssim"]
        self.spatial_lr_scale = 5.0   # nerf_normalization radius (dataset.py:249)
        self.pair_capacity = T.get("pair_capacity", 1 << 20)

        # keyframe-data-parallel mapping over a device mesh (multi-chip);
        # mesh_devices=1 keeps the single-chip path
        n_mesh = T.get("mesh_devices", 1)
        if n_mesh > 1:
            from ..parallel.sharding import make_mesh
            self.mesh = make_mesh(n_mesh)
            Log(f"mapping sharded over {n_mesh} devices", tag="Backend")
        else:
            self.mesh = None
        base_F = self.window_size + 2
        self.F = (base_F if self.mesh is None else
                  ((base_F + n_mesh - 1) // n_mesh) * n_mesh)

        sh_degree = config["model_params"]["sh_degree"]
        init_cap = T.get("initial_capacity", 1 << 16)
        self.gm = GaussianMap.empty(init_cap, sh_degree)
        self.gm_adam = gmap.adam_init(self.gm)

        self.store = KFStore.empty(
            self.kf_capacity, cam_template.height, cam_template.width)
        self.uid_to_slot: Dict[int, int] = {}
        self.current_window: List[int] = []   # frame uids, newest first
        self.occ_aware_visibility: Dict[int, np.ndarray] = {}
        self.iteration_count = 0
        self.last_sent = 0
        self.initialized = not self.monocular
        self.pose_adam = PoseAdamState.zero(self.F)
        self._key = jax.random.PRNGKey(config.get("seed", 0))
        self._py_rng = random.Random(config.get("seed", 0))
        self.bg = jnp.zeros((3,), jnp.float32)

        # window pair-plan cache across mapping_steps batches: plans stay
        # valid while the window slots and the gaussian SET persist
        # (pose/xyz drift rides the 6 px radius pad; extend/densify/grow
        # change the set -> _invalidate_plans). ``plan_reuse_iters`` caps
        # staleness from accumulated xyz Adam drift (~0.25 px/step worst
        # case at SLAM lrs; 16 steps stays inside the pad).
        self._plan_cache = None        # (key, plans, iters_used)
        self._plan_reuse = int(T.get("plan_reuse_iters", 16))
        # coarse-mapping phase (r5): first map_coarse_frac of each steady
        # keyframe/idle budget renders at map_coarse_level with the
        # blur-matched low-pass, full-res tail pins the result (see
        # map()). Default off until the on-chip keyframe-wall and cold
        # e2e gates are measured; the artifact runner enables it.
        self.map_coarse_level = int(T.get("map_coarse_level", 2))
        self.map_coarse_frac = float(T.get("map_coarse_frac", 0.0))
        # sample the 2 random mapping keyframes once per BATCH (constant
        # across its iterations) so their pair plans amortize with the
        # window's; false restores the reference's per-iteration sampling
        # (slam_backend.py:168-227) at ~2 extra plan builds per iteration
        self.map_random_per_batch = bool(T.get("map_random_per_batch",
                                               True))
        # staleness telemetry (run-summary): reuse rides the drift
        # estimate above staying inside the 6 px pad — if a run's
        # mapping quality degrades, max_stale_iters says whether stale
        # plans are a plausible culprit without any extra device pulls
        self.plan_stats = dict(builds=0, reused_batches=0,
                               reused_iters=0, max_stale_iters=0)

    # ------------------------------------------------------------------
    def reset_state(self):
        """reference BackEnd.reset (slam_backend.py:72-84): drop all
        gaussians and keyframe state."""
        self.iteration_count = 0
        self._invalidate_plans()
        self.occ_aware_visibility = {}
        self.current_window = []
        self.initialized = not self.monocular
        self.pose_adam = PoseAdamState.zero(self.F)
        self.gm, self.gm_adam = gmap.prune(
            self.gm, self.gm_adam, jnp.ones((self.gm.capacity,), bool))
        self.store = KFStore.empty(
            self.kf_capacity, self.cam.height, self.cam.width)
        self.uid_to_slot = {}

    def _split_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _gm_lrs(self, xyz_lr=None):
        return gmap.default_lrs(self.opt_params, self.spatial_lr_scale,
                                xyz_lr=xyz_lr)

    def _xyz_lr(self, iteration):
        op = self.opt_params
        t = np.clip(iteration / op["position_lr_max_steps"], 0.0, 1.0)
        lr_init = op["position_lr_init"] * self.spatial_lr_scale
        lr_final = op["position_lr_final"] * self.spatial_lr_scale
        return float(np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t))

    def _ensure_capacity(self, incoming: int):
        free = self.gm.capacity - int(self.gm.num_active())
        while free < incoming:
            new_cap = self.gm.capacity * 2
            Log(f"Growing map capacity to {new_cap}", tag="Backend")
            self.gm, self.gm_adam = gmap.grow(self.gm, self.gm_adam, new_cap)
            free = self.gm.capacity - int(self.gm.num_active())
            self._invalidate_plans()

    def _invalidate_plans(self):
        """Drop cached window pair-plans: the gaussian SET changed
        (extend / densify / prune / opacity reset / capacity growth), so
        a stale plan could miss pairs for new or re-inflated gaussians."""
        self._plan_cache = None

    def add_next_kf(self, frame_idx: int, R, t, exposure_a, exposure_b,
                    gt_image, gt_depth, depth_map, init=False):
        """Store the keyframe + seed new gaussians from its depth map
        (reference add_next_kf -> extend_from_pcd_seq,
        slam_backend.py:67-70)."""
        slot = self.uid_to_slot.get(frame_idx)
        if slot is None:
            slot = len(self.uid_to_slot)
            if slot >= self.kf_capacity:
                self.kf_capacity *= 2
                Log(f"Growing KF store to {self.kf_capacity}",
                    tag="Backend")
                self.store = self.store.grow(self.kf_capacity)
            self.uid_to_slot[frame_idx] = slot
        gt_depth_arr = (jnp.zeros((1, self.cam.height, self.cam.width))
                        if gt_depth is None else jnp.asarray(gt_depth))
        if gt_depth_arr.ndim == 2:
            gt_depth_arr = gt_depth_arr[None]
        self.store = self.store.add(
            slot, jnp.asarray(R), jnp.asarray(t), jnp.asarray(exposure_a),
            jnp.asarray(exposure_b), jnp.asarray(gt_image), gt_depth_arr,
            frame_idx)

        import time as _time
        _t0 = _time.time()
        ds_cfg = self.config["Dataset"]
        factor = (ds_cfg["pcd_downsample_init"] if init
                  else ds_cfg["pcd_downsample"])
        block = seeding.seed_from_frame(
            jnp.asarray(gt_image), jnp.asarray(depth_map), self.cam,
            self._w2c(slot),
            frame_idx, self._split_key(), factor,
            ds_cfg["point_size"], ds_cfg.get("adaptive_pointsize", False),
            self.gm.max_sh_degree)
        n_new = int(jnp.sum(block.valid))
        self._ensure_capacity(n_new)
        self.gm, self.gm_adam, ov = gmap.extend(self.gm, self.gm_adam, block)
        self._invalidate_plans()
        if int(ov) > 0:
            Log(f"extend overflow {int(ov)}", tag="Backend")
        _dt = _time.time() - _t0
        if _dt > 1.0:
            Log(f"seeded kf {frame_idx}: {n_new} pts in {_dt:.1f}s",
                tag="Backend")

    def _w2c(self, slot):
        w = jnp.eye(4)
        w = w.at[:3, :3].set(self.store.R[slot])
        w = w.at[:3, 3].set(self.store.t[slot])
        return w

    # ------------------------------------------------------------------
    def _window_tensors(self, window_uids: List[int],
                        random_uids: List[int], frames_to_optimize: int):
        F = self.F
        idx = np.zeros(F, np.int32)
        valid = np.zeros(F, bool)
        opt_pose = np.zeros(F, bool)
        opt_exp = np.zeros(F, bool)
        for i, uid in enumerate(window_uids[:self.window_size]):
            idx[i] = self.uid_to_slot[uid]
            valid[i] = True
            if uid != 0:
                opt_exp[i] = True
                if i < frames_to_optimize:
                    opt_pose[i] = True
        for j, uid in enumerate(random_uids[:2]):
            idx[self.window_size + j] = self.uid_to_slot[uid]
            valid[self.window_size + j] = True
        # validity is known host-side: a statically fully-valid window
        # takes mapping_steps' branch-free fast path
        return (jnp.asarray(idx), jnp.asarray(valid), jnp.asarray(opt_pose),
                jnp.asarray(opt_exp), bool(valid.all()))

    def _pick_randoms(self):
        pool = [u for u in self.uid_to_slot
                if u not in set(self.current_window)]
        self._py_rng.shuffle(pool)
        return pool[:2]

    def _run_batch(self, window_uids, randoms_per_iter, frames_to_optimize,
                   initialization, need_nt=True, level=1):
        """Run a batch of map iterations as device programs. Batches are
        decomposed into power-of-2 chunks so mapping_steps only ever
        compiles for log-many scan lengths instead of one program per
        distinct iteration count. ``need_nt``: whether this batch's final
        state must carry window n_touched (only the batch whose output
        feeds visibility/prune consumers pays the F extra renders).
        ``level``: render decimation for every iteration of the batch
        (mapping_steps level — the r5 coarse-mapping phase)."""
        out = None
        rest = randoms_per_iter
        while rest:
            T = 1 << (len(rest).bit_length() - 1)   # largest pow2 <= len
            out = self._run_batch_exact(
                window_uids, rest[:T], frames_to_optimize, initialization,
                need_nt=need_nt and len(rest) == T, level=level)
            rest = rest[T:]
        return out

    def _run_batch_exact(self, window_uids, randoms_per_iter,
                         frames_to_optimize, initialization, need_nt=True,
                         level=1):
        T = len(randoms_per_iter)
        rows = []
        valid = opt_pose = opt_exp = None
        for randoms in randoms_per_iter:
            idx, valid, opt_pose, opt_exp, all_valid = \
                self._window_tensors(window_uids, randoms,
                                     frames_to_optimize)
            rows.append(idx)
        window_idx = jnp.stack(rows)
        xyz_lrs = jnp.asarray(
            [self._xyz_lr(self.iteration_count + 1 + i) for i in range(T)],
            jnp.float32)
        # window pair-plan reuse across batches (same slots, same
        # gaussian set — see _invalidate_plans); staleness from xyz/pose
        # drift is capped at plan_reuse_iters accumulated iterations
        plan_key = (tuple(int(x) for x in
                          window_idx[0, :self.window_size].tolist()),
                    tuple(bool(v) for v in np.asarray(valid)),
                    self.gm.capacity, self.pair_capacity, self.tile16,
                    level)
        plans_in = None
        if (self.mesh is None and not self.use_oracle
                and self._plan_cache is not None
                and self._plan_cache[0] == plan_key
                and self._plan_cache[2] < self._plan_reuse):
            plans_in = self._plan_cache[1]
            self.plan_stats["reused_batches"] += 1
            self.plan_stats["reused_iters"] += T
            self.plan_stats["max_stale_iters"] = max(
                self.plan_stats["max_stale_iters"],
                self._plan_cache[2] + T)
        # constant random slots across the batch rows -> plan them once
        # per batch alongside the window (mapping_steps n_planned)
        rows_const = all(r == randoms_per_iter[0]
                         for r in randoms_per_iter[1:])
        # mesh: plans shard over the (padded) frame axis, so ALL F slots
        # must be planned; single-device: the window+2 prefix
        n_planned = None
        if rows_const and self.map_random_per_batch and not self.use_oracle:
            n_planned = (self.F if self.mesh is not None
                         else self.window_size + 2)
        out = mapping.mapping_steps(
            self.gm, self.gm_adam, self.store, window_idx, valid,
            opt_pose, opt_exp, self.pose_adam, self.cam, self.bg,
            self._gm_lrs(), xyz_lrs,
            self.lr_rot * 0.5, self.lr_trans * 0.5,
            self.rgb_boundary_threshold,
            n_window=self.window_size,
            alpha=self.alpha, monocular=self.monocular,
            initialization=initialization,
            pair_capacity=self.pair_capacity, interpret=self.interpret,
            use_oracle=self.use_oracle, mesh=self.mesh, tile16=self.tile16,
            all_valid=all_valid, need_n_touched=need_nt,
            window_plans_in=plans_in, n_planned=n_planned, level=level)
        if out.window_plans is not None:
            # staleness counts EVERY iteration run since the plans were
            # built — including the batch that built them
            if plans_in is None:
                self.plan_stats["builds"] += 1
            used = T if plans_in is None else self._plan_cache[2] + T
            self._plan_cache = (plan_key, out.window_plans, used)
        self.iteration_count += T
        self.last_sent += T
        self.gm, self.gm_adam = out.gm, out.gm_adam
        self.store, self.pose_adam = out.store, out.pose_adam
        if _NAN_CHECK:
            self._assert_finite(f"after _run_batch T={T} "
                                f"init={initialization}")
        return out

    def _assert_finite(self, tag):
        import numpy as _np
        act = _np.asarray(self.gm.active)
        for f in ("xyz", "scaling", "rotation", "opacity", "features_dc"):
            a = _np.asarray(getattr(self.gm, f))[act]
            assert _np.all(_np.isfinite(a)), (tag, f)
        assert _np.all(_np.isfinite(_np.asarray(self.store.R))), (tag, "R")
        assert _np.all(_np.isfinite(_np.asarray(self.store.t))), (tag, "t")

    def _next_event(self, it: int) -> int:
        """Iterations until the next densify/opacity-reset boundary AFTER
        iteration `it` (exclusive) — the schedule of slam_backend.py:286-305."""
        e, o, r = (self.gaussian_update_every, self.gaussian_update_offset,
                   self.gaussian_reset)
        nxt_update = it + ((o - it - 1) % e) + 1
        nxt_reset = it + ((-it - 1) % r) + 1
        return min(nxt_update, nxt_reset)

    def map(self, window_uids: List[int], prune: bool = False,
            iters: int = 1, frames_to_optimize: Optional[int] = None,
            initialization: bool = False):
        """reference BackEnd.map (slam_backend.py:142-318). Iterations are
        batched on-device between densify/reset schedule boundaries."""
        if len(window_uids) == 0:
            return False
        if frames_to_optimize is None:
            frames_to_optimize = self.pose_window

        # coarse-mapping phase (r5, VERDICT r4 #3): the first
        # map_coarse_frac of a steady keyframe/idle budget renders at
        # map_coarse_level (1/4 the pixels at level 2, blur-matched EWA
        # low-pass — mapping_steps level) and a full-res tail pins the
        # converged map at the native image formation. Initialization
        # and prune passes stay full-res (seeding quality / visibility
        # consumers), and the tail is never shorter than 2 iterations.
        coarse_iters = 0
        if (not initialization and not prune and self.map_coarse_level > 1
                and self.map_coarse_frac > 0 and iters >= 4):
            coarse_iters = min(iters - 2,
                               int(round(iters * self.map_coarse_frac)))

        out = None
        remaining = iters
        while remaining > 0:
            in_coarse = (iters - remaining) < coarse_iters
            if prune or initialization:
                batch = remaining
            else:
                batch = min(remaining,
                            self._next_event(self.iteration_count)
                            - self.iteration_count)
                if in_coarse:
                    batch = min(batch, coarse_iters - (iters - remaining))
            if initialization:
                randoms = [[] for _ in range(batch)]
            elif self.map_random_per_batch:
                # one random pair per BATCH (constant rows): the batch's
                # random-slot pair plans amortize like the window's
                # (mapping_steps n_planned) instead of rebuilding per
                # iteration. Coverage over the keyframe pool accrues
                # across batches (8-25 iters each) rather than per
                # iteration — the reference resamples per iteration only
                # because its CUDA binning is free (slam_backend.py:170).
                randoms = [self._pick_randoms()] * batch
            else:
                randoms = [self._pick_randoms() for _ in range(batch)]
            out = self._run_batch(
                window_uids, randoms, frames_to_optimize, initialization,
                need_nt=(prune or batch == remaining) and not in_coarse,
                level=self.map_coarse_level if in_coarse else 1)
            remaining -= batch

            if prune:
                self._covisibility_prune(window_uids, out.n_touched)
                return False
            if initialization:
                continue

            it = self.iteration_count
            if it % self.gaussian_update_every == self.gaussian_update_offset:
                self._densify_and_prune(
                    self.gaussian_th, self.gaussian_extent,
                    self.size_threshold)
            elif it % self.gaussian_reset == 0:
                Log("Resetting opacity of non-visible gaussians",
                    tag="Backend")
                vis_any = jnp.any(out.radii > 0, axis=0)
                self.gm, self.gm_adam = gmap.reset_opacity_nonvisible(
                    self.gm, self.gm_adam, vis_any)
                self._invalidate_plans()

        # record occ-aware visibility for window frames (device-resident;
        # consumers compute overlap scalars on device)
        if out is not None:
            for i, uid in enumerate(window_uids[:self.window_size]):
                self.occ_aware_visibility[uid] = out.n_touched[i] > 0
        return True

    def _densify_and_prune(self, th, extent, size_threshold):
        # ensure headroom for split/clone (up to 2x active)
        self._ensure_capacity(int(self.gm.num_active()))
        self.gm, self.gm_adam, ov = gmap.densify_and_prune(
            self.gm, self.gm_adam, self._split_key(),
            self.densify_grad_threshold, th, extent, size_threshold,
            self.percent_dense)
        self._invalidate_plans()
        if int(ov) > 0:
            Log(f"densify overflow {int(ov)}", tag="Backend")
        if _NAN_CHECK:
            self._assert_finite("after densify_and_prune")

    def _covisibility_prune(self, window_uids, n_touched):
        """reference slam_backend.py:244-275 (prune_mode slam/odometry),
        computed entirely on device — no (F, C) visibility transfers."""
        self.occ_aware_visibility = {}
        k = len(window_uids[:self.window_size])
        for i, uid in enumerate(window_uids[:self.window_size]):
            self.occ_aware_visibility[uid] = n_touched[i] > 0

        if len(window_uids) == self.window_size:
            prune_coviz = 3
            n_obs = jnp.sum((n_touched[:k] > 0).astype(jnp.int32), axis=0)
            self.gm = self.gm.replace(n_obs=n_obs)
            to_prune = None
            if self.prune_mode == "odometry":
                to_prune = n_obs < 3
            if self.prune_mode == "slam":
                sorted_window = sorted(window_uids, reverse=True)
                kfids = self.gm.unique_kfids
                mask = kfids >= sorted_window[2]
                if not self.initialized:
                    mask = kfids >= 0
                to_prune = (n_obs <= prune_coviz) & mask
            if to_prune is not None and self.monocular:
                self.gm, self.gm_adam = gmap.prune(
                    self.gm, self.gm_adam, to_prune)
                self._invalidate_plans()
            if not self.initialized:
                self.initialized = True
                Log("Initialized SLAM", tag="Backend")

    # ------------------------------------------------------------------
    def initialize_map(self, frame_uid: int):
        """reference initialize_map (slam_backend.py:86-140), with the
        iterations between densify/reset events batched on-device."""
        import time as _time
        events = sorted(set(
            list(range(self.init_gaussian_update, self.init_itr_num + 1,
                       self.init_gaussian_update))
            + [self.init_gaussian_reset,
               self.opt_params["densify_from_iter"]]))
        done = 0
        _t0 = _time.time()
        phases = []
        for ev in events + [self.init_itr_num]:
            if ev <= done or ev > self.init_itr_num:
                continue
            _tb = _time.time()
            self.map([frame_uid], iters=ev - done, initialization=True,
                     frames_to_optimize=0)
            phases.append(f"it{done}-{ev}:{_time.time() - _tb:.1f}s")
            done = ev
            if ev % self.init_gaussian_update == 0:
                _tb = _time.time()
                self._densify_and_prune(
                    self.init_gaussian_th, self.init_gaussian_extent, None)
                phases.append(f"densify:{_time.time() - _tb:.1f}s")
            if ev in (self.init_gaussian_reset,
                      self.opt_params["densify_from_iter"]):
                self.gm, self.gm_adam = gmap.reset_opacity(
                    self.gm, self.gm_adam)
        Log(f"Initialized map ({_time.time() - _t0:.1f}s: "
            + " ".join(phases) + ")", tag="Backend")

    def prewarm_mapping(self):
        """Compile + first-dispatch the steady mapping variants on the
        just-initialized single-keyframe window, before the frame loop.

        The keyframe path's programs differ from initialize_map's
        (initialization=False, different scan lengths T from the pow2
        batch decomposition, the need_n_touched tail chunk, and the
        covisibility-prune consumers), so the FIRST real keyframe
        otherwise pays their one-time costs — compile or persistent-cache
        load plus the ~10 s tunnel first-dispatch per program — inside
        the frame loop, while tracking contends for the device (measured
        191 s for the first window-3 keyframe,
        docs/tpu_full_run_async/run_summary_96_paced.json; window size
        itself is NOT a compile key — windows are padded to window_size
        with a validity mask, see _window_tensors). Runs the async
        keyframe budget, a prune pass, and one idle-refinement batch on
        a throwaway copy of the state, then restores every mutated field
        (map, Adam, store, RNG streams, plan cache, telemetry). The
        reference ships precompiled CUDA kernels and never pays this
        (slam_backend.py:409-475 runs at steady cost from keyframe 1)."""
        if self.use_oracle or not self.current_window:
            return
        # once per process per shape family: compiles and first-dispatch
        # are process-level one-time costs, and a second walk (e.g. the
        # runner's steady re-pass constructing a fresh SLAM while the
        # first instance's map is still device-resident) spends real HBM
        # on throwaway batches — measured RESOURCE_EXHAUSTED on v5e
        # (results/tpu_async_r3g pass 2)
        key = (self.gm.capacity, self.pair_capacity,
               self.cam.height, self.cam.width, self.window_size)
        if key in _PREWARMED:
            Log("mapping variants already prewarmed in this process",
                tag="Backend")
            return
        import time as _time
        t0 = _time.time()
        snap = (self.gm, self.gm_adam, self.store, self.pose_adam,
                self.iteration_count, self.last_sent, self._plan_cache,
                dict(self.plan_stats), dict(self.occ_aware_visibility),
                self.initialized, self._key, self._py_rng.getstate())
        win = list(self.current_window)
        n = 0
        try:
            kf_iters = self.mapping_itr_num if self.single_thread else 10
            self.map(win, iters=kf_iters)
            self.map(win, prune=True)
            self.map(win, iters=self.idle_batch)
            n = kf_iters + 1 + self.idle_batch
            # the saturated-window fast path (all_valid=True) is a
            # DISTINCT program set (mapping_steps static arg; it engages
            # once the window fills and 2 random keyframes exist):
            # fabricate a fully-valid window + randoms from the init
            # keyframe and walk the pow2 chunkings the event-bounded
            # batches produce — (8,need_nt=F),(8,T),(4,F),(2,T),(2,F),
            # (1,T) — plus the covisibility-prune consumers
            full_win = [win[0]] * self.window_size
            randoms2 = [win[0], win[0]]
            levels = ([1] if self.map_coarse_frac <= 0
                      or self.map_coarse_level <= 1
                      else [1, self.map_coarse_level])
            for lv in levels:
                for iters in (min(kf_iters, 10), 8, 6, 3):
                    self._run_batch(full_win, [list(randoms2)] * iters,
                                    self.pose_window, False, level=lv)
                    n += iters
            out = self._run_batch(full_win, [list(randoms2)],
                                  self.pose_window, False)
            # the densify/opacity-reset/capacity-surgery programs are
            # reached only at schedule boundaries with REAL kill/clone
            # counts (r4: "first densify-with-kills discovered in-loop",
            # 90 s at keyframe 3) — run them once on the throwaway state
            self._densify_and_prune(self.gaussian_th, self.gaussian_extent,
                                    self.size_threshold)
            vis_any = jnp.any(out.radii > 0, axis=0)
            self.gm, self.gm_adam = gmap.reset_opacity_nonvisible(
                self.gm, self.gm_adam, vis_any)
            self._invalidate_plans()
            n += 1
            # the per-KEYFRAME seed/extend programs are shaped by
            # pcd_downsample (64), distinct from the init ones (16) —
            # measured 22 s at the first real keyframe in-loop (r5)
            slot0 = self.uid_to_slot[win[0]]
            ds_cfg = self.config["Dataset"]
            block = seeding.seed_from_frame(
                self.store.image(slot0), self.store.depth(slot0)[0],
                self.cam, self._w2c(slot0), win[0], self._split_key(),
                ds_cfg["pcd_downsample"], ds_cfg["point_size"],
                ds_cfg.get("adaptive_pointsize", False),
                self.gm.max_sh_degree)
            self._ensure_capacity(int(jnp.sum(block.valid)))
            self.gm, self.gm_adam, _ = gmap.extend(
                self.gm, self.gm_adam, block)
            # suppress the "Initialized SLAM" transition log — this is a
            # throwaway window (the snapshot restores the real flag)
            self.initialized = True
            self._covisibility_prune(full_win, out.n_touched)
            n += 1
        finally:
            (self.gm, self.gm_adam, self.store, self.pose_adam,
             self.iteration_count, self.last_sent, self._plan_cache,
             self.plan_stats, self.occ_aware_visibility,
             self.initialized, self._key, py_state) = snap
            self._py_rng.setstate(py_state)
        _PREWARMED.add(key)
        self.prewarm_wall_s = _time.time() - t0
        Log(f"prewarmed mapping variants ({n} throwaway iters) in "
            f"{self.prewarm_wall_s:.1f}s", tag="Backend")

    def handle_keyframe(self, frame_idx, window_uids):
        """reference slam_backend.py:409-475."""
        import time as _time
        _t0 = _time.time()
        self.current_window = list(window_uids)
        iter_per_kf = self.mapping_itr_num if self.single_thread else 10
        frames_to_optimize = self.pose_window
        if not self.initialized:
            if len(self.current_window) == self.window_size:
                frames_to_optimize = self.window_size - 1
                iter_per_kf = 50 if self.live_mode else 300
                Log("Performing initial BA for initialization",
                    tag="Backend")
            else:
                iter_per_kf = self.mapping_itr_num
        self.pose_adam = PoseAdamState.zero(self.F)
        self.map(self.current_window, iters=iter_per_kf,
                 frames_to_optimize=frames_to_optimize)
        _t1 = _time.time()
        self.map(self.current_window, prune=True,
                 frames_to_optimize=frames_to_optimize)
        _t2 = _time.time()
        Log(f"keyframe {frame_idx} mapped: {iter_per_kf} iters, "
            f"window {len(self.current_window)}, "
            f"{_t2 - _t0:.1f}s (map {_t1 - _t0:.1f} prune {_t2 - _t1:.1f})",
            tag="Backend")

    def color_refinement(self, iteration_total: int = 26000,
                         batch: int = 256):
        """reference slam_backend.py:320-353, batched on-device: random KF
        slots and xyz LRs are precomputed per batch and the whole batch runs
        as one lax.scan program (mapping.color_refinement_steps)."""
        Log("Starting color refinement", tag="Backend")
        slots = [self.uid_to_slot[u] for u in self.uid_to_slot]
        it = 0
        while it < iteration_total:
            T = min(batch, iteration_total - it)
            T = 1 << (T.bit_length() - 1)   # pow2 chunks: few compiles
            idxs = jnp.asarray(
                [slots[self._py_rng.randint(0, len(slots) - 1)]
                 for _ in range(T)], jnp.int32)
            xyz_lrs = jnp.asarray(
                [self._xyz_lr(it + 1 + i) for i in range(T)], jnp.float32)
            self.gm, self.gm_adam, _ = mapping.color_refinement_steps(
                self.gm, self.gm_adam, self.store, idxs, xyz_lrs,
                self.cam, self.bg, self._gm_lrs(), self.lambda_dssim,
                pair_capacity=self.pair_capacity, interpret=self.interpret,
                use_oracle=self.use_oracle, tile16=self.tile16)
            it += T
        Log("Map refinement done", tag="Backend")

    def keyframe_poses(self):
        """Poses to sync back to the frontend (push_to_frontend payload).
        One packed d2h pull for the whole window (2 pulls per keyframe
        cost a host-link round trip each)."""
        uids = list(self.current_window)
        if not uids:
            return []
        slots = jnp.asarray([self.uid_to_slot[u] for u in uids], jnp.int32)
        Rt = np.asarray(jnp.concatenate(
            [self.store.R[slots].reshape(len(uids), 9),
             self.store.t[slots]], axis=1), np.float32)
        return [(u, Rt[i, :9].reshape(3, 3), Rt[i, 9:12])
                for i, u in enumerate(uids)]
