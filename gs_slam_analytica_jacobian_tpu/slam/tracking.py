"""Per-frame pose tracking: the SLAM hot loop, fully on-device.

Rebuild of reference utils/slam_frontend.py:128-196 (FrontEnd.tracking):
Adam over (cam_rot_delta, cam_trans_delta, exposure_a, exposure_b), up to
``tracking_itr_num`` iterations of render + masked tracking loss + backward
+ pose retraction, with convergence when ||tau|| < 1e-4.

TPU-first: the whole iteration loop is a single jitted lax.while_loop —
no host round-trips between iterations (the torch reference launches
dozens of kernels + a python loop per iteration). The pose delta tau is
zero at every render; Adam turns its gradient into an update which is
immediately retracted onto (R, t), exactly like
update_pose (utils/pose_utils.py:76-93).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models.camera import Camera, PoseState
from ..models.gaussian_map import GaussianMap
from ..ops import losses
from ..ops.lie import se3_exp
from .render_api import make_render_plan, render


class TrackAdamState(NamedTuple):
    m: jnp.ndarray        # (8,) moments for [tau(6), exp_a, exp_b]
    v: jnp.ndarray        # (8,)
    step: jnp.ndarray     # () int32


class TrackState(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    exposure_a: jnp.ndarray
    exposure_b: jnp.ndarray
    adam: TrackAdamState
    itr: jnp.ndarray
    converged: jnp.ndarray


def _adam8(adam: TrackAdamState, g: jnp.ndarray, lrs: jnp.ndarray,
           b1=0.9, b2=0.999, eps=1e-8) -> Tuple[jnp.ndarray, TrackAdamState]:
    """torch.optim.Adam default-eps step on the 8 tracking params."""
    step = adam.step + 1
    t = step.astype(jnp.float32)
    m = b1 * adam.m + (1 - b1) * g
    v = b2 * adam.v + (1 - b2) * g * g
    upd = lrs * (m / (1 - b1 ** t)) / (jnp.sqrt(v / (1 - b2 ** t)) + eps)
    return upd, TrackAdamState(m=m, v=v, step=step)


@functools.partial(
    jax.jit,
    static_argnames=("monocular", "max_iters",
                     "pair_capacity", "interpret", "use_oracle",
                     "amortize_binning"))
def track_frame(
    gm: GaussianMap,
    cam_template: Camera,          # static geometry (fx..H); R/t in state
    R0: jnp.ndarray, t0: jnp.ndarray,
    gt_image: jnp.ndarray,         # (3, H, W)
    gt_depth: jnp.ndarray,         # (1, H, W) (zeros if monocular)
    grad_mask: jnp.ndarray,        # (1, H, W)
    bg: jnp.ndarray,
    lr_rot: float, lr_trans: float,
    rgb_boundary_threshold: float,
    alpha: float = 0.95,
    monocular: bool = False,
    max_iters: int = 100,
    pair_capacity: int = 1 << 20,
    interpret: bool = False,
    use_oracle: bool = False,
    amortize_binning: bool = True,
):
    """Full tracking optimization for one frame.

    Returns (R, t, exposure_a, exposure_b, n_iters, final RenderOutput).

    ``amortize_binning``: bin the Gaussians into tiles ONCE from the
    warm-start pose (with an inflated radius so the pair set stays a
    superset while the pose converges) and reuse the plan for every
    iteration. The CUDA reference re-bins per render because its binning
    is ~free (rasterizer_impl.cu:327-367); on TPU the binning is sort/
    gather-bound, and intra-frame pose deltas are sub-pixel.
    """
    lrs = jnp.concatenate([
        jnp.full((3,), lr_trans), jnp.full((3,), lr_rot),
        jnp.full((2,), 0.01)]).astype(jnp.float32)

    if amortize_binning and not use_oracle:
        plan = make_render_plan(
            gm, cam_template.replace(R=R0, t=t0),
            pair_capacity=pair_capacity, radius_scale=1.1, radius_pad=8.0)
    else:
        plan = None

    def loss_fn(tau, exp_a, exp_b, R, t):
        cam = cam_template.replace(R=R, t=t)
        pose = PoseState(tau=tau, exposure_a=exp_a, exposure_b=exp_b)
        out = render(gm, cam, pose, bg, pair_capacity=pair_capacity,
                     interpret=interpret, use_oracle=use_oracle,
                     plan=plan, need_n_touched=False)
        image_ab = losses.apply_exposure(out.color, exp_a, exp_b)
        if monocular:
            L = losses.loss_tracking_rgb(
                image_ab, gt_image, out.opacity, grad_mask,
                rgb_boundary_threshold)
        else:
            L = losses.loss_tracking_rgbd(
                image_ab, out.depth, gt_image, gt_depth, out.opacity,
                grad_mask, rgb_boundary_threshold, alpha)
        return L

    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2))

    def body(s: TrackState) -> TrackState:
        tau0 = jnp.zeros((6,), jnp.float32)
        g_tau, g_a, g_b = grad_fn(tau0, s.exposure_a, s.exposure_b, s.R, s.t)
        g = jnp.concatenate([g_tau, g_a[None], g_b[None]])
        upd, adam = _adam8(s.adam, g, lrs)
        # optimizer.step(): params -= upd; tau starts at 0 so new tau = -upd
        new_tau = -upd[:6]
        new_a = s.exposure_a - upd[6]
        new_b = s.exposure_b - upd[7]
        # update_pose: T <- Exp([trans, rot]) @ T; converged if small
        T = jnp.eye(4).at[:3, :3].set(s.R).at[:3, 3].set(s.t)
        newT = se3_exp(new_tau) @ T
        converged = jnp.linalg.norm(new_tau) < 1e-4
        return TrackState(R=newT[:3, :3], t=newT[:3, 3], exposure_a=new_a,
                          exposure_b=new_b, adam=adam, itr=s.itr + 1,
                          converged=converged)

    def cond(s: TrackState):
        return (s.itr < max_iters) & ~s.converged

    init = TrackState(
        R=R0, t=t0,
        exposure_a=jnp.zeros(()), exposure_b=jnp.zeros(()),
        adam=TrackAdamState(m=jnp.zeros(8), v=jnp.zeros(8),
                            step=jnp.zeros((), jnp.int32)),
        itr=jnp.zeros((), jnp.int32),
        converged=jnp.zeros((), bool))

    final = jax.lax.while_loop(cond, body, init)

    # final render at the converged pose (for keyframing / visibility)
    cam = cam_template.replace(R=final.R, t=final.t)
    out = render(gm, cam, None, bg, pair_capacity=pair_capacity,
                 interpret=interpret, use_oracle=use_oracle)
    med = losses.median_depth(out.depth, out.opacity)
    return (final.R, final.t, final.exposure_a, final.exposure_b,
            final.itr, out, med)


# ---------------------------------------------------------------------------
# Image pyramid helpers (coarse-to-fine tracking)
# ---------------------------------------------------------------------------

def _pool_avg(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(C, H, W) average-pool by integer factor s (crop remainder)."""
    c, h, w = x.shape
    hs, ws = h // s, w // s
    return x[:, : hs * s, : ws * s].reshape(c, hs, s, ws, s).mean(axis=(2, 4))


def _pool_max(x: jnp.ndarray, s: int) -> jnp.ndarray:
    c, h, w = x.shape
    hs, ws = h // s, w // s
    return x[:, : hs * s, : ws * s].reshape(c, hs, s, ws, s).max(axis=(2, 4))


def _stride_center(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(C, H, W) block-center subsample — used for depth, where a full
    block average across discontinuities would fabricate gt surfaces.

    The level camera (_cam_level) places the level pixel center at input
    offset (s-1)/2. For odd s that is an exact sample; for even s it falls
    between two samples, so the 2x2 center block is averaged (a half-pixel
    of parallax at worst, vs the half-input-pixel bias a single off-center
    sample would carry into every coarse-level depth residual)."""
    c, h, w = x.shape
    hs, ws = h // s, w // s
    if s % 2 == 1:
        return x[:, s // 2::s, s // 2::s][:, :hs, :ws]
    a = x[:, s // 2 - 1::s, :][:, :hs]
    b = x[:, s // 2::s, :][:, :hs]
    xr = 0.5 * (a + b)
    a = xr[:, :, s // 2 - 1::s][:, :, :ws]
    b = xr[:, :, s // 2::s][:, :, :ws]
    return 0.5 * (a + b)


def _cam_level(cam: Camera, s: int) -> Camera:
    """Scaled-intrinsics camera for pyramid level of decimation s."""
    if s == 1:
        return cam
    return cam.replace(
        fx=cam.fx / s, fy=cam.fy / s,
        cx=(cam.cx + 0.5) / s - 0.5, cy=(cam.cy + 0.5) / s - 0.5,
        width=cam.width // s, height=cam.height // s)


def _central_grad(img: jnp.ndarray):
    """Central-difference image gradients d/du (x) and d/dv (y), (C,H,W).
    Replicated edges (one-sided at borders is fine for curvature use)."""
    pu = jnp.pad(img, ((0, 0), (0, 0), (1, 1)), mode="edge")
    pv = jnp.pad(img, ((0, 0), (1, 1), (0, 0)), mode="edge")
    gu = 0.5 * (pu[:, :, 2:] - pu[:, :, :-2])
    gv = 0.5 * (pv[:, 2:, :] - pv[:, :-2, :])
    return gu, gv


def _flow_jacobian(cam_l: Camera, image: jnp.ndarray, depth: jnp.ndarray,
                   opacity: jnp.ndarray):
    """Direct-alignment pose Jacobian synthesized from one render.

    For the pose convention w2c_eff = Exp(tau) @ w2c with tau = (rho, theta)
    (ops/gaussian_math.py:160), a camera-space surface point X moves as
    dX/drho = I, dX/dtheta = -[X]x, and its pixel (u, v) as du/dX =
    [fx/z, 0, -fx*x/z^2], dv/dX = [0, fy/z, -fy*y/z^2]. The rendered
    intensity at a FIXED pixel then changes by dI/dtau = -grad(I) . du/dtau
    and the rendered depth by dD/dtau = dX_z/dtau - grad(D) . du/dtau
    (classic direct image alignment, e.g. LSD-SLAM Eq. 5; here used ONLY
    for the IRLS curvature J^T W J — the loss gradient stays the exact
    analytic dL/dtau from the renderer's backward, so curvature error
    affects the convergence rate, never the fixed point).

    Returns (Jc (8,3,H,W), Jd (8,1,H,W)) including the exposure columns
    d/da = image, d/db = 1.
    """
    _, H, W = depth.shape
    f32 = jnp.float32
    u = jnp.arange(W, dtype=f32)[None, None, :]
    v = jnp.arange(H, dtype=f32)[:, None][None]
    # Rendered depth is sum(w*d) (NOT normalized by opacity); recover the
    # surface z where coverage exists and floor at the frustum near plane
    # (reference culls z<=0.2, auxiliary.h:154). Pixels without a confident
    # surface get their pose columns zeroed — a wrong 1/z there would
    # otherwise dominate J^T W J.
    conf = (opacity > 0.5).astype(f32)                         # (1, H, W)
    z = jnp.maximum(depth / jnp.maximum(opacity, 0.05), 0.2)
    xn = (u - cam_l.cx) / cam_l.fx                             # x/z
    yn = (v - cam_l.cy) / cam_l.fy                             # y/z
    inv_z = 1.0 / z

    # du/dtau, dv/dtau per pixel, tau = (rho_x, rho_y, rho_z, th_x, th_y, th_z)
    # du/dX = fx * [1/z, 0, -xn/z];  dv/dX = fy * [0, 1/z, -yn/z]
    # dX/drho = I;  dX/dtheta = -[X]x with X = z*(xn, yn, 1)
    fx, fy = cam_l.fx, cam_l.fy
    du = [fx * inv_z, jnp.zeros_like(z), -fx * xn * inv_z,
          -fx * xn * yn, fx * (1.0 + xn * xn), -fx * yn]
    dv = [jnp.zeros_like(z), fy * inv_z, -fy * yn * inv_z,
          -fy * (1.0 + yn * yn), fy * xn * yn, fy * xn]
    # dX_z/dtau = (0, 0, 1, X_y, -X_x, 0)
    dz = [jnp.zeros_like(z), jnp.zeros_like(z), jnp.ones_like(z),
          yn * z, -xn * z, jnp.zeros_like(z)]

    gIu, gIv = _central_grad(image)                            # (3, H, W)
    gDu, gDv = _central_grad(depth)                            # (1, H, W)

    Jc = jnp.stack([-conf * (gIu * du[k] + gIv * dv[k]) for k in range(6)])
    Jd = jnp.stack([conf * (dz[k] - (gDu * du[k] + gDv * dv[k]))
                    for k in range(6)])
    Jc = jnp.concatenate([Jc, image[None], jnp.ones_like(image)[None]],
                         axis=0)                               # (8, 3, H, W)
    Jd = jnp.concatenate([Jd, jnp.zeros_like(Jd[:2])], axis=0)
    return Jc, Jd


@functools.partial(
    jax.jit,
    static_argnames=("monocular", "max_iters",
                     "pair_capacity", "interpret", "use_oracle"))
def track_frame_gn(
    gm: GaussianMap,
    cam_template: Camera,
    R0: jnp.ndarray, t0: jnp.ndarray,
    gt_image: jnp.ndarray,
    gt_depth: jnp.ndarray,
    grad_mask: jnp.ndarray,
    bg: jnp.ndarray,
    lr_rot: float, lr_trans: float,   # kept for API parity; unused
    rgb_boundary_threshold: float,
    alpha: float = 0.95,
    monocular: bool = False,
    max_iters: int = 20,
    pair_capacity: int = 1 << 20,
    interpret: bool = False,
    use_oracle: bool = False,
    fd_eps: float = 1e-3,
    lm_lambda: float = 1e-2,
):
    """Gauss-Newton / IRLS pose tracker — the TPU-fast alternative to the
    reference's Adam loop (utils/slam_frontend.py:128-196).

    The fixed point is EXACT: each iteration uses the analytic dL/dtau
    from the renderer's backward (the repo's core Jacobian). Only the 8x8
    CURVATURE is approximate: an IRLS Gauss-Newton J^T W J estimated ONCE
    per frame by 6 finite-difference forward renders around the warm-start
    pose (vmapped into one device program), with analytic exposure
    columns. Curvature errors affect the rate, never the solution.

    Convergence uses the reference's rule ||delta|| < 1e-4, typically in
    5-15 iterations instead of ~100 — each iteration costing one
    render fwd+bwd, like one Adam step.
    """
    del lr_rot, lr_trans

    plan = (None if use_oracle else make_render_plan(
        gm, cam_template.replace(R=R0, t=t0),
        pair_capacity=pair_capacity, radius_scale=1.1, radius_pad=8.0))

    def render_at(tau, R, t):
        cam = cam_template.replace(R=R, t=t)
        pose = PoseState(tau=tau, exposure_a=jnp.zeros(()),
                         exposure_b=jnp.zeros(()))
        return render(gm, cam, pose, bg, pair_capacity=pair_capacity,
                      interpret=interpret, use_oracle=use_oracle,
                      plan=plan, need_n_touched=False)

    def loss_fn(tau, exp_a, exp_b, R, t):
        out = render_at(tau, R, t)
        image_ab = losses.apply_exposure(out.color, exp_a, exp_b)
        if monocular:
            L = losses.loss_tracking_rgb(
                image_ab, gt_image, out.opacity, grad_mask,
                rgb_boundary_threshold)
        else:
            L = losses.loss_tracking_rgbd(
                image_ab, out.depth, gt_image, gt_depth, out.opacity,
                grad_mask, rgb_boundary_threshold, alpha)
        aux = (jax.lax.stop_gradient(image_ab),
               jax.lax.stop_gradient(out.depth),
               jax.lax.stop_gradient(out.opacity))
        return L, aux

    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2), has_aux=True)

    # ---- frozen Jacobian columns (FD at the warm start, one vmapped
    #      device program); IRLS weights are rebuilt EVERY iteration ----
    out0 = render_at(jnp.zeros(6), R0, t0)
    base_color = out0.color                                  # (3, H, W)
    base_depth = out0.depth
    n3hw = 3.0 * gt_image.shape[1] * gt_image.shape[2]
    nhw = float(gt_image.shape[1] * gt_image.shape[2])
    rgb_mask = (gt_image.sum(axis=0, keepdims=True)
                > rgb_boundary_threshold).astype(jnp.float32)

    taus = jnp.eye(6, dtype=jnp.float32) * fd_eps

    def fd_render(tau):
        o = render_at(tau, R0, t0)
        return o.color, o.depth

    # lax.map (scan), not vmap: Pallas ANY-memspace operands cannot be
    # batched, and the 6 probes are device-bound anyway.
    colors_p, depths_p = jax.lax.map(fd_render, taus)        # (6,3,H,W)
    Jc = (colors_p - base_color[None]) / fd_eps              # (6,3,H,W)
    Jd = (depths_p - base_depth[None]) / fd_eps
    # analytic exposure columns at (a,b)=(0,0): d(image)/da = image,
    # d/db = 1 (losses.apply_exposure: exp(a)*I + b)
    Jc = jnp.concatenate(
        [Jc, base_color[None], jnp.ones_like(base_color)[None]], axis=0)
    Jd = jnp.concatenate([Jd, jnp.zeros_like(Jd[:2])], axis=0)  # (8,1,H,W)
    Jc_f = Jc.reshape(8, -1)
    Jd_f = Jd.reshape(8, -1)

    def curvature(image_ab, depth, opacity):
        """IRLS normal matrix J^T diag(w) J with weights w/(|r|+eps)
        from the CURRENT residuals — frozen-J true IRLS. Masks and mean
        normalizations mirror loss_tracking_* (ops/losses.py:100-130)."""
        r_c = image_ab - gt_image
        w_c = (opacity * grad_mask * rgb_mask) / (jnp.abs(r_c) + 1e-3)
        w_c = (w_c if monocular else alpha * w_c) / n3hw     # (3, H, W)
        H_mat = (Jc_f * w_c.reshape(1, -1)) @ Jc_f.T         # (8, 8)
        if not monocular:
            depth_mask = ((gt_depth > 0.01) & (opacity > 0.95)
                          ).astype(jnp.float32)
            r_d = depth - gt_depth
            w_d = (1.0 - alpha) * depth_mask / (jnp.abs(r_d) + 1e-3) / nhw
            H_mat = H_mat + (Jd_f * w_d.reshape(1, -1)) @ Jd_f.T
        H_mat = H_mat + lm_lambda * jnp.diag(
            jnp.maximum(jnp.diag(H_mat), 1e-8))
        return H_mat + 1e-8 * jnp.eye(8)

    # ---- iterate: exact analytic gradient + per-iteration IRLS H.
    # A geometric step decay (0.7^k after the first full step) quenches
    # the L1 zigzag around the optimum; measured: ~11 iterations to
    # ||tau|| < 1e-4 vs ~100 for the reference's Adam loop. ----
    def body(s: TrackState) -> TrackState:
        tau0 = jnp.zeros((6,), jnp.float32)
        (g_tau, g_a, g_b), aux = grad_fn(
            tau0, s.exposure_a, s.exposure_b, s.R, s.t)
        g = jnp.concatenate([g_tau, g_a[None], g_b[None]])
        H_mat = curvature(*aux)
        scale = 0.7 ** jnp.maximum(s.itr - 1, 0).astype(jnp.float32)
        delta = jnp.linalg.solve(H_mat, g) * scale
        new_tau = -delta[:6]
        new_a = s.exposure_a - delta[6]
        new_b = s.exposure_b - delta[7]
        T = jnp.eye(4).at[:3, :3].set(s.R).at[:3, 3].set(s.t)
        newT = se3_exp(new_tau) @ T
        converged = jnp.linalg.norm(new_tau) < 1e-4
        return TrackState(R=newT[:3, :3], t=newT[:3, 3], exposure_a=new_a,
                          exposure_b=new_b, adam=s.adam, itr=s.itr + 1,
                          converged=converged)

    def cond(s: TrackState):
        return (s.itr < max_iters) & ~s.converged

    init = TrackState(
        R=R0, t=t0,
        exposure_a=jnp.zeros(()), exposure_b=jnp.zeros(()),
        adam=TrackAdamState(m=jnp.zeros(8), v=jnp.zeros(8),
                            step=jnp.zeros((), jnp.int32)),
        itr=jnp.zeros((), jnp.int32),
        converged=jnp.zeros((), bool))

    final = jax.lax.while_loop(cond, body, init)

    cam = cam_template.replace(R=final.R, t=final.t)
    out = render(gm, cam, None, bg, pair_capacity=pair_capacity,
                 interpret=interpret, use_oracle=use_oracle)
    med = losses.median_depth(out.depth, out.opacity)
    return (final.R, final.t, final.exposure_a, final.exposure_b,
            final.itr, out, med)


def _gn_level(
    gm: GaussianMap,
    cam_l: Camera,
    R, t, ea, eb,
    gt_image, gt_depth, grad_mask, bg,
    rgb_boundary_threshold: float,
    alpha: float,
    monocular: bool,
    max_iters: int,
    pair_capacity: int,
    interpret: bool,
    use_oracle: bool,
    fd_eps: float,
    lm_lambda: float,
    radius_pad: float,
    H_frozen=None,
    curv: str = "fd",
    bf16: bool = False,
    mxu: bool = False,
    low_pass: float = 0.3,
    sigma0: float = 0.01,
    sigma_decay: float = 0.8,
    sigma_in=None,
    step_cap: float = 0.05,
    exact_iters: int = -1,
    tile16: bool = False,
    subset_frac: float = 1.0,
    plan_in=None,
    track_mask=None,
):
    """One pyramid level of IRLS Gauss-Newton pose refinement.

    Same math as track_frame_gn, parametrized by the level camera and
    level-resolution ground truths. Curvature modes:

    - ``curv='flow'`` (default): the 8x8 IRLS normal matrix is assembled
      every iteration from the CURRENT render via the direct-alignment
      flow Jacobian (_flow_jacobian) — zero probe renders, and the
      linearization tracks the pose, which empirically halves the
      iteration count vs a frozen FD Jacobian.
    - ``curv='fd'``: 6 finite-difference probe renders at level entry
      (frozen J, per-iteration IRLS reweighting) — the track_frame_gn
      scheme.
    - ``H_frozen`` given: skip probes entirely and reuse the coarser
      level's normal matrix (mean-normalized entries are
      resolution-invariant in expectation).

    The loss gradient is always the exact analytic dL/dtau from the
    renderer's backward; curvature errors affect the rate, never the
    fixed point.

    Returns (R, t, ea, eb, iters_done, H_last, plan).
    """
    # ``plan_in``: cross-frame plan reuse — the caller hands back the plan
    # this level emitted on a PREVIOUS frame. It stays a valid superset
    # while the projected pose drift since the plan's build pose is under
    # ``radius_pad`` pixels; the frontend gates reuse on its image-flow
    # estimate and rebuilds on a cadence (plan_pairs is a material share
    # of the per-frame cost on TPU — see PERF.md r3).
    if plan_in is not None:
        plan = plan_in
    else:
        plan = (None if use_oracle else make_render_plan(
            gm, cam_l.replace(R=R, t=t), pair_capacity=pair_capacity,
            radius_scale=1.1, radius_pad=radius_pad, tile16=tile16,
            extra_active=track_mask))

    # Texture-ranked tile subset for the forward-only IRLS phase
    # (sparse direct alignment, cf. DSO's high-gradient pixel selection):
    # rank 32x32 tiles by tracked-loss mass (grad_mask, which already
    # encodes the Scharr edge selection the reference tracks under) and
    # collapse the pair-plan ranges of the bottom (1-subset_frac) so the
    # kernel skips them at zero cost. Skipped tiles render as background
    # with opacity 0, and every term of the tracking loss and the IRLS
    # weights is opacity- or mask-gated, so they drop out of H and g
    # without any mask plumbing. The EXACT phase (and the probe renders)
    # always run the full plan — keyframe poses see every pixel.
    # CAVEAT (flow curvature): with curv='flow' the IRLS Jacobian uses
    # spatial finite differences, so pixels on a kept/skipped tile border
    # sample background neighbors — the ||J||*sigma weight floor damps but
    # does not remove the rim bias. The subset stays opt-in (default off;
    # measured a dead end on the bench scene, PERF.md r3).
    plan_irls = plan
    if (subset_frac < 1.0 and plan is not None and not tile16
            and not use_oracle):
        from ..ops.pallas.tile_kernel2 import TPX, TPY, grid_dims
        H_l, W_l = int(gt_image.shape[1]), int(gt_image.shape[2])
        n_tx, n_ty = grid_dims(W_l, H_l)

        def tile_mass(img2d):
            m2 = jnp.pad(img2d, ((0, n_ty * TPY - H_l),
                                 (0, n_tx * TPX - W_l)))
            return m2.reshape(n_ty, TPY, n_tx, TPX).sum(
                axis=(1, 3)).reshape(-1)

        # Rank by the loss-weighted constraint mass: grad-mask pixels
        # carry the RGB term (weight alpha) and, in RGB-D mode,
        # valid-depth pixels carry the depth term (weight 1-alpha) even
        # where the scene is textureless — ranking on grad_mask alone
        # dropped those depth constraints.
        mass = tile_mass(grad_mask[0])
        if not monocular:
            mass = (alpha * mass
                    + (1.0 - alpha) * tile_mass(
                        (gt_depth[0] > 0.01).astype(jnp.float32)))
        k = max(1, int(round(n_tx * n_ty * subset_frac)))
        kth = jnp.sort(mass)[mass.shape[0] - k]
        # keep >= kth (ties included). When the k-th largest mass is 0
        # (low-texture scene: most tiles carry no constraints) this keeps
        # every tile — i.e. falls back to the full plan rather than
        # silently tracking on near-zero tiles.
        keep = mass >= kth
        ranges_sub = jnp.where(keep[:, None], plan.ranges,
                               plan.ranges[:, :1])
        plan_irls = plan._replace(ranges=ranges_sub)

    def render_at(tau, R_, t_, plan_=None):
        cam = cam_l.replace(R=R_, t=t_)
        pose = PoseState(tau=tau, exposure_a=jnp.zeros(()),
                         exposure_b=jnp.zeros(()))
        return render(gm, cam, pose, bg, pair_capacity=pair_capacity,
                      interpret=interpret, use_oracle=use_oracle,
                      plan=plan if plan_ is None else plan_,
                      need_n_touched=False, bf16=bf16,
                      tile16=tile16, mxu=mxu, low_pass=low_pass)

    def loss_fn(tau, exp_a, exp_b, R_, t_, plan_=None):
        out = render_at(tau, R_, t_, plan_)
        image_ab = losses.apply_exposure(out.color, exp_a, exp_b)
        if monocular:
            L = losses.loss_tracking_rgb(
                image_ab, gt_image, out.opacity, grad_mask,
                rgb_boundary_threshold)
        else:
            L = losses.loss_tracking_rgbd(
                image_ab, out.depth, gt_image, gt_depth, out.opacity,
                grad_mask, rgb_boundary_threshold, alpha)
        aux = (jax.lax.stop_gradient(image_ab),
               jax.lax.stop_gradient(out.depth),
               jax.lax.stop_gradient(out.opacity))
        return L, aux

    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2), has_aux=True)

    n3hw = 3.0 * gt_image.shape[1] * gt_image.shape[2]
    nhw = float(gt_image.shape[1] * gt_image.shape[2])
    rgb_mask = (gt_image.sum(axis=0, keepdims=True)
                > rgb_boundary_threshold).astype(jnp.float32)

    def assemble_Hg(Jc, Jd, image_ab, depth, opacity, sigma):
        """IRLS normal matrix J^T diag(w) J AND gradient J^T diag(w) r
        with MOTION-FLOORED weights w = m / (|r| + eps + ||J_pose||*sigma),
        residuals from the CURRENT iterate. The ||J||*sigma floor is the
        key robustness device on textured scenes: pixels whose residual
        happens to be tiny but whose Jacobian is large (depth
        discontinuities, grazing surfaces, texture coincidences) would
        otherwise contribute J^2/eps to H — a bounded-gradient /
        quadratic-curvature imbalance that crushes the GN step (observed:
        steps 100x too small on a textured room). The floor says "this
        pixel's residual is only trusted up to the change a sigma-sized
        motion would cause"; sigma anneals geometrically
        (sigma0 * sigma_decay^iter, shared across pyramid levels), so the
        iteration is a trust-region -> IRLS homotopy. The returned g is
        the IRLS (smoothed-L1) gradient J^T W r — used by the fwd-only
        iteration phase; the exact phase overrides it with the renderer's
        analytic dL/dtau, which restores the exact L1 fixed point. Masks
        and mean normalizations mirror loss_tracking_*
        (ops/losses.py:100-130)."""
        Jc_f = Jc.reshape(8, -1)
        Jd_f = Jd.reshape(8, -1)
        jn_c = jnp.sqrt(jnp.sum(Jc[:6] * Jc[:6], axis=0))    # (3, H, W)
        jn_d = jnp.sqrt(jnp.sum(Jd[:6] * Jd[:6], axis=0))    # (1, H, W)
        r_c = image_ab - gt_image
        w_c = ((opacity * grad_mask * rgb_mask)
               / (jnp.abs(r_c) + 1e-3 + jn_c * sigma))
        w_c = (w_c if monocular else alpha * w_c) / n3hw
        H_mat = (Jc_f * w_c.reshape(1, -1)) @ Jc_f.T
        g_vec = Jc_f @ (w_c * r_c).reshape(-1)               # (8,)
        if not monocular:
            depth_mask = ((gt_depth > 0.01) & (opacity > 0.95)
                          ).astype(jnp.float32)
            r_d = depth - gt_depth
            w_d = ((1.0 - alpha) * depth_mask
                   / (jnp.abs(r_d) + 1e-3 + jn_d * sigma) / nhw)
            H_mat = H_mat + (Jd_f * w_d.reshape(1, -1)) @ Jd_f.T
            g_vec = g_vec + Jd_f @ (w_d * r_d).reshape(-1)
        H_mat = H_mat + lm_lambda * jnp.diag(
            jnp.maximum(jnp.diag(H_mat), 1e-8))
        return H_mat + 1e-8 * jnp.eye(8), g_vec

    # ---- curvature / approx-gradient sources. H_frozen (cross-frame
    # cache) is a (H, Jc, Jd) triple: J entries, when present, let the
    # fwd-only phase assemble its IRLS gradient without any probe renders.
    Jc_probe = Jd_probe = None
    if H_frozen is not None:
        H_const, Jc_probe, Jd_probe = H_frozen

        if Jc_probe is not None:
            # cached probe J: re-assemble H with CURRENT residual weights
            # every iteration (consistent with the IRLS gradient) — a
            # residual-frozen H cached at the previous frame's convergence
            # carries near-1/eps weights that crush the first steps
            def curv_grad(image_ab, depth, opacity, sigma):
                return assemble_Hg(Jc_probe, Jd_probe, image_ab, depth,
                                   opacity, sigma)
        else:
            def curv_grad(image_ab, depth, opacity, sigma):
                Jc, Jd = _flow_jacobian(cam_l, image_ab, depth, opacity)
                _, g_vec = assemble_Hg(Jc, Jd, image_ab, depth, opacity,
                                       sigma)
                return H_const, g_vec
    elif curv == "flow":
        def curv_grad(image_ab, depth, opacity, sigma):
            Jc, Jd = _flow_jacobian(cam_l, image_ab, depth, opacity)
            return assemble_Hg(Jc, Jd, image_ab, depth, opacity, sigma)
    else:  # "fd": frozen FD probe Jacobian at level entry
        out0 = render_at(jnp.zeros(6), R, t)
        base_color = out0.color
        base_depth = out0.depth
        taus = jnp.eye(6, dtype=jnp.float32) * fd_eps

        def fd_render(tau):
            o = render_at(tau, R, t)
            return o.color, o.depth

        colors_p, depths_p = jax.lax.map(fd_render, taus)
        Jc = (colors_p - base_color[None]) / fd_eps
        Jd = (depths_p - base_depth[None]) / fd_eps
        Jc = jnp.concatenate(
            [Jc, base_color[None], jnp.ones_like(base_color)[None]], axis=0)
        Jd = jnp.concatenate([Jd, jnp.zeros_like(Jd[:2])], axis=0)
        Jc_probe, Jd_probe = Jc, Jd

        def curv_grad(image_ab, depth, opacity, sigma):
            return assemble_Hg(Jc, Jd, image_ab, depth, opacity, sigma)

    if sigma_in is None:
        sigma_in = jnp.asarray(sigma0, jnp.float32)

    vg_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)

    def make_body(exact):
        def body(s):
            # Trust-region accept/reject GN: each iteration renders ONCE at
            # the probe pose P; if its loss beats the best-so-far B, P
            # becomes B (and its gradient/curvature are cached) and the
            # radius grows, otherwise the radius shrinks; the next probe
            # always steps from B along B's cached Newton direction. This
            # replaces the open-loop 0.7^k decay, which either over-damps
            # (mis-scaled first H on strongly textured scenes) or
            # under-damps (L1 zigzag), depending on the scene.
            #
            # exact=False is the IRLS phase: the render is FORWARD-ONLY
            # and the step uses g = J^T W r from the frozen/flow Jacobian
            # (classic inverse-compositional direct alignment) — no
            # backward kernel. exact=True uses the renderer's analytic
            # dL/dtau (fwd+bwd), which pins the exact L1 fixed point.
            (R_, t_, ea_, eb_, itr, conv, sigma, trust,
             RB, tB, eaB, ebB, LB, gB, HB) = s
            tau0 = jnp.zeros((6,), jnp.float32)
            if exact:
                (L_P, aux), (g_tau, g_a, g_b) = vg_fn(
                    tau0, ea_, eb_, R_, t_)
                g = jnp.concatenate([g_tau, g_a[None], g_b[None]])
                H_mat, _ = curv_grad(*aux, sigma)
            else:
                L_P, aux = loss_fn(tau0, ea_, eb_, R_, t_, plan_irls)
                H_mat, g = curv_grad(*aux, sigma)
            accept = L_P <= LB

            def sel(a, b):
                return jnp.where(accept, a, b)

            RB2 = sel(R_, RB)
            tB2 = sel(t_, tB)
            eaB2 = sel(ea_, eaB)
            ebB2 = sel(eb_, ebB)
            LB2 = sel(L_P, LB)
            gB2 = sel(g, gB)
            HB2 = sel(H_mat, HB)
            trust2 = jnp.where(accept, jnp.minimum(trust * 1.5, 1.0),
                               trust * 0.4)

            delta = jnp.linalg.solve(HB2, gB2) * trust2
            # pose-step cap: a quadratic-model step larger than the
            # texture wiggle scale can jump across the true basin into an
            # adjacent lower-loss valley (measured on the textured room
            # sequence); bounded steps recover the subgradient-descent
            # robustness the reference's Adam loop gets from its small
            # learning rates.
            pn = jnp.linalg.norm(delta[:6])
            delta = delta * jnp.minimum(
                1.0, step_cap / jnp.maximum(pn, 1e-12))
            new_tau = -delta[:6]
            # SELF-SCALED trust floor for the NEXT linearization:
            # residuals are trusted only up to the image change a
            # last-step-sized motion causes; monotone tightening toward
            # pure IRLS (exact L1 fixed point) at rate at most
            # sigma_decay.
            new_sigma = jnp.minimum(
                jnp.maximum(jnp.linalg.norm(delta[:6]), 1e-4),
                sigma * jnp.asarray(sigma_decay, jnp.float32))
            T = jnp.eye(4).at[:3, :3].set(RB2).at[:3, 3].set(tB2)
            newT = se3_exp(new_tau) @ T
            converged = (jnp.linalg.norm(new_tau) < 1e-4) & accept
            return (newT[:3, :3], newT[:3, 3],
                    eaB2 - delta[6], ebB2 - delta[7],
                    itr + 1, converged, new_sigma, trust2,
                    RB2, tB2, eaB2, ebB2, LB2, gB2, HB2)
        return body

    exact_l = max_iters if exact_iters < 0 else min(exact_iters, max_iters)
    cheap_l = max_iters - exact_l
    H0 = jnp.eye(8) if H_frozen is None else H_frozen[0]
    inf = jnp.asarray(jnp.inf, jnp.float32)
    state = (R, t, ea, eb, jnp.zeros((), jnp.int32),
             jnp.zeros((), bool), sigma_in, jnp.asarray(1.0, jnp.float32),
             R, t, ea, eb, inf, jnp.zeros(8), H0)
    iters_done = jnp.zeros((), jnp.int32)
    if cheap_l > 0:
        state = jax.lax.while_loop(
            lambda s: (s[4] < cheap_l) & ~s[5], make_body(False), state)
        iters_done = state[4]
    if exact_l > 0:
        if cheap_l > 0:
            # fresh phase: restart the iteration counter and the
            # accept/reject bests from the IRLS phase's best pose (its
            # approx-gradient cache must not seed an exact step)
            (_, _, _, _, _, _, sigma_c, trust_c,
             RB, tB, eaB, ebB, _, _, HBc) = state
            state = (RB, tB, eaB, ebB, jnp.zeros((), jnp.int32),
                     jnp.zeros((), bool), sigma_c, trust_c,
                     RB, tB, eaB, ebB, inf, jnp.zeros(8), HBc)
        state = jax.lax.while_loop(
            lambda s: (s[4] < exact_l) & ~s[5], make_body(True), state)
        iters_done = iters_done + state[4]
    (R_p, t_p, ea_p, eb_p, itr_f, _, sigma_f, _,
     RB, tB, eaB, ebB, LB, gB, HB) = state
    # the final PROBE pose may be a rejected overshoot — return the best
    return RB, tB, eaB, ebB, iters_done, (HB, Jc_probe, Jd_probe), plan, \
        sigma_f


def pair_capacity_bucket(num_pairs: int, ceiling: int,
                         quantum: int = 1 << 17) -> int:
    """Quantized pair-plan capacity for an observed pair count: 1.5x
    headroom, rounded up to ``quantum``, clamped to [quantum, ceiling].
    Shared by the frontend's adaptive ladder and bench.py (which mirrors
    production sizing)."""
    want = max(int(num_pairs) * 3 // 2, 1)
    want = -(-want // quantum) * quantum
    return min(max(want, quantum), ceiling)


@functools.partial(
    jax.jit,
    static_argnames=("monocular", "iters", "pair_capacity", "interpret",
                     "use_oracle", "tile16"))
def polish_frame(
    gm: GaussianMap,
    cam_template: Camera,
    R0: jnp.ndarray, t0: jnp.ndarray,
    ea0: jnp.ndarray, eb0: jnp.ndarray,
    gt_image: jnp.ndarray,
    gt_depth: jnp.ndarray,
    grad_mask: jnp.ndarray,
    bg: jnp.ndarray,
    rgb_boundary_threshold: float,
    alpha: float = 0.95,
    monocular: bool = False,
    iters: int = 2,
    pair_capacity: int = 1 << 20,
    interpret: bool = False,
    use_oracle: bool = False,
    tile16: bool = False,
):
    """Exact analytic-gradient polish at full resolution, from an
    already-converged IRLS pose.

    Rationale (measured, PERF.md r3): the per-iteration flow-Jacobian
    IRLS fixed point sits at the accuracy floor on converged-map scenes,
    so paying a renderer fwd+bwd every frame buys nothing — but the IRLS
    gradient is only the exact analytic dL/dtau in the limit, and pose
    bias matters exactly where a pose is persisted: keyframes (they seed
    gaussians and anchor mapping/ATE; reference eval_utils.py:29-38
    evaluates keyframe trajectories). So the frontend tracks every frame
    IRLS-only and pins the exact L1 fixed point here, on keyframe
    creation only.

    Returns (R, t, exposure_a, exposure_b, iters_done).
    """
    R, t, ea, eb, itr, _, _, _ = _gn_level(
        gm, cam_template, R0, t0, ea0, eb0, gt_image, gt_depth, grad_mask,
        bg, rgb_boundary_threshold, alpha, monocular, iters, pair_capacity,
        interpret, use_oracle, fd_eps=1e-3, lm_lambda=1e-2, radius_pad=2.0,
        H_frozen=None, curv="flow", sigma0=1e-3, sigma_decay=0.8,
        sigma_in=None, step_cap=0.05, exact_iters=iters, tile16=tile16)
    return R, t, ea, eb, itr


def _strip_J(entry):
    """Cross-LEVEL H reuse: the coarser level's normal matrix transfers
    (mean-normalized entries are resolution-invariant) but its probe
    Jacobian is level-resolution-shaped and does not."""
    return (entry[0], None, None)


@functools.partial(
    jax.jit,
    static_argnames=("monocular", "levels", "level_iters", "probe_levels",
                     "curv", "kernel_bf16", "kernel_mxu", "sigma0",
                     "sigma_decay", "step_cap", "level_exact", "tile16",
                     "plan_pad", "pair_capacity", "pair_capacity_ceiling",
                     "level_caps", "level_subset", "interpret",
                     "use_oracle", "nt_weight", "final_level",
                     "match_blur"))
def track_frame_pyr(
    gm: GaussianMap,
    cam_template: Camera,
    R0: jnp.ndarray, t0: jnp.ndarray,
    gt_image: jnp.ndarray,
    gt_depth: jnp.ndarray,
    grad_mask: jnp.ndarray,
    bg: jnp.ndarray,
    lr_rot: float, lr_trans: float,   # API parity; unused
    rgb_boundary_threshold: float,
    alpha: float = 0.95,
    monocular: bool = False,
    max_iters: int = 20,              # API parity; per-level counts below
    pair_capacity: int = 1 << 20,
    interpret: bool = False,
    use_oracle: bool = False,
    fd_eps: float = 1e-3,
    lm_lambda: float = 1e-2,
    levels: tuple = (4, 2, 1),
    level_iters: tuple = (5, 3, 12),
    probe_levels: str = "coarse",
    curv: str = "fd",
    kernel_bf16: bool = False,
    kernel_mxu: bool = False,
    sigma0: float = 0.01,
    sigma_decay: float = 0.8,
    step_cap: float = 0.05,
    level_exact: tuple = None,
    tile16: bool = False,
    plan_pad: float = 8.0,
    H_in=None,
    pair_capacity_ceiling: int = 0,
    level_caps: tuple = None,
    level_subset: tuple = None,
    plan_in=None,
    track_mask=None,
    nt_weight: bool = False,
    final_level: int = 1,
    match_blur: bool = False,
):
    """Coarse-to-fine IRLS Gauss-Newton tracker.

    The per-frame cost of track_frame_gn is dominated by full-resolution
    render fwd+bwd passes. A resolution pyramid makes the early iterations
    ~s^2 cheaper: levels run coarse-to-fine with warm-started pose and
    exposure; the FD curvature probes run only on levels with s > 1 (the
    finest level reuses the coarser level's normal matrix — its
    mean-normalized entries are resolution-invariant), so NO full-res
    probe renders are ever issued. The finest level still iterates with
    the exact full-resolution analytic gradient, so the fixed point
    matches track_frame_gn's up to its convergence tolerance.

    ``level_exact`` (per-level, default = level_iters) caps how many
    TRAILING iterations of each level use the exact analytic dL/dtau
    (renderer fwd+bwd); the earlier iterations run the IRLS step
    g = J^T W r from the frozen probe Jacobian with FORWARD-ONLY renders
    (inverse-compositional direct alignment) — ~2.5x cheaper per
    iteration. Levels that run IRLS iterations probe J at their own
    resolution (and the probe J rides the cross-frame cache with H).

    The reference has no pyramid (slam_frontend.py:128-196 runs ~100 Adam
    iterations at full res); this is a TPU-side redesign of the same
    optimization problem, converging to the same loss minimum.
    """
    del lr_rot, lr_trans, max_iters

    R, t = R0, t0
    ea = jnp.zeros(())
    eb = jnp.zeros(())
    total_iters = jnp.zeros((), jnp.int32)
    if level_exact is None:
        level_exact = level_iters
    H_prev = None
    plan_s1 = None
    sigma_prev = None
    H_out = []
    # per-level pair-plan overflow: coarse levels run at a reduced pair
    # capacity and a silent overflow there corrupts the IRLS gradient
    # long before the (checked) full-res render overflows — surface it
    lvl_overflow = []
    # per-level emitted pair counts: feeds the frontend's per-level
    # adaptive capacity ladder (coarse counts track the visible-gaussian
    # count, fine counts the pixel occupancy — independent quantities)
    lvl_pairs = []
    # per-level plans actually used (returned for cross-frame reuse; the
    # frontend hands them back via ``plan_in`` while its flow estimate
    # stays under the plan pad)
    plans_out = []

    for li, (s, iters_l) in enumerate(zip(levels, level_iters)):
        if iters_l <= 0:
            H_out.append((jnp.eye(8), None, None) if H_in is None
                         else H_in[li])
            lvl_overflow.append(jnp.zeros((), jnp.int32))
            lvl_pairs.append(jnp.zeros((), jnp.int32))
            plans_out.append(None if plan_in is None else plan_in[li])
            continue
        exact_l = min(int(level_exact[li]), iters_l)
        need_J = exact_l < iters_l and curv == "fd"
        cam_l = _cam_level(cam_template, s)
        if s == 1:
            gt_i, gt_d, gm_l = gt_image, gt_depth, grad_mask
        else:
            gt_i = _pool_avg(gt_image, s)
            gt_d = _stride_center(gt_depth, s)
            gm_l = _pool_max(grad_mask, s)
        # Per-level plan capacity: explicit ``level_caps`` (the frontend's
        # per-level adaptive ladder — coarse pair counts track the
        # VISIBLE GAUSSIAN count while fine counts track pixel occupancy,
        # so each level sizes off its own observed emission). Fallback:
        # ceiling/2 for coarse levels, which never overflowed in r2/r3.
        if level_caps is not None:
            cap_l = level_caps[li]
        else:
            ceil_cap = max(pair_capacity, pair_capacity_ceiling)
            cap_l = (pair_capacity if s == 1
                     else max(min(ceil_cap, 1 << 17), ceil_cap // 2))
        if H_in is not None and curv != "flow":
            # cross-frame curvature reuse: viewpoints move slowly, so the
            # previous frame's per-level normal matrices (and probe
            # Jacobians) stay valid; the frontend re-probes every few
            # frames
            probes_here = False
            H_frozen = H_in[li]
        elif curv == "flow":
            probes_here = True       # flow curvature is per-iteration free
            H_frozen = None
        elif probe_levels == "first":
            probes_here = H_prev is None or need_J
            H_frozen = None if probes_here else _strip_J(H_prev)
        elif probe_levels == "all":
            # fresh FD probes at EVERY level, including full res: the
            # warm-started fine levels re-linearize near the optimum
            # (measured: does not move the ~4 mm floor — kept as an option)
            probes_here = True
            H_frozen = None
        else:  # "coarse": re-probe at every level except the finest —
            # unless the finest runs IRLS iterations, which need J at
            # their own resolution
            probes_here = s > 1 or H_prev is None or need_J
            H_frozen = None if probes_here else _strip_J(H_prev)
        # ``match_blur``: scale the EWA low-pass so the level render's
        # blur matches the avg-pooled gt's — the gt formation is
        # (full-res image incl. its own ~0.3 px^2 dilation) box-filtered
        # by s x s (variance (s^2-1)/12), all divided by s^2 into level
        # pixels; the default +0.3 at level intrinsics is ~2x blurrier
        # at s=2, which biases the coarse photometric fixed point
        # (measured 6 mm on the bench room at s2-only, PERF.md r4)
        lp_l = ((0.3 + (s * s - 1) / 12.0) / (s * s)
                if match_blur and s > 1 else 0.3)
        R, t, ea, eb, itr_l, H_prev, plan_l, sigma_prev = _gn_level(
            gm, cam_l, R, t, ea, eb, gt_i, gt_d, gm_l, bg,
            rgb_boundary_threshold, alpha, monocular, iters_l, cap_l,
            interpret, use_oracle, fd_eps, lm_lambda,
            radius_pad=max(2.0, plan_pad / s),
            H_frozen=H_frozen, curv=curv,
            bf16=kernel_bf16, mxu=kernel_mxu, low_pass=lp_l, sigma0=sigma0,
            sigma_decay=sigma_decay, sigma_in=sigma_prev,
            step_cap=step_cap, exact_iters=exact_l, tile16=tile16,
            subset_frac=(1.0 if level_subset is None
                         else float(level_subset[li])),
            plan_in=None if plan_in is None else plan_in[li],
            track_mask=track_mask)
        total_iters = total_iters + itr_l
        H_out.append(H_prev)
        plans_out.append(plan_l)
        lvl_overflow.append(jnp.zeros((), jnp.int32) if plan_l is None
                            else plan_l.overflow)
        lvl_pairs.append(jnp.zeros((), jnp.int32) if plan_l is None
                         else plan_l.num_pairs)
        if s == final_level:
            plan_s1 = plan_l
            cap_final = cap_l

    # The finest-level plan (built with a pose-drift pad) stays a valid
    # superset at the converged pose — reuse it for the keyframing render.
    # ``nt_weight``: visibility-cull refresh frames count n_touched at the
    # blend-weight threshold instead of the reference's T > 0.5 rule (see
    # tile_kernel2.make_forward_kernel) — the T > 0.5 set drops back-layer
    # splats that still carry up to half a pixel's color, and masking on
    # it diverges on translucent scenes (tests/test_tracking.py).
    # ``final_level``: resolution of this keyframing render. Its per-
    # gaussian outputs (n_touched visibility -> overlap ratios, median
    # depth) are resolution-insensitive, so a fine-at-s2 schedule can run
    # the WHOLE per-frame loop at half resolution; the frontend re-renders
    # full-res only on actual keyframe creation (depth seeding needs
    # per-pixel depth; slam/frontend.py add_new_keyframe).
    if plan_s1 is None:
        cap_final = pair_capacity
    cam = _cam_level(cam_template, final_level).replace(R=R, t=t)
    out = render(gm, cam, None, bg, pair_capacity=cap_final,
                 interpret=interpret, use_oracle=use_oracle,
                 plan=plan_s1, tile16=tile16,
                 nt_weight=nt_weight and not use_oracle)
    med = losses.median_depth(out.depth, out.opacity)
    num_pairs = (jnp.zeros((), jnp.int32) if plan_s1 is None
                 else plan_s1.num_pairs)
    return (R, t, ea, eb, total_iters, out, med, tuple(H_out),
            jnp.stack(lvl_overflow), num_pairs, jnp.stack(lvl_pairs),
            tuple(plans_out))
