#!/usr/bin/env python
"""Decompose one tracking iteration's cost on the real TPU (in-jit loops)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsslam_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gs_slam_analytica_jacobian_tpu.ops import camera_math as cm
from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gm
from gs_slam_analytica_jacobian_tpu.ops import losses
from gs_slam_analytica_jacobian_tpu.ops.binning2 import plan_pairs
from gs_slam_analytica_jacobian_tpu.ops.pair_gather import pair_gather
from gs_slam_analytica_jacobian_tpu.ops.pallas.tile_kernel2 import (
    TPX, TPY, K, composite32)
from gs_slam_analytica_jacobian_tpu.ops.renderer_tiled import (
    _grid_dims, pack_table)

print("devices:", jax.devices())

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
PAIR_CAP = int(os.environ.get("PAIR_CAP", 1 << 20))
W, H = 1200, 680
fx = fy = 600.0
cx, cy = 599.5, 339.5
R = 8

rng = np.random.default_rng(0)
means = np.stack([rng.uniform(-4, 4, N), rng.uniform(-2.5, 2.5, N),
                  rng.uniform(0.4, 8.0, N)], -1).astype(np.float32)
scales = np.exp(rng.normal(size=(N, 3)).astype(np.float32) * 0.3 - 4.0)
quats = rng.normal(size=(N, 4)).astype(np.float32)
opac = 1 / (1 + np.exp(-rng.normal(size=N).astype(np.float32)))
shs = (rng.normal(size=(N, 1, 3)) * 0.3).astype(np.float32)
w2c = jnp.asarray(np.eye(4, dtype=np.float32))
proj = jnp.asarray(cm.projection_matrix(0.01, 100.0, cx, cy, fx, fy, W, H))
tanfovx, tanfovy = W / (2 * fx), H / (2 * fy)

cov6 = gm.build_cov3d(jnp.asarray(scales), jnp.asarray(quats))
means_j = jnp.asarray(means)
opac_j = jnp.asarray(opac)
shs_j = jnp.asarray(shs)
n_tx, n_ty = _grid_dims(W, H)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].ravel()[:1]))


def timeloop(label, step, carry0):
    def runner(reps):
        @jax.jit
        def run(carry):
            return jax.lax.fori_loop(0, reps, step, carry)
        return run
    r1, rR = runner(1), runner(R)
    sync(r1(carry0)); sync(rR(carry0))
    t0 = time.time(); sync(r1(carry0)); t1 = time.time() - t0
    t0 = time.time(); sync(rR(carry0)); tR = time.time() - t0
    per = (tR - t1) / (R - 1) * 1000
    print(f"{label:36s} {per:9.2f} ms", flush=True)


def do_preprocess(tau):
    return gm.preprocess(means_j, cov6, opac_j, shs_j, 0, w2c, proj, tau,
                         fx, fy, W, H, tanfovx, tanfovy)


# plan once
prep0 = do_preprocess(jnp.zeros(6))
plan = plan_pairs(prep0, TPX, TPY, n_tx, n_ty, PAIR_CAP, chunk=K,
                  radius_pad=8.0)
print("num_pairs:", int(plan.num_pairs), "overflow:", int(plan.overflow),
      "B_al:", plan.pair_gid1.shape[0], flush=True)

# 0. plan cost itself
timeloop("plan_pairs (per frame)",
         lambda i, c: plan_pairs(
             prep0._replace(depth=prep0.depth + c * 1e-9),
             TPX, TPY, n_tx, n_ty, PAIR_CAP, chunk=K,
             radius_pad=8.0).num_pairs.astype(jnp.float32),
         jnp.zeros(()))

# 1. preprocess fwd
timeloop("preprocess fwd",
         lambda i, c: jnp.mean(do_preprocess(c * 1e-9).mean2d) * 0
         + jnp.zeros(6), jnp.zeros(6))


# 2. preprocess fwd+bwd (cotangent on packed table)
def prep_grad_step(i, c):
    def f(tau):
        return jnp.sum(pack_table(do_preprocess(tau)) * 1e-6)
    return jax.grad(f)(c * 1e-9) * 0 + jnp.zeros(6)


timeloop("preprocess+pack fwd+bwd", prep_grad_step, jnp.zeros(6))

# 3. pair gather fwd
table0 = pack_table(prep0)


def gather_step(i, c):
    feat = pair_gather(table0 + c, plan)
    return jnp.sum(feat[:1, :1]) * 0


timeloop("pair_gather fwd", gather_step, jnp.zeros(()))


# 4. pair gather fwd+vjp
def gather_grad_step(i, c):
    def f(t):
        return jnp.sum(pair_gather(t, plan) * 1e-6)
    g = jax.grad(f)(table0 + c)
    return jnp.sum(g[:1, :1]) * 0


timeloop("pair_gather fwd+vjp", gather_grad_step, jnp.zeros(()))

# 5. composite fwd
feat0 = pair_gather(table0, plan)


def comp_step(i, c):
    out = composite32(feat0 + c, plan.ranges, n_tx, n_ty, W, H, False)
    return jnp.sum(out.color_sum[:1, :1, :1]) * 0


timeloop("composite32 fwd", comp_step, jnp.zeros(()))


# 6. composite fwd+bwd
def comp_grad_step(i, c):
    def f(ft):
        o = composite32(ft, plan.ranges, n_tx, n_ty, W, H, False)
        return (jnp.mean(jnp.abs(o.color_sum)) + jnp.mean(o.depth_sum) * 0.1
                + jnp.mean(o.final_T) * 0.01)
    g = jax.grad(f)(feat0 + c)
    return jnp.sum(g[:1, :1]) * 0


timeloop("composite32 fwd+bwd", comp_grad_step, jnp.zeros(()))

# 7. tracking loss eval on images
img0 = jnp.clip(jnp.abs(jnp.sin(jnp.arange(3 * H * W, dtype=jnp.float32)
                                .reshape(3, H, W))), 0, 1)
dep0 = img0[:1] * 3
msk0 = jnp.ones((1, H, W))


def loss_step(i, c):
    im = img0 + c
    L = losses.loss_tracking_rgbd(im, dep0, img0, dep0, img0[:1], msk0,
                                  0.01, 0.95)
    return L * 0


timeloop("tracking loss (images only)", loss_step, jnp.zeros(()))
print("done")
