#!/usr/bin/env python
"""TPU smoke test: tiled renderer fwd+bwd on the real chip, timed.

Timing methodology (see scripts/profile_micro.py): the axon tunnel dedups
identical dispatches and block_until_ready is unreliable, so we time a
jitted fori_loop running R data-dependent iterations on device and
difference against a 1-iteration run, syncing via a scalar pull.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsslam_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gm
from gs_slam_analytica_jacobian_tpu.ops import camera_math as cm
from gs_slam_analytica_jacobian_tpu.ops import renderer_tiled
from gs_slam_analytica_jacobian_tpu.ops.binning2 import plan_pairs
from gs_slam_analytica_jacobian_tpu.ops.pallas.tile_kernel2 import (
    TPX, TPY, K)

print("devices:", jax.devices())

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
PAIR_CAP = int(os.environ.get("PAIR_CAP", 1 << 19))
STAGES = set((sys.argv[2] if len(sys.argv) > 2 else "fwd,fwdplan,bwd,bwdplan"
              ).split(","))
W, H = 1200, 680
fx = fy = 600.0
cx, cy = 599.5, 339.5

rng = np.random.default_rng(0)
means = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
means[:, 2] = rng.uniform(0.5, 6.0, size=N)
scales = np.exp(rng.normal(size=(N, 3)).astype(np.float32) * 0.3 - 4.0)
quats = rng.normal(size=(N, 4)).astype(np.float32)
opac = 1 / (1 + np.exp(-rng.normal(size=N).astype(np.float32)))
shs = (rng.normal(size=(N, 1, 3)) * 0.3).astype(np.float32)
w2c = np.eye(4, dtype=np.float32)
proj = cm.projection_matrix(0.01, 100.0, cx, cy, fx, fy, W, H)
bg = jnp.zeros(3)

cov6 = gm.build_cov3d(jnp.asarray(scales), jnp.asarray(quats))
means_j = jnp.asarray(means)
opac_j = jnp.asarray(opac)
shs_j = jnp.asarray(shs)
w2c_j = jnp.asarray(w2c)
proj_j = jnp.asarray(proj)
kw = dict(fx=fx, fy=fy, width=W, height=H, tanfovx=W / (2 * fx),
          tanfovy=H / (2 * fy), bg=bg, pair_capacity=PAIR_CAP)
R = 8


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].ravel()[:1]))


def timeloop(label, step, carry0):
    """step: (i, carry) -> carry. Times R chained on-device iterations."""
    def runner(reps):
        @jax.jit
        def run(carry):
            return jax.lax.fori_loop(0, reps, step, carry)
        return run
    r1, rR = runner(1), runner(R)
    c = r1(carry0)
    sync(c)
    c = rR(carry0)
    sync(c)
    t0 = time.time(); sync(r1(carry0)); t1 = time.time() - t0
    t0 = time.time(); out = rR(carry0); sync(out); tR = time.time() - t0
    per = (tR - t1) / (R - 1) * 1000
    print(f"{label:34s} {per:9.2f} ms   (t1={t1*1000:.1f} tR={tR*1000:.1f})", flush=True)
    return out


# ---- forward ----
def fwd_step(i, carry):
    tau = carry * 1e-6
    out = renderer_tiled.render(
        means_j, cov6, opac_j, shs_j, 0, w2c_j, proj_j, tau, **kw)
    return tau * 0 + jnp.mean(out.color) * 0 + jnp.zeros(6)


out0 = renderer_tiled.render(
    means_j, cov6, opac_j, shs_j, 0, w2c_j, proj_j, jnp.zeros(6), **kw)
print("color mean:", float(out0.color.mean()),
      "opacity mean:", float(out0.opacity.mean()),
      "touched:", int((out0.n_touched > 0).sum()),
      "overflow:", int(out0.overflow), flush=True)
assert int(out0.overflow) == 0, "pair capacity overflow in smoke scene"

if "fwd" in STAGES:
    timeloop("full render fwd", fwd_step, jnp.zeros(6))


# ---- forward, amortized plan ----
prep0 = gm.preprocess(means_j, cov6, opac_j, shs_j, 0, w2c_j, proj_j,
                      jnp.zeros(6), fx, fy, W, H, kw["tanfovx"],
                      kw["tanfovy"])
n_tx, n_ty = renderer_tiled._grid_dims(W, H)
plan0 = plan_pairs(prep0, TPX, TPY, n_tx, n_ty, PAIR_CAP, chunk=K,
                   radius_pad=8.0)


def fwd_plan_step(i, carry):
    tau = carry * 1e-6
    out = renderer_tiled.render(
        means_j, cov6, opac_j, shs_j, 0, w2c_j, proj_j, tau, **kw,
        plan=plan0, need_n_touched=False)
    return tau * 0 + jnp.mean(out.color) * 0 + jnp.zeros(6)


if "fwdplan" in STAGES:
    timeloop("fwd (amortized plan)", fwd_plan_step, jnp.zeros(6))


# ---- fwd+bwd ----
def loss(tau, m3d, c6, op):
    out = renderer_tiled.render(
        m3d, c6, op, shs_j, 0, w2c_j, proj_j, tau, **kw,
        need_n_touched=False)
    return jnp.mean(jnp.abs(out.color)) + jnp.mean(out.depth) * 0.1


grad_all = jax.grad(loss, argnums=(0, 1, 2, 3))


def bwd_step(i, carry):
    g = grad_all(carry * 1e-6, means_j, cov6, opac_j)
    return g[0] * 0 + jnp.zeros(6)


if "bwd" in STAGES:
    g = grad_all(jnp.zeros(6), means_j, cov6, opac_j)
    for name, gi in zip(["tau", "means", "cov6", "opac"], g):
        arr = np.asarray(gi)
        assert np.all(np.isfinite(arr)), name
    print("dtau:", np.asarray(g[0]), flush=True)
    timeloop("full render fwd+bwd", bwd_step, jnp.zeros(6))


# ---- fwd+bwd with amortized plan (tracking inner loop shape) ----
def loss_plan(tau):
    out = renderer_tiled.render(
        means_j, cov6, opac_j, shs_j, 0, w2c_j, proj_j, tau, **kw,
        plan=plan0, need_n_touched=False)
    return jnp.mean(jnp.abs(out.color)) + jnp.mean(out.depth) * 0.1


grad_tau = jax.grad(loss_plan)


def bwd_plan_step(i, carry):
    return grad_tau(carry * 1e-6) * 0 + jnp.zeros(6)


if "bwdplan" in STAGES:
    gt = grad_tau(jnp.zeros(6))
    print("dtau (amortized):", np.asarray(gt), flush=True)
    assert np.all(np.isfinite(np.asarray(gt)))
    timeloop("fwd+bwd (amortized plan)", bwd_plan_step, jnp.zeros(6))
print("OK")
