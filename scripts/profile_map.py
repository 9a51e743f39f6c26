#!/usr/bin/env python
"""Per-stage profile of the backend keyframe path at artifact scale, on
the real chip: mapping_steps batches, plan amortization, the final
n_touched renders, seeding, KFStore.add and extend.

Tunnel-safe timing: reps are chained through a tiny input perturbation
(dedup defeat) and synced with one scalar pull (see PERF.md).

Usage: python scripts/profile_map.py [N_active] [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsslam_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import make_room_map
from gs_slam_analytica_jacobian_tpu.models import gaussian_map as gmap
from gs_slam_analytica_jacobian_tpu.models.camera import Camera
from gs_slam_analytica_jacobian_tpu.slam import mapping, seeding
from gs_slam_analytica_jacobian_tpu.slam.mapping import (KFStore,
                                                         PoseAdamState)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
T = int(sys.argv[2]) if len(sys.argv) > 2 else 8
W, H = 1216, 672
F = 8
N_WINDOW = 6
CAP_PAIRS = 1 << 20

rng = np.random.default_rng(0)
gm = gmap.from_numpy(**make_room_map(N, rng), max_sh_degree=0)
print(f"N={N} capacity={gm.capacity} T={T} F={F}", flush=True)
adam = gmap.adam_init(gm)
cam = Camera.create(np.eye(3), np.zeros(3), 600.0, 600.0, 607.5, 335.5,
                    W, H)

store = KFStore.empty(16, H, W)
for i in range(F):
    t = np.zeros(3, np.float32)
    t[0] = 0.01 * i
    store = store.add(
        i, jnp.eye(3), jnp.asarray(t), 0.0, 0.0,
        jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32)),
        jnp.asarray(rng.uniform(1, 5, size=(1, H, W)).astype(np.float32)),
        i)

window_idx = jnp.tile(jnp.arange(F, dtype=jnp.int32)[None], (T, 1))
valid = jnp.ones((F,), bool)
opt_pose = jnp.zeros((F,), bool).at[1:N_WINDOW].set(True)
lrs = {f: 1e-3 for f in gmap.PARAM_FIELDS}


def sync(x):
    return float(jnp.sum(x.ravel()[:1]))


def timeit(name, fn, reps=3):
    out = fn(jnp.zeros(()))          # warm/compile
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    eps = jnp.zeros(())
    for _ in range(reps):
        out = fn(eps)
        leaf = jax.tree_util.tree_leaves(out)[0]
        eps = (leaf.ravel()[0] * 1e-30).astype(jnp.float32)
    sync(leaf)
    dt = (time.time() - t0) / reps
    print(f"{name:34s} {dt*1000:9.1f} ms", flush=True)
    return dt


def run_steps(eps):
    return mapping.mapping_steps(
        gm.replace(xyz=gm.xyz + eps), adam, store, window_idx, valid,
        opt_pose, opt_pose, PoseAdamState.zero(F), cam, jnp.zeros(3),
        lrs, jnp.full((T,), 1e-4), 1e-3, 1e-3, 0.01,
        n_window=N_WINDOW, pair_capacity=CAP_PAIRS).gm.xyz


dt_steps = timeit(f"mapping_steps T={T} (F={F})", run_steps)
print(f"  -> per iter: {dt_steps/T*1000:.1f} ms   "
      f"per frame-iter: {dt_steps/T/F*1000:.1f} ms", flush=True)

# plan build alone
from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gmath
from gs_slam_analytica_jacobian_tpu.ops.renderer_tiled import make_plan


@jax.jit
def plans_only(eps):
    g = gm.replace(xyz=gm.xyz + eps)

    def build_plan(idx):
        c = cam.replace(R=store.R[idx], t=store.t[idx])
        prep = gmath.preprocess(
            g.xyz, g.get_cov6(), g.get_opacity(), g.get_features(),
            g.active_sh_degree, c.w2c(), c.projection(),
            jnp.zeros((6,), jnp.float32), c.fx, c.fy, c.width, c.height,
            c.tanfovx, c.tanfovy)
        return make_plan(prep, c.width, c.height, CAP_PAIRS,
                         active=g.active, radius_scale=1.1, radius_pad=6.0)

    return jax.lax.map(build_plan, window_idx[0, :N_WINDOW]).pair_gid1


timeit(f"window plans build ({N_WINDOW})", plans_only)

# plan overflow / pair saturation check
from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as _gm2
_prep = _gm2.preprocess(
    gm.xyz, gm.get_cov6(), gm.get_opacity(), gm.get_features(),
    gm.active_sh_degree, cam.w2c(), cam.projection(),
    jnp.zeros((6,), jnp.float32), cam.fx, cam.fy, cam.width, cam.height,
    cam.tanfovx, cam.tanfovy)
_plan = make_plan(_prep, cam.width, cam.height, CAP_PAIRS,
                  active=gm.active, radius_scale=1.1, radius_pad=6.0)
print(f"plan: num_pairs={int(_plan.num_pairs)} overflow={int(_plan.overflow)} "
      f"cap={CAP_PAIRS}", flush=True)

# one frame fwd+bwd with the mapping loss (the inner unit of _mapping_iter)
from gs_slam_analytica_jacobian_tpu.ops import losses as _losses
from gs_slam_analytica_jacobian_tpu.slam.render_api import render


@jax.jit
def one_frame_grad(eps):
    def loss(xyz):
        g = gm.replace(xyz=xyz)
        out = render(g, cam, None, jnp.zeros(3), pair_capacity=CAP_PAIRS,
                     need_n_touched=False)
        return _losses.loss_mapping_rgbd(
            out.color, out.depth, store.image(0), store.depth(0),
            0.01, 0.95)
    return jax.grad(loss)(gm.xyz + eps)


timeit("single frame mapping fwd+bwd", one_frame_grad)


@jax.jit
def one_frame_fwd(eps):
    g = gm.replace(xyz=gm.xyz + eps)
    return render(g, cam, None, jnp.zeros(3), pair_capacity=CAP_PAIRS,
                  need_n_touched=False).color


timeit("single frame fwd only", one_frame_fwd)

# final n_touched renders
from gs_slam_analytica_jacobian_tpu.slam.render_api import render


@jax.jit
def nt_only(eps):
    g = gm.replace(xyz=gm.xyz + eps)

    def nt_frame(idx):
        c = cam.replace(R=store.R[idx], t=store.t[idx])
        return render(g, c, None, jnp.zeros(3),
                      pair_capacity=CAP_PAIRS).n_touched

    return jax.lax.map(nt_frame, window_idx[-1])


timeit(f"n_touched renders ({F})", nt_only)

# seeding (eager path, as the backend calls it)
depth_map = jnp.asarray(rng.uniform(1, 5, size=(H, W)).astype(np.float32))
image = store.image(0)
key = jax.random.PRNGKey(0)


def run_seed(eps):
    return seeding.seed_from_frame(
        image, depth_map + eps, cam, jnp.eye(4), 3, key, 64.0,
        0.05, True, 0).xyz


timeit("seed_from_frame (downsample 64)", run_seed)


def run_extend(eps):
    block = seeding.seed_from_frame(
        image, depth_map + eps, cam, jnp.eye(4), 3, key, 64.0,
        0.05, True, 0)
    g2, _, ov = gmap.extend(gm, adam, block)
    return g2.xyz


timeit("seed + extend", run_extend)


def run_store_add(eps):
    return store.add(9, jnp.eye(3), jnp.zeros(3) + eps, 0.0, 0.0,
                     image, depth_map[None], 9).t


timeit("KFStore.add (M=16)", run_store_add)
