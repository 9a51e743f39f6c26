#!/usr/bin/env python
"""mapping_steps timing the way the BACKEND calls it: state chained
through consecutive calls (no dedup possible), one scalar sync per
measurement. Compares T=1 vs T=8 and capacity alignment.

Usage: python scripts/profile_map2.py [N_active]
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
from gs_slam_analytica_jacobian_tpu.slam import mapping
from gs_slam_analytica_jacobian_tpu.slam.mapping import (KFStore,
                                                         PoseAdamState)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
W, H = 1216, 672
F = 8
N_WINDOW = 6
CAP_PAIRS = 1 << 20

rng = np.random.default_rng(0)
gm0 = gmap.from_numpy(**make_room_map(N, rng), max_sh_degree=0)
adam0 = gmap.adam_init(gm0)
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

valid = jnp.ones((F,), bool)
opt_pose = jnp.zeros((F,), bool).at[1:N_WINDOW].set(True)
lrs = {f: 1e-6 for f in gmap.PARAM_FIELDS}


def sync(x):
    return float(jnp.sum(x.ravel()[:1]))


def measure(gm, adam, T, label, rounds=3):
    widx = jnp.tile(jnp.arange(F, dtype=jnp.int32)[None], (T, 1))

    def one(gm, adam, pose):
        out = mapping.mapping_steps(
            gm, adam, store, widx, valid, opt_pose, opt_pose,
            pose, cam, jnp.zeros(3), lrs, jnp.full((T,), 1e-6),
            1e-6, 1e-6, 0.01, n_window=N_WINDOW,
            pair_capacity=CAP_PAIRS)
        return out.gm, out.gm_adam, out.pose_adam

    pose = PoseAdamState.zero(F)
    g, a, pose = one(gm, adam, pose)     # compile + warm
    sync(g.xyz)
    t0 = time.time()
    for _ in range(rounds):
        g, a, pose = one(g, a, pose)
        sync(g.xyz)                      # backend-style sync each call
    dt = (time.time() - t0) / rounds
    print(f"{label}: {dt*1000:9.1f} ms/call  "
          f"({dt/T*1000:7.1f} ms/iter, {dt/T/F*1000:6.1f} ms/frame-iter)",
          flush=True)


print(f"capacity={gm0.capacity}", flush=True)
measure(gm0, adam0, 1, "T=1 cap=unaligned")
measure(gm0, adam0, 8, "T=8 cap=unaligned")

# pow2-aligned capacity (what the real runs use)
gm1, adam1 = gmap.grow(gm0, adam0, 1 << 17)
print(f"capacity={gm1.capacity}", flush=True)
measure(gm1, adam1, 1, "T=1 cap=131072")
measure(gm1, adam1, 8, "T=8 cap=131072")
