#!/usr/bin/env python
"""TPU smoke test: tiled renderer fwd+bwd on the real chip, timed."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gs_slam_analytica_jacobian_tpu.ops import gaussian_math as gm
from gs_slam_analytica_jacobian_tpu.ops import camera_math as cm
from gs_slam_analytica_jacobian_tpu.ops import renderer_tiled

print("devices:", jax.devices())

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
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
args = (jnp.asarray(means), cov6, jnp.asarray(opac), jnp.asarray(shs), 0,
        jnp.asarray(w2c), jnp.asarray(proj), jnp.zeros(6))
kw = dict(fx=fx, fy=fy, width=W, height=H, tanfovx=W / (2 * fx),
          tanfovy=H / (2 * fy), bg=bg, pair_capacity=1 << 21)

t0 = time.time()
out = renderer_tiled.render(*args, **kw)
jax.block_until_ready(out.color)
print(f"fwd compile+run: {time.time()-t0:.2f}s")

t0 = time.time()
for _ in range(10):
    out = renderer_tiled.render(*args, **kw)
jax.block_until_ready(out.color)
print(f"fwd steady: {(time.time()-t0)/10*1000:.2f} ms")
print("color mean:", float(out.color.mean()), "opacity mean:",
      float(out.opacity.mean()), "touched:", int((out.n_touched > 0).sum()))


def loss(means3d, cov6_, opa, tau):
    o = renderer_tiled.render(means3d, cov6_, opa, args[3], 0, args[5],
                              args[6], tau, **kw)
    return jnp.mean(jnp.abs(o.color)) + jnp.mean(o.depth) * 0.1


grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
t0 = time.time()
g = grad_fn(args[0], cov6, args[2], jnp.zeros(6))
jax.block_until_ready(g)
print(f"bwd compile+run: {time.time()-t0:.2f}s")
t0 = time.time()
for _ in range(10):
    g = grad_fn(args[0], cov6, args[2], jnp.zeros(6))
jax.block_until_ready(g)
print(f"fwd+bwd steady: {(time.time()-t0)/10*1000:.2f} ms")
print("dtau:", np.asarray(g[3]))
for name, gi in zip(["means", "cov6", "opac", "tau"], g):
    arr = np.asarray(gi)
    assert np.all(np.isfinite(arr)), name
print("OK")
