#!/usr/bin/env python
"""Micro-benchmarks for the TPU op-cost model (axon-tunnel-safe).

METHODOLOGY: block_until_ready is unreliable through the tunnel and the
first d2h sync pays giant latency. So: (1) warm up + drain with a scalar
float() sync, (2) time a jit running the op chained R times vs 1 time,
(3) report (T_R - T_1)/(R-1). Every timed program ends in a scalar reduce
pulled to host.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())
R = 9


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0][..., :1].astype(jnp.float32)))


def measure(label, make_fn, args):
    """make_fn(reps) -> jitted fn(*args) running the op `reps` chained
    times, returning something small."""
    f1, fR = make_fn(1), make_fn(R)
    sync(f1(*args)); sync(fR(*args))          # compile + drain
    t0 = time.time(); sync(f1(*args)); t1 = time.time() - t0
    t0 = time.time(); sync(fR(*args)); tR = time.time() - t0
    # second pass for stability
    t0 = time.time(); sync(f1(*args)); t1 = min(t1, time.time() - t0)
    t0 = time.time(); sync(fR(*args)); tR = min(tR, time.time() - t0)
    per = (tR - t1) / (R - 1) * 1000
    print(f"{label:52s} {per:10.3f} ms   (t1={t1*1000:.1f} tR={tR*1000:.1f})")
    return per


rng = np.random.default_rng(0)
N = 100_000

for B in (1 << 19, 1 << 21):
    tag = f"B={B>>10}k"
    keys = jnp.asarray(rng.integers(0, 850, B), jnp.int32)
    dkeys = jnp.asarray(rng.random(B), jnp.float32)
    pay = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    table16 = jnp.asarray(rng.random((N, 16)), jnp.float32)
    rows16 = jnp.asarray(rng.random((B, 16)), jnp.float32)
    upd_pos = jnp.asarray(np.sort(rng.choice(B, N, replace=False)), jnp.int32)
    sorted_offs = jnp.sort(pay)[:N]

    def mk_sort(reps):
        @jax.jit
        def f(k, d, p):
            for _ in range(reps):
                k, d, p = jax.lax.sort((k, d, p), num_keys=2)
                k = (k + 1) % 850
            return k[:8]
        return f
    measure(f"{tag} sort 2key+payload", mk_sort, (keys, dkeys, pay))

    def mk_gather(reps):
        @jax.jit
        def f(t, i):
            acc = jnp.zeros((B, 16))
            for r in range(reps):
                acc = acc + t[(i + r) % N]
            return acc[:8, 0]
        return f
    measure(f"{tag} gather (B,16) packed", mk_gather, (table16, pay))

    def mk_cumsum(reps):
        @jax.jit
        def f(x):
            for _ in range(reps):
                x = jnp.cumsum(x, axis=0) * 1e-6
            return x[:8, 0]
        return f
    measure(f"{tag} cumsum (B,16)", mk_cumsum, (rows16,))

    def mk_cummax(reps):
        @jax.jit
        def f(k):
            for _ in range(reps):
                k = jax.lax.cummax(k) % 100003
            return k[:8]
        return f
    measure(f"{tag} cummax (B,) i32", mk_cummax, (pay,))

    def mk_scat(reps):
        @jax.jit
        def f(p, v):
            out = jnp.zeros((B,), jnp.int32)
            for r in range(reps):
                out = out.at[(p + out[0] + r) % B].set(v)
            return out[:8]
        return f
    measure(f"{tag} scatter-set 100k into (B,)", mk_scat,
            (upd_pos, jnp.arange(N, dtype=jnp.int32)))

    def mk_scatadd(reps):
        @jax.jit
        def f(i, r16):
            out = jnp.zeros((N, 16))
            for r in range(reps):
                out = out.at[(i + r) % N].add(r16, mode="drop")
            return out[:8, 0]
        return f
    measure(f"{tag} scatter-add (B,16)->(100k,16) oldvjp", mk_scatadd,
            (pay, rows16))

    def mk_ss(reps):
        @jax.jit
        def f(o, q):
            out = jnp.zeros((B,), jnp.int32)
            for r in range(reps):
                out = out + jnp.searchsorted(o, (q + r) % B, side="right"
                                             ).astype(jnp.int32)
            return out[:8]
        return f
    measure(f"{tag} searchsorted(100k, B queries)", mk_ss,
            (sorted_offs, jnp.arange(B, dtype=jnp.int32)))

from gs_slam_analytica_jacobian_tpu.ops.gaussian_math import build_cov3d

sc = jnp.asarray(rng.random((N, 3)), jnp.float32)
q4 = jnp.asarray(rng.random((N, 4)), jnp.float32)


def mk_cov(reps):
    @jax.jit
    def f(s, q):
        acc = jnp.zeros((N, 6))
        for r in range(reps):
            acc = acc + build_cov3d(s + r * 1e-6, q)
        return acc[:8, 0]
    return f


measure("build_cov3d (100k)", mk_cov, (sc, q4))
print("done")
