#!/usr/bin/env python
"""Ablation microbench for the 16x16 kernel's per-chunk cost (r5).

The v4 kernel measured 203 ps/pair-cell vs v2's 27 ps/cell — a 7.6x
per-cell collapse that the DMA-ring/early-exit changes did not move.
This bench strips the forward chunk body stage by stage on a synthetic
plan (uniform pairs per tile) to find which op class lowers badly on
(K, 256) operands.

Usage: python scripts/abl16.py [variant ...]
  variants: full, noexp, noscan, nomxu, notrans, minimal
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gsslam_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gs_slam_analytica_jacobian_tpu.ops.pallas.tile_kernel16 import (
    _chunk_terms16, _pixel_rows16)
T_EPS = 1e-4

F = 16
K = 128
PS = 256
NS = 4
NBUF = 4


def _scan_mul(x):
    s = 1
    while s < x.shape[0]:
        pad = jnp.ones((s,) + x.shape[1:], x.dtype)
        x = x * jnp.concatenate([pad, x[:-s]], axis=0)
        s *= 2
    return x


def _shift_down(x, identity):
    pad = jnp.full((1,) + x.shape[1:], identity, x.dtype)
    return jnp.concatenate([pad, x[:-1]], axis=0)


def make_kernel(n_tx16, W, H, nc_fixed, variant):
    do_exp = variant not in ("noexp", "minimal")
    do_scan = variant not in ("noscan", "minimal")
    do_mxu = variant not in ("nomxu", "minimal")
    do_trans = variant not in ("notrans", "minimal")
    dyn = variant in ("dyn", "prodbody")   # dynamic per-tile trip counts
    prod = variant == "prodbody"    # the exact production chunk body

    def kernel(ranges_ref, feat_hbm, img_ref, feat_vmem, sem_in):
        gy = pl.program_id(0)
        gx = pl.program_id(1)
        f32 = jnp.float32

        starts = []
        ncs = []
        for j in range(NS):
            t16 = (2 * gy + j // 2) * n_tx16 + (2 * gx + j % 2)
            starts.append(ranges_ref[2 * t16])
            n = ranges_ref[2 * t16 + 1] - ranges_ref[2 * t16]
            ncs.append((n + K - 1) // K if dyn else nc_fixed)

        def dma_in(j, c):
            slot = jax.lax.rem(c, NBUF)
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(pl.multiple_of(starts[j] + c * K, K),
                                     K)],
                feat_vmem.at[slot], sem_in.at[slot])

        def prefetch(j):
            for w in range(NBUF - 1):
                if dyn:
                    @pl.when(ncs[j] > w)
                    def _(w=w, j=j):
                        dma_in(j, w).start()
                elif w < nc_fixed:
                    dma_in(j, w).start()

        prefetch(0)

        q = jax.lax.broadcasted_iota(jnp.int32, (1, PS), 1)
        px = (q % 16).astype(f32)
        py = (q // 16).astype(f32)

        for j in range(NS):
            nc_j = ncs[j]
            if prod:
                pxj, pyj, pix_in = _pixel_rows16(gy, gx, j, W, H)
                t16x = jnp.floor(pxj / 16.0)
                t16y = jnp.floor(pyj / 16.0)
                n_live = (ranges_ref[2 * ((2 * gy + j // 2) * n_tx16
                                          + (2 * gx + j % 2)) + 1]
                          - starts[j])

                def body(state, j=j, nc_j=nc_j, n_live=n_live, pxj=pxj,
                         pyj=pyj, t16x=t16x, t16y=t16y):
                    c, (T_carry, done, acc) = state

                    @pl.when(c + (NBUF - 1) < nc_j)
                    def _():
                        dma_in(j, c + (NBUF - 1)).start()

                    dma_in(j, c).wait()
                    slot = jax.lax.rem(c, NBUF)
                    feat = jnp.transpose(feat_vmem[slot])
                    rows = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
                    row_ok = rows < (n_live - c * K)
                    _, alpha, ok, _, _ = _chunk_terms16(
                        feat, pxj, pyj, t16x, t16y, row_ok)
                    live = ok & (done < 0.5)
                    alpha_eff = jnp.where(live, alpha, 0.0)
                    cum_incl = _scan_mul(1.0 - alpha_eff)
                    T_excl = T_carry * _shift_down(cum_incl, 1.0)
                    T_incl = T_carry * cum_incl
                    term = T_incl < T_EPS
                    include = live & ~term
                    w = jnp.where(include, alpha, 0.0) * T_excl
                    cfeat = feat[:, 6:10]
                    acc = acc + jax.lax.dot_general(
                        cfeat, w, (((0,), (0,)), ((), ())),
                        preferred_element_type=f32)
                    new_T = jnp.minimum(
                        T_carry,
                        jnp.min(jnp.where(include, T_incl, 2.0), axis=0,
                                keepdims=True))
                    new_done = jnp.maximum(
                        done,
                        jnp.max((live & term).astype(f32), axis=0,
                                keepdims=True))
                    return c + 1, (new_T, new_done, acc)

                T0 = jnp.ones((1, PS), jnp.float32)
                done0 = jnp.where(pix_in, 0.0, 1.0).astype(jnp.float32)
                acc0 = jnp.zeros((4, PS), jnp.float32)
                c_end, (T_f, _, acc_f) = jax.lax.while_loop(
                    lambda st, nc_j=nc_j: st[0] < nc_j, body,
                    (0, (T0, done0, acc0)))
                if j + 1 < NS:
                    prefetch(j + 1)
                rowsum = jnp.sum(acc_f, axis=0, keepdims=True) + T_f
                piece = jnp.concatenate([rowsum] * 6, axis=0)
                img_ref[:, 2 * j:2 * j + 2, :] = piece.reshape(6, 2, 128)
                continue

            def body(state, j=j, nc_j=nc_j):
                c, (T_carry, acc) = state

                @pl.when(c + (NBUF - 1) < nc_j)
                def _():
                    dma_in(j, c + (NBUF - 1)).start()

                dma_in(j, c).wait()
                slot = jax.lax.rem(c, NBUF)
                if do_trans:
                    feat = jnp.transpose(feat_vmem[slot])     # (K, F)
                else:
                    feat = jnp.full((K, F), 0.5, f32) + feat_vmem[slot][0, 0]
                mx = feat[:, 0:1]
                my = feat[:, 1:2]
                ca = feat[:, 2:3]
                cb = feat[:, 3:4]
                cc = feat[:, 4:5]
                opa = feat[:, 5:6]
                dx = mx - px
                dy = my - py
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                if do_exp:
                    a_un = opa * jnp.exp(power)
                else:
                    a_un = opa * (1.0 + power)
                alpha = jnp.minimum(0.99, a_un)
                ok = (power <= 0.0) & (alpha >= 1.0 / 255.0)
                alpha_eff = jnp.where(ok, alpha, 0.0)
                if do_scan:
                    cum = _scan_mul(1.0 - alpha_eff)
                    T_excl = T_carry * _shift_down(cum, 1.0)
                    T_incl = T_carry * cum
                else:
                    T_excl = T_carry * (1.0 - alpha_eff)
                    T_incl = T_excl
                w = alpha_eff * T_excl
                cfeat = feat[:, 6:10]
                if do_mxu:
                    acc = acc + jax.lax.dot_general(
                        cfeat, w, (((0,), (0,)), ((), ())),
                        preferred_element_type=f32)
                else:
                    acc = acc + jnp.sum(w, axis=0, keepdims=True) + cfeat[0, 0]
                new_T = jnp.minimum(
                    T_carry, jnp.min(T_incl, axis=0, keepdims=True))
                return c + 1, (new_T, acc)

            T0 = jnp.ones((1, PS), jnp.float32)
            acc0 = (jnp.zeros((4, PS), jnp.float32) if do_mxu
                    else jnp.zeros((1, PS), jnp.float32))

            c_end, (T_f, acc_f) = jax.lax.while_loop(
                lambda st, nc_j=nc_j: st[0] < nc_j, body, (0, (T0, acc0)))
            if j + 1 < NS:
                prefetch(j + 1)
            rowsum = jnp.sum(acc_f, axis=0, keepdims=True) + T_f  # (1, PS)
            piece = jnp.concatenate([rowsum] * 6, axis=0)     # (6, PS)
            img_ref[:, 2 * j:2 * j + 2, :] = piece.reshape(6, 2, 128)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_gx", "n_gy", "W", "H",
                                             "nc", "variant"))
def run(feat, ranges, n_gx, n_gy, W, H, nc, variant):
    kernel = make_kernel(2 * n_gx, W, H, nc, variant)
    img_spec = pl.BlockSpec((6, 8, 128), lambda gy, gx, *_: (0, gy, gx),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_gy, n_gx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=img_spec,
        scratch_shapes=[
            pltpu.VMEM((NBUF, F, K), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((6, n_gy * 8, n_gx * 128),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ranges.reshape(-1), feat)


def main():
    variants = sys.argv[1:] or ["full", "dyn"]
    W, H = 1216, 704
    n_gx, n_gy = W // 32, H // 32          # 38 x 22 = 836 groups
    n_tiles = 4 * n_gx * n_gy              # 3344
    NC = int(os.environ.get("NC", "2"))    # chunks per tile
    rng = np.random.default_rng(0)
    B = n_tiles * NC * K
    feat = jnp.asarray(rng.uniform(0.2, 0.8, (F, B)).astype(np.float32))
    r = np.zeros((n_tiles, 2), np.int32)
    r[:, 0] = np.arange(n_tiles) * NC * K
    r[:, 1] = r[:, 0] + NC * K
    ranges = jnp.asarray(r)
    print(f"tiles={n_tiles} chunks={n_tiles*NC} "
          f"cells={n_tiles*NC*K*PS/1e6:.0f}M", flush=True)

    R = 8
    for v in variants:
        def go(reps):
            @jax.jit
            def f(x):
                acc = jnp.zeros(())
                for i in range(reps):
                    img = run(x + acc * 1e-30, ranges, n_gx, n_gy, W, H,
                              NC, v)
                    acc = acc + img[0, 0, 0]
                return acc
            return f
        f1, fR = go(1), go(R)
        s = lambda x: float(x)
        s(f1(feat)); s(fR(feat))
        best = np.inf
        for _ in range(2):
            t0 = time.time(); s(f1(feat)); t1 = time.time() - t0
            t0 = time.time(); s(fR(feat)); tR = time.time() - t0
            best = min(best, (tR - t1) / (R - 1))
        per_chunk = best / (n_tiles * NC) * 1e6
        print(f"{v:10s} {best*1000:8.2f} ms   {per_chunk:6.2f} us/chunk",
              flush=True)


if __name__ == "__main__":
    main()
