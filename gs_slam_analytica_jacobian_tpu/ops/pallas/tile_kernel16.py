"""Pallas TPU kernels v4: 16x16-pixel tiles on (K, 256) operand streams.

The r5 attack on the pair-cell floor (VERDICT r4 #1). The production
32x32 kernel (tile_kernel2) charges every pair all 1024 cells of its
tile; on the converged bench room a ~5 px splat uses ~25 of them, the
tile-level early exit almost never fires (831/836 tiles run their full
pair list, PERF.md r2), and the measured roofline caps the frame loop at
~10-12 FPS. Binning at the reference's own granularity
(cuda_rasterizer/config.h:15-17: BLOCK_X=BLOCK_Y=16) quarters the
cells per pair against a ~1.4x pair increase.

Why this succeeds where the r2 attempt (tile_kernel3, retired this
round) measured 51.8 vs 14.4 ms: v3 packed four 16x16 subtile streams
into one (K, 1024) operand so every per-pair scalar needed a
4-way broadcast + lane-concat PER OPERAND PER CHUNK — a runtime
relayout bill that swamped the loop savings. The fix is to stop packing:
a (K, 256) operand row is natively two full (8,128) vregs, so the VPU
runs at identical per-vreg efficiency on 256-lane rows, and the v2
broadcast pattern (per-pair (K,1) scalars against (1,P) pixel rows)
carries over with ZERO relayout. The 2x2 subtile group still shares one
grid step (836 steps, not 3225) and one (6,8,128) output block: the four
subtiles run SEQUENTIALLY, each on its own chunk-aligned pair run from
the standard 16 px plan (binning2.plan_pairs, tile_w=tile_h=16,
chunk=K16) — the plan-time stream packing the round-4 verdict asked
for — with the first chunk of subtile j+1 prefetched while subtile j
drains, so the double-buffered DMA pipeline never stalls across subtile
boundaries.

The conic per-(gaussian,tile) cull is ON for this path (v3 kept it off):
at 16 px granularity the sub-threshold rim is most of a splat's AABB, so
the cull removes far more than the ~3% it bought at 32 px. The subtile
pixel box here is exactly the [tx*16, (tx+1)*16) box the cull tests
against (v3's packed layout was not, which is why it had to disable it).

Semantics carried over exactly from tile_kernel2 (forward.cu:406-535
parity): power>0 skip, alpha<1/255 skip, alpha capped at 0.99 (value
only; gradients flow unclamped like backward.cu:772-773), termination
when T would drop below 1e-4 (triggering Gaussian dropped), 16x16 rect
visibility test with CURRENT means (plan-amortization safety),
n_touched counted where test_T > 0.5 (or at the blend-weight threshold
under ``nt_weight``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..binning2 import FEAT_DIM
from .tile_kernel2 import (ALPHA_MAX, ALPHA_MIN, T_EPS, Composite2Out,
                           _scan_add, _scan_mul, _shift_down)

TS = 16           # tile edge in pixels
PS = TS * TS      # 256 pixels = 2 lane-vregs per operand row
NS = 4            # subtiles per grid step (2x2 group = one 32x32 region)
# pairs per chunk. The planner chunk alignment must match, and 128 is
# also the HARD floor: HBM memref slices along the lane dimension must
# be 128-aligned (Mosaic: "Slice shape along dimension 1 must be aligned
# to tiling (128)"), so a 64-pair chunk cannot be DMA'd from the
# (FEAT_DIM, B_al) layout. The cost is partial-tail waste (~15% of
# pair-cells at the bench scene's ~400 pairs/16px-tile).
K16 = 128


def grid_dims16(width: int, height: int):
    """(n_gx, n_gy) 32x32 GROUPS; the 16px tile grid is (2*n_gx, 2*n_gy)."""
    return (width + 31) // 32, (height + 31) // 32


def _pixel_rows16(gy, gx, j, W, H):
    """(1, PS) pixel coords of subtile j in group (gy, gx).

    Lane q = s2*128 + l with l = ly*16 + lx maps to pixel
    (y, x) = (gy*32 + (j//2)*16 + s2*8 + ly, gx*32 + (j%2)*16 + lx) —
    i.e. the (6, 2, 128) output piece drops into sublanes [2j, 2j+2) of
    the group's (6, 8, 128) block (see assemble_image16)."""
    q = jax.lax.broadcasted_iota(jnp.int32, (1, PS), 1)
    s2 = q // 128
    l = q % 128
    ly = l // TS
    lx = l % TS
    f32 = jnp.float32
    px = (gx * 32 + (j % 2) * TS + lx).astype(f32)
    py = (gy * 32 + (j // 2) * TS + s2 * 8 + ly).astype(f32)
    pix_in = (px < W) & (py < H)
    return px, py, pix_in


def _chunk_terms16(feat, px, py, t16x, t16y, row_ok):
    """feat: (K, FEAT_DIM). Returns (alpha_unclamped, alpha, ok, dx, dy)
    as (K, PS) — the tile_kernel2 per-chunk terms on 256-lane rows."""
    mx = feat[:, 0:1]
    my = feat[:, 1:2]
    ca = feat[:, 2:3]
    cb = feat[:, 3:4]
    cc = feat[:, 4:5]
    opa = feat[:, 5:6]
    rx0 = feat[:, 10:11]
    ry0 = feat[:, 11:12]
    rx1 = feat[:, 12:13]
    ry1 = feat[:, 13:14]

    dx = mx - px                                   # (K, PS) f32
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    a_un = opa * jnp.exp(power)
    rect_ok = ((t16x >= rx0) & (t16x < rx1) & (t16y >= ry0) & (t16y < ry1))
    alpha = jnp.minimum(ALPHA_MAX, a_un)
    ok = row_ok & rect_ok & (power <= 0.0) & (alpha >= ALPHA_MIN)
    return a_un, alpha, ok, dx, dy


NBUF = 4          # input-DMA ring depth: a 16px chunk's compute (~1-2 us)
                  # cannot hide the HBM copy latency that a 32x32 chunk's
                  # ~9 us could, so the ring runs 3 chunks ahead


def make_forward_kernel16(n_tx16, W, H, K, with_ntouch=True,
                          nt_weight=False, early_exit=False):
    """Forward kernel over 32x32 groups; 4 sequential 16x16 subtiles.

    ``early_exit=False`` drops the per-chunk cross-lane done-reduce from
    the loop condition (the exit fires on almost no tile of a converged
    scene — PERF.md r2 — and at 16 px the per-chunk compute it gates is
    8x smaller, so the scalar-only condition is the better default);
    per-PIXEL termination semantics are unchanged either way."""

    def kernel(ranges_ref, feat_hbm, *rest):
        if with_ntouch:
            (ntz_ref, img_ref, ntouch_hbm,
             feat_vmem, nt_vmem, sem_in, sem_out) = rest
            del ntz_ref  # aliased into ntouch_hbm (zero-init)
        else:
            img_ref, feat_vmem, sem_in = rest
        gy = pl.program_id(0)
        gx = pl.program_id(1)
        f32 = jnp.float32

        starts = []
        n_chunks = []
        for j in range(NS):
            t16 = (2 * gy + j // 2) * n_tx16 + (2 * gx + j % 2)
            s = ranges_ref[2 * t16]
            n = ranges_ref[2 * t16 + 1] - s
            starts.append(s)
            n_chunks.append((n + K - 1) // K)

        def dma_in(j, c):
            slot = jax.lax.rem(c, NBUF)
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(pl.multiple_of(starts[j] + c * K, K),
                                     K)],
                feat_vmem.at[slot], sem_in.at[slot])

        def prefetch(j):
            for w in range(NBUF - 1):
                @pl.when(n_chunks[j] > w)
                def _():
                    dma_in(j, w).start()

        if with_ntouch:
            def nt_dma(j, c):
                slot = jax.lax.rem(c, 2)
                return pltpu.make_async_copy(
                    nt_vmem.at[slot],
                    ntouch_hbm.at[:, pl.ds(
                        pl.multiple_of(starts[j] + c * K, K), K)],
                    sem_out.at[slot])

        prefetch(0)

        for j in range(NS):
            px, py, pix_in = _pixel_rows16(gy, gx, j, W, H)
            t16x = jnp.floor(px / 16.0)
            t16y = jnp.floor(py / 16.0)
            pix_in_f = pix_in.astype(f32)
            nc = n_chunks[j]
            n_live = ranges_ref[2 * ((2 * gy + j // 2) * n_tx16
                                     + (2 * gx + j % 2)) + 1] - starts[j]

            def body(state, j=j, nc=nc, n_live=n_live, px=px, py=py,
                     t16x=t16x, t16y=t16y, pix_in_f=pix_in_f):
                c, (T_carry, done, acc) = state

                @pl.when(c + (NBUF - 1) < nc)
                def _():
                    dma_in(j, c + (NBUF - 1)).start()

                dma_in(j, c).wait()
                slot = jax.lax.rem(c, NBUF)
                feat = jnp.transpose(feat_vmem[slot])         # (K, F)
                rows = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
                row_ok = rows < (n_live - c * K)

                _, alpha, ok, _, _ = _chunk_terms16(
                    feat, px, py, t16x, t16y, row_ok)
                live = ok & (done < 0.5)
                alpha_eff = jnp.where(live, alpha, 0.0)
                cum_incl = _scan_mul(1.0 - alpha_eff)
                T_excl = T_carry * _shift_down(cum_incl, 1.0)
                T_incl = T_carry * cum_incl
                # T_incl is monotone along K: (T_incl < eps) marks the
                # triggering gaussian and everything behind it
                term = T_incl < T_EPS
                include = live & ~term
                w = jnp.where(include, alpha, 0.0) * T_excl   # (K, PS)

                cfeat = feat[:, 6:10]                         # (K, 4)
                acc = acc + jax.lax.dot_general(
                    cfeat, w, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)               # (4, PS)

                new_T = jnp.minimum(
                    T_carry,
                    jnp.min(jnp.where(include, T_incl, 2.0), axis=0,
                            keepdims=True))
                new_done = jnp.maximum(
                    done,
                    jnp.max((live & term).astype(f32), axis=0,
                            keepdims=True))

                if with_ntouch:
                    nt_cond = (include & (w >= ALPHA_MIN) if nt_weight
                               else include & (T_incl > 0.5))
                    nt = jnp.sum(
                        jnp.where(nt_cond, pix_in_f, 0.0),
                        axis=1, keepdims=True)                # (K, 1)
                    nt_t = jnp.transpose(nt)
                    slot_o = jax.lax.rem(c, 2)

                    @pl.when(c >= 2)
                    def _():
                        nt_dma(j, c - 2).wait()

                    @pl.when(slot_o == 0)
                    def _():
                        nt_vmem[0] = nt_t

                    @pl.when(slot_o == 1)
                    def _():
                        nt_vmem[1] = nt_t

                    nt_dma(j, c).start()
                return c + 1, (new_T, new_done, acc)

            T0 = jnp.ones((1, PS), f32)
            done0 = jnp.where(pix_in, 0.0, 1.0).astype(f32)
            acc0 = jnp.zeros((4, PS), f32)

            if early_exit:
                def cond(state, nc=nc):
                    c, (_, done, _) = state
                    return (c < nc) & (jnp.min(done) < 0.5)
            else:
                def cond(state, nc=nc):
                    c, _ = state
                    return c < nc

            c_end, (T_f, _, acc_f) = jax.lax.while_loop(
                cond, body, (0, (T0, done0, acc0)))

            # drain in-flight input prefetches (early exit, or the ring's
            # tail NBUF-1 copies beyond the last processed chunk)
            for w in range(NBUF - 1):
                @pl.when(c_end + w < nc)
                def _(w=w):
                    dma_in(j, c_end + w).wait()

            # prefetch the NEXT subtile's first chunks before the output
            # assembly below — keeps the input pipeline busy across the
            # subtile boundary (all of this subtile's input copies are
            # drained at this point, so the ring slots are free)
            if j + 1 < NS:
                prefetch(j + 1)

            if with_ntouch:
                @pl.when(c_end >= 2)
                def _():
                    nt_dma(j, c_end - 2).wait()

                @pl.when(c_end >= 1)
                def _():
                    nt_dma(j, c_end - 1).wait()

            # channel 5 carries the chunk counter at exit (early-exit
            # diagnostics, chunk_stats_from_img16)
            stats = jnp.full((1, PS), c_end, f32)
            piece = jnp.concatenate([acc_f, T_f, stats], axis=0)  # (6, PS)
            img_ref[:, 2 * j:2 * j + 2, :] = piece.reshape(6, 2, 128)

    return kernel


def make_backward_kernel16(n_tx16, W, H, K, early_exit=False):
    def kernel(ranges_ref, feat_hbm, fwd_ref, cot_ref, dfz_ref, dfeat_hbm,
               feat_vmem, dgrad_vmem, sem_in, sem_out):
        del dfz_ref  # aliased into dfeat_hbm (zero-init)
        gy = pl.program_id(0)
        gx = pl.program_id(1)
        f32 = jnp.float32

        starts = []
        n_chunks = []
        for j in range(NS):
            t16 = (2 * gy + j // 2) * n_tx16 + (2 * gx + j % 2)
            s = ranges_ref[2 * t16]
            n = ranges_ref[2 * t16 + 1] - s
            starts.append(s)
            n_chunks.append((n + K - 1) // K)

        def dma_in(j, c):
            slot = jax.lax.rem(c, NBUF)
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(pl.multiple_of(starts[j] + c * K, K),
                                     K)],
                feat_vmem.at[slot], sem_in.at[slot])

        def prefetch(j):
            for w in range(NBUF - 1):
                @pl.when(n_chunks[j] > w)
                def _():
                    dma_in(j, w).start()

        def out_dma(j, c):
            slot = jax.lax.rem(c, 2)
            return pltpu.make_async_copy(
                dgrad_vmem.at[slot],
                dfeat_hbm.at[:, pl.ds(
                    pl.multiple_of(starts[j] + c * K, K), K)],
                sem_out.at[slot])

        prefetch(0)

        for j in range(NS):
            px, py, pix_in = _pixel_rows16(gy, gx, j, W, H)
            t16x = jnp.floor(px / 16.0)
            t16y = jnp.floor(py / 16.0)
            nc = n_chunks[j]
            n_live = ranges_ref[2 * ((2 * gy + j // 2) * n_tx16
                                     + (2 * gx + j % 2)) + 1] - starts[j]

            # this subtile's slice of the forward image and cotangents
            fwd = fwd_ref[:, 2 * j:2 * j + 2, :].reshape(6, PS)
            T_final = fwd[4:5]
            cot = cot_ref[:, 2 * j:2 * j + 2, :].reshape(5, PS)
            dT = cot[4:5]
            dCD = cot[0:4]                                    # (4, PS)
            Stot = jnp.sum(dCD * fwd[0:4], axis=0, keepdims=True)

            def body(state, j=j, nc=nc, n_live=n_live, px=px, py=py,
                     t16x=t16x, t16y=t16y, dCD=dCD, dT=dT,
                     T_final=T_final, Stot=Stot):
                c, (T_carry, done, prefA) = state

                @pl.when(c + (NBUF - 1) < nc)
                def _():
                    dma_in(j, c + (NBUF - 1)).start()

                dma_in(j, c).wait()
                slot = jax.lax.rem(c, NBUF)
                feat = jnp.transpose(feat_vmem[slot])         # (K, F)
                rows = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
                row_ok = rows < (n_live - c * K)

                a_un, alpha, ok, dx, dy = _chunk_terms16(
                    feat, px, py, t16x, t16y, row_ok)
                live = ok & (done < 0.5)
                alpha_eff = jnp.where(live, alpha, 0.0)
                cum_incl = _scan_mul(1.0 - alpha_eff)
                T_excl = T_carry * _shift_down(cum_incl, 1.0)
                T_incl = T_carry * cum_incl
                term = T_incl < T_EPS
                include = live & ~term
                w = jnp.where(include, alpha, 0.0) * T_excl   # (K, PS)

                cfeat = feat[:, 6:10]                         # (K, 4)

                # linearity-collapsed dL/dalpha (see tile_kernel2):
                # A = sum_ch cot_ch * chan_ch, one forward-order scan
                A = jax.lax.dot_general(
                    cfeat, dCD, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)               # (K, PS)
                pA = _scan_add(w * A) + prefA
                inv_om = 1.0 / jnp.maximum(1.0 - alpha, 1e-6)
                dLda = A * T_excl - inv_om * (dT * T_final + Stot - pA)
                dLda = jnp.where(include, dLda, 0.0)

                d_cd = jax.lax.dot_general(
                    w, dCD, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)               # (K, 4)
                d_colors = d_cd[:, 0:3]
                d_depths = d_cd[:, 3:4]

                opa = feat[:, 5:6]
                G = jnp.where(include, a_un / jnp.maximum(opa, 1e-12),
                              0.0)
                dLdG = opa * dLda
                d_opa = jnp.sum(G * dLda, axis=1, keepdims=True)

                ca = feat[:, 2:3]
                cb = feat[:, 3:4]
                cc = feat[:, 4:5]
                gdx = G * dx
                gdy = G * dy
                dG_ddx = -gdx * ca - gdy * cb
                dG_ddy = -gdy * cc - gdx * cb
                d_mx = jnp.sum(dLdG * dG_ddx, axis=1, keepdims=True)
                d_my = jnp.sum(dLdG * dG_ddy, axis=1, keepdims=True)
                d_ca = jnp.sum(dLdG * (-0.5 * gdx * dx), axis=1,
                               keepdims=True)
                d_cb = jnp.sum(dLdG * (-gdx * dy), axis=1, keepdims=True)
                d_cc = jnp.sum(dLdG * (-0.5 * gdy * dy), axis=1,
                               keepdims=True)

                dgrad = jnp.concatenate(
                    [d_mx, d_my, d_ca, d_cb, d_cc, d_opa, d_colors,
                     d_depths, jnp.zeros((K, FEAT_DIM - 10), f32)],
                    axis=1)
                dgrad = jnp.where(row_ok, dgrad, 0.0)
                dgrad_t = jnp.transpose(dgrad)                # (F, K)
                slot_o = jax.lax.rem(c, 2)

                @pl.when(c >= 2)
                def _():
                    out_dma(j, c - 2).wait()

                @pl.when(slot_o == 0)
                def _():
                    dgrad_vmem[0] = dgrad_t

                @pl.when(slot_o == 1)
                def _():
                    dgrad_vmem[1] = dgrad_t

                out_dma(j, c).start()

                new_T = jnp.minimum(
                    T_carry,
                    jnp.min(jnp.where(include, T_incl, 2.0), axis=0,
                            keepdims=True))
                new_done = jnp.maximum(
                    done,
                    jnp.max((live & term).astype(f32), axis=0,
                            keepdims=True))
                return c + 1, (new_T, new_done, pA[-1:])

            T0 = jnp.ones((1, PS), f32)
            done0 = jnp.where(pix_in, 0.0, 1.0).astype(f32)
            pA0 = jnp.zeros((1, PS), f32)

            if early_exit:
                def cond(state, nc=nc):
                    c, (_, done, _) = state
                    return (c < nc) & (jnp.min(done) < 0.5)
            else:
                def cond(state, nc=nc):
                    c, _ = state
                    return c < nc

            c_end, _ = jax.lax.while_loop(
                cond, body, (0, (T0, done0, pA0)))

            for w in range(NBUF - 1):
                @pl.when(c_end + w < nc)
                def _(w=w):
                    dma_in(j, c_end + w).wait()

            if j + 1 < NS:
                prefetch(j + 1)

            # drain the (up to two) in-flight output copies before the
            # next subtile reuses the dgrad slots
            @pl.when(c_end >= 2)
            def _():
                out_dma(j, c_end - 2).wait()

            @pl.when(c_end >= 1)
            def _():
                out_dma(j, c_end - 1).wait()

    return kernel


def assemble_image16(img_blocks, n_gx, n_gy, W, H):
    """(C, n_gy*8, n_gx*128) block-permuted -> (C, H, W).

    Sublane sl = j*2 + s2 with j = jy*2 + jx; lane l = ly*16 + lx;
    pixel (y, x) = (gy*32 + jy*16 + s2*8 + ly, gx*32 + jx*16 + lx)."""
    C = img_blocks.shape[0]
    x = img_blocks.reshape(C, n_gy, 2, 2, 2, n_gx, 8, TS)
    # dims: (C, gy, jy, jx, s2, gx, ly, lx)
    x = jnp.transpose(x, (0, 1, 2, 4, 6, 5, 3, 7))
    # dims: (C, gy, jy, s2, ly, gx, jx, lx)
    x = x.reshape(C, n_gy * 32, n_gx * 32)
    return x[:, :H, :W]


def disassemble_image16(img, n_gx, n_gy):
    """(C, H, W) -> (C, n_gy*8, n_gx*128) block-permuted (zero padded)."""
    C, H_, W_ = img.shape
    x = jnp.pad(img, ((0, 0), (0, n_gy * 32 - H_), (0, n_gx * 32 - W_)))
    x = x.reshape(C, n_gy, 2, 2, 8, n_gx, 2, TS)
    # dims: (C, gy, jy, s2, ly, gx, jx, lx)
    x = jnp.transpose(x, (0, 1, 2, 6, 3, 5, 4, 7))
    # dims: (C, gy, jy, jx, s2, gx, ly, lx)
    return x.reshape(C, n_gy * 8, n_gx * 128)


def chunk_stats_from_img16(img_blocks, n_gx, n_gy):
    """Raw kernel output -> (n_gy*2, n_gx*2) per-16px-tile processed-chunk
    counts (channel 5 carries each subtile's loop counter at exit)."""
    C_ = img_blocks[5]                         # (n_gy*8, n_gx*128)
    x = C_.reshape(n_gy, 4, 2, n_gx, 128)[:, :, 0, :, 0]  # (n_gy,4,n_gx)
    # subtile j = jy*2+jx at sublane 2j -> rows [jy][jx]
    x = x.reshape(n_gy, 2, 2, n_gx)
    x = jnp.transpose(x, (0, 1, 3, 2))         # (n_gy, jy, n_gx, jx)
    return x.reshape(n_gy * 2, n_gx * 2)


@functools.partial(
    jax.jit, static_argnames=("n_gx", "n_gy", "W", "H", "interpret",
                              "with_ntouch", "nt_weight", "early_exit"))
def _fwd_impl16(feat, ranges, n_gx, n_gy, W, H, interpret=False,
                with_ntouch=True, nt_weight=False, early_exit=False):
    B_al = feat.shape[0]
    n_tx16 = 2 * n_gx
    # barrier: without it XLA fuses the upstream pair gather INTO this
    # transpose (a per-element gather in transposed order) — measured
    # 50.8 ms vs 14.3 ms for the same stages materialized (r5)
    feat = jax.lax.optimization_barrier(feat)
    feat_v = jnp.transpose(feat)                  # (FEAT_DIM, B_al)
    # ranges prefetched FLAT (2*T,): 2D SMEM operands are lane-padded to
    # 128, which blows the 1 MB SMEM at production tile counts (3344
    # tiles -> 1.7 MB; the r2 Mosaic gotcha recorded in PERF.md)
    ranges = ranges.reshape(-1)
    kernel = make_forward_kernel16(n_tx16, W, H, K16, with_ntouch,
                                   nt_weight, early_exit)
    img_spec = pl.BlockSpec((6, 8, 128), lambda gy, gx, *_: (0, gy, gx),
                            memory_space=pltpu.VMEM)
    img_shape = jax.ShapeDtypeStruct((6, n_gy * 8, n_gx * 128), jnp.float32)
    if with_ntouch:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_gy, n_gx),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[img_spec, pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=[
                pltpu.VMEM((NBUF, FEAT_DIM, K16), jnp.float32),
                pltpu.VMEM((2, 1, K16), jnp.float32),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        img, ntouch = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(img_shape,
                       jax.ShapeDtypeStruct((1, B_al), jnp.float32)),
            input_output_aliases={2: 1},  # zeros operand -> ntouch output
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ranges, feat_v, jnp.zeros((1, B_al), jnp.float32))
        return img, ntouch[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_gy, n_gx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=img_spec,
        scratch_shapes=[
            pltpu.VMEM((NBUF, FEAT_DIM, K16), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    img = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=img_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ranges, feat_v)
    return img, jnp.zeros((B_al,), jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("n_gx", "n_gy", "W", "H", "interpret",
                              "early_exit"))
def _bwd_impl16(feat, ranges, fwd_img, cot_img, n_gx, n_gy, W, H,
                interpret=False, early_exit=False):
    B_al = feat.shape[0]
    n_tx16 = 2 * n_gx
    feat = jax.lax.optimization_barrier(feat)     # see _fwd_impl16
    feat_v = jnp.transpose(feat)
    ranges = ranges.reshape(-1)                   # flat SMEM prefetch
    kernel = make_backward_kernel16(n_tx16, W, H, K16, early_exit)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_gy, n_gx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((6, 8, 128), lambda gy, gx, *_: (0, gy, gx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 8, 128), lambda gy, gx, *_: (0, gy, gx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((NBUF, FEAT_DIM, K16), jnp.float32),
            pltpu.VMEM((2, FEAT_DIM, K16), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dfeat_v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((FEAT_DIM, B_al), jnp.float32),
        input_output_aliases={4: 0},   # zeros operand -> dfeat output
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ranges, feat_v, fwd_img, cot_img,
      jnp.zeros((FEAT_DIM, B_al), jnp.float32))
    return jnp.transpose(dfeat_v)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def composite16(feat, ranges, n_gx, n_gy, W, H,
                interpret=False, with_ntouch=True,
                nt_weight=False, early_exit=False) -> Composite2Out:
    """Differentiable 16x16-tiled compositing (v4 production tile16 path).

    feat: (B_al, FEAT_DIM) aligned pair records from a 16px plan
    (binning2.plan_pairs, tile_w=tile_h=16, chunk=K16);
    ranges: (4*n_gx*n_gy, 2) i32 per-16px-tile [start, end).
    """
    img, ntouch = _fwd_impl16(feat, ranges, n_gx, n_gy, W, H, interpret,
                              with_ntouch, nt_weight, early_exit)
    asm = assemble_image16(img, n_gx, n_gy, W, H)
    return Composite2Out(color_sum=asm[0:3], depth_sum=asm[3],
                         final_T=asm[4], n_touched_pairs=ntouch)


def _c16_fwd(feat, ranges, n_gx, n_gy, W, H, interpret=False,
             with_ntouch=True, nt_weight=False, early_exit=False):
    img, ntouch = _fwd_impl16(feat, ranges, n_gx, n_gy, W, H, interpret,
                              with_ntouch, nt_weight, early_exit)
    asm = assemble_image16(img, n_gx, n_gy, W, H)
    out = Composite2Out(color_sum=asm[0:3], depth_sum=asm[3],
                        final_T=asm[4], n_touched_pairs=ntouch)
    return out, (feat, ranges, img)


def _c16_bwd(n_gx, n_gy, W, H, interpret, with_ntouch, nt_weight,
             early_exit, res, cot):
    feat, ranges, fwd_img = res
    cot_asm = jnp.concatenate(
        [cot.color_sum, cot.depth_sum[None], cot.final_T[None]], axis=0)
    cot_img = disassemble_image16(cot_asm, n_gx, n_gy)
    dfeat = _bwd_impl16(feat, ranges, fwd_img, cot_img, n_gx, n_gy, W, H,
                        interpret, early_exit)
    return dfeat, None


composite16.defvjp(_c16_fwd, _c16_bwd)
