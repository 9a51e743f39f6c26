"""Pallas TPU kernels v2: 32x32-pixel tiled alpha compositing, fwd + bwd.

TPU-native rebuild of the CUDA per-tile rasterization kernels
(cuda_rasterizer/forward.cu:406-535, backward.cu:648-872). Changes vs the
round-1 kernel (ops/pallas/tile_composite.py):

- Tiles are 32x32 PIXELS mapped onto one (8,128) f32 VMEM block
  (sublane s, lane l -> pixel (s*4 + l//32, l%32)). A Gaussian of typical
  radius touches ~2x fewer 32x32 tiles than 8x128 tiles, halving both the
  pair count and the per-pair wasted pixels. The image is assembled from
  the permuted block layout by one XLA reshape/transpose afterwards.
- BOTH kernels early-exit once every pixel of the tile has terminated.
  Their per-pair HBM outputs (n_touched, feature gradients) are
  zero-initialized via input_output_aliases, so skipped chunks correctly
  contribute zeros (fixes the round-1 advisor finding: garbage n_touched
  rows on real TPU).
- Out-of-image pixels in boundary tiles start with done=1 so they cannot
  suppress the early exit.
- The termination cut needs no scan: T_incl is monotone non-increasing
  along the chunk, so (T_incl < eps) is itself the suffix indicator.
  new_T is a masked min-reduce instead of a third multiplicative scan.
- Chunk DMAs are double-buffered (in-flight copy drained on early exit).

Semantics carried over exactly (forward.cu:406-535): power>0 skip,
alpha<1/255 skip, alpha capped at 0.99 (value only, gradients flow
unclamped like backward.cu:772-773), termination when T would drop below
1e-4 (the triggering Gaussian dropped), 16x16 rect visibility test,
n_touched counted where test_T > 0.5.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..binning2 import FEAT_DIM

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4

TPX = 32          # tile width in pixels
TPY = 32          # tile height in pixels
P = TPX * TPY     # 1024 = (8, 128) f32 block
K = 128           # pairs per chunk (lane-aligned for the (F, K) DMA slice)


def grid_dims(width: int, height: int):
    return (width + TPX - 1) // TPX, (height + TPY - 1) // TPY


def _scan_mul(x):
    """Inclusive multiplicative Hillis-Steele scan along axis 0 of (K, P)."""
    s = 1
    while s < x.shape[0]:
        pad = jnp.ones((s,) + x.shape[1:], x.dtype)
        x = x * jnp.concatenate([pad, x[:-s]], axis=0)
        s *= 2
    return x


def _scan_add(x):
    s = 1
    while s < x.shape[0]:
        pad = jnp.zeros((s,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([pad, x[:-s]], axis=0)
        s *= 2
    return x


def _shift_down(x, identity):
    pad = jnp.full((1,) + x.shape[1:], identity, x.dtype)
    return jnp.concatenate([pad, x[:-1]], axis=0)


def _pixel_rows(ty, tx, W, H):
    """(1, P) pixel coords for this tile under the lane permutation
    q = s*128 + l -> (y, x) = (ty*32 + s*4 + l//32, tx*32 + l%32)."""
    q = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    s = q // 128
    l = q % 128
    x_in = l % TPX
    y_in = s * 4 + l // TPX
    f32 = jnp.float32
    px = (tx * TPX + x_in).astype(f32)
    py = (ty * TPY + y_in).astype(f32)
    pix_in = ((px < W) & (py < H))
    return px, py, pix_in


def _mxu_power(feat, cx_t, cy_t, P6):
    """Gaussian falloff for a whole (K, P) chunk as ONE MXU matmul.

    The quadratic form Q(m - p) expands in the pixel-coordinate basis
    [px^2, px*py, py^2, px, py, 1] with per-gaussian coefficients, so
    power = G6 @ P6 with G6 (K, 6) built from the conic + mean (a handful
    of (K,1) VPU ops) and P6 (6, P) built ONCE per tile — the ~9 per-cell
    VPU ops of the direct evaluation ride the (otherwise idle in this
    elementwise mix) MXU instead. Coordinates are TILE-LOCAL: the raw
    pixel basis at x~1200 would lose ~7 digits to cancellation
    (px^2 ~ 1.4e6 against power ~ O(10)); locally |p| <= ~16+pad and
    |m| is rect-bounded, so the bf16x3 matmul keeps power to ~1e-4 —
    an alpha error ~1e-4 relative, far under the tracking loop's
    sensitivity. Opt-in (tracking renders); parity/golden renders keep
    the exact VPU path."""
    mxl = feat[:, 0:1] - cx_t   # tile-local mean
    myl = feat[:, 1:2] - cy_t
    ca = feat[:, 2:3]
    cb = feat[:, 3:4]
    cc = feat[:, 4:5]
    g3 = ca * mxl + cb * myl
    g4 = cb * mxl + cc * myl
    g5 = -0.5 * (ca * mxl * mxl + 2.0 * cb * mxl * myl + cc * myl * myl)
    G6 = jnp.concatenate(
        [-0.5 * ca, -cb, -0.5 * cc, g3, g4, g5], axis=1)      # (K, 6)
    # HIGHEST precision: the default single-pass bf16 matmul would carry
    # ~1e-2 absolute error into power (operands ~1e4 against power ~10)
    power = jax.lax.dot_general(
        G6, P6, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                  # (K, P)
    # clamp the (analytically non-positive) form like the bf16 path
    return jnp.minimum(power, 0.0)


def _chunk_terms(feat, px, py, t16x, t16y, row_ok, bf16=False,
                 mxu_ctx=None):
    """feat: (K, FEAT_DIM). Returns (alpha_unclamped, alpha, ok, dx, dy).

    bf16=True evaluates the Gaussian falloff (the dominant per-cell VPU
    work) in bfloat16: the pixel deltas are formed in f32 first (mean2d
    coordinates up to ~1200 would lose whole pixels in bf16), then cast —
    |dx| <~ 48 px carries ~0.4% relative error into alpha, which only the
    tracking-loop renders opt into (the IRLS weights and GN direction are
    insensitive at that scale; final/golden renders stay f32).

    mxu_ctx=(cx_t, cy_t, P6) evaluates the falloff on the MXU instead
    (_mxu_power) — same opt-in audience as bf16."""
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

    dx = mx - px                                   # (K, P) f32
    dy = my - py
    if mxu_ctx is not None:
        power = _mxu_power(feat, *mxu_ctx)
        a_un = opa * jnp.exp(power)
    elif bf16:
        b = jnp.bfloat16
        dxb = dx.astype(b)
        dyb = dy.astype(b)
        power_b = (-0.5 * (ca.astype(b) * dxb * dxb
                           + cc.astype(b) * dyb * dyb)
                   - cb.astype(b) * dxb * dyb)
        # bf16 cancellation between the ca/cc and cb terms can round a true
        # tiny-negative power to positive along a thin splat's long axis —
        # clamp to <=0 (the quadratic form is PSD by construction: cov2d
        # carries the +0.3 low-pass dilation, so eigenvalues >= 0.3; the
        # f32 path keeps the CUDA power>0 guard for exact parity).
        power_b = jnp.minimum(power_b, 0.0)
        a_un_b = opa.astype(b) * jnp.exp(power_b)
        power = power_b.astype(jnp.float32)
        a_un = a_un_b.astype(jnp.float32)
    else:
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        a_un = opa * jnp.exp(power)
    rect_ok = ((t16x >= rx0) & (t16x < rx1) & (t16y >= ry0) & (t16y < ry1))
    alpha = jnp.minimum(ALPHA_MAX, a_un)
    ok = row_ok & rect_ok & (power <= 0.0) & (alpha >= ALPHA_MIN)
    return a_un, alpha, ok, dx, dy


def make_forward_kernel(n_tx, W, H, with_ntouch=True, bf16=False,
                        nt_weight=False, mxu=False):
    """with_ntouch=False drops the per-chunk n_touched DMA round trip —
    the tracking inner loop never reads it (renderer_tiled.render
    need_n_touched=False).

    nt_weight=True counts pixels where the pair's actual blend weight
    alpha*T_excl >= 1/255 instead of the reference's T > 0.5 test
    (forward.cu:512-514) — the exact "contributed at all" visibility
    signal the tracking cull masks on (a back-layer splat behind an
    0.6-alpha surface carries up to 40% of a pixel's color yet fails the
    T > 0.5 test). Opt-in: reference-parity renders keep the 0.5 rule.

    mxu=True rides the (otherwise idle in this elementwise mix) MXU for
    the two largest VPU blocks of the per-cell budget: the Gaussian
    falloff becomes one (K,6)@(6,P) matmul in the tile-local pixel basis
    (_mxu_power), and the transmittance prefix-product becomes a
    lower-triangular (K,K)@(K,P) matmul in log space (log1p/exp
    roundtrip, ~1e-5 relative in T). Tracking-loop opt-in, like bf16;
    parity/golden renders keep the exact VPU path."""

    def kernel(ranges_ref, feat_hbm, *rest):
        if with_ntouch:
            (ntz_ref, img_ref, ntouch_hbm,
             feat_vmem, nt_vmem, sem_in, sem_out) = rest
            del ntz_ref  # aliased into ntouch_hbm (zero-init)
        else:
            img_ref, feat_vmem, sem_in = rest
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        tile = ty * n_tx + tx
        start = ranges_ref[tile, 0]
        n = ranges_ref[tile, 1] - start

        f32 = jnp.float32
        px, py, pix_in = _pixel_rows(ty, tx, W, H)
        t16x = jnp.floor(px / 16.0)
        t16y = jnp.floor(py / 16.0)
        pix_in_f = pix_in.astype(f32)

        if mxu:
            # per-tile constants for the MXU paths (built once per tile)
            cx_t = (tx * TPX).astype(f32) + (TPX - 1) / 2.0
            cy_t = (ty * TPY).astype(f32) + (TPY - 1) / 2.0
            pxl = px - cx_t
            pyl = py - cy_t
            P6 = jnp.concatenate(
                [pxl * pxl, pxl * pyl, pyl * pyl, pxl, pyl,
                 jnp.ones_like(pxl)], axis=0)                 # (6, P)
            mxu_ctx = (cx_t, cy_t, P6)
            ii = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
            L_tri = (jj <= ii).astype(f32)                    # (K, K)
        else:
            mxu_ctx = None

        n_chunks = (n + K - 1) // K

        def dma_in(c):
            slot = jax.lax.rem(c, 2)
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(pl.multiple_of(start + c * K, K), K)],
                feat_vmem.at[slot], sem_in.at[slot])

        if with_ntouch:
            def nt_dma(c):
                slot = jax.lax.rem(c, 2)
                return pltpu.make_async_copy(
                    nt_vmem.at[slot],
                    ntouch_hbm.at[:, pl.ds(
                        pl.multiple_of(start + c * K, K), K)],
                    sem_out.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            dma_in(0).start()

        def body(state):
            c, (T_carry, done, acc) = state

            @pl.when(c + 1 < n_chunks)
            def _():
                dma_in(c + 1).start()

            dma_in(c).wait()
            slot = jax.lax.rem(c, 2)
            feat = jnp.transpose(feat_vmem[slot])             # (K, FEAT_DIM)
            rows = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
            row_ok = rows < (n - c * K)

            _, alpha, ok, _, _ = _chunk_terms(
                feat, px, py, t16x, t16y, row_ok, bf16, mxu_ctx)
            live = ok & (done < 0.5)
            alpha_eff = jnp.where(live, alpha, 0.0)
            if mxu:
                # prefix product as a lower-triangular matmul in log
                # space: log1p(0) = 0 for dead rows, so the cumsum is
                # exactly the live-prefix log-product
                loga = jnp.log1p(-alpha_eff)                  # (K, P)
                cum = jax.lax.dot_general(
                    L_tri, loga, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)      # (K, P)
                T_incl = T_carry * jnp.exp(cum)
                T_excl = T_incl / (1.0 - alpha_eff)
            else:
                cum_incl = _scan_mul(1.0 - alpha_eff)
                T_excl = T_carry * _shift_down(cum_incl, 1.0)
                T_incl = T_carry * cum_incl
            # T_incl is monotone along K, so (T_incl < eps) marks the
            # triggering gaussian and everything behind it.
            term = T_incl < T_EPS
            include = live & ~term
            w = jnp.where(include, alpha, 0.0) * T_excl       # (K, P)

            cfeat = feat[:, 6:10]                             # (K, 4) rgb+d
            acc = acc + jax.lax.dot_general(
                cfeat, w, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)                   # (4, P)

            new_T = jnp.minimum(
                T_carry,
                jnp.min(jnp.where(include, T_incl, 2.0), axis=0,
                        keepdims=True))
            new_done = jnp.maximum(
                done,
                jnp.max((live & term).astype(f32), axis=0, keepdims=True))

            if with_ntouch:
                nt_cond = (include & (w >= ALPHA_MIN) if nt_weight
                           else include & (T_incl > 0.5))
                nt = jnp.sum(
                    jnp.where(nt_cond, pix_in_f, 0.0),
                    axis=1, keepdims=True)                    # (K, 1)
                nt_t = jnp.transpose(nt)
                slot_o = jax.lax.rem(c, 2)

                @pl.when(c >= 2)
                def _():
                    nt_dma(c - 2).wait()

                @pl.when(slot_o == 0)
                def _():
                    nt_vmem[0] = nt_t

                @pl.when(slot_o == 1)
                def _():
                    nt_vmem[1] = nt_t

                nt_dma(c).start()
            return c + 1, (new_T, new_done, acc)

        T0 = jnp.ones((1, P), f32)
        done0 = jnp.where(pix_in, 0.0, 1.0).astype(f32)       # (1, P)
        acc0 = jnp.zeros((4, P), f32)

        def cond(state):
            c, (_, done, _) = state
            return (c < n_chunks) & (jnp.min(done) < 0.5)

        c_end, (T_f, _, acc_f) = jax.lax.while_loop(
            cond, body, (0, (T0, done0, acc0)))

        # drain the in-flight prefetch if we exited early
        @pl.when(c_end < n_chunks)
        def _():
            dma_in(c_end).wait()

        if with_ntouch:
            @pl.when(c_end >= 2)
            def _():
                nt_dma(c_end - 2).wait()

            @pl.when(c_end >= 1)
            def _():
                nt_dma(c_end - 1).wait()

        # channel 5 is spare in the render output — carry the number of
        # chunks this tile actually processed (early-exit diagnostics,
        # read by scripts/profile_kernels.py via chunk_stats_from_img)
        stats = jnp.full((1, P), c_end, f32)
        out = jnp.concatenate([acc_f, T_f, stats], axis=0)    # (6, P)
        img_ref[:, :, :] = out.reshape(6, 8, 128)

    return kernel


def make_backward_kernel(n_tx, W, H, bf16=False, mxu=False):
    def kernel(ranges_ref, feat_hbm, fwd_ref, cot_ref, dfz_ref, dfeat_hbm,
               feat_vmem, dgrad_vmem, sem_in, sem_out):
        del dfz_ref  # aliased into dfeat_hbm (zero-init)
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        tile = ty * n_tx + tx
        start = ranges_ref[tile, 0]
        n = ranges_ref[tile, 1] - start

        f32 = jnp.float32
        px, py, pix_in = _pixel_rows(ty, tx, W, H)
        t16x = jnp.floor(px / 16.0)
        t16y = jnp.floor(py / 16.0)

        if mxu:
            # MXU alpha evaluation, matching the forward's (_mxu_power);
            # the gradient products keep the exact VPU path (they need
            # dx/dy anyway)
            cx_t = (tx * TPX).astype(f32) + (TPX - 1) / 2.0
            cy_t = (ty * TPY).astype(f32) + (TPY - 1) / 2.0
            pxl = px - cx_t
            pyl = py - cy_t
            P6 = jnp.concatenate(
                [pxl * pxl, pxl * pyl, pyl * pyl, pxl, pyl,
                 jnp.ones_like(pxl)], axis=0)
            mxu_ctx = (cx_t, cy_t, P6)
        else:
            mxu_ctx = None

        fwd = fwd_ref[:, :, :].reshape(6, P)
        T_final = fwd[4:5]
        cot = cot_ref[:, :, :].reshape(5, P)
        dT = cot[4:5]
        dCD = cot[0:4]                                        # (4, P)
        # Stot = sum_ch dC_ch * C_total_ch + dD * D_total  (per-pixel)
        Stot = jnp.sum(dCD * fwd[0:4], axis=0, keepdims=True)  # (1, P)


        n_chunks = (n + K - 1) // K

        def dma_in(c):
            slot = jax.lax.rem(c, 2)
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(pl.multiple_of(start + c * K, K), K)],
                feat_vmem.at[slot], sem_in.at[slot])

        def out_dma(c):
            slot = jax.lax.rem(c, 2)
            return pltpu.make_async_copy(
                dgrad_vmem.at[slot],
                dfeat_hbm.at[:, pl.ds(pl.multiple_of(start + c * K, K), K)],
                sem_out.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            dma_in(0).start()

        def body(state):
            c, (T_carry, done, prefA) = state

            @pl.when(c + 1 < n_chunks)
            def _():
                dma_in(c + 1).start()

            dma_in(c).wait()
            slot = jax.lax.rem(c, 2)
            feat = jnp.transpose(feat_vmem[slot])             # (K, FEAT_DIM)
            rows = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
            row_ok = rows < (n - c * K)

            a_un, alpha, ok, dx, dy = _chunk_terms(
                feat, px, py, t16x, t16y, row_ok, bf16, mxu_ctx)
            live = ok & (done < 0.5)
            alpha_eff = jnp.where(live, alpha, 0.0)
            cum_incl = _scan_mul(1.0 - alpha_eff)
            T_excl = T_carry * _shift_down(cum_incl, 1.0)
            T_incl = T_carry * cum_incl
            term = T_incl < T_EPS
            include = live & ~term
            w = jnp.where(include, alpha, 0.0) * T_excl       # (K, P)

            cfeat = feat[:, 6:10]                             # (K, 4) rgb+d

            # dL/dalpha via the LINEARITY of the per-channel prefix sums:
            # the CUDA back-to-front accumulators (backward.cu:705-830)
            # collapse into A = sum_ch cot_ch * chan_ch — one MXU matmul —
            # and ONE forward-order scan of w*A (instead of four):
            #   dLda = A*T_excl - inv_om*(dT*T_final + Stot - prefix(w*A))
            A = jax.lax.dot_general(
                cfeat, dCD, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)                   # (K, P)
            pA = _scan_add(w * A) + prefA                     # (K, P) incl.
            inv_om = 1.0 / jnp.maximum(1.0 - alpha, 1e-6)
            dLda = A * T_excl - inv_om * (dT * T_final + Stot - pA)
            dLda = jnp.where(include, dLda, 0.0)              # (K, P)

            # color/depth grads in one MXU matmul: (K,P)@(P,4)
            d_cd = jax.lax.dot_general(
                w, dCD, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                   # (K, 4)
            d_colors = d_cd[:, 0:3]
            d_depths = d_cd[:, 3:4]

            # alpha = opa * G; grads flow through the unclamped value.
            # (A moment-matmul formulation of these five reductions was
            # tried and measured SLOWER on-chip — 45 vs 42 ms — the VPU
            # reduce chain wins at this shape.)
            opa = feat[:, 5:6]
            G = jnp.where(include, a_un / jnp.maximum(opa, 1e-12), 0.0)
            dLdG = opa * dLda
            d_opa = jnp.sum(G * dLda, axis=1, keepdims=True)  # (K, 1)

            ca = feat[:, 2:3]
            cb = feat[:, 3:4]
            cc = feat[:, 4:5]
            if bf16:
                # the quadratic-form gradient products are the largest
                # VPU block of the kernel: evaluate in bf16, reduce in f32
                b16 = jnp.bfloat16
                Gb = G.astype(b16)
                dxb = dx.astype(b16)
                dyb = dy.astype(b16)
                dLdGb = dLdG.astype(b16)
                gdx = Gb * dxb
                gdy = Gb * dyb
                dG_ddx = -gdx * ca.astype(b16) - gdy * cb.astype(b16)
                dG_ddy = -gdy * cc.astype(b16) - gdx * cb.astype(b16)

                def rsum(x):
                    return jnp.sum(x.astype(f32), axis=1, keepdims=True)

                d_mx = rsum(dLdGb * dG_ddx)
                d_my = rsum(dLdGb * dG_ddy)
                d_ca = rsum(dLdGb * (-0.5 * gdx * dxb))
                d_cb = rsum(dLdGb * (-gdx * dyb))
                d_cc = rsum(dLdGb * (-0.5 * gdy * dyb))
            else:
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
                [d_mx, d_my, d_ca, d_cb, d_cc, d_opa, d_colors, d_depths,
                 jnp.zeros((K, FEAT_DIM - 10), f32)], axis=1)
            dgrad = jnp.where(row_ok, dgrad, 0.0)
            dgrad_t = jnp.transpose(dgrad)                    # (FEAT_DIM, K)
            # double-buffered output DMA: only wait before REUSING a slot
            # (two chunks later) instead of synchronously after every
            # chunk — the grid is sequential on the single TensorCore, so
            # each removed wait comes straight off the critical path.
            slot_o = jax.lax.rem(c, 2)

            @pl.when(c >= 2)
            def _():
                out_dma(c - 2).wait()

            @pl.when(slot_o == 0)
            def _():
                dgrad_vmem[0] = dgrad_t

            @pl.when(slot_o == 1)
            def _():
                dgrad_vmem[1] = dgrad_t

            out_dma(c).start()

            new_T = jnp.minimum(
                T_carry,
                jnp.min(jnp.where(include, T_incl, 2.0), axis=0,
                        keepdims=True))
            new_done = jnp.maximum(
                done,
                jnp.max((live & term).astype(f32), axis=0, keepdims=True))
            return c + 1, (new_T, new_done, pA[-1:])

        T0 = jnp.ones((1, P), f32)
        done0 = jnp.where(pix_in, 0.0, 1.0).astype(f32)
        pA0 = jnp.zeros((1, P), f32)

        def cond(state):
            c, (_, done, _) = state
            return (c < n_chunks) & (jnp.min(done) < 0.5)

        c_end, _ = jax.lax.while_loop(cond, body, (0, (T0, done0, pA0)))

        @pl.when(c_end < n_chunks)
        def _():
            dma_in(c_end).wait()

        # drain the (up to two) in-flight output copies
        @pl.when(c_end >= 2)
        def _():
            out_dma(c_end - 2).wait()

        @pl.when(c_end >= 1)
        def _():
            out_dma(c_end - 1).wait()

    return kernel


class Composite2Out(NamedTuple):
    color_sum: jnp.ndarray        # (3, H, W) — before background
    depth_sum: jnp.ndarray        # (H, W)
    final_T: jnp.ndarray          # (H, W)
    n_touched_pairs: jnp.ndarray  # (B_al,) f32 per-pair touch counts


def assemble_image(img_blocks, n_tx, n_ty, W, H):
    """(C, n_ty*8, n_tx*128) block-permuted -> (C, H, W)."""
    C = img_blocks.shape[0]
    x = img_blocks.reshape(C, n_ty, 8, n_tx, 4, TPX)
    x = jnp.transpose(x, (0, 1, 2, 4, 3, 5))      # (C, n_ty, 8, 4, n_tx, 32)
    x = x.reshape(C, n_ty * TPY, n_tx * TPX)
    return x[:, :H, :W]


def chunk_stats_from_img(img_blocks, n_tx, n_ty):
    """(6, n_ty*8, n_tx*128) raw kernel output -> (n_ty, n_tx) number of
    K-pair chunks each tile actually processed (early-exit diagnostics;
    channel 5 carries the loop counter at exit)."""
    return img_blocks[5, ::8, ::128]


def disassemble_image(img, n_tx, n_ty):
    """(C, H, W) -> (C, n_ty*8, n_tx*128) block-permuted (zero padded)."""
    C, H_, W_ = img.shape
    x = jnp.pad(img, ((0, 0), (0, n_ty * TPY - H_), (0, n_tx * TPX - W_)))
    x = x.reshape(C, n_ty, 8, 4, n_tx, TPX)
    x = jnp.transpose(x, (0, 1, 2, 4, 3, 5))      # (C, n_ty, 8, n_tx, 4, 32)
    return x.reshape(C, n_ty * 8, n_tx * 128)


@functools.partial(
    jax.jit, static_argnames=("n_tx", "n_ty", "W", "H", "interpret",
                              "with_ntouch", "bf16", "nt_weight", "mxu"))
def _fwd_impl(feat, ranges, n_tx, n_ty, W, H, interpret=False,
              with_ntouch=True, bf16=False, nt_weight=False, mxu=False):
    B_al = feat.shape[0]
    feat_v = jnp.transpose(feat)                  # (FEAT_DIM, B_al)
    kernel = make_forward_kernel(n_tx, W, H, with_ntouch, bf16, nt_weight,
                                 mxu)
    img_spec = pl.BlockSpec((6, 8, 128), lambda ty, tx, *_: (0, ty, tx),
                            memory_space=pltpu.VMEM)
    img_shape = jax.ShapeDtypeStruct((6, n_ty * 8, n_tx * 128), jnp.float32)
    if with_ntouch:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_ty, n_tx),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[img_spec, pl.BlockSpec(memory_space=pl.ANY)],
            scratch_shapes=[
                pltpu.VMEM((2, FEAT_DIM, K), jnp.float32),
                pltpu.VMEM((2, 1, K), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
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
        grid=(n_ty, n_tx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=img_spec,
        scratch_shapes=[
            pltpu.VMEM((2, FEAT_DIM, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
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
    jax.jit, static_argnames=("n_tx", "n_ty", "W", "H", "interpret",
                              "bf16", "mxu"))
def _bwd_impl(feat, ranges, fwd_img, cot_img, n_tx, n_ty, W, H,
              interpret=False, bf16=False, mxu=False):
    B_al = feat.shape[0]
    feat_v = jnp.transpose(feat)
    kernel = make_backward_kernel(n_tx, W, H, bf16, mxu)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((6, 8, 128), lambda ty, tx, *_: (0, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 8, 128), lambda ty, tx, *_: (0, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT_DIM, K), jnp.float32),
            pltpu.VMEM((2, FEAT_DIM, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
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
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10))
def composite32(feat, ranges, n_tx, n_ty, W, H,
                interpret=False, with_ntouch=True,
                bf16=False, nt_weight=False, mxu=False) -> Composite2Out:
    """Differentiable 32x32-tiled compositing.

    feat: (B_al, FEAT_DIM) aligned pair records; ranges: (n_tiles, 2) i32.
    with_ntouch=False skips the per-pair touch-count output (zeros).
    bf16=True evaluates the Gaussian falloff / gradient products in
    bfloat16 (see _chunk_terms) — opt-in for tracking-loop renders.
    """
    img, ntouch = _fwd_impl(feat, ranges, n_tx, n_ty, W, H, interpret,
                            with_ntouch, bf16, nt_weight, mxu)
    asm = assemble_image(img, n_tx, n_ty, W, H)
    return Composite2Out(color_sum=asm[0:3], depth_sum=asm[3],
                         final_T=asm[4], n_touched_pairs=ntouch)


def _c32_fwd(feat, ranges, n_tx, n_ty, W, H, interpret=False,
             with_ntouch=True, bf16=False, nt_weight=False, mxu=False):
    img, ntouch = _fwd_impl(feat, ranges, n_tx, n_ty, W, H, interpret,
                            with_ntouch, bf16, nt_weight, mxu)
    asm = assemble_image(img, n_tx, n_ty, W, H)
    out = Composite2Out(color_sum=asm[0:3], depth_sum=asm[3],
                        final_T=asm[4], n_touched_pairs=ntouch)
    return out, (feat, ranges, img)


def _c32_bwd(n_tx, n_ty, W, H, interpret, with_ntouch, bf16, nt_weight,
             mxu, res, cot):
    feat, ranges, fwd_img = res
    cot_asm = jnp.concatenate(
        [cot.color_sum, cot.depth_sum[None], cot.final_T[None]], axis=0)
    cot_img = disassemble_image(cot_asm, n_tx, n_ty)
    dfeat = _bwd_impl(feat, ranges, fwd_img, cot_img, n_tx, n_ty, W, H,
                      interpret, bf16, mxu)
    return dfeat, None


composite32.defvjp(_c32_fwd, _c32_bwd)
