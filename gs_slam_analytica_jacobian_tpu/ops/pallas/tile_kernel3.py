"""Pallas TPU kernels v3: 16x16-pixel subtiles, four per (8,128) block.

Why: the chunk-stats instrumentation (scripts/profile_kernels.py, real
chip, converged-room scene) showed the v2 32x32 kernel processes 99.9% of
its available pair-chunks — nearly every tile holds at least one pixel
whose transmittance never crosses the 1e-4 termination, so the tile-level
early exit cannot fire, and the cost driver is PAIR-CELLS = pairs x 1024
lanes. Binning at 16x16 roughly doubles the pair count but quarters the
lanes each pair pays, a ~2x cut in pair-cells — the same reasoning that
took round 1's (8,128) tiles to 32x32. A 16x16 subtile cannot fill the
(8,128) f32 block on its own, so each grid step processes a 2x2 GROUP of
subtiles packed into the 1024 lanes (subtile j owns lanes [256j, 256j+4)):

- each subtile has its OWN pair run (own DMA stream, own chunk count);
  the loop runs to the max of the four chunk counts, with exhausted
  subtiles masked — so a straggler subtile only pays its own (short)
  list, not a 32x32 superset;
- every per-pair operand is materialized as a (K, 1024) array whose lane
  groups carry their subtile's slice (concat of four sublane-broadcasts —
  128-aligned, no cross-lane shuffles), which keeps the whole v2
  elementwise pipeline (scans, termination, weights) unchanged;
- the MXU contractions (color accumulation, dL/dalpha channel collapse,
  color/depth grads) split into four per-subtile matmuls over 256-lane
  slices;
- per-pair reductions reshape (K, 1024) -> (K, 4, 256) and reduce the
  lane-local 256, giving each subtile's pair rows their own sums.

Semantics are identical to tile_kernel2 (forward.cu:406-535 parity:
power>0 skip, alpha clamp at 0.99, T<1e-4 termination, 16px rect test —
which at 16x16 binning coincides with the bin tile), and the pair plan
comes from the same binning2.plan_pairs with tile_w=tile_h=16.

MEASURED OUTCOME (r2, real chip, N=200k room scene): 51.8 ms forward vs
tile_kernel2's 14.4 ms. The per-operand packing (broadcast + lane-concat
of four per-subtile slices) lowers to per-piece relayouts that swamp the
~1.5x loop-iteration savings, and the amortization radius_pad inflates
16px pair counts 2.4x. The kernel is kept as a CORRECT, fully tested
alternative (oracle parity fwd+bwd, real-chip lane coverage) and as the
record of why 16px subtiling does not pay on this hardware — tile_kernel2
remains the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..binning2 import FEAT_DIM
from .tile_kernel2 import (ALPHA_MAX, ALPHA_MIN, T_EPS, Composite2Out,
                           _scan_add, _scan_mul, _shift_down)

TS = 16           # subtile edge in pixels
PS = TS * TS      # 256 pixels per subtile
NS = 4            # subtiles per grid step (2x2 group = one 32x32 region)
P = NS * PS       # 1024 lanes = one (8, 128) f32 block
K = 128           # pairs per chunk per subtile


def grid_dims16(width: int, height: int):
    """(n_gx, n_gy) 32x32 GROUPS; the 16px tile grid is (2*n_gx, 2*n_gy)."""
    return (width + 31) // 32, (height + 31) // 32


def _pixel_rows16(gy, gx, W, H):
    """(1, P) pixel coords: lane q -> subtile j = q // 256,
    r = q % 256 -> (y16, x16) = (r // 16, r % 16),
    pixel = (gy*32 + (j//2)*16 + y16, gx*32 + (j%2)*16 + x16)."""
    q = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    j = q // PS
    r = q % PS
    y16 = r // TS
    x16 = r % TS
    f32 = jnp.float32
    px = (gx * 32 + (j % 2) * TS + x16).astype(f32)
    py = (gy * 32 + (j // 2) * TS + y16).astype(f32)
    pix_in = (px < W) & (py < H)
    return px, py, pix_in


def _clean_feat4(feat_vmem, slot, n_live):
    """List of NS (F, K) slices with rows beyond each subtile's live count
    zeroed — empty/exhausted subtiles otherwise feed uninitialized VMEM
    into the packed operands, where 0 * garbage poisons the matmuls."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    return [jnp.where(lane < n_live[j], feat_vmem[slot, j], 0.0)
            for j in range(NS)]


def _cols4(feat4, i):
    """feat4: list of NS (FEAT_DIM, K) slices -> (K, P) operand whose lane
    group j carries slice j's scalar i (sublane-broadcast + lane concat)."""
    parts = [jnp.broadcast_to(jnp.transpose(feat4[j][i:i + 1, :]), (K, PS))
             for j in range(NS)]
    return jnp.concatenate(parts, axis=1)


def _subtile_terms(feat4, px, py, t16x, t16y, row_ok, bf16=False):
    """The v2 _chunk_terms evaluated on packed per-subtile operands.
    Returns (a_un, alpha, ok, dx, dy) as (K, P)."""
    mx = _cols4(feat4, 0)
    my = _cols4(feat4, 1)
    ca = _cols4(feat4, 2)
    cb = _cols4(feat4, 3)
    cc = _cols4(feat4, 4)
    opa = _cols4(feat4, 5)
    rx0 = _cols4(feat4, 10)
    ry0 = _cols4(feat4, 11)
    rx1 = _cols4(feat4, 12)
    ry1 = _cols4(feat4, 13)

    dx = mx - px
    dy = my - py
    if bf16:
        b = jnp.bfloat16
        dxb = dx.astype(b)
        dyb = dy.astype(b)
        power_b = (-0.5 * (ca.astype(b) * dxb * dxb
                           + cc.astype(b) * dyb * dyb)
                   - cb.astype(b) * dxb * dyb)
        power_b = jnp.minimum(power_b, 0.0)   # see tile_kernel2 bf16 note
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


def make_forward_kernel16(n_tx16, W, H, with_ntouch=True, bf16=False):
    def kernel(ranges_ref, feat_hbm, *rest):
        if with_ntouch:
            (ntz_ref, img_ref, ntouch_hbm,
             feat_vmem, nt_vmem, sem_in, sem_out) = rest
            del ntz_ref
        else:
            img_ref, feat_vmem, sem_in = rest
        gy = pl.program_id(0)
        gx = pl.program_id(1)

        starts, n_list, n_chunks_j = [], [], []
        for j in range(NS):
            t16 = (2 * gy + j // 2) * n_tx16 + (2 * gx + j % 2)
            s_j = ranges_ref[2 * t16]
            n_j = ranges_ref[2 * t16 + 1] - s_j
            starts.append(s_j)
            n_list.append(n_j)
            n_chunks_j.append((n_j + K - 1) // K)
        max_chunks = functools.reduce(jnp.maximum, n_chunks_j)

        f32 = jnp.float32
        px, py, pix_in = _pixel_rows16(gy, gx, W, H)
        t16x = jnp.floor(px / 16.0)
        t16y = jnp.floor(py / 16.0)
        pix_in_f = pix_in.astype(f32)

        # Every DMA below is guarded by c < n_chunks_j[j]: an exhausted
        # subtile keeps riding the loop (its rows masked) but issues no
        # copies — in particular its output slices are never overwritten.
        def dma_in(c, j):
            slot = jax.lax.rem(c, 2)
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(pl.multiple_of(starts[j] + c * K, K),
                                     K)],
                feat_vmem.at[slot, j], sem_in.at[slot, j])

        if with_ntouch:
            def nt_dma(c, j):
                slot = jax.lax.rem(c, 2)
                return pltpu.make_async_copy(
                    nt_vmem.at[slot, j],
                    ntouch_hbm.at[:, pl.ds(
                        pl.multiple_of(starts[j] + c * K, K), K)],
                    sem_out.at[slot, j])

        for j in range(NS):
            @pl.when(n_chunks_j[j] > 0)
            def _(j=j):
                dma_in(0, j).start()

        def exhausted_row(c):
            return jnp.concatenate(
                [jnp.broadcast_to((c >= n_chunks_j[j]).astype(f32),
                                  (1, PS)) for j in range(NS)], axis=1)

        def body(state):
            c, (T_carry, done, acc) = state

            for j in range(NS):
                @pl.when(c + 1 < n_chunks_j[j])
                def _(j=j):
                    dma_in(c + 1, j).start()

            for j in range(NS):
                @pl.when(c < n_chunks_j[j])
                def _(j=j):
                    dma_in(c, j).wait()
            slot = jax.lax.rem(c, 2)
            n_live = [n_list[j] - c * K for j in range(NS)]
            feat4 = _clean_feat4(feat_vmem, slot, n_live)
            rows = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
            row_ok = jnp.concatenate(
                [jnp.broadcast_to(rows < n_live[j], (K, PS))
                 for j in range(NS)], axis=1)

            _, alpha, ok, _, _ = _subtile_terms(
                feat4, px, py, t16x, t16y, row_ok, bf16)
            live = ok & (done < 0.5)
            alpha_eff = jnp.where(live, alpha, 0.0)
            cum_incl = _scan_mul(1.0 - alpha_eff)
            T_excl = T_carry * _shift_down(cum_incl, 1.0)
            T_incl = T_carry * cum_incl
            term = T_incl < T_EPS
            include = live & ~term
            w = jnp.where(include, alpha, 0.0) * T_excl       # (K, P)

            acc_parts = []
            for j in range(NS):
                cfeat_j = jnp.transpose(feat4[j][6:10, :])    # (K, 4)
                acc_parts.append(jax.lax.dot_general(
                    cfeat_j, w[:, j * PS:(j + 1) * PS],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=f32))              # (4, PS)
            acc = acc + jnp.concatenate(acc_parts, axis=1)    # (4, P)

            new_T = jnp.minimum(
                T_carry,
                jnp.min(jnp.where(include, T_incl, 2.0), axis=0,
                        keepdims=True))
            new_done = jnp.maximum(
                done,
                jnp.max((live & term).astype(f32), axis=0, keepdims=True))

            if with_ntouch:
                touch = jnp.where(include & (T_incl > 0.5), pix_in_f, 0.0)
                # per-subtile lane-slice reductions (fresh offset-0
                # vectors — see the backward kernel's Mosaic note)
                nts = [jnp.transpose(jnp.sum(
                    touch[:, j * PS:(j + 1) * PS], axis=1, keepdims=True))
                    for j in range(NS)]                       # NS x (1, K)
                slot_o = jax.lax.rem(c, 2)

                for j in range(NS):
                    @pl.when((c >= 2) & (c - 2 < n_chunks_j[j]))
                    def _(j=j):
                        nt_dma(c - 2, j).wait()

                for sv in range(2):
                    @pl.when(slot_o == sv)
                    def _(sv=sv):
                        for j in range(NS):
                            nt_vmem[sv, j] = nts[j]

                for j in range(NS):
                    @pl.when(c < n_chunks_j[j])
                    def _(j=j):
                        nt_dma(c, j).start()
            return c + 1, (new_T, new_done, acc)

        T0 = jnp.ones((1, P), f32)
        done0 = jnp.where(pix_in, 0.0, 1.0).astype(f32)
        acc0 = jnp.zeros((4, P), f32)

        def cond(state):
            c, (_, done, _) = state
            done_eff = jnp.maximum(done, exhausted_row(c))
            return (c < max_chunks) & (jnp.min(done_eff) < 0.5)

        c_end, (T_f, _, acc_f) = jax.lax.while_loop(
            cond, body, (0, (T0, done0, acc0)))

        # drain in-flight prefetches and the last (up to two) output
        # copies per subtile; issued_j = how many chunks subtile j ran
        for j in range(NS):
            @pl.when(c_end < n_chunks_j[j])
            def _(j=j):
                dma_in(c_end, j).wait()

        if with_ntouch:
            # outstanding output copies are exactly those issued at
            # c_end-2 / c_end-1 (earlier ones were waited in-body)
            for j in range(NS):
                for d in (2, 1):
                    x = c_end - d

                    @pl.when((x >= 0) & (x < n_chunks_j[j]))
                    def _(j=j, x=x):
                        nt_dma(x, j).wait()

        stats = jnp.full((1, P), c_end, f32)
        out = jnp.concatenate([acc_f, T_f, stats], axis=0)    # (6, P)
        img_ref[:, :, :] = out.reshape(6, 8, 128)

    return kernel


def make_backward_kernel16(n_tx16, W, H, bf16=False):
    def kernel(ranges_ref, feat_hbm, fwd_ref, cot_ref, dfz_ref, dfeat_hbm,
               feat_vmem, dgrad_vmem, sem_in, sem_out):
        del dfz_ref
        gy = pl.program_id(0)
        gx = pl.program_id(1)

        starts, n_chunks_j, n_list = [], [], []
        for j in range(NS):
            t16 = (2 * gy + j // 2) * n_tx16 + (2 * gx + j % 2)
            s_j = ranges_ref[2 * t16]
            n_j = ranges_ref[2 * t16 + 1] - s_j
            starts.append(s_j)
            n_list.append(n_j)
            n_chunks_j.append((n_j + K - 1) // K)
        max_chunks = functools.reduce(jnp.maximum, n_chunks_j)

        f32 = jnp.float32
        px, py, pix_in = _pixel_rows16(gy, gx, W, H)
        t16x = jnp.floor(px / 16.0)
        t16y = jnp.floor(py / 16.0)

        fwd = fwd_ref[:, :, :].reshape(6, P)
        T_final = fwd[4:5]
        cot = cot_ref[:, :, :].reshape(5, P)
        dT = cot[4:5]
        dCD = cot[0:4]                                        # (4, P)
        Stot = jnp.sum(dCD * fwd[0:4], axis=0, keepdims=True)  # (1, P)

        # all DMAs guarded by c < n_chunks_j[j] (see forward kernel note)
        def dma_in(c, j):
            slot = jax.lax.rem(c, 2)
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(pl.multiple_of(starts[j] + c * K, K),
                                     K)],
                feat_vmem.at[slot, j], sem_in.at[slot, j])

        def out_dma(c, j):
            slot = jax.lax.rem(c, 2)
            return pltpu.make_async_copy(
                dgrad_vmem.at[slot, j],
                dfeat_hbm.at[:, pl.ds(
                    pl.multiple_of(starts[j] + c * K, K), K)],
                sem_out.at[slot, j])

        for j in range(NS):
            @pl.when(n_chunks_j[j] > 0)
            def _(j=j):
                dma_in(0, j).start()

        def exhausted_row(c):
            return jnp.concatenate(
                [jnp.broadcast_to((c >= n_chunks_j[j]).astype(f32),
                                  (1, PS)) for j in range(NS)], axis=1)

        def body(state):
            c, (T_carry, done, prefA) = state

            for j in range(NS):
                @pl.when(c + 1 < n_chunks_j[j])
                def _(j=j):
                    dma_in(c + 1, j).start()

            for j in range(NS):
                @pl.when(c < n_chunks_j[j])
                def _(j=j):
                    dma_in(c, j).wait()
            slot = jax.lax.rem(c, 2)
            n_live = [n_list[j] - c * K for j in range(NS)]
            feat4 = _clean_feat4(feat_vmem, slot, n_live)
            rows = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
            row_ok_col = [rows < n_live[j] for j in range(NS)]
            row_ok = jnp.concatenate(
                [jnp.broadcast_to(row_ok_col[j], (K, PS))
                 for j in range(NS)], axis=1)

            a_un, alpha, ok, dx, dy = _subtile_terms(
                feat4, px, py, t16x, t16y, row_ok, bf16)
            live = ok & (done < 0.5)
            alpha_eff = jnp.where(live, alpha, 0.0)
            cum_incl = _scan_mul(1.0 - alpha_eff)
            T_excl = T_carry * _shift_down(cum_incl, 1.0)
            T_incl = T_carry * cum_incl
            term = T_incl < T_EPS
            include = live & ~term
            w = jnp.where(include, alpha, 0.0) * T_excl       # (K, P)

            # dL/dalpha via the channel-collapse (see tile_kernel2):
            # A = sum_ch cot_ch * chan_ch, per-subtile MXU matmuls
            A_parts = []
            for j in range(NS):
                cfeat_j = jnp.transpose(feat4[j][6:10, :])    # (K, 4)
                A_parts.append(jax.lax.dot_general(
                    cfeat_j, dCD[:, j * PS:(j + 1) * PS],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32))              # (K, PS)
            A = jnp.concatenate(A_parts, axis=1)              # (K, P)
            pA = _scan_add(w * A) + prefA
            inv_om = 1.0 / jnp.maximum(1.0 - alpha, 1e-6)
            dLda = A * T_excl - inv_om * (dT * T_final + Stot - pA)
            dLda = jnp.where(include, dLda, 0.0)              # (K, P)

            opa = _cols4(feat4, 5)
            G = jnp.where(include, a_un / jnp.maximum(opa, 1e-12), 0.0)
            dLdG = opa * dLda
            ca = _cols4(feat4, 2)
            cb = _cols4(feat4, 3)
            cc = _cols4(feat4, 4)
            if bf16:
                b16 = jnp.bfloat16
                Gb = G.astype(b16)
                dxb = dx.astype(b16)
                dyb = dy.astype(b16)
                dLdGb = dLdG.astype(b16)
                gdx = Gb * dxb
                gdy = Gb * dyb
                dG_ddx = -gdx * ca.astype(b16) - gdy * cb.astype(b16)
                dG_ddy = -gdy * cc.astype(b16) - gdx * cb.astype(b16)
                prods = [(dLdGb * dG_ddx).astype(f32),
                         (dLdGb * dG_ddy).astype(f32),
                         (dLdGb * (-0.5 * gdx * dxb)).astype(f32),
                         (dLdGb * (-gdx * dyb)).astype(f32),
                         (dLdGb * (-0.5 * gdy * dyb)).astype(f32),
                         G * dLda]
            else:
                gdx = G * dx
                gdy = G * dy
                dG_ddx = -gdx * ca - gdy * cb
                dG_ddy = -gdy * cc - gdx * cb
                prods = [dLdG * dG_ddx, dLdG * dG_ddy,
                         dLdG * (-0.5 * gdx * dx),
                         dLdG * (-gdx * dy),
                         dLdG * (-0.5 * gdy * dy),
                         G * dLda]

            slot_o = jax.lax.rem(c, 2)

            for j in range(NS):
                @pl.when((c >= 2) & (c - 2 < n_chunks_j[j]))
                def _(j=j):
                    out_dma(c - 2, j).wait()

            dgrads = []
            for j in range(NS):
                sl = slice(j * PS, (j + 1) * PS)
                d_cd_j = jax.lax.dot_general(
                    w[:, sl], dCD[:, sl],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)               # (K, 4)
                # per-quantity lane-slice reductions: each produces a
                # fresh offset-0 (K, 1) vector (slicing a packed (K, NS)
                # array instead gives operands with heterogeneous lane
                # offsets, which Mosaic's concatenate cannot lower)
                cols = [jnp.sum(p[:, sl], axis=1, keepdims=True)
                        for p in prods]                       # 6 x (K, 1)
                dgrad_j = jnp.concatenate(
                    cols + [d_cd_j,
                            jnp.zeros((K, FEAT_DIM - 10), f32)], axis=1)
                dgrad_j = jnp.where(row_ok_col[j], dgrad_j, 0.0)
                dgrads.append(jnp.transpose(dgrad_j))         # (F, K)

            for sv in range(2):
                @pl.when(slot_o == sv)
                def _(sv=sv):
                    for j in range(NS):
                        dgrad_vmem[sv, j] = dgrads[j]

            for j in range(NS):
                @pl.when(c < n_chunks_j[j])
                def _(j=j):
                    out_dma(c, j).start()

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
            done_eff = jnp.maximum(done, exhausted_row(c))
            return (c < max_chunks) & (jnp.min(done_eff) < 0.5)

        c_end, _ = jax.lax.while_loop(cond, body, (0, (T0, done0, pA0)))

        for j in range(NS):
            @pl.when(c_end < n_chunks_j[j])
            def _(j=j):
                dma_in(c_end, j).wait()

        for j in range(NS):
            for d in (2, 1):
                x = c_end - d

                @pl.when((x >= 0) & (x < n_chunks_j[j]))
                def _(j=j, x=x):
                    out_dma(x, j).wait()

    return kernel


def assemble_image16(img_blocks, n_gx, n_gy, W, H):
    """(C, n_gy*8, n_gx*128) block-permuted -> (C, H, W).
    s-axis (8) decomposes as (jy, jx, sy); l-axis (128) as (ly:8, lx:16);
    pixel = (gy*32 + jy*16 + sy*8 + ly, gx*32 + jx*16 + lx)."""
    C = img_blocks.shape[0]
    x = img_blocks.reshape(C, n_gy, 2, 2, 2, n_gx, 8, 16)
    x = jnp.transpose(x, (0, 1, 2, 4, 6, 5, 3, 7))
    x = x.reshape(C, n_gy * 32, n_gx * 32)
    return x[:, :H, :W]


def disassemble_image16(img, n_gx, n_gy):
    """(C, H, W) -> (C, n_gy*8, n_gx*128) block-permuted (zero padded);
    inverse of assemble_image16."""
    C, H_, W_ = img.shape
    x = jnp.pad(img, ((0, 0), (0, n_gy * 32 - H_), (0, n_gx * 32 - W_)))
    # y-axis (32) = (jy:2, sy:2, ly:8); x-axis (32) = (jx:2, lx:16)
    x = x.reshape(C, n_gy, 2, 2, 8, n_gx, 2, 16)
    # current dims: (C, gy, jy, sy, ly, gx, jx, lx)
    # target s-axis order (jy, jx, sy), l-axis (ly, lx):
    x = jnp.transpose(x, (0, 1, 2, 6, 3, 5, 4, 7))
    x = x.reshape(C, n_gy * 8, n_gx * 128)
    return x


@functools.partial(
    jax.jit, static_argnames=("n_gx", "n_gy", "W", "H", "interpret",
                              "with_ntouch", "bf16"))
def _fwd_impl16(feat, ranges, n_gx, n_gy, W, H, interpret=False,
                with_ntouch=True, bf16=False):
    B_al = feat.shape[0]
    n_tx16 = 2 * n_gx
    feat_v = jnp.transpose(feat)                  # (FEAT_DIM, B_al)
    kernel = make_forward_kernel16(n_tx16, W, H, with_ntouch, bf16)
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
                pltpu.VMEM((2, NS, FEAT_DIM, K), jnp.float32),
                pltpu.VMEM((2, NS, 1, K), jnp.float32),
                pltpu.SemaphoreType.DMA((2, NS)),
                pltpu.SemaphoreType.DMA((2, NS)),
            ],
        )
        img, ntouch = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(img_shape,
                       jax.ShapeDtypeStruct((1, B_al), jnp.float32)),
            input_output_aliases={2: 1},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(jnp.ravel(ranges), feat_v, jnp.zeros((1, B_al), jnp.float32))
        return img, ntouch[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_gy, n_gx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=img_spec,
        scratch_shapes=[
            pltpu.VMEM((2, NS, FEAT_DIM, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2, NS)),
        ],
    )
    img = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=img_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.ravel(ranges), feat_v)
    return img, jnp.zeros((B_al,), jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("n_gx", "n_gy", "W", "H", "interpret",
                              "bf16"))
def _bwd_impl16(feat, ranges, fwd_img, cot_img, n_gx, n_gy, W, H,
                interpret=False, bf16=False):
    B_al = feat.shape[0]
    n_tx16 = 2 * n_gx
    feat_v = jnp.transpose(feat)
    kernel = make_backward_kernel16(n_tx16, W, H, bf16)
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
            pltpu.VMEM((2, NS, FEAT_DIM, K), jnp.float32),
            pltpu.VMEM((2, NS, FEAT_DIM, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2, NS)),
            pltpu.SemaphoreType.DMA((2, NS)),
        ],
    )
    dfeat_v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((FEAT_DIM, B_al), jnp.float32),
        input_output_aliases={4: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.ravel(ranges), feat_v, fwd_img, cot_img,
      jnp.zeros((FEAT_DIM, B_al), jnp.float32))
    return jnp.transpose(dfeat_v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def composite16(feat, ranges, n_gx, n_gy, W, H,
                interpret=False, with_ntouch=True,
                bf16=False) -> Composite2Out:
    """Differentiable 16x16-subtiled compositing (drop-in for
    composite32 with a 16px-binned plan; ranges: (4*n_gx*n_gy, 2))."""
    img, ntouch = _fwd_impl16(feat, ranges, n_gx, n_gy, W, H, interpret,
                              with_ntouch, bf16)
    asm = assemble_image16(img, n_gx, n_gy, W, H)
    return Composite2Out(color_sum=asm[0:3], depth_sum=asm[3],
                         final_T=asm[4], n_touched_pairs=ntouch)


def _c16_fwd(feat, ranges, n_gx, n_gy, W, H, interpret=False,
             with_ntouch=True, bf16=False):
    img, ntouch = _fwd_impl16(feat, ranges, n_gx, n_gy, W, H, interpret,
                              with_ntouch, bf16)
    asm = assemble_image16(img, n_gx, n_gy, W, H)
    out = Composite2Out(color_sum=asm[0:3], depth_sum=asm[3],
                        final_T=asm[4], n_touched_pairs=ntouch)
    return out, (feat, ranges, img)


def _c16_bwd(n_gx, n_gy, W, H, interpret, with_ntouch, bf16, res, cot):
    feat, ranges, fwd_img = res
    cot_asm = jnp.concatenate(
        [cot.color_sum, cot.depth_sum[None], cot.final_T[None]], axis=0)
    cot_img = disassemble_image16(cot_asm, n_gx, n_gy)
    dfeat = _bwd_impl16(feat, ranges, fwd_img, cot_img, n_gx, n_gy, W, H,
                        interpret, bf16)
    return dfeat, None


composite16.defvjp(_c16_fwd, _c16_bwd)
