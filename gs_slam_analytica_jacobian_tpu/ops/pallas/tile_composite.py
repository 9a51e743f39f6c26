"""Pallas TPU kernels: tiled alpha-compositing forward + backward.

TPU-native replacement of the CUDA per-tile rasterization kernels
(cuda_rasterizer/forward.cu:406-535 render, backward.cu:648-872 render-bwd).

Design (vs the CUDA original):
- CUDA: one 16x16 thread block per tile, per-pixel threads march the
  depth-sorted pair list with shared-memory batches, warp divergence for
  skips and __syncthreads_count early-out.
- Here: one grid step per (TY x TX) lanes-aligned tile; pairs stream
  through VMEM in chunks of K. For each chunk, alpha for all (K, P) pairs x
  pixels is evaluated at once (the Gaussian quadratic form becomes a
  (K,6)x(6,P) contraction), transmittance is a Hillis-Steele scan along K,
  and the color/depth accumulation is a (4,K)x(K,P) MXU matmul. Early
  termination is a masked cut (no divergence), and the backward runs in
  FORWARD order using prefix sums + saved totals instead of CUDA's
  back-to-front re-traversal with atomics.
- Per-pair outputs (n_touched, pair gradients) are DMA'd to HBM at the
  pair's own offset; TPU grid steps run sequentially so later tiles
  overwrite any chunk-rounding spill into their range before using it.

Semantics carried over exactly: power>0 skip, alpha<1/255 skip, alpha
capped at 0.99 (value-only: gradients flow unclamped like the CUDA
backward, backward.cu:772-773,831), termination when T would drop below
1e-4 (the triggering Gaussian is dropped), 16x16-tile rect visibility test,
n_touched counted where test_T > 0.5.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..binning import FEAT_DIM

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
NGRAD = 10  # dmx dmy dca dcb dcc dopa dr dg db ddepth


def _scan_assoc(x, op, identity, K):
    """Inclusive Hillis-Steele scan along axis 0 of (K, P)."""
    y = x
    s = 1
    while s < K:
        pad = jnp.full((s,) + y.shape[1:], identity, y.dtype)
        y = op(y, jnp.concatenate([pad, y[:-s]], axis=0))
        s *= 2
    return y


def _shift_down_one(x, identity):
    pad = jnp.full((1,) + x.shape[1:], identity, x.dtype)
    return jnp.concatenate([pad, x[:-1]], axis=0)


def _pixel_arrays(ty, tx, TY, TX, dtype):
    """Flattened (1, P) pixel coordinate rows for this tile."""
    P = TY * TX
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (tx * TX + lane % TX).astype(dtype)
    py = (ty * TY + lane // TX).astype(dtype)
    return px, py


def _chunk_terms(feat, px, py, t16x, t16y, row_ok):
    """Common forward-order per-chunk quantities.

    feat: (K, FEAT_DIM) chunk; px/py/t16x/t16y: (1, P).
    Returns (alpha_unclamped, alpha, ok, delta_x, delta_y)."""
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

    dx = mx - px                  # (K, P)
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    rect_ok = ((t16x >= rx0) & (t16x < rx1) & (t16y >= ry0) & (t16y < ry1))
    a_un = opa * jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, a_un)
    ok = row_ok & rect_ok & (power <= 0.0) & (alpha >= ALPHA_MIN)
    return a_un, alpha, ok, dx, dy


def _forward_chunk(feat, px, py, t16x, t16y, row_ok, T_carry, done):
    """Returns (include, alpha, T_excl_abs, T_incl_abs, new_T, new_done)."""
    _, alpha, ok, _, _ = _chunk_terms(feat, px, py, t16x, t16y, row_ok)
    live = ok & (done < 0.5)
    alpha_eff = jnp.where(live, alpha, 0.0)
    one_minus = 1.0 - alpha_eff
    cum_incl = _scan_assoc(one_minus, jnp.multiply, 1.0, one_minus.shape[0])
    cum_excl = _shift_down_one(cum_incl, 1.0)
    T_excl = T_carry * cum_excl
    T_incl = T_carry * cum_incl
    would_term = live & (T_incl < T_EPS)
    cut = _scan_assoc(
        would_term.astype(jnp.float32), jnp.maximum, 0.0,
        would_term.shape[0]) > 0.5
    include = live & ~cut
    # product over included only (Mosaic has no reduce_prod: reuse the scan
    # and read its last row)
    om_inc = jnp.where(include, 1.0 - alpha, 1.0)
    new_T = T_carry * _scan_assoc(
        om_inc, jnp.multiply, 1.0, om_inc.shape[0])[-1:]
    new_done = jnp.maximum(
        done, jnp.max(would_term.astype(jnp.float32), axis=0, keepdims=True))
    return include, alpha, T_excl, T_incl, new_T, new_done


def make_forward_kernel(TY, TX, K, n_tx, W, H):
    """Pair records live in HBM FIELD-MAJOR (FEAT_DIM, B_al) so each chunk
    DMA is a full-lane (FEAT_DIM, K) slice (Mosaic requires lane-aligned
    slices); an in-kernel transpose yields the (K, FEAT_DIM) pair-major
    block the compute wants."""
    P = TY * TX

    def kernel(ranges_ref, feat_hbm, img_ref, ntouch_hbm,
               feat_vmem, nt_vmem, sem_in, sem_out):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        tile = ty * n_tx + tx
        start = ranges_ref[tile, 0]
        end = ranges_ref[tile, 1]
        n = end - start

        f32 = jnp.float32
        px, py = _pixel_arrays(ty, tx, TY, TX, f32)
        t16x = jnp.floor(px / 16.0)
        t16y = jnp.floor(py / 16.0)
        pix_in = ((px < W) & (py < H)).astype(f32)

        n_chunks = (n + K - 1) // K

        def body(c, carry):
            T_carry, done, acc = carry
            chunk_start = pl.multiple_of(start + c * K, K)
            cp = pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(chunk_start, K)], feat_vmem, sem_in)
            cp.start()
            cp.wait()
            feat = jnp.transpose(feat_vmem[:, :])             # (K, FEAT_DIM)
            rows = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
            row_ok = rows < (n - c * K)

            include, alpha, T_excl, T_incl, new_T, new_done = _forward_chunk(
                feat, px, py, t16x, t16y, row_ok, T_carry, done)
            w = jnp.where(include, alpha, 0.0) * T_excl      # (K, P)

            cfeat = jnp.concatenate(
                [feat[:, 6:9], feat[:, 9:10]], axis=1)        # (K, 4)
            acc = acc + jax.lax.dot_general(
                cfeat, w, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)                   # (4, P)

            nt = jnp.sum(
                jnp.where(include & (T_incl > 0.5), pix_in, 0.0),
                axis=1, keepdims=True)                        # (K, 1)
            nt_vmem[0:1, :] = jnp.transpose(nt)               # (1, K)
            cp_out = pltpu.make_async_copy(
                nt_vmem, ntouch_hbm.at[:, pl.ds(chunk_start, K)], sem_out)
            cp_out.start()
            cp_out.wait()
            return new_T, new_done, acc

        T0 = jnp.ones((1, P), f32)
        done0 = jnp.zeros((1, P), f32)
        acc0 = jnp.zeros((4, P), f32)

        def cond(state):
            c, (T_carry, done, acc) = state
            return (c < n_chunks) & (jnp.min(done) < 0.5)

        def wbody(state):
            c, carry = state
            return c + 1, body(c, carry)

        _, (T_f, done_f, acc_f) = jax.lax.while_loop(
            cond, wbody, (0, (T0, done0, acc0)))

        out = jnp.concatenate(
            [acc_f, T_f, jnp.zeros((1, P), f32)], axis=0)     # (6, P)
        img_ref[:, :, :] = out.reshape(6, TY, TX)

    return kernel


def make_backward_kernel(TY, TX, K, n_tx, W, H):
    P = TY * TX

    def kernel(ranges_ref, feat_hbm, fwd_ref, cot_ref, dfeat_hbm,
               feat_vmem, dgrad_vmem, sem_in, sem_out):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        tile = ty * n_tx + tx
        start = ranges_ref[tile, 0]
        end = ranges_ref[tile, 1]
        n = end - start

        f32 = jnp.float32
        px, py = _pixel_arrays(ty, tx, TY, TX, f32)
        t16x = jnp.floor(px / 16.0)
        t16y = jnp.floor(py / 16.0)

        fwd = fwd_ref[:, :, :].reshape(6, P)
        C_total = fwd[0:3]                                   # (3, P)
        D_total = fwd[3:4]
        T_final = fwd[4:5]
        cot = cot_ref[:, :, :].reshape(5, P)
        dC = cot[0:3]
        dD = cot[3:4]
        dT = cot[4:5]

        n_chunks = (n + K - 1) // K

        def body(c, carry):
            T_carry, done, pref_c, pref_d = carry
            chunk_start = pl.multiple_of(start + c * K, K)
            cp = pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(chunk_start, K)], feat_vmem, sem_in)
            cp.start()
            cp.wait()
            feat = jnp.transpose(feat_vmem[:, :])             # (K, FEAT_DIM)
            rows = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
            row_ok = rows < (n - c * K)

            a_un, alpha, ok, dx, dy = _chunk_terms(
                feat, px, py, t16x, t16y, row_ok)
            live = ok & (done < 0.5)
            alpha_eff = jnp.where(live, alpha, 0.0)
            one_minus = 1.0 - alpha_eff
            cum_incl = _scan_assoc(one_minus, jnp.multiply, 1.0, K)
            cum_excl = _shift_down_one(cum_incl, 1.0)
            T_excl = T_carry * cum_excl
            T_incl = T_carry * cum_incl
            would_term = live & (T_incl < T_EPS)
            cut = _scan_assoc(
                would_term.astype(f32), jnp.maximum, 0.0, K) > 0.5
            include = live & ~cut
            w = jnp.where(include, alpha, 0.0) * T_excl       # (K, P)

            colors = feat[:, 6:9]                             # (K, 3)
            depths = feat[:, 9:10]                            # (K, 1)

            # prefix-inclusive contribution sums (carry + within-chunk),
            # per channel (2D scans only — Mosaic-friendly)
            inv_om = 1.0 / jnp.maximum(1.0 - alpha, 1e-6)
            dLda = dD * depths * T_excl + dT * (-T_final * inv_om)
            new_pref_c = []
            for ch in range(3):
                pc_ch = (_scan_assoc(w * colors[:, ch:ch + 1], jnp.add,
                                     0.0, K) + pref_c[ch:ch + 1])  # (K, P)
                S_after = C_total[ch:ch + 1] - pc_ch
                dLda = dLda + dC[ch:ch + 1] * (
                    colors[:, ch:ch + 1] * T_excl - S_after * inv_om)
                new_pref_c.append(pc_ch[-1:])
            pd_in = _scan_assoc(w * depths, jnp.add, 0.0, K) + pref_d
            dLda = dLda - dD * (D_total - pd_in) * inv_om
            dLda = jnp.where(include, dLda, 0.0)              # (K, P)

            # color/depth grads: sum_p w * cotangent
            d_colors = jax.lax.dot_general(
                w, jnp.transpose(dC), (((1,), (0,)), ((), ())),
                preferred_element_type=f32)                   # (K, 3)
            d_depths = jax.lax.dot_general(
                w, jnp.transpose(dD), (((1,), (0,)), ((), ())),
                preferred_element_type=f32)                   # (K, 1)

            # alpha = opa * G (unclamped for grads, like the CUDA backward)
            G = jnp.where(include, a_un / jnp.maximum(feat[:, 5:6], 1e-12),
                          0.0)                                # (K, P) = exp(power)
            opa = feat[:, 5:6]
            dLdG = opa * dLda
            d_opa = jnp.sum(G * dLda, axis=1, keepdims=True)  # (K, 1)

            ca = feat[:, 2:3]
            cb = feat[:, 3:4]
            cc = feat[:, 4:5]
            gdx = G * dx
            gdy = G * dy
            # dpower/ddelx where delx = dx = mx - px -> dmean2d_x = dL/ddx
            dG_ddx = -gdx * ca - gdy * cb
            dG_ddy = -gdy * cc - gdx * cb
            d_mx = jnp.sum(dLdG * dG_ddx, axis=1, keepdims=True)
            d_my = jnp.sum(dLdG * dG_ddy, axis=1, keepdims=True)
            d_ca = jnp.sum(dLdG * (-0.5 * gdx * dx), axis=1, keepdims=True)
            d_cb = jnp.sum(dLdG * (-gdx * dy), axis=1, keepdims=True)
            d_cc = jnp.sum(dLdG * (-0.5 * gdy * dy), axis=1, keepdims=True)

            dgrad = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_opa, d_colors, d_depths,
                 jnp.zeros((K, FEAT_DIM - NGRAD), f32)], axis=1)
            dgrad = jnp.where(row_ok, dgrad, 0.0)
            dgrad_vmem[:, :] = jnp.transpose(dgrad)           # (FEAT_DIM, K)
            cp_out = pltpu.make_async_copy(
                dgrad_vmem, dfeat_hbm.at[:, pl.ds(chunk_start, K)], sem_out)
            cp_out.start()
            cp_out.wait()

            om_inc = jnp.where(include, 1.0 - alpha, 1.0)
            new_T = T_carry * _scan_assoc(om_inc, jnp.multiply, 1.0, K)[-1:]
            new_done = jnp.maximum(
                done, jnp.max(would_term.astype(f32), axis=0, keepdims=True))
            return (new_T, new_done, jnp.concatenate(new_pref_c, axis=0),
                    pd_in[-1:])

        T0 = jnp.ones((1, P), f32)
        done0 = jnp.zeros((1, P), f32)
        pc0 = jnp.zeros((3, P), f32)
        pd0 = jnp.zeros((1, P), f32)

        def cond(state):
            c, _ = state
            return c < n_chunks

        def wbody(state):
            c, carry = state
            return c + 1, body(c, carry)

        jax.lax.while_loop(cond, wbody, (0, (T0, done0, pc0, pd0)))

    return kernel


class CompositeOut(NamedTuple):
    color_sum: jnp.ndarray   # (3, Hp, Wp) — before background
    depth_sum: jnp.ndarray   # (Hp, Wp)
    final_T: jnp.ndarray     # (Hp, Wp)
    n_touched_pairs: jnp.ndarray  # (B,) f32 per-pair touch counts


def _field_major(feat, K):
    """(B, FEAT_DIM) -> (FEAT_DIM, B_pad) field-major layout (B padded to a
    multiple of K; binning already aligns tile ranges to K)."""
    B = feat.shape[0]
    B_pad = ((B + K - 1) // K) * K
    feat_p = jnp.pad(feat, ((0, B_pad - B), (0, 0)))
    return jnp.transpose(feat_p), B_pad


@functools.partial(
    jax.jit,
    static_argnames=("TY", "TX", "K", "n_tx", "n_ty", "W", "H", "interpret"))
def _composite_fwd_impl(feat, ranges, TY, TX, K, n_tx, n_ty, W, H,
                        interpret=False):
    feat_v, B_pad = _field_major(feat, K)
    kernel = make_forward_kernel(TY, TX, K, n_tx, W, H)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ty, n_tx),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((6, TY, TX), lambda ty, tx, *_: (0, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((FEAT_DIM, K), jnp.float32),
            pltpu.VMEM((1, K), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    img, ntouch = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((6, n_ty * TY, n_tx * TX), jnp.float32),
            jax.ShapeDtypeStruct((1, B_pad), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ranges, feat_v)
    B = feat.shape[0]
    return img, ntouch[0, :B]


@functools.partial(
    jax.jit,
    static_argnames=("TY", "TX", "K", "n_tx", "n_ty", "W", "H", "interpret"))
def _composite_bwd_impl(feat, ranges, fwd_img, cot_img,
                        TY, TX, K, n_tx, n_ty, W, H, interpret=False):
    feat_v, B_pad = _field_major(feat, K)
    kernel = make_backward_kernel(TY, TX, K, n_tx, W, H)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((6, TY, TX), lambda ty, tx, *_: (0, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, TY, TX), lambda ty, tx, *_: (0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((FEAT_DIM, K), jnp.float32),
            pltpu.VMEM((FEAT_DIM, K), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    dfeat_v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(feat_v.shape, jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ranges, feat_v, fwd_img, cot_img)
    return jnp.transpose(dfeat_v)[: feat.shape[0]]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def composite_tiles(feat, ranges, TY, TX, K, n_tx, n_ty, W, H,
                    interpret=False) -> CompositeOut:
    """Differentiable tiled compositing. feat: (B, FEAT_DIM) sorted pair
    records; ranges: (n_tiles, 2) int32. Outputs are in the PADDED image
    (n_ty*TY, n_tx*TX); crop outside."""
    img, ntouch = _composite_fwd_impl(
        feat, ranges, TY, TX, K, n_tx, n_ty, W, H, interpret)
    return CompositeOut(color_sum=img[0:3], depth_sum=img[3],
                        final_T=img[4], n_touched_pairs=ntouch)


def _ct_fwd(feat, ranges, TY, TX, K, n_tx, n_ty, W, H, interpret=False):
    img, ntouch = _composite_fwd_impl(
        feat, ranges, TY, TX, K, n_tx, n_ty, W, H, interpret)
    out = CompositeOut(color_sum=img[0:3], depth_sum=img[3],
                       final_T=img[4], n_touched_pairs=ntouch)
    return out, (feat, ranges, img)


def _ct_bwd(TY, TX, K, n_tx, n_ty, W, H, interpret, res, cot):
    feat, ranges, fwd_img = res
    cot_img = jnp.concatenate(
        [cot.color_sum, cot.depth_sum[None], cot.final_T[None]], axis=0)
    dfeat = _composite_bwd_impl(
        feat, ranges, fwd_img, cot_img, TY, TX, K, n_tx, n_ty, W, H,
        interpret)
    return dfeat, None


composite_tiles.defvjp(_ct_fwd, _ct_bwd)
