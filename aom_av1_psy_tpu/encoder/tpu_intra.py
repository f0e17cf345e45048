"""TPU-resident conforming all-intra frame encoder (the fused path).

This is the round-2 fusion of the jitted analysis pipeline and the
conforming encoder demanded by VERDICT r1 #1: ONE path where the mode
search runs batched on the TPU over wavefronts of the block grid using
**real reconstruction edges**, the transform/quantize/recon loop is the
bit-exact normative integer path (``ops/txfm``), and the host only packs
the already-made decisions into the bitstream (per-txb coefficient coding
via the native C++ coder).

Design (TPU-first, not a translation of the reference):
  - the reference encodes SB-by-SB with per-block scalar RD
    (av1/encoder/encodeframe.c:2211 encode_sb_row); here the frame is a
    uniform grid of ``bs``-sized blocks and a ``lax.scan`` walks the
    anti-diagonals of that grid — every block on a diagonal depends only
    on earlier diagonals (above row / left column recon), so each step
    evaluates ALL candidate modes for ALL blocks of the diagonal as one
    batched tensor op and reconstructs them bit-exactly in parallel.
  - rate terms come from precomputed default-CDF cost tables
    (av1/encoder/cost.c, mode_costs.c analogue) instead of re-running the
    entropy coder per candidate.
  - the uniform-grid plan codes the 7 extension-free modes
    {DC, V, H, SMOOTH, SMOOTH_V, SMOOTH_H, PAETH}; the two-level
    partition plan additionally evaluates ALL directional modes with
    angle deltas through the batched edge pipeline of
    ``tpu_intra_dir`` (corner smoothing, 5-tap edge filtering, z1/z2/z3
    gathers, availability-gated TR/BL extensions — reconintra.c:1081).

Conformance contract: the recon this module produces IS the in-loop
recon; the pack stage consumes the plan verbatim, so encoder recon ==
decoder recon bit-exactly (verified vs aomdec in tests).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..normative import tables
from ..normative import txsize as TS
from ..normative.blocks import INTRA_MODE_CONTEXT
from ..normative.enums import BlockSize, TxSize
from ..ops import intra as intra_ops
from ..ops import txfm as txfm_ops

# plan mode set: no top-right/bottom-left extensions, no edge filtering
PLAN_MODES = (0, 1, 2, 9, 10, 11, 12)  # DC V H SMOOTH SMOOTH_V SMOOTH_H PAETH
BS_TO_TX = {4: int(TxSize.TX_4X4), 8: int(TxSize.TX_8X8),
            16: int(TxSize.TX_16X16), 32: int(TxSize.TX_32X32)}
BS_TO_BSIZE = {8: int(BlockSize.BLOCK_8X8), 16: int(BlockSize.BLOCK_16X16),
               32: int(BlockSize.BLOCK_32X32)}


# ----------------------------------------------------------------------
# batched intra predictors (bit-exact vs ops/intra.py single-block path)
# ----------------------------------------------------------------------
def _round2(x, n):
    return (x + (1 << (n - 1))) >> n


def _predict_all_modes(above, left, tl, have_a, have_l, bs):
    """(B, bs) above/left, (B,) tl/have flags -> (M, B, bs, bs) int32.

    Edge conditioning mirrors reconintra.c build_intra_predictors for the
    non-extended mode set: missing above row is filled from left[0] (129
    if nothing), missing left column from above[0] (127 if nothing), the
    corner falls back above[0] -> left[0] -> 128.
    """
    B = above.shape[0]
    ha = have_a[:, None]
    hl = have_l[:, None]
    above_eff = jnp.where(ha, above, jnp.where(hl, left[:, :1], 127))
    left_eff = jnp.where(hl, left, jnp.where(ha, above[:, :1], 129))
    tl_eff = jnp.where(have_a & have_l, tl,
                       jnp.where(have_a, above[:, 0],
                                 jnp.where(have_l, left[:, 0], 128)))
    lg = bs.bit_length() - 1

    # DC (dc_pred: averaging domain depends on which edges exist)
    s_a = above_eff.sum(1)
    s_l = left_eff.sum(1)
    dc = jnp.where(
        have_a & have_l, (s_a + s_l + bs) >> (lg + 1),
        jnp.where(have_a, (s_a + (bs >> 1)) >> lg,
                  jnp.where(have_l, (s_l + (bs >> 1)) >> lg, 128)))
    p_dc = jnp.broadcast_to(dc[:, None, None], (B, bs, bs))

    p_v = jnp.broadcast_to(above_eff[:, None, :], (B, bs, bs))
    p_h = jnp.broadcast_to(left_eff[:, :, None], (B, bs, bs))

    # PAETH
    a2 = above_eff[:, None, :]
    l2 = left_eff[:, :, None]
    t2 = tl_eff[:, None, None]
    base = l2 + a2 - t2
    pl = jnp.abs(base - l2)
    pt = jnp.abs(base - a2)
    ptl = jnp.abs(base - t2)
    take_l = (pl <= pt) & (pl <= ptl)
    take_t = pt <= ptl
    p_paeth = jnp.where(take_l, jnp.broadcast_to(l2, base.shape),
                        jnp.where(take_t, jnp.broadcast_to(a2, base.shape),
                                  jnp.broadcast_to(t2, base.shape)))

    # SMOOTH family
    ww = jnp.asarray(intra_ops.smooth_weights(bs), jnp.int32)
    scale = 1 << intra_ops.SMOOTH_WEIGHT_LOG2_SCALE
    below = left_eff[:, bs - 1 : bs]      # (B,1)
    right = above_eff[:, bs - 1 : bs]
    p = (ww[None, :, None] * a2
         + (scale - ww)[None, :, None] * below[:, :, None]
         + ww[None, None, :] * l2
         + (scale - ww)[None, None, :] * right[:, :, None])
    p_smooth = _round2(p, 1 + intra_ops.SMOOTH_WEIGHT_LOG2_SCALE)
    p_sv = _round2(ww[None, :, None] * a2
                   + (scale - ww)[None, :, None] * below[:, :, None],
                   intra_ops.SMOOTH_WEIGHT_LOG2_SCALE)
    p_sh = _round2(ww[None, None, :] * l2
                   + (scale - ww)[None, None, :] * right[:, :, None],
                   intra_ops.SMOOTH_WEIGHT_LOG2_SCALE)

    return jnp.stack([p_dc, p_v, p_h, p_smooth, p_sv, p_sh, p_paeth]) \
        .astype(jnp.int32)


def _quantize(flat, dc_q, ac_q, shift):
    """av1_quantize_b-domain levels from (B, n) coefficients (int32).

    The final encode path of the reference quantizes with the B quantizer
    (encodemb.c:422 AV1_XFORM_QUANT_B when trellis is off): a zbin dead
    zone of (84|80)/128 * q (get_qzbin_factor, av1_quantize.c:590) and
    48/128 rounding — substantially fewer noise coefficients than the
    round-half FP quantizer at equal q."""
    n = flat.shape[-1]
    dqv = jnp.full((n,), ac_q, jnp.int32).at[0].set(dc_q)
    zf = jnp.where(dc_q < 148, 84, 80)
    rnd = (48 * dqv) >> 7
    zbin = (zf * dqv + 64) >> 7
    scaled = jnp.abs(flat) << shift
    lv = jnp.sign(flat) * ((scaled + rnd) // dqv)
    lv = jnp.where(scaled < zbin, 0, lv)
    return jnp.clip(lv, -(1 << 15), (1 << 15) - 1).astype(jnp.int32)


def _dequantize(levels, dc_q, ac_q, shift):
    n = levels.shape[-1]
    dqv = jnp.full((n,), ac_q, jnp.int32).at[0].set(dc_q)
    mag = (jnp.abs(levels) * dqv) & 0xFFFFFF
    mag = mag >> shift
    out = jnp.where(levels < 0, -mag, mag)
    return jnp.clip(out, -(1 << 15), (1 << 15) - 1).astype(jnp.int32)


def _tq_recon(src, pred, dc_q, ac_q, tx_size, scan):
    """(B,bs,bs) src/pred -> (levels (B,n), eob (B,), recon (B,bs,bs)).
    Bit-exact mirror of FrameEncoder._tq_levels/_recon_from_levels for the
    square DCT_DCT case."""
    bs = src.shape[-1]
    shift = TS.tx_scale(tx_size)
    res = (src - pred).astype(jnp.int32)
    coeffs = txfm_ops.fwd_txfm2d(res, tx_size, 0, bd=8)   # (B, W, H)
    flat = coeffs.reshape(coeffs.shape[0], -1)
    levels = _quantize(flat, dc_q, ac_q, shift)
    ls = levels[:, scan]
    idx = jnp.arange(1, ls.shape[-1] + 1, dtype=jnp.int32)
    eob = jnp.max(jnp.where(ls != 0, idx, 0), axis=-1)
    dq = _dequantize(levels, dc_q, ac_q, shift)
    recon = txfm_ops.inv_txfm2d_add(dq.reshape(-1, bs, bs), pred, tx_size,
                                    0, bd=8)
    return levels, eob, recon.astype(jnp.int32)


# mode -> (vert ADST?, horiz ADST?) from the DERIVED chroma tx type
# (decoder/frame.py:_uv_tx_type: INTRA_MODE_TO_TX_TYPE[uv_mode], all four
# DCT/ADST combos are in the allowed set for TX_8X8/TX_16X16 intra)
from ..normative.blocks import INTRA_MODE_TO_TX_TYPE as _IM2TT


from ..normative.enums import TxType1D  # noqa: E402


def _sel_1d(x, n, cos_bit, use_adst, inverse, clamp_bit):
    """Per-block 1-D transform select between DCT and ADST.

    x: (B*n_other, n); use_adst broadcast (B,) expanded by caller to rows.
    """
    d = txfm_ops._txfm_1d(x, n, TxType1D.DCT, cos_bit, inverse, clamp_bit)
    a = txfm_ops._txfm_1d(x, n, TxType1D.ADST, cos_bit, inverse, clamp_bit)
    return jnp.where(use_adst[:, None], a, d)


def _tq_recon_uv(src, pred, dc_q, ac_q, tx_size, scan, uv_mode):
    """Chroma TQ+recon with the mode-DERIVED tx type per block.

    uv_mode: (B,) AV1 intra mode ids. The decoder derives the chroma tx
    type from the uv mode (no syntax), so the in-loop recon must apply the
    same ADST/DCT combo — using DCT unconditionally silently diverges the
    closed loop (found vs aomdec in round 4)."""
    bs = src.shape[-1]
    b = src.shape[0]
    shift = TS.tx_scale(tx_size)
    tt = jnp.asarray(_IM2TT, jnp.int32)[uv_mode]          # (B,)
    vadst = (tt == 1) | (tt == 3)                         # ADST_DCT/ADST_ADST
    hadst = (tt == 2) | (tt == 3)                         # DCT_ADST/ADST_ADST
    lw = bs.bit_length() - 3
    cb_col = int(txfm_ops.FWD_COS_BIT_COL[lw][lw])
    cb_row = int(txfm_ops.FWD_COS_BIT_ROW[lw][lw])
    fsh = txfm_ops.FWD_SHIFT[tx_size]

    res = (src - pred).astype(jnp.int32)
    # forward: column pass along H, then row pass along W (fwd_txfm2d)
    xc = jnp.transpose(res, (0, 2, 1)).reshape(b * bs, bs)
    xc = txfm_ops._round_shift_arr(xc, -int(fsh[0]))
    va = jnp.repeat(vadst, bs)
    xc = _sel_1d(xc, bs, cb_col, va, inverse=False, clamp_bit=None)
    xc = txfm_ops._round_shift_arr(xc, -int(fsh[1]))
    buf = jnp.transpose(xc.reshape(b, bs, bs), (0, 2, 1))
    xr = buf.reshape(b * bs, bs)
    ha = jnp.repeat(hadst, bs)
    xr = _sel_1d(xr, bs, cb_row, ha, inverse=False, clamp_bit=None)
    xr = txfm_ops._round_shift_arr(xr, -int(fsh[2]))
    coeffs = jnp.transpose(xr.reshape(b, bs, bs), (0, 2, 1))  # (B, W, H)

    flat = coeffs.reshape(b, -1)
    levels = _quantize(flat, dc_q, ac_q, shift)
    ls = levels[:, scan]
    idx = jnp.arange(1, ls.shape[-1] + 1, dtype=jnp.int32)
    eob = jnp.max(jnp.where(ls != 0, idx, 0), axis=-1)
    dq = _dequantize(levels, dc_q, ac_q, shift)

    # inverse: row pass then column pass (inv_txfm2d_add), bd=8 clamps
    ish = txfm_ops.INV_SHIFT[tx_size]
    coeff = dq.reshape(b, bs, bs)                         # (B, W, H)
    xr = jnp.transpose(coeff, (0, 2, 1)).reshape(b * bs, bs)
    xr = jnp.clip(xr, -(1 << 15), (1 << 15) - 1)
    xr = _sel_1d(xr, bs, txfm_ops.INV_COS_BIT, ha, inverse=True,
                 clamp_bit=16)
    xr = txfm_ops._round_shift_arr(xr, -int(ish[0]))
    buf = xr.reshape(b, bs, bs)
    xc = jnp.transpose(buf, (0, 2, 1)).reshape(b * bs, bs)
    xc = jnp.clip(xc, -(1 << 15), (1 << 15) - 1)
    xc = _sel_1d(xc, bs, txfm_ops.INV_COS_BIT, va, inverse=True,
                 clamp_bit=16)
    xc = txfm_ops._round_shift_arr(xc, -int(ish[1]))
    resid = jnp.transpose(xc.reshape(b, bs, bs), (0, 2, 1))
    recon = jnp.clip(pred.astype(resid.dtype) + resid, 0, 255)
    return levels, eob, recon.astype(jnp.int32)


# ----------------------------------------------------------------------
# wavefront scan
# ----------------------------------------------------------------------
def _gather_edges(buf, by, bx, bs):
    """buf has a 1-px guard border; (by,bx) are block origins + 1."""
    cols = bx[:, None] + jnp.arange(bs)[None, :]
    above = buf[by[:, None] - 1, cols]
    rows = by[:, None] + jnp.arange(bs)[None, :]
    left = buf[rows, bx[:, None] - 1]
    tl = buf[by - 1, bx - 1]
    return above, left, tl


def _scatter_block(buf, by, bx, blocks, bs, valid):
    y = jnp.where(valid, by, buf.shape[0] + 1)
    yy = y[:, None, None] + jnp.arange(bs)[None, :, None]
    xx = bx[:, None, None] + jnp.arange(bs)[None, None, :]
    return buf.at[yy, xx].set(blocks, mode="drop")


def _rd(sse, rate, rdmult):
    # RDCOST scaling (ec/costs.rdcost): (rate*rdmult)>>9 + (sse<<11),
    # evaluated in f32 — decision-only, pack derives nothing from it.
    # rdmult broadcasts: scalar, or per-block (B,) from the rdmult grid
    # (av1_set_ssim_rdmult / per-SB psy modulation, encodeframe_utils.c:20).
    return sse.astype(jnp.float32) * 2048.0 + \
        rate.astype(jnp.float32) * (rdmult / 512.0)


@functools.partial(jax.jit, static_argnames=("bs", "R", "C"))
def _luma_wavefront(src, mode_cost, angle_cost, dc_q, ac_q, rdmult,
                    *, bs, R, C):
    """src: (R*bs, C*bs) int32; rdmult: (R,C) f32 per-block lambda grid.
    Returns (mode_idx (R,C), levels (R,C,n), eob (R,C),
    recon (R*bs, C*bs))."""
    tx_size = BS_TO_TX[bs]
    scan = jnp.asarray(tables.scan_table(tx_size, 0))
    n = bs * bs
    H, W = R * bs, C * bs
    B = min(R, C)
    buf = jnp.zeros((H + 2 + bs, W + 2 + bs), jnp.int32)
    mode_grid = jnp.zeros((R, C), jnp.int32)          # chosen PLAN index
    levels_out = jnp.zeros((R, C, n), jnp.int32)
    eob_out = jnp.zeros((R, C), jnp.int32)
    imc = jnp.asarray(INTRA_MODE_CONTEXT)
    plan_modes = jnp.asarray(PLAN_MODES, jnp.int32)

    def step(carry, d):
        buf, mode_grid, levels_out, eob_out = carry
        r0 = jnp.maximum(0, d - (C - 1))
        r = r0 + jnp.arange(B, dtype=jnp.int32)
        c = d - r
        valid = (r < R) & (c >= 0) & (c <= d)
        rc = jnp.where(valid, r, 0)
        cc = jnp.where(valid, c, 0)
        by = rc * bs + 1
        bx = cc * bs + 1
        above, left, tl = _gather_edges(buf, by, bx, bs)
        have_a = rc > 0
        have_l = cc > 0
        preds = _predict_all_modes(above, left, tl, have_a, have_l, bs)

        rows = by[:, None] + jnp.arange(bs)[None, :]
        cols = bx[:, None] + jnp.arange(bs)[None, :]
        sb = src[rows[:, :, None] - 1, cols[:, None, :] - 1]  # (B,bs,bs)
        sse = ((preds - sb[None]) ** 2).sum((-1, -2))          # (M,B)

        am = jnp.where(have_a, mode_grid[rc - 1, cc], 0)
        lm = jnp.where(have_l, mode_grid[rc, jnp.maximum(cc - 1, 0)], 0)
        actx = imc[plan_modes[am]]
        lctx = imc[plan_modes[lm]]
        rate = mode_cost[actx, lctx] + angle_cost[None, :]     # (B,M)
        rdm = rdmult[rc, cc]                                   # (B,)
        best = jnp.argmin(_rd(sse, rate.T, rdm), axis=0)       # (B,)

        pred = jnp.take_along_axis(
            preds, best[None, :, None, None], axis=0)[0]
        levels, eob, recon = _tq_recon(sb, pred, dc_q, ac_q, tx_size, scan)

        buf = _scatter_block(buf, by, bx, recon, bs, valid)
        rs = jnp.where(valid, rc, R)
        mode_grid = mode_grid.at[rs, cc].set(best, mode="drop")
        levels_out = levels_out.at[rs, cc].set(levels, mode="drop")
        eob_out = eob_out.at[rs, cc].set(eob, mode="drop")
        return (buf, mode_grid, levels_out, eob_out), None

    init = (buf, mode_grid, levels_out, eob_out)
    (buf, mode_grid, levels_out, eob_out), _ = jax.lax.scan(
        step, init, jnp.arange(R + C - 1, dtype=jnp.int32))
    return mode_grid, levels_out, eob_out, buf[1 : 1 + H, 1 : 1 + W]


@functools.partial(jax.jit, static_argnames=("bs", "R", "C"))
def _chroma_wavefront(src_u, src_v, uv_cost, dc_q, ac_q, rdmult,
                      y_mode_idx, *, bs, R, C):
    """Joint U/V mode decision + recon. uv_cost: (13, M) cost of plan mode
    m given luma mode (uv_mode_cdf[cfl_allowed=1][y_mode])."""
    tx_size = BS_TO_TX[bs]
    scan = jnp.asarray(tables.scan_table(tx_size, 0))
    n = bs * bs
    H, W = R * bs, C * bs
    B = min(R, C)
    bufs = jnp.zeros((2, H + 2 + bs, W + 2 + bs), jnp.int32)
    mode_grid = jnp.zeros((R, C), jnp.int32)
    levels_out = jnp.zeros((2, R, C, n), jnp.int32)
    eob_out = jnp.zeros((2, R, C), jnp.int32)
    plan_modes = jnp.asarray(PLAN_MODES, jnp.int32)

    def step(carry, d):
        bufs, mode_grid, levels_out, eob_out = carry
        r0 = jnp.maximum(0, d - (C - 1))
        r = r0 + jnp.arange(B, dtype=jnp.int32)
        c = d - r
        valid = (r < R) & (c >= 0) & (c <= d)
        rc = jnp.where(valid, r, 0)
        cc = jnp.where(valid, c, 0)
        by = rc * bs + 1
        bx = cc * bs + 1
        have_a = rc > 0
        have_l = cc > 0
        rows = by[:, None] + jnp.arange(bs)[None, :]
        cols = bx[:, None] + jnp.arange(bs)[None, :]

        sses = []
        preds_uv = []
        for p, srcp in ((0, src_u), (1, src_v)):
            above, left, tl = _gather_edges(bufs[p], by, bx, bs)
            preds = _predict_all_modes(above, left, tl, have_a, have_l, bs)
            sb = srcp[rows[:, :, None] - 1, cols[:, None, :] - 1]
            sses.append(((preds - sb[None]) ** 2).sum((-1, -2)))
            preds_uv.append((preds, sb))
        sse = sses[0] + sses[1]                                # (M,B)
        ym = plan_modes[y_mode_idx[rc, cc]]
        rate = uv_cost[ym]                                     # (B,M)
        rdm = rdmult[rc, cc]                                   # (B,)
        best = jnp.argmin(_rd(sse, rate.T, rdm), axis=0)

        best_uv_mode = plan_modes[best]
        new_bufs = []
        for p in range(2):
            preds, sb = preds_uv[p]
            pred = jnp.take_along_axis(
                preds, best[None, :, None, None], axis=0)[0]
            levels, eob, recon = _tq_recon_uv(sb, pred, dc_q, ac_q, tx_size,
                                              scan, best_uv_mode)
            new_bufs.append(_scatter_block(bufs[p], by, bx, recon, bs,
                                           valid))
            rs = jnp.where(valid, rc, R)
            levels_out = levels_out.at[p, rs, cc].set(levels, mode="drop")
            eob_out = eob_out.at[p, rs, cc].set(eob, mode="drop")
        rs = jnp.where(valid, rc, R)
        mode_grid = mode_grid.at[rs, cc].set(best, mode="drop")
        return (jnp.stack(new_bufs), mode_grid, levels_out, eob_out), None

    init = (bufs, mode_grid, levels_out, eob_out)
    (bufs, mode_grid, levels_out, eob_out), _ = jax.lax.scan(
        step, init, jnp.arange(R + C - 1, dtype=jnp.int32))
    return (mode_grid, levels_out, eob_out,
            bufs[:, 1 : 1 + H, 1 : 1 + W])


# ----------------------------------------------------------------------
# host-side cost tables (mode_costs.c analogue, default CDFs)
# ----------------------------------------------------------------------
def _plan_cost_tables(fc):
    from ..ec.costs import cdf_cost_table
    m = len(PLAN_MODES)
    kf = np.zeros((5, 5, m), np.int32)
    for a in range(5):
        for l in range(5):
            t = cdf_cost_table(fc.kf_y_cdf[a][l], 13)
            kf[a, l] = t[list(PLAN_MODES)]
    # angle_delta symbol 3 (delta 0) for directional modes V(1)/H(2)
    angle = np.zeros(m, np.int32)
    for i, mode in enumerate(PLAN_MODES):
        if mode in (1, 2):
            angle[i] = cdf_cost_table(fc.angle_delta_cdf[mode - 1], 7)[3]
    uv = np.zeros((13, m), np.int32)
    for ym in range(13):
        t = cdf_cost_table(fc.uv_mode_cdf[1][ym], 14)
        uv[ym] = t[list(PLAN_MODES)]
        for i, mode in enumerate(PLAN_MODES):
            if mode in (1, 2):
                uv[ym, i] += angle[i]
    return kf, angle, uv


def _plan_cost_tables2(fc):
    """Candidate-shaped cost tables for the directional two-level plan:
    kf (5, 5, K) luma mode cost per neighbour ctx, angle (K,) the
    angle-delta symbol cost (0 for non-directional), uv (13, 7) as
    before (chroma keeps the extension-free set)."""
    from ..ec.costs import cdf_cost_table
    from . import tpu_intra_dir as DIR
    cands = DIR.candidates()
    K = len(cands)
    modes = [m for m, _, _ in cands]
    kf = np.zeros((5, 5, K), np.int32)
    for a in range(5):
        for l in range(5):
            t = cdf_cost_table(fc.kf_y_cdf[a][l], 13)
            kf[a, l] = t[modes]
    angle = np.zeros(K, np.int32)
    for i, (mode, delta, _c) in enumerate(cands):
        if 1 <= mode <= 8:
            angle[i] = cdf_cost_table(fc.angle_delta_cdf[mode - 1],
                                      7)[delta + 3]
    _kf7, _a7, uv = _plan_cost_tables(fc)
    return kf, angle, uv


@functools.partial(jax.jit, static_argnames=())
def _shrink_levels(lv):
    """Levels are clipped to +/-32767 (int16 range) — downcast on device
    to halve the device->host transfer for the pack stage."""
    return lv.astype(jnp.int16)


def plan_frame(src_planes, q, bs, fc, rdmult, fetch_recon=False):
    """Run the TPU wavefronts over one frame; returns a host-side plan
    dict consumed by TpuFrameEncoder's pack walk. src_planes are the
    mi-aligned int32 source planes (luma dims must be multiples of bs).
    ``rdmult`` is a scalar or a per-block (R, C) grid (per-SB SSIM/psy
    modulation, av1_set_ssim_rdmult encodeframe_utils.c:20). Recon stays
    on device unless ``fetch_recon`` (the pack stage never reads it; LPF
    search / quality probes do)."""
    kf_cost, angle_cost, uv_cost = _plan_cost_tables(fc)
    y = src_planes[0]
    R, C = y.shape[0] // bs, y.shape[1] // bs
    dc_q, ac_q = tables.dc_quant(q), tables.ac_quant(q)
    rdgrid = np.asarray(rdmult, np.float32)
    if rdgrid.ndim == 0:
        rdgrid = np.full((R, C), float(rdmult), np.float32)
    assert rdgrid.shape == (R, C), (rdgrid.shape, R, C)
    rdgrid = jnp.asarray(rdgrid)
    ym, ylv, yeob, yrec = _luma_wavefront(
        jnp.asarray(y), jnp.asarray(kf_cost), jnp.asarray(angle_cost),
        dc_q, ac_q, rdgrid, bs=bs, R=R, C=C)
    plan = {
        "bs": bs,
        "y_mode": np.asarray(ym),
        "y_levels": np.asarray(_shrink_levels(ylv)).astype(np.int32),
        "y_eob": np.asarray(yeob),
        "recon_dev": [yrec],
    }
    if len(src_planes) > 1:
        cbs = bs // 2
        u, v = src_planes[1], src_planes[2]
        uvm, uvlv, uveob, uvrec = _chroma_wavefront(
            jnp.asarray(u), jnp.asarray(v), jnp.asarray(uv_cost),
            dc_q, ac_q, rdgrid, ym, bs=cbs, R=R, C=C)
        plan["uv_mode"] = np.asarray(uvm)
        plan["uv_levels"] = np.asarray(_shrink_levels(uvlv)).astype(np.int32)
        plan["uv_eob"] = np.asarray(uveob)
        plan["recon_dev"] += [uvrec[0], uvrec[1]]
    if fetch_recon:
        plan["recon"] = [np.asarray(r) for r in plan["recon_dev"]]
    return plan


# ----------------------------------------------------------------------
# two-level partition wavefront (32 -> NONE | SPLIT into 4x16), VERDICT
# r3 task 3: the batched analogue of av1_rd_pick_partition
# (av1/encoder/partition_search.c:5265) restricted to the square ladder.
# The partition choice is made ON DEVICE from the reconstructed RD of
# both alternatives (coeff rate approximated as alpha*eob), with
# skip-RD (zero the residual when prediction alone is cheaper —
# encodeframe analog of av1_rd_pick's skip_txfm decision).
# ----------------------------------------------------------------------
_QUADS = ((0, 0), (0, 1), (1, 0), (1, 1))


def _coeff_rate_est(levels, eob, lvl_tbl, eob_tbl):
    """(B, n) levels + (B,) eob -> (B,) estimated coefficient rate in
    1/512-bit units from the CDF-derived tables of
    ec/costs.coeff_rate_tables (av1_cost_coeffs_txb's decision role:
    per-|level| base+br+sign cost, golomb tail, eob token + extra
    bits). Replaces the r2-r4 alpha*eob+beta proxy."""
    al = jnp.abs(levels)
    per = lvl_tbl[jnp.clip(al, 0, 15)]
    nz = al > 0
    rate = jnp.where(nz, per, 0.0).sum(-1)
    nnz = nz.sum(-1)
    # zeros before the scan eob each cost the base-0 symbol
    rate = rate + (eob - nnz).astype(jnp.float32) * lvl_tbl[0]
    big = jnp.maximum(al.astype(jnp.float32) - 14.0, 1.0)
    rate = rate + jnp.where(
        al >= 15, (2.0 * jnp.floor(jnp.log2(big)) + 1.0) * 512.0,
        0.0).sum(-1)
    # eob_pt = 1, 2, then 2 + floor(log2(eob - 1)) (eob_group_start)
    ptf = 2.0 + jnp.floor(jnp.log2(jnp.maximum(eob - 1, 1)
                                   .astype(jnp.float32)))
    pt = jnp.where(eob <= 2, eob, ptf.astype(jnp.int32))
    pt = jnp.clip(pt, 1, eob_tbl.shape[0])
    rate = rate + eob_tbl[pt - 1]
    return jnp.where(eob > 0, rate, 0.0)


def _skip_rd(levels, eob, recon, pred, src, rdm, lvl_tbl, eob_tbl):
    """Zero the block's residual when RD prefers prediction-only.

    Compares 2048*sse against the lambda-scaled CDF-estimated
    coefficient rate (1/512-bit units)."""
    ssep = ((pred - src) ** 2).sum((-1, -2)).astype(jnp.float32)
    ssec = ((recon - src) ** 2).sum((-1, -2)).astype(jnp.float32)
    rate = _coeff_rate_est(levels, eob, lvl_tbl, eob_tbl)
    skip = 2048.0 * (ssep - ssec) < (rdm / 512.0) * rate
    keep = eob > 0
    skip = skip & keep  # already-skipped blocks stay skipped
    levels = jnp.where(skip[:, None], 0, levels)
    eob = jnp.where(skip, 0, eob)
    recon = jnp.where(skip[:, None, None], pred, recon)
    sse = jnp.where(skip | ~keep, ssep, ssec)
    rate = jnp.where(skip | ~keep, 0.0, rate)
    return levels, eob, recon, sse, rate


@functools.partial(jax.jit, static_argnames=("R", "C"))
def _luma_wavefront_part(src, mode_cost, angle_cost, dc_q, ac_q,
                         rd16, rd32, forced, no_split, pr_none, pr_split,
                         rt32, rt16, masks, *, R, C):
    """Two-level luma wavefront over 32px cells with the FULL candidate
    set: 7 extension-free modes + all directional (mode, delta) pairs
    (tpu_intra_dir). Candidate availability follows the normative
    has_top_right/has_bottom_left rules via the host-precomputed
    ``masks`` grids.

    src: (R*32, C*32) int32; rd16 (2R,2C) / rd32 (R,C) lambda grids;
    forced (R,C) bool — cells where the decoder implies SPLIT (frame
    edge, has_rows/has_cols false). Returns (split (R,C), m32 (AV1 mode),
    d32 (angle delta), lv32, eob32, m16, d16, lv16, eob16, recon)."""
    from . import tpu_intra_dir as DIR
    tx32, tx16 = BS_TO_TX[32], BS_TO_TX[16]
    scan32 = jnp.asarray(tables.scan_table(tx32, 0))
    scan16 = jnp.asarray(tables.scan_table(tx16, 0))
    H, W = R * 32, C * 32
    B = min(R, C)
    tab = DIR.tables(32)
    MODE32 = jnp.asarray(tab["MODE"])
    DELTA32 = jnp.asarray(tab["DELTA"])
    tab16t = DIR.tables(16)
    MODE16 = jnp.asarray(tab16t["MODE"])
    DELTA16 = jnp.asarray(tab16t["DELTA"])
    buf = jnp.zeros((H + 2 + 32, W + 2 + 32), jnp.int32)
    mode16 = jnp.zeros((2 * R, 2 * C), jnp.int32)   # AV1 mode ctx map
    split_out = jnp.zeros((R, C), jnp.int32)
    m32o = jnp.zeros((R, C), jnp.int32)
    d32o = jnp.zeros((R, C), jnp.int32)
    lv32o = jnp.zeros((R, C, 1024), jnp.int32)
    e32o = jnp.zeros((R, C), jnp.int32)
    m16o = jnp.zeros((2 * R, 2 * C), jnp.int32)
    d16o = jnp.zeros((2 * R, 2 * C), jnp.int32)
    lv16o = jnp.zeros((2 * R, 2 * C, 256), jnp.int32)
    e16o = jnp.zeros((2 * R, 2 * C), jnp.int32)
    imc = jnp.asarray(INTRA_MODE_CONTEXT)

    def mode_rate(am, lm):
        # am/lm are AV1 mode ids of the neighbours
        return mode_cost[imc[am], imc[lm]] + angle_cost[None, :]  # (B, K)

    def smooth(m):
        return (m >= 9) & (m <= 11)

    def step(carry, d):
        (buf, mode16, split_out, m32o, d32o, lv32o, e32o, m16o, d16o,
         lv16o, e16o) = carry
        r0 = jnp.maximum(0, d - (C - 1))
        r = r0 + jnp.arange(B, dtype=jnp.int32)
        c = d - r
        valid = (r < R) & (c >= 0) & (c <= d)
        rc = jnp.where(valid, r, 0)
        cc = jnp.where(valid, c, 0)
        by = rc * 32 + 1
        bx = cc * 32 + 1
        have_a = rc > 0
        have_l = cc > 0
        above, left, tl = _gather_edges(buf, by, bx, 32)
        rows = by[:, None] + jnp.arange(32)[None, :]
        cols = bx[:, None] + jnp.arange(32)[None, :]
        src32 = src[rows[:, :, None] - 1, cols[:, None, :] - 1]  # (B,32,32)

        # ---- 32 path ----
        am = jnp.where(have_a, mode16[2 * rc - 1, 2 * cc], 0)
        lm = jnp.where(have_l, mode16[2 * rc, jnp.maximum(2 * cc - 1, 0)], 0)
        ef = (smooth(am) & have_a) | (smooth(lm) & have_l)
        zero_ext = jnp.zeros((B, 32), jnp.int32)
        falseb = jnp.zeros((B,), bool)
        E32 = DIR.build_edge_buffer(above, left, tl, have_a, have_l,
                                    falseb, falseb, zero_ext, zero_ext, 32)
        preds = jnp.concatenate([
            _predict_all_modes(above, left, tl, have_a, have_l, 32),
            DIR.dir_predict(E32, ef, 32)], axis=0)               # (K,B,..)
        ssep = ((preds - src32[None]) ** 2).sum((-1, -2))        # (K,B)
        allowed = DIR.allowed_mask(masks["ok1_32"][rc, cc],
                                   masks["ok2_32"][rc, cc],
                                   masks["ok3_32"][rc, cc], 32)  # (K,B)
        rate32 = mode_rate(am, lm)                               # (B,K)
        rdm32 = rd32[rc, cc]
        # disallowed candidates are masked in the RD domain: a rate
        # penalty can be outweighed by an SSE gap at small rdmult, and a
        # candidate whose edge model mismatches the decoder's must NEVER
        # win (closed-loop divergence)
        rd32c = jnp.where(allowed, _rd(ssep, rate32.T, rdm32), jnp.inf)
        best32 = jnp.argmin(rd32c, axis=0)
        ymode32 = MODE32[best32]
        ydelta32 = DELTA32[best32]
        pred32 = jnp.take_along_axis(preds, best32[None, :, None, None],
                                     axis=0)[0]
        lv32, e32, rec32 = _tq_recon(src32, pred32, dc_q, ac_q, tx32, scan32)
        lv32, e32, rec32, sse32, crate32 = _skip_rd(
            lv32, e32, rec32, pred32, src32, rdm32, *rt32)
        mrate32 = jnp.take_along_axis(rate32, best32[:, None], axis=1)[:, 0]
        cost32 = 2048.0 * sse32 + (rdm32 / 512.0) * (
            mrate32.astype(jnp.float32) + crate32 + pr_none)

        # ---- 16 path (4 sub-blocks, raster order, local recon) ----
        loc = jnp.zeros((B, 34, 34), jnp.int32)
        loc = loc.at[:, 0, 1:33].set(above)
        loc = loc.at[:, 1:33, 0].set(left)
        loc = loc.at[:, 0, 0].set(tl)
        cost16 = jnp.zeros((B,), jnp.float32)
        subs = []
        sub_modes = {}
        for qi, (qr, qc) in enumerate(_QUADS):
            a = jax.lax.dynamic_slice(
                loc, (0, qr * 16, 1 + qc * 16), (B, 1, 16))[:, 0, :]
            l = jax.lax.dynamic_slice(
                loc, (0, 1 + qr * 16, qc * 16), (B, 16, 1))[:, :, 0]
            t = loc[:, qr * 16, qc * 16]
            ha = have_a | (qr > 0)
            hl = have_l | (qc > 0)
            i16 = 2 * rc + qr
            j16 = 2 * cc + qc
            if qr == 0:
                am = jnp.where(have_a, mode16[2 * rc - 1, 2 * cc + qc], 0)
            else:
                am = sub_modes[(0, qc)]
            if qc == 0:
                lm = jnp.where(have_l,
                               mode16[2 * rc + qr,
                                      jnp.maximum(2 * cc - 1, 0)], 0)
            else:
                lm = sub_modes[(qr, 0)]
            ef16 = (smooth(am) & ha) | (smooth(lm) & hl)
            # real extension pixels in wavefront+Z order (see
            # tpu_intra_dir.position_masks): top-right row = loc row
            # qr*16 cols 17..32, bottom-left col = loc col 0 rows 17..32
            aext = loc[:, qr * 16, 17:33]
            lext = loc[:, 17:33, qc * 16]
            trr = masks["trreal_16"][i16, j16]
            blr = masks["blreal_16"][i16, j16]
            E16 = DIR.build_edge_buffer(a, l, t, ha, hl, trr, blr,
                                        aext, lext, 16)
            p16 = jnp.concatenate([
                _predict_all_modes(a, l, t, ha, hl, 16),
                DIR.dir_predict(E16, ef16, 16)], axis=0)
            s16 = src32[:, qr * 16 : qr * 16 + 16, qc * 16 : qc * 16 + 16]
            sp = ((p16 - s16[None]) ** 2).sum((-1, -2))
            allowed16 = DIR.allowed_mask(masks["ok1_16"][i16, j16],
                                         masks["ok2_16"][i16, j16],
                                         masks["ok3_16"][i16, j16], 16)
            r16 = mode_rate(am, lm)
            rdm16 = rd16[i16, j16]
            rd16c = jnp.where(allowed16, _rd(sp, r16.T, rdm16), jnp.inf)
            b16 = jnp.argmin(rd16c, axis=0)
            ymode16 = MODE16[b16]
            ydelta16 = DELTA16[b16]
            pr = jnp.take_along_axis(p16, b16[None, :, None, None],
                                     axis=0)[0]
            lv, e, rec = _tq_recon(s16, pr, dc_q, ac_q, tx16, scan16)
            lv, e, rec, sse, crate = _skip_rd(lv, e, rec, pr, s16, rdm16,
                                              *rt16)
            mrate = jnp.take_along_axis(r16, b16[:, None], axis=1)[:, 0]
            cost16 = cost16 + 2048.0 * sse + (rdm16 / 512.0) * (
                mrate.astype(jnp.float32) + crate)
            loc = jax.lax.dynamic_update_slice(
                loc, rec, (0, 1 + qr * 16, 1 + qc * 16))
            sub_modes[(qr, qc)] = ymode16
            subs.append((ymode16, ydelta16, lv, e))
        cost16 = cost16 + (rdm32 / 512.0) * pr_split

        split = forced[rc, cc] | ((cost16 < cost32) & ~no_split[rc, cc])
        recon = jnp.where(split[:, None, None], loc[:, 1:33, 1:33], rec32)
        buf = _scatter_block(buf, by, bx, recon, 32, valid)

        rs = jnp.where(valid, rc, R)
        split_out = split_out.at[rs, cc].set(split.astype(jnp.int32),
                                             mode="drop")
        m32o = m32o.at[rs, cc].set(ymode32, mode="drop")
        d32o = d32o.at[rs, cc].set(ydelta32, mode="drop")
        lv32o = lv32o.at[rs, cc].set(lv32, mode="drop")
        e32o = e32o.at[rs, cc].set(e32, mode="drop")
        for qi, (qr, qc) in enumerate(_QUADS):
            ym16, yd16, lv, e = subs[qi]
            rq = jnp.where(valid, 2 * rc + qr, 2 * R)
            cq = 2 * cc + qc
            m16o = m16o.at[rq, cq].set(ym16, mode="drop")
            d16o = d16o.at[rq, cq].set(yd16, mode="drop")
            lv16o = lv16o.at[rq, cq].set(lv, mode="drop")
            e16o = e16o.at[rq, cq].set(e, mode="drop")
            # ctx map: chosen sub mode where split else the 32 mode
            mode16 = mode16.at[rq, cq].set(
                jnp.where(split, ym16, ymode32), mode="drop")
        return (buf, mode16, split_out, m32o, d32o, lv32o, e32o, m16o,
                d16o, lv16o, e16o), None

    init = (buf, mode16, split_out, m32o, d32o, lv32o, e32o, m16o, d16o,
            lv16o, e16o)
    (buf, mode16, split_out, m32o, d32o, lv32o, e32o, m16o, d16o, lv16o,
     e16o), _ = jax.lax.scan(
        step, init, jnp.arange(R + C - 1, dtype=jnp.int32))
    return (split_out, m32o, d32o, lv32o, e32o, m16o, d16o, lv16o, e16o,
            buf[1 : 1 + H, 1 : 1 + W])


@functools.partial(jax.jit, static_argnames=("R", "C"))
def _chroma_wavefront_part(src_u, src_v, uv_cost, dc_q, ac_q,
                           rd16, rd32, split32, y_m32, y_m16, rtc16, rtc8,
                           *, R, C):
    """Two-level chroma wavefront over 16px chroma cells (4:2:0 mirror of
    the luma 32/16 partition). The structure FOLLOWS the luma split map;
    both alternatives are reconstructed and selected by ``split32``.

    Returns (uvm16 (R,C), uvlv16 (2,R,C,256), uveob16 (2,R,C),
    uvm8 (2R,2C), uvlv8 (2,2R,2C,64), uveob8 (2,2R,2C), recon (2,H,W))."""
    tx16, tx8 = BS_TO_TX[16], BS_TO_TX[8]
    scan16 = jnp.asarray(tables.scan_table(tx16, 0))
    scan8 = jnp.asarray(tables.scan_table(tx8, 0))
    H, W = R * 16, C * 16
    B = min(R, C)
    bufs = jnp.zeros((2, H + 2 + 16, W + 2 + 16), jnp.int32)
    plan_modes = jnp.asarray(PLAN_MODES, jnp.int32)
    uvm16o = jnp.zeros((R, C), jnp.int32)
    uvlv16o = jnp.zeros((2, R, C, 256), jnp.int32)
    uve16o = jnp.zeros((2, R, C), jnp.int32)
    uvm8o = jnp.zeros((2 * R, 2 * C), jnp.int32)
    uvlv8o = jnp.zeros((2, 2 * R, 2 * C, 64), jnp.int32)
    uve8o = jnp.zeros((2, 2 * R, 2 * C), jnp.int32)

    def step(carry, d):
        bufs, uvm16o, uvlv16o, uve16o, uvm8o, uvlv8o, uve8o = carry
        r0 = jnp.maximum(0, d - (C - 1))
        r = r0 + jnp.arange(B, dtype=jnp.int32)
        c = d - r
        valid = (r < R) & (c >= 0) & (c <= d)
        rc = jnp.where(valid, r, 0)
        cc = jnp.where(valid, c, 0)
        by = rc * 16 + 1
        bx = cc * 16 + 1
        have_a = rc > 0
        have_l = cc > 0
        rows = by[:, None] + jnp.arange(16)[None, :]
        cols = bx[:, None] + jnp.arange(16)[None, :]
        split = split32[rc, cc].astype(bool)
        rdm32 = rd32[rc, cc]

        # ---- 16 path (single chroma block per plane) ----
        ym32 = y_m32[rc, cc]                        # AV1 mode ids
        sse16 = 0
        pb16 = []
        for p, srcp in ((0, src_u), (1, src_v)):
            a, l, t = _gather_edges(bufs[p], by, bx, 16)
            preds = _predict_all_modes(a, l, t, have_a, have_l, 16)
            sb = srcp[rows[:, :, None] - 1, cols[:, None, :] - 1]
            sse16 = sse16 + ((preds - sb[None]) ** 2).sum((-1, -2))
            pb16.append((preds, sb))
        rate16 = uv_cost[ym32]
        best16 = jnp.argmin(_rd(sse16, rate16.T, rdm32), axis=0)
        uvmode16 = plan_modes[best16]
        res16 = []
        for p in range(2):
            preds, sb = pb16[p]
            pred = jnp.take_along_axis(preds, best16[None, :, None, None],
                                       axis=0)[0]
            lv, e, rec = _tq_recon_uv(sb, pred, dc_q, ac_q, tx16, scan16,
                                      uvmode16)
            lv, e, rec, _, _ = _skip_rd(lv, e, rec, pred, sb, rdm32,
                                        *rtc16)
            res16.append((lv, e, rec))

        # ---- 8 path (4 sub-blocks per plane, raster, local recon) ----
        locs = [jnp.zeros((B, 18, 18), jnp.int32) for _ in range(2)]
        for p in range(2):
            a, l, t = _gather_edges(bufs[p], by, bx, 16)
            loc = locs[p]
            loc = loc.at[:, 0, 1:17].set(a)
            loc = loc.at[:, 1:17, 0].set(l)
            loc = loc.at[:, 0, 0].set(t)
            locs[p] = loc
        subs8 = []
        for qi, (qr, qc) in enumerate(_QUADS):
            ha = have_a | (qr > 0)
            hl = have_l | (qc > 0)
            ym = y_m16[2 * rc + qr, 2 * cc + qc]    # AV1 mode id
            sse8 = 0
            pb8 = []
            for p, srcp in ((0, src_u), (1, src_v)):
                loc = locs[p]
                a = jax.lax.dynamic_slice(
                    loc, (0, qr * 8, 1 + qc * 8), (B, 1, 8))[:, 0, :]
                l = jax.lax.dynamic_slice(
                    loc, (0, 1 + qr * 8, qc * 8), (B, 8, 1))[:, :, 0]
                t = loc[:, qr * 8, qc * 8]
                preds = _predict_all_modes(a, l, t, ha, hl, 8)
                sb = srcp[rows[:, qr * 8 : qr * 8 + 8, None] - 1,
                          cols[:, None, qc * 8 : qc * 8 + 8] - 1]
                sse8 = sse8 + ((preds - sb[None]) ** 2).sum((-1, -2))
                pb8.append((preds, sb))
            rate8 = uv_cost[ym]
            rdm16 = rd16[2 * rc + qr, 2 * cc + qc]
            b8 = jnp.argmin(_rd(sse8, rate8.T, rdm16), axis=0)
            uvmode8 = plan_modes[b8]
            out_p = []
            for p in range(2):
                preds, sb = pb8[p]
                pred = jnp.take_along_axis(preds, b8[None, :, None, None],
                                           axis=0)[0]
                lv, e, rec = _tq_recon_uv(sb, pred, dc_q, ac_q, tx8, scan8,
                                          uvmode8)
                lv, e, rec, _, _ = _skip_rd(lv, e, rec, pred, sb, rdm16,
                                            *rtc8)
                locs[p] = jax.lax.dynamic_update_slice(
                    locs[p], rec, (0, 1 + qr * 8, 1 + qc * 8))
                out_p.append((lv, e))
            subs8.append((b8, out_p))

        # ---- select & scatter ----
        new_bufs = []
        for p in range(2):
            rec = jnp.where(split[:, None, None], locs[p][:, 1:17, 1:17],
                            res16[p][2])
            new_bufs.append(_scatter_block(bufs[p], by, bx, rec, 16, valid))
        rs = jnp.where(valid, rc, R)
        uvm16o = uvm16o.at[rs, cc].set(best16, mode="drop")
        for p in range(2):
            uvlv16o = uvlv16o.at[p, rs, cc].set(res16[p][0], mode="drop")
            uve16o = uve16o.at[p, rs, cc].set(res16[p][1], mode="drop")
        for qi, (qr, qc) in enumerate(_QUADS):
            b8, out_p = subs8[qi]
            rq = jnp.where(valid, 2 * rc + qr, 2 * R)
            cq = 2 * cc + qc
            uvm8o = uvm8o.at[rq, cq].set(b8, mode="drop")
            for p in range(2):
                uvlv8o = uvlv8o.at[p, rq, cq].set(out_p[p][0], mode="drop")
                uve8o = uve8o.at[p, rq, cq].set(out_p[p][1], mode="drop")
        return (jnp.stack(new_bufs), uvm16o, uvlv16o, uve16o, uvm8o,
                uvlv8o, uve8o), None

    init = (bufs, uvm16o, uvlv16o, uve16o, uvm8o, uvlv8o, uve8o)
    (bufs, uvm16o, uvlv16o, uve16o, uvm8o, uvlv8o, uve8o), _ = jax.lax.scan(
        step, init, jnp.arange(R + C - 1, dtype=jnp.int32))
    return (uvm16o, uvlv16o, uve16o, uvm8o, uvlv8o, uve8o,
            bufs[:, 1 : 1 + H, 1 : 1 + W])




def _rate_tables(fc):
    """Device coefficient-rate tables per (tx size, plane) as jnp pairs
    (ec/costs.coeff_rate_tables)."""
    from ..ec.costs import coeff_rate_tables
    from ..normative.enums import TxSize as _TS

    def pair(tx, pl):
        lvl, eob = coeff_rate_tables(fc, tx, pl)
        return (jnp.asarray(lvl), jnp.asarray(eob))

    return {"y32": pair(int(_TS.TX_32X32), 0),
            "y16": pair(int(_TS.TX_16X16), 0),
            "uv16": pair(int(_TS.TX_16X16), 1),
            "uv8": pair(int(_TS.TX_8X8), 1)}


def _part_rate_scalars(fc):
    """Default-CDF costs of PARTITION_NONE / PARTITION_SPLIT at the
    32x32 bsize (ctx: bsl=2, no-split neighbours) — decision-only."""
    from ..ec.costs import cdf_cost_table
    t = cdf_cost_table(fc.partition_cdf[8], 10)
    return float(t[0]), float(t[3])


def plan_frame_part(src_planes, q, fc, rdmult, mi_rows, mi_cols,
                    fetch_recon=False, tile_mi_w=None, vis_mi_w=None):
    """Two-level (32 -> 16) partition plan over one frame.

    src_planes: mi-aligned int32 planes padded to multiples of 32 (luma)
    / 16 (chroma). ``rdmult`` scalar or (2R, 2C) 16-granularity grid.
    ``tile_mi_w``/``vis_mi_w`` (tile columns): the tile's actual mi width
    (bounds top-right availability across the prediction-independent tile
    edge) and the visible mi width (alignment of partial edge blocks);
    both default to ``mi_cols``. Returns the plan dict consumed by the v2
    native pack; luma modes are AV1 ids with angle deltas
    (y_delta32/y_delta16)."""
    from . import tpu_intra_dir as DIR
    kf_cost, angle_cost, uv_cost = _plan_cost_tables2(fc)
    y = src_planes[0]
    R, C = y.shape[0] // 32, y.shape[1] // 32
    dc_q, ac_q = tables.dc_quant(q), tables.ac_quant(q)
    masks_np = DIR.position_masks(
        mi_rows, tile_mi_w if tile_mi_w is not None else mi_cols,
        vis_mi_w if vis_mi_w is not None else mi_cols, R, C)
    masks = {k: jnp.asarray(v) for k, v in masks_np.items()}

    rd16 = np.asarray(rdmult, np.float32)
    if rd16.ndim == 0:
        rd16 = np.full((2 * R, 2 * C), float(rdmult), np.float32)
    assert rd16.shape == (2 * R, 2 * C), (rd16.shape, R, C)
    # 32-lambda: geometric mean of the four covered 16 lambdas
    rd32 = np.exp(np.log(rd16).reshape(R, 2, C, 2).mean((1, 3))) \
        .astype(np.float32)

    # decoder-implied splits at the frame edge (has_rows/has_cols false),
    # and cells that must NOT split because a visited 16 sub-block would be
    # partial (no square leaf available there); conflicting cells are
    # rejected by the caller (plan_part_supported)
    rr = 8 * np.arange(R)[:, None]
    cc = 8 * np.arange(C)[None, :]
    forced = ((rr + 4 >= mi_rows) | (cc + 4 >= mi_cols))
    no_split = np.zeros((R, C), bool)
    for qr in (0, 1):
        for qc in (0, 1):
            sr, sc = rr + 4 * qr, cc + 4 * qc
            visited = (sr < mi_rows) & (sc < mi_cols)
            partial = visited & ((sr + 2 >= mi_rows) | (sc + 2 >= mi_cols))
            no_split |= partial
    assert not (forced & no_split).any(), "unsupported mi dims for part2"
    pr_none, pr_split = _part_rate_scalars(fc)

    rt = _rate_tables(fc)
    split, m32, d32, lv32, e32, m16, d16, lv16, e16, yrec = \
        _luma_wavefront_part(
            jnp.asarray(y), jnp.asarray(kf_cost), jnp.asarray(angle_cost),
            dc_q, ac_q, jnp.asarray(rd16), jnp.asarray(rd32),
            jnp.asarray(forced), jnp.asarray(no_split), pr_none, pr_split,
            rt["y32"], rt["y16"], masks, R=R, C=C)
    plan = {
        "part": True,
        "split32": np.asarray(split).astype(np.uint8),
        "y_mode32": np.asarray(m32), "y_mode16": np.asarray(m16),
        "y_delta32": np.asarray(d32), "y_delta16": np.asarray(d16),
        "y_levels32": np.asarray(_shrink_levels(lv32)).astype(np.int32),
        "y_levels16": np.asarray(_shrink_levels(lv16)).astype(np.int32),
        "y_eob32": np.asarray(e32), "y_eob16": np.asarray(e16),
        "recon_dev": [yrec],
    }
    if len(src_planes) > 1:
        u, v = src_planes[1], src_planes[2]
        uvm16, uvlv16, uve16, uvm8, uvlv8, uve8, uvrec = \
            _chroma_wavefront_part(
                jnp.asarray(u), jnp.asarray(v), jnp.asarray(uv_cost),
                dc_q, ac_q, jnp.asarray(rd16),
                jnp.asarray(rd32), split, m32, m16,
                rt["uv16"], rt["uv8"], R=R, C=C)
        plan["uv_mode16"] = np.asarray(uvm16)
        plan["uv_mode8"] = np.asarray(uvm8)
        plan["uv_levels16"] = np.asarray(_shrink_levels(uvlv16)) \
            .astype(np.int32)
        plan["uv_levels8"] = np.asarray(_shrink_levels(uvlv8)) \
            .astype(np.int32)
        plan["uv_eob16"] = np.asarray(uve16)
        plan["uv_eob8"] = np.asarray(uve8)
        plan["recon_dev"] += [uvrec[0], uvrec[1]]
    if fetch_recon:
        plan["recon"] = [np.asarray(r) for r in plan["recon_dev"]]
    return plan


def plan_part_supported(mi_rows: int, mi_cols: int) -> bool:
    """True when every frame-edge cell has a square-leaf coding (a cell
    that the decoder implies SPLIT must not contain partial 16s)."""
    return mi_rows % 8 != 2 and mi_cols % 8 != 2
