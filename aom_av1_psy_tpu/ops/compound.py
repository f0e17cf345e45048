"""Compound inter prediction kernels — dist-weighted two-ref convolve,
mask blends, and difference-weighted masks, batched.

Covers the reference family (SURVEY §2.12 convolve/inter-pred group):
``av1_dist_wtd_convolve_{2d,x,y,2d_copy}_c`` (av1/common/convolve.c:176+),
``aom_blend_a64_{mask,hmask,vmask}_c`` (aom_dsp/blend_a64*.c),
``aom_comp_avg_pred_c`` / ``aom_comp_mask_pred_c`` (aom_dsp/sad.c /
variance.c helpers) and ``av1_build_compound_diffwtd_mask_c``
(reconinter.c:345).
"""
from __future__ import annotations

import numpy as np

from .convolve import (FILTER_BITS, SUBPEL_MASK, filter_kernels,
                       EIGHTTAP_REGULAR)

DIST_PRECISION_BITS = 4
BLEND_A64_MAX_ALPHA = 64
DIFF_FACTOR = 16
ROUND0 = 3
ROUND1_COMPOUND = 7


def _round2(v, bits):
    if bits == 0:
        return v
    return (v + (1 << (bits - 1))) >> bits


def _first_pass(ref, w, h, subpel_x, subpel_y, kx, ky, bd=8):
    """Produce the CONV_BUF intermediate for one reference (do_average=0).
    ref: (..., h+7, w+7) padded region with origin at [3,3]."""
    x = np.asarray(ref).astype(np.int64)
    round0, round1 = ROUND0, ROUND1_COMPOUND
    offset_bits = bd + 2 * FILTER_BITS - round0
    round_offset = (1 << (offset_bits - round1)) \
        + (1 << (offset_bits - round1 - 1))
    if subpel_x and subpel_y:
        im = np.zeros(x.shape[:-2] + (h + 7, w), np.int64)
        off = 1 << (bd + FILTER_BITS - 1)
        for k in range(8):
            t = int(kx[k])
            if t:
                im += t * x[..., :, k : k + w]
        im = _round2(im + off, round0)
        out = np.zeros(x.shape[:-2] + (h, w), np.int64)
        for k in range(8):
            t = int(ky[k])
            if t:
                out += t * im[..., k : k + h, :]
        return _round2(out + (1 << offset_bits), round1)
    if subpel_x:
        out = np.zeros(x.shape[:-2] + (h, w), np.int64)
        for k in range(8):
            t = int(kx[k])
            if t:
                out += t * x[..., 3 : 3 + h, k : k + w]
        out = _round2(out, round0) << (FILTER_BITS - round1)
        return out + round_offset
    if subpel_y:
        out = np.zeros(x.shape[:-2] + (h, w), np.int64)
        for k in range(8):
            t = int(ky[k])
            if t:
                out += t * x[..., k : k + h, 3 : 3 + w]
        out <<= (FILTER_BITS - round0)
        return _round2(out, round1) + round_offset
    out = x[..., 3 : 3 + h, 3 : 3 + w] << (2 * FILTER_BITS - round0 - round1)
    return out + round_offset


def dist_wtd_avg(conv0, conv1, fwd_offset: int, bck_offset: int,
                 use_dist_wtd: bool, bd: int = 8):
    """Second-pass averaging of two CONV_BUF intermediates into pixels."""
    round0, round1 = ROUND0, ROUND1_COMPOUND
    offset_bits = bd + 2 * FILTER_BITS - round0
    round_offset = (1 << (offset_bits - round1)) \
        + (1 << (offset_bits - round1 - 1))
    round_bits = 2 * FILTER_BITS - round0 - round1
    if use_dist_wtd:
        tmp = (conv0 * fwd_offset + conv1 * bck_offset) >> DIST_PRECISION_BITS
    else:
        tmp = (conv0 + conv1) >> 1
    tmp = tmp - round_offset
    return np.clip(_round2(tmp, round_bits), 0, (1 << bd) - 1)


def compound_predict(ref0, ref1, w: int, h: int, subpel0, subpel1,
                     fwd_offset: int = 0, bck_offset: int = 0,
                     use_dist_wtd: bool = False,
                     interp: int = EIGHTTAP_REGULAR, bd: int = 8):
    """Two-reference compound MC (av1_dist_wtd_convolve facade pair:
    first ref fills the CONV_BUF, second averages into pixels)."""
    preds = []
    for ref, (sx, sy) in ((ref0, subpel0), (ref1, subpel1)):
        kx = filter_kernels(interp, w)[sx & SUBPEL_MASK]
        ky = filter_kernels(interp, h)[sy & SUBPEL_MASK]
        preds.append(_first_pass(ref, w, h, sx & SUBPEL_MASK,
                                 sy & SUBPEL_MASK, kx, ky, bd))
    return dist_wtd_avg(preds[0], preds[1], fwd_offset, bck_offset,
                        use_dist_wtd, bd)


# ---------------------------------------------------------------------------
# Blends
# ---------------------------------------------------------------------------

def blend_a64_mask(src0, src1, mask, subw: int = 0, subh: int = 0):
    """aom_blend_a64_mask_c incl. 2x subsampled mask variants
    (aom_dsp/blend_a64_mask.c:27): dst = (m*a + (64-m)*b + 32) >> 6."""
    a = np.asarray(src0).astype(np.int64)
    b = np.asarray(src1).astype(np.int64)
    m = np.asarray(mask).astype(np.int64)
    if subw and subh:
        mm = _round2(m[0::2, 0::2] + m[1::2, 0::2] + m[0::2, 1::2]
                     + m[1::2, 1::2], 2)
    elif subw:
        mm = _round2(m[:, 0::2] + m[:, 1::2], 1)
    elif subh:
        mm = _round2(m[0::2, :] + m[1::2, :], 1)
    else:
        mm = m
    return _round2(mm * a + (BLEND_A64_MAX_ALPHA - mm) * b, 6)


def blend_a64_hmask(src0, src1, mask_row):
    """aom_blend_a64_hmask_c: per-column mask."""
    m = np.asarray(mask_row).astype(np.int64)[None, :]
    return blend_a64_mask(src0, src1, np.broadcast_to(
        m, np.asarray(src0).shape))


def blend_a64_vmask(src0, src1, mask_col):
    """aom_blend_a64_vmask_c: per-row mask."""
    m = np.asarray(mask_col).astype(np.int64)[:, None]
    return blend_a64_mask(src0, src1, np.broadcast_to(
        m, np.asarray(src0).shape))


def comp_avg_pred(pred, ref):
    """aom_comp_avg_pred_c: (p + r + 1) >> 1."""
    return (np.asarray(pred).astype(np.int64)
            + np.asarray(ref).astype(np.int64) + 1) >> 1


def comp_mask_pred(pred, ref, mask, invert: bool = False):
    """aom_comp_mask_pred_c: mask blend of pred/ref."""
    if invert:
        return blend_a64_mask(ref, pred, mask)
    return blend_a64_mask(pred, ref, mask)


def build_compound_diffwtd_mask(src0, src1, inverse: bool = False,
                                mask_base: int = 38):
    """av1_build_compound_diffwtd_mask_c (DIFFWTD_38 / _INV)."""
    diff = np.abs(np.asarray(src0).astype(np.int64)
                  - np.asarray(src1).astype(np.int64))
    m = np.clip(mask_base + diff // DIFF_FACTOR, 0, BLEND_A64_MAX_ALPHA)
    return (BLEND_A64_MAX_ALPHA - m) if inverse else m
