"""TPU-batched encode analysis: the hot compute core of the encoder.

Replaces the reference's per-block scalar RD loops (``av1/encoder/rdopt.c``
intra search + ``encodemb.c`` xform/quant) with one fused, jittable pipeline
over the whole superblock grid:

  frame -> (B, N, N) block batch -> intra predictions for all candidate
  modes -> SSE mode decision -> exact integer forward transform ->
  fp-domain quantization -> coded-level statistics

Everything is static-shaped and batch-parallel: XLA maps the transform
stage interpreter (ops/txfm.py) and the prediction broadcasts straight onto
the MXU/VPU, and the batch axis shards across devices (see parallel/mesh.py).

Mode-decision predictions use source neighbors (one row/col shifted), a
standard encoder-side approximation; the conforming bitstream writer re-runs
prediction from recon with the chosen mode, so output streams stay exact.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..normative import tables
from ..normative.enums import TxSize
from ..normative import txsize as TS
from . import txfm as txfm_ops
from .intra import smooth_weights, SMOOTH_WEIGHT_LOG2_SCALE

# candidate modes in the batched search (DC, V, H, SMOOTH, SMOOTH_V,
# SMOOTH_H, PAETH) — the ones whose predictors are pure broadcasts
BATCH_MODES = (0, 1, 2, 9, 10, 11, 12)


def blockify(plane: jnp.ndarray, n: int) -> jnp.ndarray:
    """(H, W) -> (B, n, n) raster-ordered blocks. H, W multiples of n."""
    h, w = plane.shape
    return (plane.reshape(h // n, n, w // n, n)
            .transpose(0, 2, 1, 3)
            .reshape(-1, n, n))


def unblockify(blocks: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    n = blocks.shape[-1]
    return (blocks.reshape(h // n, w // n, n, n)
            .transpose(0, 2, 1, 3)
            .reshape(h, w))


def _edges_from_source(plane: jnp.ndarray, n: int):
    """Above row / left col per block, from source neighbors.

    above: (B, n), left: (B, n), corner: (B,). Edge blocks fall back to the
    AV1 defaults (127 above / 129 left / 128 corner)."""
    h, w = plane.shape
    above_rows = jnp.concatenate(
        [jnp.full((1, w), 127, plane.dtype), plane[n - 1 :: n][:-1]], axis=0)
    above = blockify(jnp.repeat(above_rows, n, axis=0), n)[:, 0, :]
    left_cols = jnp.concatenate(
        [jnp.full((h, 1), 129, plane.dtype), plane[:, n - 1 :: n][:, :-1]],
        axis=1)
    left = blockify(jnp.repeat(left_cols, n, axis=1), n)[:, :, 0]
    corner_grid = jnp.full((h // n + 1, w // n + 1), 128, plane.dtype)
    corner_grid = corner_grid.at[1:, 1:].set(plane[n - 1 :: n, n - 1 :: n])
    corner = corner_grid[:-1, :-1].reshape(-1)
    return above, left, corner


def predict_modes(above: jnp.ndarray, left: jnp.ndarray, corner: jnp.ndarray,
                  n: int) -> jnp.ndarray:
    """All BATCH_MODES predictions: returns (M, B, n, n) int32."""
    above = above.astype(jnp.int32)
    left = left.astype(jnp.int32)
    corner = corner.astype(jnp.int32)
    b = above.shape[0]
    a2 = above[:, None, :]  # (B,1,n)
    l2 = left[:, :, None]  # (B,n,1)
    c2 = corner[:, None, None]
    ones = jnp.ones((b, n, n), jnp.int32)

    dc = ((above.sum(1) + left.sum(1) + n) // (2 * n))[:, None, None] * ones
    v = a2 * jnp.ones((b, n, 1), jnp.int32)
    hmode = l2 * jnp.ones((b, 1, n), jnp.int32)

    sw = jnp.asarray(smooth_weights(n), jnp.int32)
    scale = 1 << SMOOTH_WEIGHT_LOG2_SCALE
    below = left[:, -1][:, None, None]
    right = above[:, -1][:, None, None]
    wh = sw[None, :, None]
    ww = sw[None, None, :]
    smooth = (wh * a2 + (scale - wh) * below + ww * l2
              + (scale - ww) * right + scale) >> (SMOOTH_WEIGHT_LOG2_SCALE + 1)
    smooth_v = (wh * a2 + (scale - wh) * below
                + (scale >> 1)) >> SMOOTH_WEIGHT_LOG2_SCALE
    smooth_h = (ww * l2 + (scale - ww) * right
                + (scale >> 1)) >> SMOOTH_WEIGHT_LOG2_SCALE

    base = l2 + a2 - c2
    pl, pt, ptl = (jnp.abs(base - l2), jnp.abs(base - a2), jnp.abs(base - c2))
    paeth = jnp.where((pl <= pt) & (pl <= ptl), l2 * jnp.ones_like(base),
                      jnp.where(pt <= ptl, a2 * jnp.ones_like(base),
                                c2 * jnp.ones_like(base)))

    return jnp.stack([dc, v, hmode, smooth, smooth_v, smooth_h, paeth])


def quantize_fp(coeff_flat: jnp.ndarray, dc_q: int, ac_q: int,
                shift: int) -> jnp.ndarray:
    """fp-domain quantization: level = round(F << shift / dqv)."""
    dqv = jnp.full(coeff_flat.shape[-1], ac_q, jnp.int32).at[0].set(dc_q)
    scaled = jnp.abs(coeff_flat) << shift
    lv = (scaled + (dqv >> 1)) // dqv
    return jnp.sign(coeff_flat) * lv


@functools.partial(jax.jit, static_argnames=("n", "tx_size"))
def analyze_plane(plane: jnp.ndarray, dc_q: int, ac_q: int, n: int = 16,
                  tx_size: int = int(TxSize.TX_16X16)):
    """Full batched analysis of one plane with n×n blocks.

    Returns dict of per-block: best mode index (into BATCH_MODES), SSE of
    the winner, quantized levels (B, n*n) in coeff layout, eob.
    """
    src = blockify(plane.astype(jnp.int32), n)
    above, left, corner = _edges_from_source(plane.astype(jnp.int32), n)
    preds = predict_modes(above, left, corner, n)  # (M,B,n,n)
    sse = ((preds - src[None]) ** 2).sum((-1, -2))  # (M,B)
    best = jnp.argmin(sse, axis=0)  # (B,)
    best_pred = jnp.take_along_axis(
        preds, best[None, :, None, None], axis=0)[0]
    res = src - best_pred

    coeffs = txfm_ops.fwd_txfm2d(res, tx_size, 0, bd=8)  # (B, n, n) W,H
    shift = TS.tx_scale(tx_size)
    flat = coeffs.reshape(coeffs.shape[0], -1)
    levels = quantize_fp(flat, dc_q, ac_q, shift)

    scan = jnp.asarray(tables.scan_table(TS.adjusted_tx_size(tx_size), 0))
    scanned = levels[:, scan]
    nz = scanned != 0
    idx = jnp.arange(nz.shape[1], dtype=jnp.int32)
    eob = jnp.max(jnp.where(nz, idx + 1, 0), axis=1)

    return {"mode": best, "sse": jnp.take_along_axis(sse, best[None], 0)[0],
            "levels": levels, "eob": eob}
