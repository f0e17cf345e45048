"""Device-mesh sharding for the encode pipeline.

The reference scales with a pthread pool over tiles/SB-rows/frames
(``av1/encoder/ethread.c``, SURVEY §2.8). The TPU-native analogue: shard the
superblock/block grid over a ``jax.sharding.Mesh`` ("tiles" axis — spatial
tile parallelism P1), with frame/GOP batching on a "frames" axis (FPMT P3
analogue). Boundary-free stages (analysis, transforms, quantization) are
embarrassingly parallel over blocks; reductions (rate/distortion totals)
ride ICI via ``psum`` inside ``shard_map``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import analyze as A
from ..normative import tables
from ..normative.enums import TxSize


def make_mesh(n_devices: int | None = None, axis: str = "tiles") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def sharded_analyze_step(mesh: Mesh, n: int = 16, qindex: int = 100):
    """Build a jitted, mesh-sharded encode-analysis step.

    Input: block batch (B, n, n) uint8 with B divisible by the mesh size,
    plus per-block above/left/corner edges. Each device analyzes its shard
    of blocks (tile parallelism); frame-level rate/distortion totals are
    reduced across the mesh with psum.
    Returns fn(blocks, above, left, corner) ->
      (modes, levels, eob, totals{sse, coded_coeffs})
    """
    dc_q = tables.dc_quant(qindex)
    ac_q = tables.ac_quant(qindex)
    tx_size = {4: TxSize.TX_4X4, 8: TxSize.TX_8X8, 16: TxSize.TX_16X16,
               32: TxSize.TX_32X32}[n]
    from ..normative import txsize as TS
    shift = TS.tx_scale(int(tx_size))
    scan = jnp.asarray(tables.scan_table(TS.adjusted_tx_size(int(tx_size)), 0))

    def per_shard(blocks, above, left, corner):
        src = blocks.astype(jnp.int32)
        preds = A.predict_modes(above, left, corner, n)
        sse = ((preds - src[None]) ** 2).sum((-1, -2))
        best = jnp.argmin(sse, axis=0)
        best_pred = jnp.take_along_axis(
            preds, best[None, :, None, None], axis=0)[0]
        res = src - best_pred
        from ..ops import txfm as T
        coeffs = T.fwd_txfm2d(res, int(tx_size), 0, bd=8)
        flat = coeffs.reshape(coeffs.shape[0], -1)
        levels = A.quantize_fp(flat, dc_q, ac_q, shift)
        nz = levels[:, scan] != 0
        idx = jnp.arange(nz.shape[1], dtype=jnp.int32)
        eob = jnp.max(jnp.where(nz, idx + 1, 0), axis=1)
        best_sse = jnp.take_along_axis(sse, best[None], 0)[0]
        # frame totals reduced over the tile mesh (ICI psum)
        tot_sse = jax.lax.psum(best_sse.sum(), "tiles")
        tot_coeff = jax.lax.psum(eob.sum(), "tiles")
        return best, levels, eob, tot_sse, tot_coeff

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("tiles"), P("tiles"), P("tiles"), P("tiles")),
        out_specs=(P("tiles"), P("tiles"), P("tiles"), P(), P()))
    return jax.jit(fn)
