"""Device (jax) deblocker vs the conformance-proven host walker.

The fused plan's geometry (TX == block size, aligned 32/16 luma cells,
uniform level, sharpness 0) collapses the loop filter to independent
parallel edges (ops/deblock_jax.py). These tests assert bit-exactness of
that collapsed form against ops/deblock.loop_filter_plane — the host
implementation proven against aomdec by the decode-conformance corpus.
"""
import numpy as np
import pytest

from aom_av1_psy_tpu.ops import deblock as HB
from aom_av1_psy_tpu.ops import deblock_jax as DJ
from aom_av1_psy_tpu.bitstream.headers import (SequenceHeader, FrameHeader)
from aom_av1_psy_tpu.normative.enums import BlockSize, TxSize


def _host_filter(buf, plane, split16, w, h, lvl, lvl_uv=(0, 0)):
    """Run the host walker with grids derived from a split map."""
    mi_rows = (h + 7) // 8 * 2
    mi_cols = (w + 7) // 8 * 2
    sp = np.repeat(np.repeat(split16, 4, 0), 4, 1)[:mi_rows, :mi_cols]
    ytx = np.where(sp, int(TxSize.TX_16X16), int(TxSize.TX_32X32))
    uvtx = np.where(sp, int(TxSize.TX_8X8), int(TxSize.TX_16X16))
    bsz = np.where(sp, int(BlockSize.BLOCK_16X16),
                   int(BlockSize.BLOCK_32X32))
    info = HB.DeblockInfo(ytx, bsz, np.zeros_like(ytx),
                          np.zeros_like(ytx), mi_rows, mi_cols)
    seq = SequenceHeader(max_frame_width=w, max_frame_height=h)
    fh = FrameHeader(width=w, height=h)
    fh.lf.filter_level = (lvl, lvl)
    fh.lf.filter_level_u, fh.lf.filter_level_v = lvl_uv
    out = buf.copy()
    HB.loop_filter_plane(out, plane, info, fh, seq, uv_tx_grid=uvtx)
    return out


@pytest.mark.parametrize("w,h,lvl,seed", [
    (352, 288, 14, 0), (352, 288, 63, 1), (176, 144, 7, 2),
    (176, 144, 1, 3), (128, 128, 32, 4), (192, 160, 21, 5),
])
def test_device_deblock_luma_exact(w, h, lvl, seed):
    rng = np.random.default_rng(seed)
    pw, ph = (w + 31) // 32 * 32, (h + 31) // 32 * 32
    R2, C2 = ph // 16, pw // 16
    split32 = rng.integers(0, 2, (ph // 32, pw // 32)).astype(bool)
    split16 = np.repeat(np.repeat(split32, 2, 0), 2, 1)
    buf = rng.integers(0, 256, (ph, pw)).astype(np.int32)
    # blocky content so long filters actually fire on flat runs
    buf[:, ::16] = buf[:, 1::16] = 128
    ref = _host_filter(buf, 0, split16, w, h, lvl)
    import jax.numpy as jnp
    got = np.asarray(DJ.deblock_plane_fused(
        jnp.asarray(buf), jnp.asarray(split16), lvl, lvl,
        cell=16, w=w, h=h, luma=True))
    assert np.array_equal(ref, got), int((ref != got).sum())


@pytest.mark.parametrize("w,h,lvl,seed", [
    (352, 288, 20, 0), (176, 144, 9, 1), (128, 128, 44, 2),
    (192, 160, 3, 3),
])
def test_device_deblock_chroma_exact(w, h, lvl, seed):
    rng = np.random.default_rng(100 + seed)
    pw, ph = (w + 31) // 32 * 32, (h + 31) // 32 * 32
    split32 = rng.integers(0, 2, (ph // 32, pw // 32)).astype(bool)
    split16 = np.repeat(np.repeat(split32, 2, 0), 2, 1)
    cw, ch = w // 2, h // 2
    buf = rng.integers(0, 256, (ph // 2, pw // 2)).astype(np.int32)
    buf[::8, :] = 90
    for plane, cell in ((1, 8), (2, 8)):
        ref = _host_filter(buf, plane, split16, w, h, 0,
                           lvl_uv=(lvl, lvl) if plane == 1 else (0, lvl))
        # host uses filter_level_u/v per plane; emulate per-plane level
        import jax.numpy as jnp
        got = np.asarray(DJ.deblock_plane_fused(
            jnp.asarray(buf), jnp.asarray(split16), lvl, lvl,
            cell=8, w=cw, h=ch, luma=False))
        assert np.array_equal(ref, got), (plane, int((ref != got).sum()))


def test_lpf_pick_matches_host_ladder():
    """The device ladder must pick the same level as evaluating each
    candidate through the host walker and taking the min-MSE one."""
    rng = np.random.default_rng(7)
    w, h = 176, 144
    pw, ph = 192, 160
    split32 = rng.integers(0, 2, (ph // 32, pw // 32)).astype(bool)
    split16 = np.repeat(np.repeat(split32, 2, 0), 2, 1)
    src = rng.integers(0, 256, (ph, pw)).astype(np.int32)
    rec = np.clip(src + rng.integers(-12, 13, src.shape), 0, 255) \
        .astype(np.int32)
    rec[:, ::16] = np.clip(rec[:, ::16] + 6, 0, 255)
    cands = np.array([0, 4, 8, 16, 32, 63], np.int32)
    import jax.numpy as jnp
    levels, outs = DJ.lpf_pick_and_filter(
        (jnp.asarray(rec),), (jnp.asarray(src),), jnp.asarray(split16),
        cands, w=w, h=h, nplanes=1)
    best_host, best_mse = None, None
    for lvl in cands:
        f = _host_filter(rec, 0, split16, w, h, int(lvl))
        mse = int(((f[:h, :w].astype(np.int64) - src[:h, :w]) ** 2).sum())
        if best_mse is None or mse < best_mse:
            best_host, best_mse = int(lvl), mse
    assert int(levels[0]) == best_host
    ref = _host_filter(rec, 0, split16, w, h, best_host)
    assert np.array_equal(ref, np.asarray(outs[0]))
