"""Psy layer tests (reference analogue: behavior of --tune-content=psy
paths in av1_quantize.c / partition_search.c / encoder_utils.c)."""
import numpy as np

from aom_av1_psy_tpu.encoder import psy
from aom_av1_psy_tpu.ops import metrics


def test_chroma_delta_q_table():
    assert psy.chroma_delta_q(1, 1) == -1   # 4:2:0
    assert psy.chroma_delta_q(1, 0) == 0    # 4:2:2
    assert psy.chroma_delta_q(0, 0) == 6    # 4:4:4
    assert psy.chroma_delta_q(1, 1, psy=False) == 6


def test_dark_bias_breakpoints():
    assert psy.dark_bias_adjustment(0) == -2
    assert psy.dark_bias_adjustment(44) == -2
    assert psy.dark_bias_adjustment(45) == -1
    assert psy.dark_bias_adjustment(69) == -1
    assert psy.dark_bias_adjustment(70) == 0
    assert psy.dark_bias_adjustment(195) == 0
    assert psy.dark_bias_adjustment(196) == 1
    assert psy.dark_bias_adjustment(255) == 1


def test_perpixel_variance_matches_metrics():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 40), np.uint8)
    v8 = psy.perpixel_variance_8x8(img)
    for r in range(4):
        for c in range(5):
            blk = img[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8].astype(np.int32)
            ref = metrics.variance(blk, np.zeros_like(blk))[0] / 64.0
            assert abs(v8[r, c] - ref) < 1e-9


def test_ssim_factors_normalized_and_ordered():
    rng = np.random.default_rng(3)
    # left half flat (low var), right half noisy (high var)
    img = np.full((64, 64), 128, np.uint8)
    img[:, 32:] = rng.integers(0, 256, (64, 32), np.uint8)
    f = psy.ssim_rdmult_scaling_factors(img)
    assert f.shape == (4, 4)
    # geometric mean == 1
    assert abs(np.exp(np.log(f).mean()) - 1.0) < 1e-12
    # flat regions get smaller rdmult factors (more bits) than noisy ones
    assert f[:, :2].mean() < f[:, 2:].mean()


def test_ssim_factors_odd_size():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (130, 178), np.uint8)
    f = psy.ssim_rdmult_scaling_factors(img)
    assert f.shape == ((34 + 3) // 4, (46 + 3) // 4)
    assert np.isfinite(f).all() and (f > 0).all()


def test_ssim_scaled_rdmult():
    f = np.array([[0.5, 2.0], [2.0, 0.5]])
    # 16x16 block at (0,0) covers one cell
    assert psy.ssim_scaled_rdmult(1000, f, 0, 0, 4, 4) == 500
    # 32x32 at origin covers all four → geomean(0.5,2,2,0.5)=1
    assert psy.ssim_scaled_rdmult(1000, f, 0, 0, 8, 8) == 1000
    # out of range → unchanged
    assert psy.ssim_scaled_rdmult(1000, f, 16, 16, 4, 4) == 1000
