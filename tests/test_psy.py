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


def test_butteraugli_lite_rdmult_grid(tmp_path):
    """tune_butteraugli (butteraugli-LITE masking model,
    tune_butteraugli.c's role): dark/flat regions must get a smaller
    lambda (more bits) than bright textured regions, the stream must
    stay conforming, and bits must measurably shift toward the
    sensitive half."""
    import os
    import subprocess
    import numpy as np
    from aom_av1_psy_tpu.utils.frame import Frame
    from aom_av1_psy_tpu.encoder.frame import EncoderConfig
    from aom_av1_psy_tpu.encoder.tpu_frame import TpuFrameEncoder
    from aom_av1_psy_tpu.bitstream.containers import write_ivf

    w, h = 176, 144
    rng = np.random.default_rng(5)
    y = np.empty((h, w), np.uint8)
    # left half: dark smooth ramp (high sensitivity); right half: bright
    # heavy texture (strong masking)
    yy, xx = np.mgrid[0:h, 0 : w // 2].astype(np.float32)
    y[:, : w // 2] = np.clip(20 + 20 * (xx / w) + 8 * np.sin(yy / 23.0),
                             0, 255).astype(np.uint8)
    y[:, w // 2 :] = np.clip(150 + rng.normal(0, 45, (h, w // 2)), 0,
                             255).astype(np.uint8)
    f = Frame(y, np.full((h // 2, w // 2), 128, np.uint8),
              np.full((h // 2, w // 2), 128, np.uint8))
    enc = TpuFrameEncoder(f, EncoderConfig(base_q_idx=120,
                                           tune_butteraugli=True))
    grid = np.asarray(enc.rdmult)
    assert grid.ndim == 2 and grid.std() > 0
    # dark/flat left gets smaller lambda than masked bright right
    assert grid[:, : grid.shape[1] // 2].mean() \
        < grid[:, grid.shape[1] // 2 :].mean()
    data = enc.encode()
    path = str(tmp_path / "ba.ivf")
    write_ivf(path, [data], w, h)
    aomdec = "/tmp/refbuild/aomdec"
    if os.path.exists(aomdec):
        r = subprocess.run([aomdec, "--rawvideo", "-o",
                            str(tmp_path / "ba.yuv"), path],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
    # vs untuned: the dark half's reconstruction error must shrink
    enc0 = TpuFrameEncoder(f, EncoderConfig(base_q_idx=120))
    enc0.encode()
    rec1 = np.asarray(enc.ref_planes_dev[0])[:h, : w // 2]
    rec0 = np.asarray(enc0.ref_planes_dev[0])[:h, : w // 2]
    src = y[:, : w // 2].astype(np.int64)
    e1 = ((rec1 - src) ** 2).mean()
    e0 = ((rec0 - src) ** 2).mean()
    assert e1 <= e0, (e1, e0)
