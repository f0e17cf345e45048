"""Encoder end-to-end tests: our streams must decode identically by our
decoder; lossless must reproduce the source exactly (reference analogue:
test/lossless_test.cc, coding_path_sync.cc). Conformance vs aomdec runs in
CI-like environments where the oracle binary exists."""
import os
import subprocess

import numpy as np
import pytest

from aom_av1_psy_tpu.utils.frame import Frame
from aom_av1_psy_tpu.encoder.frame import EncoderConfig, encode_ivf
from aom_av1_psy_tpu.decoder.obu import decode_ivf

AOMDEC = "/tmp/refbuild/aomdec"


def make_frames(w, h, n=2, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        y = (120 + 60 * np.sin(xx / 13 + i) * np.cos(yy / 9)
             + rng.normal(0, 5, (h, w))).clip(0, 255).astype(np.uint8)
        cw, ch = (w + 1) // 2, (h + 1) // 2
        u = (128 + 30 * np.cos(np.arange(ch)[:, None] / 5)).clip(0, 255) \
            .astype(np.uint8) * np.ones((ch, cw), np.uint8)
        v = np.full((ch, cw), 100, np.uint8)
        out.append(Frame(y, u, v))
    return out


@pytest.mark.parametrize("w,h", [(64, 64), (96, 72), (178, 130)])
def test_lossless_roundtrip(tmp_path, w, h):
    src = make_frames(w, h)
    path = str(tmp_path / "out.ivf")
    encode_ivf(src, EncoderConfig(lossless=True, block_size=6), path)
    dec = decode_ivf(path)
    for a, b in zip(dec, src):
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.u, b.u)
        np.testing.assert_array_equal(a.v, b.v)


@pytest.mark.parametrize("q,bs", [(60, 6), (120, 9), (160, 12)])
@pytest.mark.slow
def test_lossy_self_consistent(tmp_path, q, bs):
    src = make_frames(96, 72)
    path = str(tmp_path / "out.ivf")
    encode_ivf(src, EncoderConfig(base_q_idx=q, block_size=bs), path)
    dec = decode_ivf(path)
    assert len(dec) == len(src)
    # recon should be reasonably close at moderate q
    mse = ((dec[0].y.astype(float) - src[0].y.astype(float)) ** 2).mean()
    psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
    assert psnr > 25, psnr


@pytest.mark.skipif(not os.path.exists(AOMDEC), reason="aomdec oracle absent")
@pytest.mark.parametrize("q,bs,lossless", [(0, 6, True), (60, 6, False),
                                           (120, 12, False)])
@pytest.mark.slow
def test_aomdec_conformance(tmp_path, q, bs, lossless):
    w, h = 178, 130
    src = make_frames(w, h)
    path = str(tmp_path / "out.ivf")
    encode_ivf(src, EncoderConfig(base_q_idx=q, lossless=lossless,
                                  block_size=bs), path)
    out = str(tmp_path / "o.yuv")
    subprocess.check_call([AOMDEC, "--rawvideo", "-o", out, path],
                          stderr=subprocess.DEVNULL)
    ours = decode_ivf(path)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    fsz = w * h + 2 * cw * ch
    raw = np.fromfile(out, np.uint8)
    assert len(raw) == fsz * len(src)
    for i, f in enumerate(ours):
        off = i * fsz
        np.testing.assert_array_equal(f.y, raw[off : off + w * h].reshape(h, w))
        np.testing.assert_array_equal(
            f.u, raw[off + w * h : off + w * h + cw * ch].reshape(ch, cw))
        np.testing.assert_array_equal(
            f.v, raw[off + w * h + cw * ch : off + fsz].reshape(ch, cw))
        if lossless:
            np.testing.assert_array_equal(f.y, src[i].y)


@pytest.mark.slow
def test_tune_psy_stream_conforms():
    """--tune-content=psy analogue: SSIM/psy rdmult modulation produces a
    stream aomdec-compatible syntax-wise (decoded by our own decoder)."""
    import numpy as np
    from aom_av1_psy_tpu.encoder.frame import FrameEncoder, EncoderConfig
    from aom_av1_psy_tpu.decoder.obu import Av1Decoder
    from aom_av1_psy_tpu.utils.frame import Frame
    rng = np.random.default_rng(9)
    y = rng.integers(0, 256, (96, 96), np.uint8)
    y[:48] //= 4  # dark region: psy dark-bias / rdmult modulation target
    u = np.full((48, 48), 120, np.uint8)
    v = np.full((48, 48), 130, np.uint8)
    cfg = EncoderConfig(base_q_idx=100, tune_psy=True)
    pkt = FrameEncoder(Frame(y, u, v), cfg).encode()
    out = Av1Decoder().decode_packet(pkt)[0]
    assert out.y.shape == (96, 96)
    err = np.abs(out.y.astype(int) - y.astype(int)).mean()
    assert err < 30
