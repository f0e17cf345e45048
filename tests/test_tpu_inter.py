"""Fused TPU inter path: closed loop (plan recon == decoder recon) and
bitstream conformance through the reference aomdec (reference analogue:
test/coding_path_sync.cc for inter frames)."""
import os
import subprocess

import numpy as np
import pytest

from aom_av1_psy_tpu.utils.frame import Frame
from aom_av1_psy_tpu.encoder.frame import EncoderConfig
from aom_av1_psy_tpu.encoder.tpu_interframe import encode_video_tpu
from aom_av1_psy_tpu.decoder.obu import Av1Decoder
from aom_av1_psy_tpu.bitstream.containers import write_ivf

AOMDEC = "/tmp/refbuild/aomdec"


def panning(w, h, n, seed=5):
    rng = np.random.default_rng(seed)
    pad = 4 * n + 16
    bg = (110 + 45 * np.sin(np.arange(w + pad) / 37.)[None, :]
          * np.cos(np.arange(h + pad) / 29.)[:, None]
          + rng.normal(0, 6, (h + pad, w + pad))).clip(0, 255) \
        .astype(np.uint8)
    u0 = (128 + 20 * np.cos(np.arange((w + pad) // 2) / 17.)[None, :]
          * np.ones(((h + pad) // 2, 1))).clip(0, 255).astype(np.uint8)
    out = []
    for i in range(n):
        ox, oy = 3 * i, 2 * i
        y = bg[oy : oy + h, ox : ox + w].copy()
        u = u0[oy // 2 : oy // 2 + h // 2, ox // 2 : ox // 2 + w // 2].copy()
        v = 255 - u
        out.append(Frame(y, u, v))
    return out


def _decode_all(packets):
    dec = Av1Decoder()
    out = []
    for p in packets:
        out.extend(dec.decode_packet(p))
    return out


@pytest.mark.parametrize("w,h,q", [(96, 64, 80), (160, 112, 120)])
def test_tpu_inter_closed_loop(w, h, q):
    frames = panning(w, h, 3, seed=w)
    packets, encs = encode_video_tpu(frames, EncoderConfig(base_q_idx=q))
    dec = _decode_all(packets)
    assert len(dec) == len(frames)
    for i, f in enumerate(dec):
        rec = [np.asarray(r) for r in encs[i].plan["recon_dev"]]
        for pi, d_ in enumerate((f.y, f.u, f.v)):
            d_ = d_.astype(np.int32)
            np.testing.assert_array_equal(
                d_, rec[pi][: d_.shape[0], : d_.shape[1]],
                err_msg=f"frame {i} plane {pi}")
    # a STATIC repeat of the same frame must cost far less than the KEY
    static = [frames[0]] * 2
    spk, _ = encode_video_tpu(static, EncoderConfig(base_q_idx=q))
    assert len(spk[1]) < 0.3 * len(spk[0]), (len(spk[1]), len(spk[0]))


@pytest.mark.skipif(not os.path.exists(AOMDEC), reason="aomdec oracle absent")
def test_tpu_inter_aomdec_bitexact(tmp_path):
    w, h = 112, 80
    frames = panning(w, h, 4, seed=9)
    packets, _ = encode_video_tpu(frames, EncoderConfig(base_q_idx=100))
    path = str(tmp_path / "gop.ivf")
    raw = str(tmp_path / "gop.yuv")
    write_ivf(path, packets, w, h)
    r = subprocess.run([AOMDEC, "--rawvideo", "-o", raw, path],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref = np.fromfile(raw, np.uint8)
    dec = _decode_all(packets)
    ours = np.concatenate([np.concatenate([f.y.ravel(), f.u.ravel(),
                                           f.v.ravel()]) for f in dec])
    assert ref.size == ours.size
    assert np.array_equal(ref, ours)


@pytest.mark.skipif(not os.path.exists(AOMDEC), reason="aomdec oracle absent")
def test_tpu_inter_mid_gop_key(tmp_path):
    w, h = 96, 64
    frames = panning(w, h, 5, seed=3)
    packets, _ = encode_video_tpu(frames, EncoderConfig(base_q_idx=90),
                                  key_interval=2)
    path = str(tmp_path / "kgop.ivf")
    raw = str(tmp_path / "kgop.yuv")
    write_ivf(path, packets, w, h)
    r = subprocess.run([AOMDEC, "--rawvideo", "-o", raw, path],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref = np.fromfile(raw, np.uint8)
    dec = _decode_all(packets)
    ours = np.concatenate([np.concatenate([f.y.ravel(), f.u.ravel(),
                                           f.v.ravel()]) for f in dec])
    assert np.array_equal(ref, ours)
