"""RD-picked uniform-64 (BLOCK_64X64 + TX_64X64) smooth-frame fallback
(encoder/tpu_frame.py _pick_smooth64): the 64 partition level halves the
rate on smooth content (av1/encoder/partition_search.c's top level, not
yet reached by the fused 32/16 wavefront)."""
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

AOMDEC = "/tmp/refbuild/aomdec"
needs_oracle = pytest.mark.skipif(not os.path.exists(AOMDEC),
                                  reason="aomdec oracle absent")


@needs_oracle
def test_gradient_key_picks_64_and_conforms(tmp_path):
    from quality import clip_gradient
    from aom_av1_psy_tpu.encoder.tpu_frame import TpuFrameEncoder
    from aom_av1_psy_tpu.encoder.frame import EncoderConfig
    from aom_av1_psy_tpu.bitstream.containers import write_ivf
    from aom_av1_psy_tpu.decoder.obu import decode_ivf

    f = clip_gradient(352, 288, 1)[0]
    enc = TpuFrameEncoder(f, EncoderConfig(base_q_idx=140))
    pkt = enc.encode(include_seq=True)
    assert enc.picked_smooth64, "64-level must win on a smooth gradient"
    assert len(pkt) < 1500  # fused 32/16 needs ~6x more here
    path = str(tmp_path / "s64.ivf")
    raw = str(tmp_path / "s64.yuv")
    write_ivf(path, [pkt], f.width, f.height)
    r = subprocess.run([AOMDEC, "--rawvideo", "-o", raw, path],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref = np.fromfile(raw, np.uint8)
    fr = decode_ivf(path)[0]
    ours = np.concatenate([fr.y.ravel(), fr.u.ravel(), fr.v.ravel()])
    assert np.array_equal(ref, ours)
    # adopted state: reference planes must equal the decoded (in-loop)
    # recon so GOP chains stay decoder-exact
    got = np.asarray(enc.ref_planes_dev[0])[: f.height, : f.width]
    assert np.array_equal(got, fr.y.astype(np.int32))


def test_textured_frame_keeps_fused_path():
    from quality import clip_detail
    from aom_av1_psy_tpu.encoder.tpu_frame import TpuFrameEncoder
    from aom_av1_psy_tpu.encoder.frame import EncoderConfig

    f = clip_detail(176, 144, 1)[0]
    enc = TpuFrameEncoder(f, EncoderConfig(base_q_idx=140))
    assert not enc._smooth64_eligible(), \
        "HF gate must reject textured frames without the extra encode"
    enc.encode(include_seq=True)
    assert not enc.picked_smooth64


@needs_oracle
def test_gop_chains_off_adopted_64_key(tmp_path):
    from quality import clip_gradient
    from aom_av1_psy_tpu.encoder.frame import EncoderConfig
    from aom_av1_psy_tpu.encoder.tpu_interframe import encode_video_tpu
    from aom_av1_psy_tpu.bitstream.containers import write_ivf
    from aom_av1_psy_tpu.decoder.obu import decode_ivf

    frames = clip_gradient(352, 288, 3)
    pkts, encs = encode_video_tpu(frames, EncoderConfig(base_q_idx=160))
    assert encs[0].picked_smooth64
    path = str(tmp_path / "g64gop.ivf")
    raw = str(tmp_path / "g64gop.yuv")
    write_ivf(path, pkts, 352, 288)
    r = subprocess.run([AOMDEC, "--rawvideo", "-o", raw, path],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref = np.fromfile(raw, np.uint8)
    ours = np.concatenate([np.concatenate([f.y.ravel(), f.u.ravel(),
                                           f.v.ravel()])
                           for f in decode_ivf(path)])
    assert ref.size == ours.size and np.array_equal(ref, ours)
