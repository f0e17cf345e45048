"""VMAF-style tuner (encoder/tune_vmaf.py) — metric properties, the
unsharp servo's direction, and end-to-end conformance."""
import os
import subprocess

import numpy as np
import pytest

from aom_av1_psy_tpu.utils.frame import Frame
from aom_av1_psy_tpu.encoder import tune_vmaf as TV
from aom_av1_psy_tpu.encoder.frame import EncoderConfig
from aom_av1_psy_tpu.encoder.tpu_frame import TpuFrameEncoder
from aom_av1_psy_tpu.bitstream.containers import write_ivf

AOMDEC = "/tmp/refbuild/aomdec"


def _src(w=176, h=144, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.clip(100 + 60 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
                   + rng.normal(0, 3, (h, w)), 0, 255).astype(np.uint8)


def test_vif_lite_properties():
    import jax.numpy as jnp
    y = _src().astype(np.float32)
    b = np.asarray(TV.gaussian_blur(jnp.asarray(y, jnp.int32))) \
        .astype(np.float32)
    b2 = np.asarray(TV.gaussian_blur(jnp.asarray(b, jnp.int32))) \
        .astype(np.float32)
    v_self = float(TV.vif_lite(y, y))
    v_blur = float(TV.vif_lite(y, b))
    v_blur2 = float(TV.vif_lite(y, b2))
    assert abs(v_self - 1.0) < 1e-4
    assert v_blur < v_self
    assert v_blur2 < v_blur  # more information loss, lower fidelity


def test_unsharp_servo_direction():
    """Blurry content gets a larger amount than already-sharp content;
    heavily textured content gets none (tune_vmaf.c's observable
    preprocessing behavior)."""
    import jax.numpy as jnp
    y = _src()
    blurry = np.asarray(TV.gaussian_blur(jnp.asarray(y, jnp.int32))) \
        .astype(np.uint8)
    rng = np.random.default_rng(0)
    textured = rng.integers(0, 256, y.shape).astype(np.uint8)
    a_sharp, _ = TV.frame_preprocessing(y)
    a_blur, s_blur = TV.frame_preprocessing(blurry)
    a_tex, s_tex = TV.frame_preprocessing(textured)
    assert a_blur > a_sharp >= 0.0
    assert a_tex == 0.0
    assert np.array_equal(s_tex, textured)
    assert not np.array_equal(s_blur, blurry)


def test_gaussian_blur_matches_host_convolve():
    """The jitted blur must equal ops/convolve.convolve_2d_sr with the
    tune_vmaf kernel (the conformance-proven convolve arithmetic)."""
    from aom_av1_psy_tpu.ops import convolve as CONV
    y = _src(96, 64).astype(np.int32)
    pad = np.pad(y, ((3, 4), (3, 4)), mode="edge")
    k = np.asarray(TV.GAUSS_KERNEL, np.int64)
    ref = CONV.convolve_2d_sr(pad, 96, 64, k, k)
    got = np.asarray(TV.gaussian_blur(y))
    assert np.array_equal(np.asarray(ref, np.int32), got)


@pytest.mark.skipif(not os.path.exists(AOMDEC), reason="aomdec oracle absent")
def test_tune_vmaf_stream_conforming(tmp_path):
    f = Frame(_src(), np.full((72, 88), 120, np.uint8),
              np.full((72, 88), 130, np.uint8))
    enc = TpuFrameEncoder(f, EncoderConfig(base_q_idx=100, tune_vmaf=True))
    pkt = enc.encode()
    assert enc.vmaf_unsharp_amount >= 0.0
    path = str(tmp_path / "tv.ivf")
    raw = str(tmp_path / "tv.yuv")
    write_ivf(path, [pkt], 176, 144)
    r = subprocess.run([AOMDEC, "--rawvideo", "-o", raw, path],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    buf = np.fromfile(raw, np.uint8)
    dy = buf[: 176 * 144].reshape(144, 176).astype(np.int32)
    rec = np.asarray(enc.ref_planes_dev[0])[:144, :176]
    assert np.array_equal(rec, dy)
