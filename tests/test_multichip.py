"""Multi-chip tile sharding on the PRODUCT path: the fused intra plan
sharded one tile-column per device must produce a byte-identical
bitstream to the single-device loop (MT determinism contract of
test/ethread_test.cc:113-205), and the multi-tile stream must be
bit-exact through the reference aomdec."""
import os
import subprocess

import numpy as np
import pytest

from aom_av1_psy_tpu.utils.frame import Frame
from aom_av1_psy_tpu.encoder.frame import EncoderConfig
from aom_av1_psy_tpu.encoder.tpu_frame import TpuFrameEncoder
from aom_av1_psy_tpu.parallel.mesh import make_mesh
from aom_av1_psy_tpu.bitstream.containers import write_ivf
from aom_av1_psy_tpu.decoder.obu import decode_ivf

AOMDEC = "/tmp/refbuild/aomdec"


def _frame(w, h, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (100 + 50 * np.sin(xx / 19) * np.cos(yy / 13)
         + rng.normal(0, 10, (h, w))).clip(0, 255).astype(np.uint8)
    u = (128 + 30 * np.sin(xx[::2, ::2] / 23)).clip(0, 255).astype(np.uint8)
    v = (110 + rng.normal(0, 8, (h // 2, w // 2))).clip(0, 255) \
        .astype(np.uint8)
    return Frame(y, u, v)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_tiles_byte_identical(n_dev):
    import jax
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual device mesh")
    w, h = 64 * n_dev, 128
    f = _frame(w, h)
    cfg = EncoderConfig(base_q_idx=90,
                        tile_cols_log2=n_dev.bit_length() - 1)
    enc1 = TpuFrameEncoder(f, cfg)
    assert enc1.tile_T == n_dev
    d_loop = enc1.encode()
    enc2 = TpuFrameEncoder(f, cfg)
    enc2.mesh = make_mesh(n_dev)
    d_shard = enc2.encode()
    assert d_shard == d_loop


@pytest.mark.skipif(not os.path.exists(AOMDEC), reason="aomdec oracle absent")
@pytest.mark.parametrize("lg", [1, 2])
def test_multitile_stream_aomdec_bitexact(tmp_path, lg):
    w, h = 256, 128
    f = _frame(w, h, seed=lg)
    enc = TpuFrameEncoder(f, EncoderConfig(base_q_idx=90,
                                           tile_cols_log2=lg))
    assert enc.tile_T == (1 << lg)
    data = enc.encode()
    path = str(tmp_path / "t.ivf")
    raw = str(tmp_path / "t.yuv")
    write_ivf(path, [data], w, h)
    r = subprocess.run([AOMDEC, "--rawvideo", "-o", raw, path],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref = np.fromfile(raw, np.uint8)
    dec = decode_ivf(path)
    ours = np.concatenate([dec[0].y.ravel(), dec[0].u.ravel(),
                           dec[0].v.ravel()])
    assert np.array_equal(ref, ours)
