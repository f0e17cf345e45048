"""Device CDEF apply (ops/cdef_jax.py) vs the conformance-proven host
CDEF (ops/cdef.py), plus the CDEF-carrying GOP reference chain."""
import os
import subprocess

import numpy as np
import pytest

from aom_av1_psy_tpu.ops import cdef as HC
from aom_av1_psy_tpu.ops import cdef_jax as DC
from aom_av1_psy_tpu.bitstream.headers import SequenceHeader, FrameHeader
from aom_av1_psy_tpu.utils.frame import Frame

AOMDEC = "/tmp/refbuild/aomdec"


@pytest.mark.parametrize("w,h,yp,ys,up,us,seed", [
    (176, 144, 4, 2, 3, 1, 0), (96, 64, 9, 1, 6, 2, 1),
    (352, 288, 2, 0, 1, 0, 2), (128, 128, 0, 2, 0, 1, 3),
    (176, 144, 15, 3, 12, 3, 4),
])
def test_device_cdef_matches_host(w, h, yp, ys, up, us, seed):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    mi_rows, mi_cols = h // 4, w // 4
    y = rng.integers(0, 256, (h, w)).astype(np.int32)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    skip = (rng.random((mi_rows, mi_cols)) < 0.3).astype(np.int32)
    seq = SequenceHeader(max_frame_width=w, max_frame_height=h)
    fh = FrameHeader(width=w, height=h)
    c = fh.cdef
    c.bits = 0
    c.damping = 5
    c.y_pri, c.y_sec = [yp], [min(ys, 3)]
    c.uv_pri, c.uv_sec = [up], [min(us, 3)]
    planes_h = [y.copy(), u.copy(), v.copy()]
    unit = np.zeros(((mi_rows + 15) // 16, (mi_cols + 15) // 16), np.int32)
    HC.cdef_frame(planes_h, skip, unit, fh, seq, mi_rows, mi_cols)
    ysec = min(ys, 3)
    ysec += ysec == 3
    usec = min(us, 3)
    usec += usec == 3
    skip8 = skip.reshape(mi_rows // 2, 2, mi_cols // 2, 2).all((1, 3))
    nbr, nbc = h // 8, w // 8
    yb = y.reshape(nbr, 8, nbc, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    dirs, var = HC.find_dir_blocks(yb, 0)
    outs = DC.cdef_apply_fused(
        (jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)),
        jnp.asarray(skip8), jnp.asarray(dirs),
        jnp.asarray(var.astype(np.int32)), yp, ysec, up, usec, 5,
        mi_rows=mi_rows, mi_cols=mi_cols, nplanes=3)
    for a, b in zip(planes_h, outs):
        assert np.array_equal(a, np.asarray(b))


@pytest.mark.skipif(not os.path.exists(AOMDEC), reason="aomdec oracle absent")
def test_gop_with_cdef_reference_chain(tmp_path):
    """A GOP encoded with CDEF on (quantizer-derived strengths, device
    apply on the reference chain) must decode bit-identically through
    aomdec and our decoder, with at least one frame actually filtered."""
    from aom_av1_psy_tpu.encoder.frame import EncoderConfig
    from aom_av1_psy_tpu.encoder.tpu_interframe import encode_video_tpu
    from aom_av1_psy_tpu.bitstream.containers import write_ivf
    from aom_av1_psy_tpu.decoder.obu import decode_ivf

    rng = np.random.default_rng(13)
    w, h = 176, 144
    frames = []
    base = (110 + 55 * np.sin(np.arange(w) / 9.0)[None, :]
            * np.cos(np.arange(h) / 7.0)[:, None])
    for i in range(4):
        y = np.clip(np.roll(base, 2 * i, 1)
                    + rng.normal(0, 3, (h, w)), 0, 255).astype(np.uint8)
        frames.append(Frame(y, np.full((h // 2, w // 2), 120, np.uint8),
                            np.full((h // 2, w // 2), 133, np.uint8)))
    # try_smooth64 off: this probe targets the fused path's CDEF
    # reference chain, not the smooth-frame 64-level fallback
    pkts, encs = encode_video_tpu(
        frames, EncoderConfig(base_q_idx=140, try_smooth64=False),
        cdef=True)
    assert encs[0].seq.enable_cdef
    filtered = any((e.fh.cdef.y_pri[0] or e.fh.cdef.y_sec[0])
                   for e in encs if e is not None)
    path = str(tmp_path / "cdefgop.ivf")
    raw = str(tmp_path / "cdefgop.yuv")
    write_ivf(path, pkts, w, h)
    r = subprocess.run([AOMDEC, "--rawvideo", "-o", raw, path],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    ref = np.fromfile(raw, np.uint8)
    dec = decode_ivf(path)
    ours = np.concatenate([np.concatenate([f.y.ravel(), f.u.ravel(),
                                           f.v.ravel()]) for f in dec])
    assert ref.size == ours.size and np.array_equal(ref, ours)
    assert filtered, "CDEF never fired in the GOP probe"
