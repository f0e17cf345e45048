"""PSNR-HVS golden tests vs aom_dsp/psnrhvs.c (calc_psnrhvs scores dumped
from the reference build into golden_psnrhvs.npz)."""
import os

import numpy as np
import pytest

from aom_av1_psy_tpu.ops.metrics import (_calc_psnrhvs_plane, psnr_hvs,
                                         _CSF_Y, _CSF_CB, _CSF_CR)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "golden_psnrhvs.npz")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


@pytest.mark.parametrize("c", range(3))
def test_psnrhvs_planes_golden(golden, c):
    w, h, _seed = (int(v) for v in golden[f"case{c}_dims"])
    cw, ch = w // 2, h // 2
    d = golden[f"case{c}_planes"]
    o = [0]

    def take(n):
        r = d[o[0] : o[0] + n]
        o[0] += n
        return r

    sy = take(w * h).reshape(h, w)
    dy = take(w * h).reshape(h, w)
    su = take(cw * ch).reshape(ch, cw)
    du = take(cw * ch).reshape(ch, cw)
    sv = take(cw * ch).reshape(ch, cw)
    dv = take(cw * ch).reshape(ch, cw)
    want_y, want_u, want_v = golden[f"case{c}_scores"]
    y = _calc_psnrhvs_plane(sy, dy, _CSF_Y, True)
    u = _calc_psnrhvs_plane(su, du, _CSF_CB, False)
    v = _calc_psnrhvs_plane(sv, dv, _CSF_CR, False)
    # float32 accumulation-order differences in the C bound the match at
    # ~1e-7 relative; the integer DCT path itself is exact
    for got, want in ((y, want_y), (u, want_u), (v, want_v)):
        assert abs(got - want) <= 1e-6 * max(abs(want), 1e-3), (got, want)


def test_psnrhvs_db_properties(golden):
    w, h, _ = (int(v) for v in golden["case0_dims"])
    cw, ch = w // 2, h // 2
    d = golden["case0_planes"]
    sy = d[: w * h].reshape(h, w)
    su = np.full((ch, cw), 128, np.uint8)
    sv = np.full((ch, cw), 128, np.uint8)
    total, y, u, v = psnr_hvs((sy, su, sv), (sy, su, sv))
    assert total == 100.0 and y == 100.0    # identity saturates
    noisy = np.clip(sy.astype(int)
                    + np.random.default_rng(0).integers(-20, 21, sy.shape),
                    0, 255).astype(np.uint8)
    t2, *_ = psnr_hvs((sy, su, sv), (noisy, su, sv))
    assert t2 < 45.0
