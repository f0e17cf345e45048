"""Golden tests for sub-pixel variance / OBMC / masked SAD kernels
(reference analogue: test/variance_test.cc, test/obmc_sad_test.cc,
test/masked_sad_test.cc)."""
import os

import numpy as np
import pytest

from aom_av1_psy_tpu.ops import metrics as M

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "golden_metrics2.npz")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


def test_sub_pixel_variance(golden):
    g = golden
    for c in range(8):
        xo, yo, var, sse, var2, sse2 = (int(v) for v in g[f"sp{c}_misc"])
        src = g[f"sp{c}_src"].astype(np.int64)[:17, :17]
        ref = g[f"sp{c}_ref"].astype(np.int64)
        gv, gs = M.sub_pixel_variance(src, ref, xo, yo)
        assert (int(gv), int(gs)) == (var, sse), f"sp{c}"
        sec = g[f"sp{c}_sec"].astype(np.int64)
        gv2, gs2 = M.sub_pixel_avg_variance(src, ref, xo, yo, sec)
        assert (int(gv2), int(gs2)) == (var2, sse2), f"sp{c} avg"


def test_obmc(golden):
    g = golden
    for c in range(6):
        s, var, sse = (int(v) for v in g[f"ob{c}_misc"])
        pre = g[f"ob{c}_pre"].astype(np.int64)
        wsrc = g[f"ob{c}_wsrc"].astype(np.int64)
        mask = g[f"ob{c}_mask"].astype(np.int64)
        assert int(M.obmc_sad(pre, wsrc, mask)) == s, f"ob{c} sad"
        gv, gs = M.obmc_variance(pre, wsrc, mask)
        assert (int(gv), int(gs)) == (var, sse), f"ob{c} var"


def test_masked_sad(golden):
    g = golden
    for c in range(4):
        s, invert = (int(v) for v in g[f"mk{c}_misc"])
        src = g[f"mk{c}_src"].astype(np.int64)[:16, :16]
        # harness src stride 32: take every row's first 16 of the 32-wide buf
        full = g[f"mk{c}_src"].astype(np.int64)
        src = full.reshape(-1)[: 16 * 32].reshape(16, 32)[:, :16]
        ref = g[f"mk{c}_ref"].astype(np.int64)
        sec = g[f"mk{c}_sec"].astype(np.int64)
        mask = g[f"mk{c}_mask"].astype(np.int64)
        got = M.masked_sad(src, ref, sec, mask, invert=bool(invert))
        assert int(got) == s, f"mk{c}"
