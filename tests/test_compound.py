"""Compound prediction golden tests vs av1_dist_wtd_convolve_* /
aom_blend_a64_mask_c / av1_build_compound_diffwtd_mask_c (reference
analogue: test/av1_convolve_test.cc compound cases, test/blend_a64_*)."""
import os

import numpy as np
import pytest

from aom_av1_psy_tpu.ops import compound as CP

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "golden_compound.npz")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


def test_dist_wtd_two_ref(golden):
    g = golden
    n = 0
    while f"cp{n}_out" in g:
        sx, sy, use_dw, fwd, bck, w = (int(v) for v in g[f"cp{n}_misc"])
        h = w
        # harness: block at (16,16) in a 64x64 source; padded region origin
        # is full-pel minus (3,3)
        r0 = g[f"cp{n}_src0"].astype(np.int64)[13 : 16 + h + 4, 13 : 16 + w + 4]
        r1 = g[f"cp{n}_src1"].astype(np.int64)[13 : 16 + h + 4, 13 : 16 + w + 4]
        got = CP.compound_predict(r0, r1, w, h, (sx, sy), (sx, sy),
                                  fwd, bck, bool(use_dw))
        np.testing.assert_array_equal(got, g[f"cp{n}_out"].astype(np.int64),
                                      err_msg=f"cp{n}")
        n += 1
    assert n == 16


def test_blend_a64_mask(golden):
    g = golden
    for c in range(4):
        subw, subh = (int(v) for v in g[f"bl{c}_misc"])
        a = g[f"bl{c}_a"].astype(np.int64)[:16, :16]
        b = g[f"bl{c}_b"].astype(np.int64)[:16, :16]
        mask = g[f"bl{c}_mask"].astype(np.int64)
        mh = 16 << subh
        mw = 16 << subw
        got = CP.blend_a64_mask(a, b, mask[:mh, :mw], subw, subh)
        np.testing.assert_array_equal(got, g[f"bl{c}_out"].astype(np.int64),
                                      err_msg=f"bl{c}")


def test_diffwtd_mask(golden):
    g = golden
    for c in range(2):
        a = g[f"dw{c}_a"].astype(np.int64)[:8, :16]
        b = g[f"dw{c}_b"].astype(np.int64)[:8, :16]
        got = CP.build_compound_diffwtd_mask(a, b, inverse=bool(c))
        np.testing.assert_array_equal(got, g[f"dw{c}_out"].astype(np.int64))


def test_comp_avg():
    rng = np.random.default_rng(1)
    p = rng.integers(0, 256, (8, 8))
    r = rng.integers(0, 256, (8, 8))
    np.testing.assert_array_equal(CP.comp_avg_pred(p, r), (p + r + 1) >> 1)
