"""Warped motion golden tests vs av1_warp_affine_c (reference analogue:
test/warp_filter_test.cc)."""
import os

import numpy as np
import pytest

from aom_av1_psy_tpu.ops import warp as W

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_warp.npz")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


def test_warp_affine_all(golden):
    n = 0
    while f"w{n}_out" in golden:
        mat = golden[f"w{n}_mat"].astype(np.int64)
        alpha, beta, gamma, delta, p_col, p_row, ss, round0 = \
            (int(v) for v in golden[f"w{n}_misc"])
        ref = golden[f"w{n}_ref"].astype(np.int64)
        want = golden[f"w{n}_out"].astype(np.int64)
        ph, pw = want.shape
        got = W.warp_affine(mat, ref, p_col, p_row, pw, ph, ss, ss,
                            alpha, beta, gamma, delta, round0=round0)
        np.testing.assert_array_equal(got, want, err_msg=f"case {n}")
        n += 1
    assert n == 24
