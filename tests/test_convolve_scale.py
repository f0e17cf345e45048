"""Scaled-reference convolve golden test vs av1_convolve_2d_scale_c
(av1/common/convolve.c:371) across filters, block sizes, scale steps
(1:1, 3:2, 2:1, non-dyadic 1638/1024) and phases."""
import os

import numpy as np
import pytest

from aom_av1_psy_tpu.ops import convolve as cv

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "golden_convolve_scale.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_all_cases(golden):
    names = [n for n in golden.files if n.endswith("_src")]
    assert len(names) == 48
    for n in names:
        # cvs_f{filt}_{w}x{h}_st{xs}_{ys}_p{ph}_src
        parts = n.split("_")
        filt = int(parts[1][1:])
        w, h = map(int, parts[2].split("x"))
        xs = int(parts[3][2:])
        ys = int(parts[4])
        ph = int(parts[5][1:])
        spx, spy = (517, 260) if ph else (64, 960)
        src = golden[n].astype(np.int32)
        want = golden[n[:-4] + "_out"]
        out = cv.convolve_2d_scale(
            src, 32, 32, w, h,
            cv.filter_kernels(filt, w), cv.filter_kernels(filt, h),
            spx, xs, spy, ys)
        assert np.array_equal(out, want), n
