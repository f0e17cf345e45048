"""Subpel convolve golden tests vs av1_convolve_{2d,x,y}_sr_c
(reference analogue: test/av1_convolve_test.cc)."""
import os

import numpy as np
import pytest

from aom_av1_psy_tpu.ops import convolve as C

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "golden_convolve.npz")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


def _cases(g):
    return sorted(k[:-4] for k in g if k.endswith("_out"))


def test_all_cases(golden):
    checked = 0
    for stem in _cases(golden):
        parts = stem.split("_")
        filt = int(parts[1][1:])
        w, h = map(int, parts[2].split("x"))
        sx = int(parts[3][1:])
        sy = int(parts[4])
        src = golden[f"{stem}_src"].astype(np.int32)
        ref = src[13 : 16 + h + 4, 13 : 16 + w + 4]
        got = C.predict_subpel(ref, w, h, sx, sy, filt, filt)
        np.testing.assert_array_equal(got, golden[f"{stem}_out"].astype(np.int32),
                                      err_msg=stem)
        checked += 1
    assert checked >= 170


def test_jax_parity(golden):
    import jax.numpy as jnp
    stem = _cases(golden)[5]
    parts = stem.split("_")
    filt = int(parts[1][1:])
    w, h = map(int, parts[2].split("x"))
    sx = int(parts[3][1:])
    sy = int(parts[4])
    src = golden[f"{stem}_src"].astype(np.int32)
    ref = src[13 : 16 + h + 4, 13 : 16 + w + 4]
    got = np.asarray(C.predict_subpel(jnp.asarray(ref), w, h, sx, sy, filt,
                                      filt))
    np.testing.assert_array_equal(got, golden[f"{stem}_out"].astype(np.int32))
