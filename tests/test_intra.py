"""Intra predictor golden tests vs reference C kernels
(reference analogue: test/intrapred_test.cc, test/dr_prediction_test.cc,
test/intra_edge_test.cc, test/filterintra_test.cc)."""
import os

import numpy as np
import pytest

from aom_av1_psy_tpu.ops import intra

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_intra.npz")

SIZES = [(4, 4), (8, 8), (16, 16), (32, 32), (4, 8), (8, 4), (16, 8),
         (4, 16), (64, 64), (8, 32)]
MODES = ["dc", "dc_top", "dc_left", "dc_128", "v", "h", "paeth", "smooth",
         "smooth_v", "smooth_h"]


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


@pytest.mark.parametrize("w,h", SIZES)
@pytest.mark.parametrize("mode", MODES)
def test_leaf_predictors(golden, mode, w, h):
    above_full = golden[f"{mode}_{w}x{h}_above"].astype(np.int32)
    left = golden[f"{mode}_{w}x{h}_left"].astype(np.int32)
    want = golden[f"{mode}_{w}x{h}_out"].astype(np.int32)
    above = above_full[2:]  # above_full[1] is the corner pixel above[-1]
    tl = above_full[1]
    if mode == "dc":
        got = intra.dc_pred(above, left, w, h, True, True)
    elif mode == "dc_top":
        got = intra.dc_pred(above, left, w, h, True, False)
    elif mode == "dc_left":
        got = intra.dc_pred(above, left, w, h, False, True)
    elif mode == "dc_128":
        got = intra.dc_pred(above, left, w, h, False, False)
    elif mode == "v":
        got = intra.v_pred(above, left, w, h)
    elif mode == "h":
        got = intra.h_pred(above, left, w, h)
    elif mode == "paeth":
        got = intra.paeth_pred(above, left, tl, w, h)
    elif mode == "smooth":
        got = intra.smooth_pred(above, left, w, h)
    elif mode == "smooth_v":
        got = intra.smooth_v_pred(above, left, w, h)
    else:
        got = intra.smooth_h_pred(above, left, w, h)
    np.testing.assert_array_equal(got, want, err_msg=f"{mode} {w}x{h}")


def test_directional_z1_z2_z3(golden):
    checked = 0
    for key in list(golden):
        if key.startswith("z1_") and key.endswith("_out"):
            stem = key[: -len("_out")]
            _, wh, up_s, dx_s = stem.split("_")
            w, h = map(int, wh.split("x"))
            up = int(up_s[2:])
            dx = int(dx_s[2:])
            above = golden[f"{stem}_above"].astype(np.int32)[2:]
            got = intra.dr_pred_z1(above, w, h, up, dx)
            np.testing.assert_array_equal(got, golden[key].astype(np.int32),
                                          err_msg=stem)
            checked += 1
        if key.startswith("z3_") and key.endswith("_out"):
            stem = key[: -len("_out")]
            _, wh, up_s, dy_s = stem.split("_")
            w, h = map(int, wh.split("x"))
            up = int(up_s[2:])
            dy = int(dy_s[2:])
            left = golden[f"{stem}_left"].astype(np.int32)
            got = intra.dr_pred_z3(left, w, h, up, dy)
            np.testing.assert_array_equal(got, golden[key].astype(np.int32),
                                          err_msg=stem)
            checked += 1
        if key.startswith("z2_") and key.endswith("_out"):
            stem = key[: -len("_out")]
            _, wh, up_s, a_s = stem.split("_")
            w, h = map(int, wh.split("x"))
            up_a, up_l = int(up_s[2]), int(up_s[3])
            angle = int(a_s[1:])
            dx, dy = intra.get_dx(angle), intra.get_dy(angle)
            above_m2 = golden[f"{stem}_above"].astype(np.int32)
            left_m2 = golden[f"{stem}_left"].astype(np.int32)  # starts at -2
            got = intra.dr_pred_z2(above_m2, left_m2, w, h, up_a, up_l, dx, dy)
            np.testing.assert_array_equal(got, golden[key].astype(np.int32),
                                          err_msg=stem)
            checked += 1
    assert checked > 100


def test_edge_filter(golden):
    for strength in range(4):
        for sz in (5, 17, 65):
            p = golden[f"ef_s{strength}_sz{sz}_in"].astype(np.int32).copy()
            intra.filter_intra_edge(p, sz, strength)
            np.testing.assert_array_equal(
                p, golden[f"ef_s{strength}_sz{sz}_out"].astype(np.int32))


def test_upsample_edge(golden):
    for sz in (4, 8, 16):
        pin = golden[f"ue_sz{sz}_in"].astype(np.int32)  # [corner, sz pixels]
        got = intra.upsample_intra_edge(pin, sz)
        np.testing.assert_array_equal(got, golden[f"ue_sz{sz}_out"].astype(np.int32))


def test_filter_intra(golden):
    for mode in range(5):
        above = golden[f"fi_m{mode}_above"].astype(np.int32)  # starts at corner
        left = golden[f"fi_m{mode}_left"].astype(np.int32)
        got = intra.filter_intra_pred(above, left, 8, 8, mode)
        np.testing.assert_array_equal(got, golden[f"fi_m{mode}_out"].astype(np.int32))
