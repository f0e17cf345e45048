"""Film grain synthesis golden tests vs av1_add_film_grain_run on the
encoder's film_grain_test_vectors (reference analogue:
test/film_grain_table_test.cc + decoder grain path)."""
import os

import numpy as np
import pytest

from aom_av1_psy_tpu.ops import grain as G

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_grain.npz")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


def _params(g, v):
    def i(f):
        return int(g[f"g{v}_{f}"][0])

    return G.FilmGrainParams(
        scaling_points_y=g[f"g{v}_sp_y"], num_y_points=i("num_y_points"),
        scaling_points_cb=g[f"g{v}_sp_cb"], num_cb_points=i("num_cb_points"),
        scaling_points_cr=g[f"g{v}_sp_cr"], num_cr_points=i("num_cr_points"),
        scaling_shift=i("scaling_shift"), ar_coeff_lag=i("ar_coeff_lag"),
        ar_coeffs_y=g[f"g{v}_ar_y"].astype(np.int64),
        ar_coeffs_cb=g[f"g{v}_ar_cb"].astype(np.int64),
        ar_coeffs_cr=g[f"g{v}_ar_cr"].astype(np.int64),
        ar_coeff_shift=i("ar_coeff_shift"), cb_mult=i("cb_mult"),
        cb_luma_mult=i("cb_luma_mult"), cb_offset=i("cb_offset"),
        cr_mult=i("cr_mult"), cr_luma_mult=i("cr_luma_mult"),
        cr_offset=i("cr_offset"), overlap_flag=i("overlap_flag"),
        clip_to_restricted_range=i("clip_to_restricted_range"),
        chroma_scaling_from_luma=i("chroma_scaling_from_luma"),
        grain_scale_shift=i("grain_scale_shift"),
        random_seed=i("random_seed"), bit_depth=8)


@pytest.mark.parametrize("v", range(16))
def test_grain_vector(golden, v):
    p = _params(golden, v)
    y = golden[f"g{v}_luma_in"].copy()
    cb = golden[f"g{v}_cb_in"].copy()
    cr = golden[f"g{v}_cr_in"].copy()
    oy, ocb, ocr = G.apply_film_grain(p, y, cb, cr, ss_x=1, ss_y=1)
    np.testing.assert_array_equal(oy, golden[f"g{v}_luma_out"],
                                  err_msg=f"v{v} luma")
    np.testing.assert_array_equal(ocb, golden[f"g{v}_cb_out"],
                                  err_msg=f"v{v} cb")
    np.testing.assert_array_equal(ocr, golden[f"g{v}_cr_out"],
                                  err_msg=f"v{v} cr")
