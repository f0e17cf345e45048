"""Temporal filter golden tests vs av1_apply_temporal_filter_c
(reference analogue: test/temporal_filter_test.cc)."""
import os

import numpy as np
import pytest

from aom_av1_psy_tpu.encoder import temporal_filter as TF

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_tf.npz")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


@pytest.mark.parametrize("c", range(4))
def test_apply_temporal_filter(golden, c):
    g = golden
    q, strength, mb_row, mb_col = (int(v) for v in g[f"tf{c}_misc"])
    y = g[f"tf{c}_y"].astype(np.int64)
    u = g[f"tf{c}_u"].astype(np.int64)
    v = g[f"tf{c}_v"].astype(np.int64)
    MB = 32
    ry = y[mb_row * MB : (mb_row + 1) * MB, mb_col * MB : (mb_col + 1) * MB]
    ru = u[mb_row * 16 : (mb_row + 1) * 16, mb_col * 16 : (mb_col + 1) * 16]
    rv = v[mb_row * 16 : (mb_row + 1) * 16, mb_col * 16 : (mb_col + 1) * 16]
    pred = g[f"tf{c}_pred"].astype(np.int64)
    py = pred[:1024].reshape(32, 32)
    pu = pred[1024:1280].reshape(16, 16)
    pv = pred[1280:1536].reshape(16, 16)
    mvs = g[f"tf{c}_mvs"].astype(np.int64)
    mses = g[f"tf{c}_mses"].astype(np.int64)
    noise = g[f"tf{c}_noise"].astype(np.float64)
    accum = [np.zeros((32, 32), np.int64), np.zeros((16, 16), np.int64),
             np.zeros((16, 16), np.int64)]
    count = [np.zeros((32, 32), np.int64), np.zeros((16, 16), np.int64),
             np.zeros((16, 16), np.int64)]
    TF.apply_temporal_filter([ry, ru, rv], [py, pu, pv], noise, mvs, mses,
                             q, strength, 128, 96, 1, 1, accum, count)
    want_acc = g[f"tf{c}_accum"].astype(np.int64)
    want_cnt = g[f"tf{c}_count"].astype(np.int64)
    np.testing.assert_array_equal(accum[0].ravel(), want_acc[:1024],
                                  err_msg="y accum")
    np.testing.assert_array_equal(count[0].ravel(), want_cnt[:1024])
    np.testing.assert_array_equal(accum[1].ravel(), want_acc[1024:1280],
                                  err_msg="u accum")
    np.testing.assert_array_equal(count[1].ravel(), want_cnt[1024:1280])
    np.testing.assert_array_equal(accum[2].ravel(), want_acc[1280:1536],
                                  err_msg="v accum")
    np.testing.assert_array_equal(count[2].ravel(), want_cnt[1280:1536])


def test_frame_driver_smoke():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (48, 64), np.int16)
    frames = []
    for i in range(3):
        n = np.clip(base + rng.integers(-8, 9, base.shape), 0, 255)
        frames.append((n.astype(np.uint8),
                       np.full((24, 32), 100 + i, np.uint8),
                       np.full((24, 32), 140 - i, np.uint8)))
    out = TF.temporal_filter_frames(frames, 1, q_factor=100, strength=2)
    assert out[0].shape == (48, 64)
    # filtering toward the temporal mean reduces noise vs the center frame
    err_f = np.abs(out[0].astype(int) - base).mean()
    err_c = np.abs(frames[1][0].astype(int) - base).mean()
    assert err_f <= err_c + 0.5
