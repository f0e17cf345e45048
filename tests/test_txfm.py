"""Transform golden tests: every valid (tx_size, tx_type) pair, forward and
inverse, must match the reference C kernels bit-exactly (reference
test analogue: test/av1_fwd_txfm2d_test.cc, av1_inv_txfm2d_test.cc)."""
import os

import numpy as np
import pytest

from aom_av1_psy_tpu.normative.enums import TxSize, TxType, TX_WIDTH, TX_HEIGHT
from aom_av1_psy_tpu.ops import txfm
from aom_av1_psy_tpu.utils.recordio import parse_records

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_txfm.npz")


def _valid(ts, tt):
    from aom_av1_psy_tpu.normative.enums import TX_TYPE_1D, TxType1D
    w, h = int(TX_WIDTH[ts]), int(TX_HEIGHT[ts])
    v, hh = TX_TYPE_1D[TxType(tt)]

    def ok(n, t):
        if n <= 16:
            return True
        if n == 32:
            return t in (TxType1D.DCT, TxType1D.IDTX)
        return t == TxType1D.DCT

    return ok(h, v) and ok(w, hh)


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(GOLDEN), "run tools/gen_golden.sh"
    return dict(np.load(GOLDEN))


ALL_PAIRS = [(ts, tt) for ts in range(19) for tt in range(16) if _valid(ts, tt)]


@pytest.mark.parametrize("ts,tt", ALL_PAIRS)
def test_fwd_txfm2d_matches_reference(golden, ts, tt):
    inp = golden[f"fwd_in_ts{ts}_tt{tt}"].astype(np.int64)
    want = golden[f"fwd_out_ts{ts}_tt{tt}"]
    got = txfm.fwd_txfm2d(inp, ts, tt, bd=8)
    w, h = int(TX_WIDTH[ts]), int(TX_HEIGHT[ts])
    cw, ch = min(w, 32), min(h, 32)
    if (cw, ch) != (w, h):
        # reference packs the surviving <=32x32 coeffs compactly and zeroes
        # the rest (av1_fwd_txfm2d.c 64-point wrappers); ours stay full-size
        B = want.shape[0]
        flat = want.reshape(B, w * h)
        # (bytes past cw*ch in the reference buffer are stale scratch — the
        # reference relies on eob never reaching them)
        np.testing.assert_array_equal(
            got[:, :cw, :ch].reshape(B, cw * ch), flat[:, : cw * ch],
            err_msg=f"ts={ts} tt={tt}")
    else:
        np.testing.assert_array_equal(got, want, err_msg=f"ts={ts} tt={tt}")


@pytest.mark.parametrize("ts,tt", ALL_PAIRS)
def test_inv_txfm2d_matches_reference(golden, ts, tt):
    coeff = golden[f"inv_in_ts{ts}_tt{tt}"].astype(np.int32)
    pred = golden[f"inv_pred_ts{ts}_tt{tt}"].astype(np.int32)
    want = golden[f"inv_recon_ts{ts}_tt{tt}"]
    got = txfm.inv_txfm2d_add(coeff, pred, ts, tt, bd=8)
    np.testing.assert_array_equal(got, want.astype(np.int32),
                                  err_msg=f"ts={ts} tt={tt}")


def test_wht_matches_reference(golden):
    inp = golden["wht_in"].astype(np.int64)
    got = txfm.fwht4x4(inp)
    np.testing.assert_array_equal(got, golden["wht_out"])


def test_iwht_matches_reference(golden):
    coeff = golden["iwht_in"].astype(np.int64)
    pred = golden["iwht_pred"].astype(np.int64)
    got = txfm.iwht4x4_add(coeff, pred, bd=8)
    np.testing.assert_array_equal(got, golden["iwht_recon"].astype(np.int64))


def test_fwd_inv_roundtrip_small_residual():
    """fwd -> inv on zero prediction approximately recovers the residual
    (scaling is exact powers of two at 4x4)."""
    rng = np.random.default_rng(0)
    res = rng.integers(-128, 128, size=(16, 4, 4)).astype(np.int64)
    co = txfm.fwd_txfm2d(res, TxSize.TX_4X4, TxType.DCT_DCT)
    pred = np.full((16, 4, 4), 128, dtype=np.int64)
    rec = txfm.inv_txfm2d_add(co.astype(np.int32), pred, TxSize.TX_4X4,
                              TxType.DCT_DCT)
    err = np.abs(rec - (pred + res))
    assert err.max() <= 2


def test_jax_matches_numpy():
    """The same code path jits under JAX and matches numpy bit-exactly."""
    import jax
    import jax.numpy as jnp
    coeff = np.arange(16 * 2, dtype=np.int32).reshape(2, 4, 4) * 37 % 901 - 450
    pred = np.full((2, 4, 4), 100, np.int32)
    want = txfm.inv_txfm2d_add(coeff, pred, TxSize.TX_4X4, TxType.ADST_ADST)

    f = jax.jit(lambda c, p: txfm.inv_txfm2d_add(
        c, p, TxSize.TX_4X4, TxType.ADST_ADST))
    got = np.asarray(f(jnp.asarray(coeff), jnp.asarray(pred)))
    np.testing.assert_array_equal(got, want)
