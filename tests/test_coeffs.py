"""Coefficient coder roundtrip tests (reference analogue: encodetxb_test.cc).
Conformance vs libaom is exercised end-to-end by the decoder tests decoding
aomenc bitstreams."""
import numpy as np
import pytest

from aom_av1_psy_tpu.ec.coder import Encoder, Decoder
from aom_av1_psy_tpu.ec.coeffs import (read_coeffs_txb, write_coeffs_txb,
                                       get_eob_pos_token)
from aom_av1_psy_tpu.ec.context import FrameContext
from aom_av1_psy_tpu.normative.enums import TX_WIDTH, TX_HEIGHT, TxSize
from aom_av1_psy_tpu.normative.txsize import adjusted_tx_size
from aom_av1_psy_tpu.normative import tables


def make_coeffs(rng, ts_adj, density, mag):
    w, h = int(TX_WIDTH[ts_adj]), int(TX_HEIGHT[ts_adj])
    n = w * h
    coeff = np.zeros(n, np.int32)
    nz = rng.random(n) < density
    coeff[nz] = rng.integers(-mag, mag + 1, nz.sum())
    # derive eob from scan order with DCT_DCT scan as canonical nonzero layout
    return coeff


def eob_from_scan(coeff, ts_adj, tx_type):
    scan = tables.scan_table(ts_adj, tx_type)
    nz = np.nonzero(coeff[scan] != 0)[0]
    return int(nz[-1]) + 1 if len(nz) else 0


@pytest.mark.parametrize("tx_size", [0, 1, 2, 3, 4, 5, 7, 10, 13, 16, 18])
@pytest.mark.parametrize("tx_type", [0, 1, 9, 11])
def test_roundtrip_txb(tx_size, tx_type):
    from aom_av1_psy_tpu.normative.enums import TxType1D, TX_TYPE_1D, TxType
    ts_adj = adjusted_tx_size(tx_size)
    w, h = int(TX_WIDTH[ts_adj]), int(TX_HEIGHT[ts_adj])
    v, hh = TX_TYPE_1D[TxType(tx_type)]

    def dim_ok(n, t):
        return n <= 16 or (n == 32 and t in (TxType1D.DCT, TxType1D.IDTX)) or \
            (n == 64 and t == TxType1D.DCT)

    if not (dim_ok(int(TX_HEIGHT[tx_size]), v) and dim_ok(int(TX_WIDTH[tx_size]), hh)):
        pytest.skip("invalid size/type pair")

    rng = np.random.default_rng(tx_size * 37 + tx_type)
    fc_e = FrameContext(base_qindex=100)
    fc_d = FrameContext(base_qindex=100)
    enc = Encoder()
    blocks = []
    for i in range(24):
        density = [0.0, 0.05, 0.3, 0.9][i % 4]
        mag = [1, 3, 20, 300][i % 4]
        coeff = make_coeffs(rng, ts_adj, density, mag)
        eob = eob_from_scan(coeff, ts_adj, tx_type)
        if eob == 0:
            coeff[:] = 0
        plane = i % 3
        skip_ctx = int(rng.integers(0, 7 if plane == 0 else 13))
        sign_ctx = int(rng.integers(0, 3))
        cul = write_coeffs_txb(enc, fc_e, tx_size, tx_type, plane, coeff, eob,
                               skip_ctx, sign_ctx)
        blocks.append((coeff, eob, plane, skip_ctx, sign_ctx, cul))
    data = enc.done()

    dec = Decoder(data)
    for i, (coeff, eob, plane, skip_ctx, sign_ctx, cul) in enumerate(blocks):
        got, got_eob, got_cul = read_coeffs_txb(
            dec, fc_d, tx_size, tx_type, plane, skip_ctx, sign_ctx)
        assert got_eob == eob, f"block {i}"
        assert got_cul == cul, f"block {i}"
        # compare only the coded (scan-covered) region
        np.testing.assert_array_equal(got, coeff, err_msg=f"block {i}")
    # CDF states must stay in lockstep
    for name in ("txb_skip_cdf", "coeff_base_cdf", "coeff_br_cdf",
                 "coeff_base_eob_cdf", "dc_sign_cdf", "eob_extra_cdf"):
        np.testing.assert_array_equal(getattr(fc_e, name), getattr(fc_d, name),
                                      err_msg=name)


def test_eob_pos_token():
    # groups: 0,1,2,3,5,9,17,33,65,...
    assert get_eob_pos_token(1) == (1, 0)
    assert get_eob_pos_token(2) == (2, 0)
    assert get_eob_pos_token(3) == (3, 0)
    assert get_eob_pos_token(4) == (3, 1)
    assert get_eob_pos_token(5) == (4, 0)
    assert get_eob_pos_token(8) == (4, 3)
    assert get_eob_pos_token(9) == (5, 0)
    assert get_eob_pos_token(1024) == (11, 511)
