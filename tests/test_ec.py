"""Entropy coder tests — mirrors reference test/ec_test.cc: random CDF
sequences round-trip through encode/decode, with and without adaptation,
plus raw bits/literals, and byte-exact comparison against the reference
oracle when its dump exists (tests/golden/ec_oracle.bin)."""
import os

import numpy as np
import pytest

from aom_av1_psy_tpu.ec.coder import Encoder, Decoder, update_cdf, CDF_PROB_TOP


def random_icdf(rng, nsyms):
    """Build a valid icdf: strictly decreasing to 0, with counter slot."""
    while True:
        cuts = np.sort(rng.integers(1, CDF_PROB_TOP, size=nsyms - 1))
        if len(set(cuts.tolist())) == nsyms - 1:
            break
    icdf = np.zeros(nsyms + 1, dtype=np.uint16)
    icdf[: nsyms - 1] = (CDF_PROB_TOP - cuts).astype(np.uint16)
    icdf[nsyms - 1] = 0
    icdf[nsyms] = 0
    return icdf


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("adapt", [False, True])
def test_roundtrip_random_symbols(seed, adapt):
    rng = np.random.default_rng(seed)
    n = 4000
    syms, cdfs = [], []
    enc = Encoder()
    enc_cdf_state, dec_cdf_state = [], []
    for _ in range(n):
        nsyms = int(rng.integers(2, 17))
        icdf = random_icdf(rng, nsyms)
        s = int(rng.integers(0, nsyms))
        syms.append((s, nsyms))
        cdfs.append(icdf)
        e_icdf = icdf.copy()
        enc.encode_symbol(s, e_icdf, nsyms, allow_update=adapt)
        enc_cdf_state.append(e_icdf)
    data = enc.done()

    dec = Decoder(data)
    for i, ((s, nsyms), icdf) in enumerate(zip(syms, cdfs)):
        d_icdf = icdf.copy()
        got = dec.decode_symbol(d_icdf, nsyms, allow_update=adapt)
        assert got == s, f"symbol {i}: got {got} want {s}"
        np.testing.assert_array_equal(d_icdf, enc_cdf_state[i])


def test_roundtrip_adaptive_shared_cdf():
    """One CDF adapted across many symbols — enc/dec must stay in lockstep."""
    rng = np.random.default_rng(7)
    nsyms = 5
    base = random_icdf(rng, nsyms)
    syms = rng.integers(0, nsyms, size=3000).tolist()
    enc = Encoder()
    ecdf = base.copy()
    for s in syms:
        enc.encode_symbol(int(s), ecdf, nsyms)
    data = enc.done()
    dec = Decoder(data)
    dcdf = base.copy()
    for s in syms:
        assert dec.decode_symbol(dcdf, nsyms) == s
    np.testing.assert_array_equal(ecdf, dcdf)


def test_roundtrip_bits_and_literals():
    rng = np.random.default_rng(3)
    enc = Encoder()
    lits = [(int(rng.integers(0, 1 << b)), b) for b in rng.integers(1, 16, 200)]
    for v, b in lits:
        enc.write_literal(v, int(b))
    data = enc.done()
    dec = Decoder(data)
    for v, b in lits:
        assert dec.read_literal(int(b)) == v


def test_update_cdf_matches_spec_rate():
    cdf = np.array([CDF_PROB_TOP - 16384, 0, 0], dtype=np.uint16)  # 2 syms
    update_cdf(cdf, 0, 2)
    # icdf convention: coding symbol 0 (i >= val) decays entry 0 at rate 4
    assert cdf[0] == 16384 - (16384 >> 4)
    assert cdf[2] == 1
    update_cdf(cdf, 1, 2)  # i < val: entry 0 moves toward 32768
    assert cdf[0] == 15360 + ((CDF_PROB_TOP - 15360) >> 4)
    assert cdf[2] == 2


ORACLE = os.path.join(os.path.dirname(__file__), "golden", "ec_oracle.bin")


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle dump absent")
def test_byte_exact_vs_reference_oracle():
    """tools/ec_oracle.c encodes a fixed LCG-driven symbol stream with the
    reference entenc; we must produce the identical bytes."""
    with open(ORACLE, "rb") as f:
        golden = f.read()

    # identical LCG to the C oracle
    state = 0x12345678

    def lcg():
        nonlocal state
        state = (state * 1103515245 + 12345) & 0xFFFFFFFF
        return state >> 16

    enc = Encoder()
    cdfs = {}
    for i in range(20000):
        nsyms = 2 + lcg() % 15
        key = lcg() % 64
        if (key, nsyms) not in cdfs:
            # uniform-ish initial icdf like av1's default init
            icdf = np.zeros(nsyms + 1, dtype=np.uint16)
            for j in range(nsyms - 1):
                icdf[j] = CDF_PROB_TOP - (CDF_PROB_TOP * (j + 1) // nsyms)
            cdfs[(key, nsyms)] = icdf
        icdf = cdfs[(key, nsyms)]
        s = lcg() % nsyms
        enc.encode_symbol(s, icdf, nsyms)
        if i % 7 == 0:
            enc.write_literal(lcg() & 0xFF, 8)
    data = enc.done()
    assert data == golden
