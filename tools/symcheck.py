"""Symbol-level conformance check: decode an IVF with the pure-Python range
decoder, comparing every decoded symbol (value, nsymbs, pre-update CDF)
against a CONFIG_BITSTREAM_DEBUG dump from tools/dump_symbols.c.
Usage: PYTHONPATH=. python tools/symcheck.py out.syms out.ivf"""
"""Compare our decoder's symbol reads against a CONFIG_BITSTREAM_DEBUG dump."""
import sys, struct
import numpy as np
import aom_av1_psy_tpu.ec.native_coder as NC
from aom_av1_psy_tpu.ec.coder import Decoder as PyDecoder, update_cdf

syms_path, ivf_path = sys.argv[1], sys.argv[2]
raw = open(syms_path, "rb").read()
frames_syms = []
pos = 0
while pos < len(raw):
    marker, count = struct.unpack_from("<ii", raw, pos); pos += 8
    assert marker == -1
    entries = []
    for _ in range(count):
        result, nsymbs = struct.unpack_from("<ii", raw, pos); pos += 8
        cdf = np.frombuffer(raw, np.uint16, 16, pos); pos += 32
        entries.append((result, nsymbs, cdf))
    frames_syms.append(entries)
print("frames in syms:", len(frames_syms), "counts:", [len(f) for f in frames_syms])

# a temporal unit may contain several coded frames (one syms marker per
# packet), so compare against the FLAT symbol sequence
flat = [e for f in frames_syms for e in f]
state = {"frame": 0, "idx": 0, "mismatch": None, "flat": 0}

class CheckingDecoder:
    def __init__(self, data):
        self.d = PyDecoder(data)
        self.allow_update_ = True
    @property
    def allow_update(self):
        return self.allow_update_
    @allow_update.setter
    def allow_update(self, v):
        self.allow_update_ = v
        self.d.allow_update = v
    def _check(self, val, nsyms, cdf_before):
        i = state["flat"]
        if state["mismatch"]: return
        if i >= len(flat):
            state["mismatch"] = (i, "overrun", val, nsyms); raise SystemExit(f"OVERRUN at {i}")
        r, n, cdf = flat[i]
        ok = (r == val and n == nsyms)
        if ok and cdf_before is not None and n > 1:
            ok = bool((cdf[:n-1] == np.asarray(cdf_before[:n-1], np.uint16)).all())
        if not ok:
            print(f"MISMATCH flat-sym#{i}: ref=(val {r}, n {n}, cdf {cdf[:max(n,2)]}) ours=(val {val}, n {nsyms}, cdf {None if cdf_before is None else np.asarray(cdf_before)[:max(nsyms,2)]})")
            import traceback; traceback.print_stack()
            raise SystemExit(1)
        state["idx"] += 1
        state["flat"] += 1
    def decode_symbol(self, icdf, nsyms, allow_update=None):
        before = np.array(icdf[:nsyms], np.uint16).copy()
        au = self.allow_update_ if allow_update is None else allow_update
        v = self.d.decode_cdf(icdf, nsyms)
        if au: update_cdf(icdf, v, nsyms)
        self._check(v, nsyms, before)
        return v
    def decode_cdf(self, icdf, nsyms):
        before = np.array(icdf[:nsyms], np.uint16).copy()
        v = self.d.decode_cdf(icdf, nsyms)
        self._check(v, nsyms, before)
        return v
    def read_bit(self):
        v = self.d.read_bit()
        self._check(v, 2, None)
        return v
    def read_literal(self, bits):
        v = 0
        for _ in range(bits):
            v = (v << 1) | self.read_bit()
        return v
    def tell(self):
        return self.d.tell()

orig_make = NC.make_decoder
def make_checking(data):
    state["idx"] = 0
    return CheckingDecoder(data)
NC.make_decoder = make_checking

# frame boundary advance: wrap FrameDecoder.decode_tile? each frame = new decoder...
# decode_ivf imports make_decoder inside decoder.frame as "from ..ec.native_coder import make_decoder"
# It's imported at call time (inside decode_tile), so the monkeypatch takes effect.
import aom_av1_psy_tpu.decoder.obu as O
import aom_av1_psy_tpu.decoder.frame as DF

orig_decode_tile = DF.FrameDecoder.decode_tile
def tile_wrap(self, *a, **k):
    r = orig_decode_tile(self, *a, **k)
    return r
DF.FrameDecoder.decode_tile = tile_wrap

frames = O.decode_ivf(ivf_path)
print(f"consumed {state['flat']}/{len(flat)} symbols")
print("ALL SYMBOLS MATCH" if state["mismatch"] is None and state["flat"] == len(flat) else "MISMATCHED/INCOMPLETE")
