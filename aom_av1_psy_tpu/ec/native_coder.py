"""ctypes wrappers over the native range coder — drop-in replacements for
ec.coder.Encoder/Decoder. CDF arrays (numpy uint16 rows) are adapted in
place by the native code, so entropy state stays shared with Python."""
from __future__ import annotations

import ctypes

import numpy as np

from ..native import get_lib


def available() -> bool:
    return get_lib() is not None


def _ptr(arr: np.ndarray):
    return ctypes.c_void_p(arr.ctypes.data)


class NativeEncoder:
    def __init__(self) -> None:
        self._lib = get_lib()
        self._h = ctypes.c_void_p(self._lib.ec_enc_new())
        self._allow = True

    @property
    def allow_update(self) -> bool:
        return self._allow

    @allow_update.setter
    def allow_update(self, v: bool) -> None:
        self._allow = bool(v)
        self._lib.ec_enc_set_allow_update(self._h, int(v))

    def encode_symbol(self, s, icdf, nsyms, allow_update=None):
        if allow_update is None or allow_update == self._allow:
            self._lib.ec_enc_symbol(self._h, int(s), _ptr(icdf), int(nsyms))
        else:
            self._lib.ec_enc_cdf(self._h, int(s), _ptr(icdf), int(nsyms))
            if allow_update:
                from .coder import update_cdf
                update_cdf(icdf, int(s), int(nsyms))

    def encode_cdf(self, s, icdf, nsyms):
        icdf = np.ascontiguousarray(icdf, np.uint16)
        self._lib.ec_enc_cdf(self._h, int(s), _ptr(icdf), int(nsyms))

    def write_bit(self, bit):
        self._lib.ec_enc_bit(self._h, int(bit))

    def write_literal(self, data, bits):
        self._lib.ec_enc_literal(self._h, int(data), int(bits))

    def tell(self):
        return int(self._lib.ec_enc_tell(self._h))

    def done(self) -> bytes:
        n = self._lib.ec_enc_done(self._h)
        out = (ctypes.c_uint8 * n)()
        self._lib.ec_enc_copy(self._h, out)
        return bytes(out)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.ec_enc_free(self._h)
            self._h = None


class NativeDecoder:
    def __init__(self, data: bytes) -> None:
        self._lib = get_lib()
        self._data = bytes(data)  # keep alive
        self._h = ctypes.c_void_p(
            self._lib.ec_dec_new(self._data, len(self._data)))
        self._allow = True

    @property
    def allow_update(self) -> bool:
        return self._allow

    @allow_update.setter
    def allow_update(self, v: bool) -> None:
        self._allow = bool(v)
        self._lib.ec_dec_set_allow_update(self._h, int(v))

    def decode_symbol(self, icdf, nsyms, allow_update=None):
        if allow_update is None or allow_update == self._allow:
            return int(self._lib.ec_dec_symbol(self._h, _ptr(icdf),
                                               int(nsyms)))
        ret = int(self._lib.ec_dec_cdf(self._h, _ptr(icdf), int(nsyms)))
        if allow_update:
            from .coder import update_cdf
            update_cdf(icdf, ret, int(nsyms))
        return ret

    def decode_cdf(self, icdf, nsyms):
        icdf = np.ascontiguousarray(icdf, np.uint16)
        return int(self._lib.ec_dec_cdf(self._h, _ptr(icdf), int(nsyms)))

    def read_bit(self):
        return int(self._lib.ec_dec_bit(self._h))

    def read_literal(self, bits):
        return int(self._lib.ec_dec_literal(self._h, int(bits)))

    def tell(self):
        return int(self._lib.ec_dec_tell(self._h))

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.ec_dec_free(self._h)
            self._h = None


def _force_python() -> bool:
    import os
    return bool(os.environ.get("AOMTPU_NO_NATIVE"))


def make_encoder():
    """Best-available encoder (native if the toolchain built it)."""
    if available() and not _force_python():
        return NativeEncoder()
    from .coder import Encoder
    return Encoder()


def make_decoder(data: bytes):
    if available() and not _force_python():
        return NativeDecoder(data)
    from .coder import Decoder
    return Decoder(data)


def native_coeff_loop(enc: "NativeEncoder", coeff_flat: np.ndarray,
                      width: int, height: int, bhl: int, eob: int,
                      scan: np.ndarray, tx_class: int, nz_off,
                      base_eob_cdf: np.ndarray, base_cdf: np.ndarray,
                      br_cdf: np.ndarray, dc_sign_cdf: np.ndarray) -> int:
    """Drive ec_enc_coeffs: the base/br/sign/golomb loops of one txb in a
    single native call. CDF blocks are (n_ctx, nsyms+1) contiguous uint16
    arrays adapted in place. Returns cul_level."""
    lib = enc._lib
    coeff32 = np.ascontiguousarray(coeff_flat, np.int32)
    scan32 = np.ascontiguousarray(scan, np.int32)
    if nz_off is None:
        nz32 = np.zeros(1, np.int32)
    else:
        nz32 = np.ascontiguousarray(nz_off, np.int32)
    assert base_eob_cdf.flags["C_CONTIGUOUS"] and base_cdf.flags["C_CONTIGUOUS"]
    assert br_cdf.flags["C_CONTIGUOUS"] and dc_sign_cdf.flags["C_CONTIGUOUS"]
    return int(lib.ec_enc_coeffs(
        enc._h, _ptr(coeff32), int(width), int(height), int(bhl), int(eob),
        _ptr(scan32), int(tx_class), _ptr(nz32), _ptr(base_eob_cdf),
        int(base_eob_cdf.shape[-1]), _ptr(base_cdf),
        int(base_cdf.shape[-1]), _ptr(br_cdf), int(br_cdf.shape[-1]),
        _ptr(dc_sign_cdf)))


def native_coeff_read(dec: "NativeDecoder", width: int, height: int,
                      bhl: int, eob: int, scan: np.ndarray, tx_class: int,
                      nz_off, base_eob_cdf: np.ndarray, base_cdf: np.ndarray,
                      br_cdf: np.ndarray, dc_sign_cdf: np.ndarray):
    """Drive ec_dec_coeffs. Returns (coeff int32 (w*h), cul_level)."""
    lib = dec._lib
    coeff = np.zeros(width * height, np.int32)
    scan32 = np.ascontiguousarray(scan, np.int32)
    nz32 = (np.zeros(1, np.int32) if nz_off is None
            else np.ascontiguousarray(nz_off, np.int32))
    cul = int(lib.ec_dec_coeffs(
        dec._h, _ptr(coeff), int(width), int(height), int(bhl), int(eob),
        _ptr(scan32), int(tx_class), _ptr(nz32), _ptr(base_eob_cdf),
        int(base_eob_cdf.shape[-1]), _ptr(base_cdf),
        int(base_cdf.shape[-1]), _ptr(br_cdf), int(br_cdf.shape[-1]),
        _ptr(dc_sign_cdf)))
    return coeff, cul
