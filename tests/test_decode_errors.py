"""Decoder error contract: corrupt or truncated input must raise only the
typed Av1Error surface, never arbitrary internal exceptions, and must not
poison a decoder instance for subsequent valid input (reference analogue:
test/invalid_file_test.cc over the AOM_CODEC_CORRUPT_FRAME contract)."""
import numpy as np
import pytest

from aom_av1_psy_tpu.utils.frame import Frame
from aom_av1_psy_tpu.encoder.frame import EncoderConfig
from aom_av1_psy_tpu.encoder.tpu_frame import TpuFrameEncoder
from aom_av1_psy_tpu.decoder.obu import Av1Decoder, decode_ivf
from aom_av1_psy_tpu.errors import (Av1Error, Av1CorruptFrameError,
                                    Av1InvalidParamError)


@pytest.fixture(scope="module")
def packet():
    rng = np.random.default_rng(3)
    w, h = 96, 64
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    return TpuFrameEncoder(Frame(y, u, v),
                           EncoderConfig(base_q_idx=120)).encode()


def _try(data):
    """The invalid-input contract: decodes cleanly OR raises Av1Error."""
    try:
        Av1Decoder().decode_packet(data)
    except Av1Error:
        pass


def test_garbage_input():
    rng = np.random.default_rng(0)
    for n in (1, 7, 64, 4096):
        _try(rng.integers(0, 256, n, dtype=np.uint8).tobytes())


def test_truncations(packet):
    # every prefix of a valid temporal unit must decode or raise Av1Error
    for cut in list(range(1, min(len(packet), 64))) + \
            [len(packet) // 2, len(packet) - 1]:
        _try(packet[:cut])


def test_byte_flips(packet):
    rng = np.random.default_rng(1)
    for _ in range(32):
        b = bytearray(packet)
        i = int(rng.integers(0, len(b)))
        b[i] ^= int(rng.integers(1, 256))
        _try(bytes(b))


def test_obu_size_overrun():
    # hand-built OBU header claiming a size far past the packet end
    bad = bytes([0x32, 0xFF, 0x7F]) + b"\x00" * 4
    with pytest.raises(Av1CorruptFrameError):
        Av1Decoder().decode_packet(bad)


def test_invalid_param():
    with pytest.raises(Av1InvalidParamError):
        Av1Decoder().decode_packet("not bytes")


def test_decoder_survives_corrupt_then_valid(packet):
    dec = Av1Decoder()
    try:
        dec.decode_packet(packet[: len(packet) // 3])
    except Av1Error:
        pass
    frames = dec.decode_packet(packet)  # KEY frame resets state
    assert len(frames) == 1


def test_bad_ivf(tmp_path):
    p = tmp_path / "bad.ivf"
    p.write_bytes(b"DKIF" + b"\x01" * 9)
    with pytest.raises(Av1Error):
        decode_ivf(str(p))


def test_encoder_config_validation():
    """AOM_CODEC_INVALID_PARAM on config (av1_validate_config analogue)."""
    with pytest.raises(Av1InvalidParamError):
        EncoderConfig(base_q_idx=300)
    with pytest.raises(Av1InvalidParamError):
        EncoderConfig(base_q_idx=-1)
    with pytest.raises(Av1InvalidParamError):
        EncoderConfig(block_size=1)
    with pytest.raises(Av1InvalidParamError):
        EncoderConfig(tile_cols_log2=9)
    EncoderConfig(base_q_idx=255)  # boundary ok
