"""OBU-level decode driver (av1/decoder/obu.c analogue).

Parses a temporal unit's OBUs, reads headers, dispatches tile groups to the
FrameDecoder, returns decoded frames.
"""
from __future__ import annotations

import numpy as np

from ..bitstream.bitio import BitReader, read_leb128
from ..bitstream.headers import (SequenceHeader, FrameHeader,
                                 read_frame_header)
from ..ec.context import FrameContext
from .frame import FrameDecoder

OBU_SEQUENCE_HEADER = 1
OBU_TEMPORAL_DELIMITER = 2
OBU_FRAME_HEADER = 3
OBU_TILE_GROUP = 4
OBU_METADATA = 5
OBU_FRAME = 6
OBU_PADDING = 15


class Av1Decoder:
    """Stateful packet decoder: feed temporal units, collect frames."""

    def __init__(self) -> None:
        self.seq: SequenceHeader | None = None
        self.fh: FrameHeader | None = None
        self.fdec: FrameDecoder | None = None
        self.tiles_parsed = 0

    def decode_packet(self, data: bytes) -> list:
        """Decode one temporal unit (e.g. an IVF packet). Returns frames."""
        frames = []
        pos = 0
        while pos < len(data):
            if pos + 1 > len(data):
                break
            hdr = data[pos]
            assert (hdr >> 7) == 0, "forbidden bit set"
            obu_type = (hdr >> 3) & 0xF
            ext_flag = (hdr >> 2) & 1
            has_size = (hdr >> 1) & 1
            pos += 1
            if ext_flag:
                pos += 1
            if has_size:
                size, pos = read_leb128(data, pos)
            else:
                size = len(data) - pos
            payload = data[pos : pos + size]
            pos += size
            self._handle_obu(obu_type, payload, frames)
        return frames

    # ------------------------------------------------------------------
    def _handle_obu(self, obu_type: int, payload: bytes, frames: list) -> None:
        if obu_type in (OBU_TEMPORAL_DELIMITER, OBU_PADDING, OBU_METADATA):
            return
        if obu_type == OBU_SEQUENCE_HEADER:
            self.seq = SequenceHeader.read(BitReader(payload))
            return
        if obu_type == OBU_FRAME_HEADER:
            r = BitReader(payload)
            self._start_frame(read_frame_header(r, self.seq))
            return
        if obu_type == OBU_FRAME:
            r = BitReader(payload)
            fh = read_frame_header(r, self.seq)
            self._start_frame(fh)
            r.byte_align()
            self._tile_group(payload[r.byte_offset() :], frames)
            return
        if obu_type == OBU_TILE_GROUP:
            self._tile_group_obu(payload, frames)
            return
        raise NotImplementedError(f"OBU type {obu_type}")

    def _start_frame(self, fh: FrameHeader) -> None:
        self.fh = fh
        self.fdec = FrameDecoder(self.seq, fh)
        self.tiles_parsed = 0
        # primary_ref_frame is always NONE for intra: defaults per frame
        self.frame_fc = FrameContext(fh.quant.base_q_idx)

    def _tile_group_obu(self, payload: bytes, frames: list) -> None:
        t = self.fh.tiles
        num_tiles = t.tile_cols * t.tile_rows
        r = BitReader(payload)
        tg_start, tg_end = 0, num_tiles - 1
        if num_tiles > 1:
            if r.f(1):  # tile_start_and_end_present
                bits = t.tile_cols_log2 + t.tile_rows_log2
                tg_start = r.f(bits)
                tg_end = r.f(bits)
        r.byte_align()
        self._tiles(payload[r.byte_offset() :], tg_start, tg_end, frames)

    def _tile_group(self, payload: bytes, frames: list) -> None:
        # OBU_FRAME: tile group with no start/end syntax for single group
        t = self.fh.tiles
        num_tiles = t.tile_cols * t.tile_rows
        r = BitReader(payload)
        if num_tiles > 1:
            r.f(1)  # tile_start_and_end_present must be 0 in OBU_FRAME
        r.byte_align()
        self._tiles(payload[r.byte_offset() :], 0, num_tiles - 1, frames)

    def _tiles(self, data: bytes, tg_start: int, tg_end: int,
               frames: list) -> None:
        t = self.fh.tiles
        pos = 0
        for tnum in range(tg_start, tg_end + 1):
            row, col = divmod(tnum, t.tile_cols)
            if tnum == tg_end:
                tile_data = data[pos:]
            else:
                sz = int.from_bytes(data[pos : pos + t.tile_size_bytes],
                                    "little") + 1
                pos += t.tile_size_bytes
                tile_data = data[pos : pos + sz]
                pos += sz
            fc = self.frame_fc.copy()
            self.fdec.decode_tile(tile_data, row, col, fc)
            self.tiles_parsed += 1
        if self.tiles_parsed == t.tile_cols * t.tile_rows:
            self.fdec.apply_loop_filter()
            frames.append(self._finish_frame(self.fdec.output_frame()))

    def _finish_frame(self, frame):
        """Post-decode grain application (av1_dx_iface.c:465 grain apply;
        output only — reference buffers stay grain-free)."""
        fg = getattr(self.fh, "film_grain", None)
        if fg is None or not fg.apply_grain:
            return frame
        from ..ops.grain import apply_film_grain
        from ..utils.frame import Frame
        y, u, v = frame.y, frame.u, frame.v
        h, w = y.shape
        eh, ew = (h + 1) & ~1, (w + 1) & ~1
        if (eh, ew) != (h, w):  # extend_even (grain_synthesis.c:884)
            y = np.pad(y, ((0, eh - h), (0, ew - w)), mode="edge")
        mc_identity = (self.seq.color_description_present
                       and self.seq.matrix_coefficients == 0)
        oy, ou, ov = apply_film_grain(
            fg, y, u, v, ss_x=self.seq.subsampling_x,
            ss_y=self.seq.subsampling_y, mc_identity=mc_identity)
        return Frame(oy[:h, :w], ou, ov)


def decode_ivf(path: str) -> list:
    from ..bitstream.containers import read_ivf
    dec = Av1Decoder()
    frames = []
    for pkt in read_ivf(path):
        frames.extend(dec.decode_packet(pkt))
    return frames
