"""Inspection API (decoder/inspect.py — av1/decoder/inspection.h role)."""
import numpy as np

from aom_av1_psy_tpu.decoder.obu import Av1Decoder
from aom_av1_psy_tpu.bitstream.containers import read_ivf
import os

HERE = os.path.join(os.path.dirname(__file__), "golden", "streams")


def test_inspect_inter_stream():
    dec = Av1Decoder()
    pkts = list(read_ivf(os.path.join(HERE, "resize_d12.ivf")))
    dec.decode_packet(pkts[0])
    insp0 = dec.inspect()
    assert insp0.frame_type == 0 and not insp0.is_inter.any()
    assert insp0.mode.shape == (insp0.mi_rows, insp0.mi_cols)
    dec.decode_packet(pkts[1])
    insp1 = dec.inspect()
    assert insp1.frame_type == 1
    assert insp1.is_inter.any()
    # inter blocks carry their ref + mv; intra blocks carry modes
    inter_mask = insp1.is_inter.astype(bool)
    assert (insp1.ref_frame0[inter_mask] >= 1).all()
    assert np.abs(insp1.mv[inter_mask]).max() > 0
    assert insp1.base_q_idx > 0
    assert insp1.width == 107 and insp1.height == 80
