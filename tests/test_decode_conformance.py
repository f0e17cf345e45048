"""Decoder conformance: committed aomenc-produced streams must decode to the
reference decoder's exact per-frame MD5s (reference analogue:
test/test_vector_test.cc with its 268-stream corpus)."""
import hashlib
import json
import os

import numpy as np
import pytest

from aom_av1_psy_tpu.decoder.obu import decode_ivf

HERE = os.path.join(os.path.dirname(__file__), "golden", "streams")

with open(os.path.join(HERE, "expected.json")) as f:
    EXPECTED = json.load(f)


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_stream_md5(name):
    info = EXPECTED[name]
    frames = decode_ivf(os.path.join(HERE, f"{name}.ivf"))
    assert len(frames) == len(info["md5"])
    for i, f in enumerate(frames):
        m = hashlib.md5()
        for p in (f.y, f.u, f.v):
            m.update(np.ascontiguousarray(p).tobytes())
        assert m.hexdigest() == info["md5"][i], f"{name} frame {i}"
