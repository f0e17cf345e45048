"""Quick conformance check: decode IVF streams with our decoder and compare
per-frame pixel MD5s against the reference decode_to_md5 tool
(reference analogue: test/test_vector_test.cc MD5 flow)."""
import hashlib
import subprocess
import sys

import numpy as np

from aom_av1_psy_tpu.decoder.obu import decode_ivf

REF_MD5 = "/tmp/refbuild/decode_to_md5"


def ref_md5s(path):
    out = subprocess.run([REF_MD5, path, "/dev/stdout"],
                         capture_output=True, text=True, timeout=300)
    import re
    lines = [l.split()[0] for l in out.stdout.splitlines()
             if re.match(r"^[0-9a-f]{32}\s", l)]
    return lines


def our_md5s(path):
    frames = decode_ivf(path)
    res = []
    for f in frames:
        m = hashlib.md5()
        for p in (f.y, f.u, f.v):
            m.update(np.ascontiguousarray(p).tobytes())
        res.append(m.hexdigest())
    return res


if __name__ == "__main__":
    ok = True
    for path in sys.argv[1:]:
        try:
            ours = our_md5s(path)
            refs = ref_md5s(path)
            if ours == refs:
                print(f"PASS {path} ({len(ours)} frames)")
            else:
                bad = [i for i, (a, b) in enumerate(zip(ours, refs)) if a != b]
                print(f"FAIL {path}: {len(ours)} vs {len(refs)} frames, "
                      f"mismatch at {bad[:8]}")
                ok = False
        except Exception as e:
            print(f"ERROR {path}: {type(e).__name__}: {e}")
            ok = False
    sys.exit(0 if ok else 1)
