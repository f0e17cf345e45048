#!/usr/bin/env python3
"""Build tools/dump_tables.c against the reference oracle build and convert
its record stream into aom_av1_psy_tpu/normative/data/tables.npz.

Usage: python tools/gen_tables.py [--ref /root/reference --build /tmp/refbuild]

The emitted npz contains only normative AV1 *data* (default CDFs, quantizer
lookups, scan orders, cosine tables) — spec constants, committed so the
framework is standalone.
"""
import argparse
import os
import struct
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_records(path):
    out = {}
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        (nl,) = struct.unpack_from("<I", data, pos); pos += 4
        name = data[pos : pos + nl].decode(); pos += nl
        es, nd = struct.unpack_from("<II", data, pos); pos += 8
        dims = struct.unpack_from(f"<{nd}I", data, pos); pos += 4 * nd
        total = int(np.prod(dims)) if nd else 1
        dt = {2: np.uint16, 4: np.int32}[es]
        arr = np.frombuffer(data, dtype=dt, count=total, offset=pos).reshape(dims)
        pos += total * es
        out[name] = arr.copy()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--build", default="/tmp/refbuild")
    args = ap.parse_args()

    exe = "/tmp/dump_tables"
    bin_path = "/tmp/tables.bin"
    subprocess.check_call(
        ["gcc", os.path.join(REPO, "tools/dump_tables.c"),
         "-I", args.ref, "-I", args.build,
         os.path.join(args.build, "libaom.a"), "-lm", "-O1", "-o", exe])
    subprocess.check_call([exe, bin_path])
    tables = parse_records(bin_path)

    # Convert libaom's "inverse CDF" convention (AOM_ICDF = 32768 - cdf, with a
    # trailing adaptation-counter slot) as-is; the ec layer knows the layout.
    outdir = os.path.join(REPO, "aom_av1_psy_tpu", "normative", "data")
    os.makedirs(outdir, exist_ok=True)
    np.savez_compressed(os.path.join(outdir, "tables.npz"), **tables)
    print(f"wrote {len(tables)} tables -> {outdir}/tables.npz")


if __name__ == "__main__":
    sys.exit(main())
