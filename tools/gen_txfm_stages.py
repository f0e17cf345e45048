#!/usr/bin/env python3
"""Extract the normative AV1 1-D transform butterfly structure into data.

The AV1 spec (§7.13.3) defines the inverse transforms as fixed sequences of
butterfly stages; libaom's ``av1_inv_txfm1d.c`` / ``av1_fwd_txfm1d.c``
transcribe exactly that structure. Rather than hand-porting ~3.4k lines of
butterflies, this script parses the reference C into per-stage *op tables*
(pure connectivity/coefficient data, committed as
``normative/data/txfm_stages.json``) which a batched JAX executor
(``ops/txfm.py``) interprets.

Op encoding per stage: list of [kind, a, b, wa, wb, clamp]
  kind 0: linear   out[i] = wa*x[a] + wb*x[b]      (wa/wb in {-1,0,1})
  kind 1: btf      out[i] = round_shift(cospi[wa']*x[a] + cospi[wb']*x[b], cos_bit)
                   wa/wb encode sign*(index+1) into the cospi table
  clamp: 1 if the reference wraps the op in clamp_value(stage_range)
Ops are listed in output-index order (one op per output element).
"""
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"

FUNCS = {
    "av1/encoder/av1_fwd_txfm1d.c": [
        ("av1_fdct4", 4), ("av1_fdct8", 8), ("av1_fdct16", 16),
        ("av1_fdct32", 32), ("av1_fdct64", 64),
        ("av1_fadst8", 8), ("av1_fadst16", 16),
    ],
    "av1/common/av1_inv_txfm1d.c": [
        ("av1_idct4", 4), ("av1_idct8", 8), ("av1_idct16", 16),
        ("av1_idct32", 32), ("av1_idct64", 64),
        ("av1_iadst8", 8), ("av1_iadst16", 16),
    ],
}

ASSIGN = re.compile(r"bf1\[(\d+)\]\s*=\s*(.+?);", re.S)
BTF = re.compile(
    r"half_btf\(\s*(-?)cospi\[(\d+)\],\s*bf0\[(\d+)\],\s*(-?)cospi\[(\d+)\],"
    r"\s*bf0\[(\d+)\],\s*cos_bit\)")
LIN2 = re.compile(r"(-?)(?:bf0|input)\[(\d+)\]\s*([+-])\s*(?:bf0|input)\[(\d+)\]")
LIN1 = re.compile(r"^(-?)(?:bf0|input)\[(\d+)\]$")


def parse_func(src: str, name: str, size: int):
    m = re.search(rf"void {re.escape(name)}\(.*?\n}}", src, re.S)
    if not m:
        raise ValueError(f"{name} not found")
    body = m.group(0)
    # split into stages on "// stage N" markers; stage 0 is a no-op check
    chunks = re.split(r"//\s*stage\s*\d+", body)[1:]
    stages = []
    for chunk in chunks:
        ops = {}
        for am in ASSIGN.finditer(chunk):
            dst = int(am.group(1))
            expr = " ".join(am.group(2).split())
            clamp = 0
            cm = re.match(r"clamp_value\((.+),\s*stage_range\[stage\]\)$", expr)
            if cm:
                clamp = 1
                expr = cm.group(1).strip()
            bm = BTF.search(expr)
            if bm:
                sa, ia, a, sb, ib, b = bm.groups()
                wa = (int(ia) + 1) * (-1 if sa == "-" else 1)
                wb = (int(ib) + 1) * (-1 if sb == "-" else 1)
                ops[dst] = [1, int(a), int(b), wa, wb, clamp]
                continue
            lm = LIN2.match(expr)
            if lm:
                s1, a, opsign, b = lm.groups()
                wa = -1 if s1 == "-" else 1
                wb = -1 if opsign == "-" else 1
                ops[dst] = [0, int(a), int(b), wa, wb, clamp]
                continue
            lm = LIN1.match(expr)
            if lm:
                s1, a = lm.groups()
                ops[dst] = [0, int(a), int(a), -1 if s1 == "-" else 1, 0, clamp]
                continue
            raise ValueError(f"{name}: unparsed expr: {expr!r}")
        if not ops:
            continue  # stage-0 chunk holds only the range check
        if len(ops) != size:
            raise ValueError(f"{name}: stage has {len(ops)} ops, want {size}")
        stages.append([ops[i] for i in range(size)])
    return stages


def main():
    out = {}
    for rel, funcs in FUNCS.items():
        with open(os.path.join(REF, rel)) as f:
            src = f.read()
        for name, size in funcs:
            out[name] = parse_func(src, name, size)
            print(f"{name}: {len(out[name])} stages")
    path = os.path.join(REPO, "aom_av1_psy_tpu", "normative", "data",
                        "txfm_stages.json")
    with open(path, "w") as f:
        json.dump(out, f, separators=(",", ":"))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
