#!/usr/bin/env python3
"""Extract small normative tables from C initializers in the reference
(smooth-prediction weights, directional-prediction derivatives, filter-intra
taps, sub-pel interpolation kernels — all AV1 spec constants) into
aom_av1_psy_tpu/normative/data/misc_tables.npz.
"""
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"

# (file, variable name, output key, shape or None(flat), dtype)
TABLES = [
    ("aom_dsp/intrapred_common.h", "smooth_weights", "smooth_weights",
     None, np.int32),
    ("av1/common/reconintra.h", "dr_intra_derivative", "dr_intra_derivative",
     (90,), np.int32),
    ("av1/common/reconintra.c", "av1_filter_intra_taps", "filter_intra_taps",
     (5, 8, 8), np.int32),
    ("av1/common/filter.h", "av1_sub_pel_filters_8", "subpel_filters_8",
     (16, 8), np.int32),
    ("av1/common/filter.h", "av1_sub_pel_filters_8sharp",
     "subpel_filters_8sharp", (16, 8), np.int32),
    ("av1/common/filter.h", "av1_sub_pel_filters_8smooth",
     "subpel_filters_8smooth", (16, 8), np.int32),
    ("av1/common/filter.h", "av1_bilinear_filters", "bilinear_filters",
     (16, 8), np.int32),
    ("av1/common/filter.h", "av1_sub_pel_filters_4", "subpel_filters_4",
     (16, 8), np.int32),
    ("av1/common/filter.h", "av1_sub_pel_filters_4smooth",
     "subpel_filters_4smooth", (16, 8), np.int32),
    # resize / superres kernels (av1/common/resize.c)
    ("av1/common/resize.c", "av1_resize_filter_normative",
     "resize_filter_normative", (64, 8), np.int32),
    ("av1/common/resize.c", "filteredinterp_filters500",
     "resize_filters500", (64, 8), np.int32),
    ("av1/common/resize.c", "filteredinterp_filters625",
     "resize_filters625", (64, 8), np.int32),
    ("av1/common/resize.c", "filteredinterp_filters750",
     "resize_filters750", (64, 8), np.int32),
    ("av1/common/resize.c", "filteredinterp_filters875",
     "resize_filters875", (64, 8), np.int32),
    ("av1/common/resize.c", "av1_down2_symeven_half_filter",
     "down2_symeven_half", (4,), np.int32),
    ("av1/common/resize.c", "av1_down2_symodd_half_filter",
     "down2_symodd_half", (4,), np.int32),
    # warped motion subpel filters (av1/common/warped_motion.c)
    ("av1/common/warped_motion.c", "av1_warped_filter",
     "warped_filter", (193, 8), np.int32),
]


def extract_array(src: str, name: str) -> np.ndarray:
    m = re.search(rf"\b{re.escape(name)}\s*(\[[^=]*)?\)?\s*=\s*\{{", src)
    if not m:
        raise ValueError(f"{name} not found")
    i = src.index("{", m.start())
    depth = 0
    j = i
    while True:
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                break
        j += 1
    body = src[i : j + 1]
    body = re.sub(r"//.*", "", body)
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    body = re.sub(r"#.*", "", body)  # preprocessor lines inside initializers
    body = re.sub(r"-\s+", "-", body)  # "- 1" style negatives (warp table)
    vals = [int(t) for t in re.findall(r"-?\d+", body)]
    return np.array(vals)


def main():
    out = {}
    # auto-discover the has_top_right / has_bottom_left availability bitmask
    # tables (reconintra.c:64-310)
    with open(os.path.join(REF, "av1/common/reconintra.c")) as f:
        recon_src = f.read()
    for m in re.finditer(r"static uint8_t (has_(?:tr|bl)\w*)\[(\d+)\]",
                         recon_src):
        name, n = m.group(1), int(m.group(2))
        arr = extract_array(recon_src, name).astype(np.uint8)
        assert arr.size == n, name
        out[name] = arr
    for rel, cname, key, shape, dt in TABLES:
        with open(os.path.join(REF, rel)) as f:
            src = f.read()
        arr = extract_array(src, cname).astype(dt)
        if shape is not None:
            arr = arr.reshape(shape)
        out[key] = arr
        print(key, arr.shape)
    path = os.path.join(REPO, "aom_av1_psy_tpu", "normative", "data",
                        "misc_tables.npz")
    np.savez_compressed(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
