#!/usr/bin/env python3
"""Benchmark: 1080p conforming all-intra TPU encode, end-to-end.

Times ``TpuFrameEncoder`` (encoder/tpu_frame.py) — the product path that
``av1_get_compressed_data`` (av1/encoder/encoder.c:4597) corresponds to:
batched wavefront mode search + bit-exact transform/quantize/recon on the
TPU, then the one-call native syntax pack. The output packets are fully
conforming AV1 KEY frames (bit-exact through the reference aomdec,
tests/test_tpu_encoder.py).

Reported metric: median steady-state frames/s at 1080p on one chip.
``extra`` carries the first-frame latency (jit compile + axon executable
load — measured 10–80 s, occasionally worse: the axon compile/load service
has large nondeterministic variance; see PERF_NOTES.md), the min/max
steady-state spread, and the plan/pack split.

Persistent jax compilation cache is deliberately NOT used: on the axon
platform a cache *hit* costs ~75 s in executable deserialization/load —
7x slower than a fresh ~10 s compile (PERF_NOTES.md).

Baseline: aomenc --cpu-used=6 --threads=1 all-intra 1080p at 0.141 fps on
the dev host (reference built with AOM_TARGET_CPU=generic — no SIMD — so
this flatters us vs a production aomenc build; kept for round-over-round
continuity and recorded as such).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
import json
import statistics
import time

import numpy as np

AOMENC_CPU6_1080P_FPS = 0.141  # generic-C build (no SIMD), 1 thread


def make_frame(w: int, h: int, seed: int = 0):
    """Deterministic, moderately textured 1080p frame: smooth gradients +
    sinusoidal detail + mild noise (random noise alone is a pathological
    coding target; this keeps pack time representative)."""
    from aom_av1_psy_tpu.utils.frame import Frame

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (96 + 60 * np.sin(xx / 97.0) * np.cos(yy / 53.0)
            + 40 * (xx / w) + 20 * (yy / h))
    y = np.clip(base + rng.normal(0, 4.0, (h, w)), 0, 255).astype(np.uint8)
    u = np.clip(128 + 30 * np.sin(xx[::2, ::2] / 131.0)
                + rng.normal(0, 2.0, (h // 2, w // 2)), 0, 255)
    v = np.clip(128 - 25 * np.cos(yy[::2, ::2] / 89.0)
                + rng.normal(0, 2.0, (h // 2, w // 2)), 0, 255)
    return Frame(y, u.astype(np.uint8), v.astype(np.uint8))


def main():
    from aom_av1_psy_tpu.encoder.frame import EncoderConfig
    from aom_av1_psy_tpu.encoder.tpu_frame import TpuFrameEncoder

    frame = make_frame(1920, 1080)
    cfg = EncoderConfig(base_q_idx=100)

    t0 = time.perf_counter()
    enc = TpuFrameEncoder(frame, cfg)
    pkt = enc.encode()
    first_s = time.perf_counter() - t0
    nbytes = len(pkt)

    iters = 8
    times, plans, packs = [], [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        enc = TpuFrameEncoder(frame, cfg)
        enc.encode()
        times.append(time.perf_counter() - t0)
        plans.append(enc.timings["plan_s"])
        packs.append(enc.timings["pack_s"])

    med = statistics.median(times)
    fps = 1.0 / med
    print(json.dumps({
        "metric": "1080p_allintra_conforming_encode_fps",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / AOMENC_CPU6_1080P_FPS, 2),
        "extra": {
            "first_frame_s": round(first_s, 2),
            "steady_min_s": round(min(times), 3),
            "steady_max_s": round(max(times), 3),
            "plan_median_s": round(statistics.median(plans), 3),
            "pack_median_s": round(statistics.median(packs), 3),
            "frame_bytes": nbytes,
            "iters": iters,
            "baseline_note": "aomenc cpu-used=6 generic-C (no SIMD) build",
        },
    }))


if __name__ == "__main__":
    main()
