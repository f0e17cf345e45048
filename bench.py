#!/usr/bin/env python3
"""Benchmark: 1080p all-intra encode-analysis throughput on one chip.

Times the jitted TPU pipeline (intra mode search over 7 predictors + exact
integer 16x16 DCT + fp quantization + eob stats) over a full 1080p frame
(luma + both chroma planes), steady-state.

Baseline: aomenc --cpu-used=6 --threads=1 all-intra 1080p measured at
0.141 fps on the dev host (reference built with AOM_TARGET_CPU=generic —
no SIMD — so this flatters us vs a production aomenc; recorded for
continuity until the full conforming encoder is benched end-to-end).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

AOMENC_CPU6_1080P_FPS = 0.141  # generic-C build, 1 thread, dev host


def main():
    import jax
    import jax.numpy as jnp
    from aom_av1_psy_tpu.ops.analyze import analyze_plane
    from aom_av1_psy_tpu.normative import tables

    dc_q, ac_q = tables.dc_quant(100), tables.ac_quant(100)
    rng = np.random.default_rng(0)
    luma = jnp.asarray(rng.integers(0, 256, (1088, 1920), np.uint8))
    cb = jnp.asarray(rng.integers(0, 256, (544, 960), np.uint8))
    cr = jnp.asarray(rng.integers(0, 256, (544, 960), np.uint8))

    def frame_step(y, u, v):
        oy = analyze_plane(y, dc_q, ac_q, n=16)
        ou = analyze_plane(u, dc_q, ac_q, n=16)
        ov = analyze_plane(v, dc_q, ac_q, n=16)
        return oy["levels"], ou["levels"], ov["levels"], oy["mode"], oy["eob"]

    step = jax.jit(frame_step)
    out = step(luma, cb, cr)
    jax.block_until_ready(out)  # compile + warm
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(luma, cb, cr)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt
    print(json.dumps({
        "metric": "1080p_allintra_analysis_fps",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / AOMENC_CPU6_1080P_FPS, 2),
    }))


if __name__ == "__main__":
    main()
