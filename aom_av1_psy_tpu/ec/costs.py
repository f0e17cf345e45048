"""Rate estimation — CDF-based symbol costs and a cost-accumulating
encoder shim (av1/encoder/cost.{h,c}: av1_cost_symbol / av1_cost_literal;
mode_costs.c builds per-frame tables the same way).

Costs are in 1/512-bit units (AV1_PROB_COST_SHIFT = 9), matching
RDCOST's scaling (rd.h:31)."""
from __future__ import annotations

import numpy as np

PROB_COST_SHIFT = 9
CDF_TOP = 1 << 15


def symbol_cost(icdf, s: int) -> int:
    """Cost of coding symbol s against an inverse CDF, in 1/512 bits."""
    fl = int(icdf[s - 1]) if s > 0 else CDF_TOP
    fh = int(icdf[s])
    p = (fl - fh) / CDF_TOP
    if p <= 0:
        p = 1.0 / CDF_TOP
    return int(round(-np.log2(p) * (1 << PROB_COST_SHIFT)))


def cdf_cost_table(icdf, nsyms: int) -> np.ndarray:
    """Per-symbol costs for one CDF row."""
    return np.array([symbol_cost(icdf, s) for s in range(nsyms)], np.int64)


def literal_cost(bits: int) -> int:
    """av1_cost_literal: raw bits at p=1/2."""
    return bits << PROB_COST_SHIFT


class CostingEncoder:
    """Drop-in for ec.coder.Encoder that accumulates rate instead of
    writing; lets the exact write paths (e.g. write_coeffs_txb) double as
    rate estimators. CDF adaptation is disabled (cost estimation uses the
    frame-start CDFs, like the reference's per-frame cost tables)."""

    allow_update = False

    def __init__(self) -> None:
        self.cost = 0  # 1/512 bits

    def encode_cdf(self, s: int, icdf, nsyms: int) -> None:
        self.cost += symbol_cost(icdf, s)

    def encode_symbol(self, s: int, icdf, nsyms: int,
                      allow_update=None) -> None:
        self.cost += symbol_cost(icdf, s)

    def encode_bool_q15(self, val: int, f: int) -> None:
        p0 = f / (1 << 15)  # probability of the 0 branch
        p = (1.0 - p0) if val else p0
        p = min(max(p, 1.0 / CDF_TOP), 1.0 - 1.0 / CDF_TOP)
        self.cost += int(round(-np.log2(p) * (1 << PROB_COST_SHIFT)))

    def write_bit(self, bit: int) -> None:
        self.cost += 1 << PROB_COST_SHIFT

    def write_literal(self, data: int, bits: int) -> None:
        self.cost += bits << PROB_COST_SHIFT

    def bits(self) -> float:
        return self.cost / (1 << PROB_COST_SHIFT)


def rdcost(rdmult: int, rate: int, dist_sse: int) -> int:
    """RDCOST (rd.h:31): rate in 1/512 bits; the reference passes
    distortion pre-scaled by 16 (e.g. pixel_dist_visible's `<< 4`), so
    scale raw SSE here to keep the rd multiplier calibration."""
    return ((rate * rdmult + (1 << (PROB_COST_SHIFT - 1)))
            >> PROB_COST_SHIFT) + ((dist_sse << 4) << 7)


def compute_rd_mult(qindex: int, frame_type_kf: bool = True) -> int:
    """av1_compute_rd_mult_based_on_qindex (rd.c:384), 8-bit KF path."""
    from ..normative import tables
    q = tables.dc_quant(qindex)
    rdmult = q * q
    mult = (3.3 + 0.0015 * q) if frame_type_kf else (4.25 + 0.001 * q)
    return max(int(rdmult * mult), 1)
