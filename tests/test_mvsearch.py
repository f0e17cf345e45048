"""Motion search tests (reference analogue: test/av1_fwd_txfm-style
oracle checks; mcomp.c search correctness is validated by construction:
a dense scan must find the true SAD minimum)."""
import numpy as np
import pytest

from aom_av1_psy_tpu.ops import mvsearch as M
from aom_av1_psy_tpu.ops import convolve as C


def _make_case(rng, B=4, h=16, w=16, radius=8, shift=(3, -5)):
    ref = rng.integers(0, 256, (B, h + 2 * radius, w + 2 * radius), np.uint8)
    src = np.stack([
        ref[b, radius + shift[0] : radius + shift[0] + h,
            radius + shift[1] : radius + shift[1] + w]
        for b in range(B)
    ])
    return src.astype(np.int32), ref.astype(np.int32)


def test_full_pel_exact_match():
    rng = np.random.default_rng(11)
    src, ref = _make_case(rng)
    mvs, sads = M.full_pel_grid_search(src, ref, 8)
    assert (sads == 0).all()
    assert (mvs == np.array([3, -5])).all()


def test_full_pel_is_true_minimum():
    rng = np.random.default_rng(13)
    B, h, w, radius = 2, 8, 8, 4
    src = rng.integers(0, 256, (B, h, w), np.int32)
    ref = rng.integers(0, 256, (B, h + 2 * radius, w + 2 * radius), np.int32)
    mvs, sads = M.full_pel_grid_search(src, ref, radius)
    for b in range(B):
        brute = min(
            np.abs(ref[b, r + radius : r + radius + h,
                       c + radius : c + radius + w] - src[b]).sum()
            for r in range(-radius, radius + 1)
            for c in range(-radius, radius + 1))
        assert sads[b] == brute


def test_hierarchical_finds_planted_match():
    # hierarchical search relies on spatially smooth content (like real
    # video) so the coarse grid ranks neighbourhoods correctly
    rng = np.random.default_rng(17)
    B, h, w, radius = 4, 16, 16, 16
    coarse = rng.integers(0, 256, (B, 8, 8))
    ref = np.kron(coarse, np.ones((1, 8, 8))).astype(np.int32)
    ref = ref[:, : h + 2 * radius, : w + 2 * radius]
    shift = (-11, 7)
    src = ref[:, radius + shift[0] : radius + shift[0] + h,
              radius + shift[1] : radius + shift[1] + w]
    mvs, sads = M.full_pel_hierarchical(src, ref, radius, step=4)
    assert (sads == 0).all()
    # smooth content can have SAD-0 ties; accept any zero-SAD MV but the
    # planted one must be reachable — check reconstruction equality
    for b in range(4):
        r, c = mvs[b]
        got = ref[b, radius + r : radius + r + h, radius + c : radius + c + w]
        np.testing.assert_array_equal(got, src[b])


def test_full_pel_jax_parity():
    import jax.numpy as jnp
    rng = np.random.default_rng(19)
    src, ref = _make_case(rng, B=2, radius=6, shift=(2, -3))
    mv_np, sad_np = M.full_pel_grid_search(src, ref, 6)
    mv_j, sad_j = M.full_pel_grid_search(jnp.asarray(src), jnp.asarray(ref), 6)
    np.testing.assert_array_equal(mv_np, np.asarray(mv_j))
    np.testing.assert_array_equal(sad_np, np.asarray(sad_j))


def test_subpel_refine_recovers_half_pel():
    # Build a reference, derive src by shifting it half a pel with the
    # normative convolve; refine should land on that subpel phase.
    rng = np.random.default_rng(23)
    h = w = 16
    big = rng.integers(0, 256, (h + 32, w + 32), np.int32)
    # src = ref at subpel (sx=8 → half-pel horizontal), fullpel (16,16)
    reg = big[16 - 3 : 16 + h + 4, 16 - 3 : 16 + w + 4]
    src = np.asarray(C.predict_subpel(reg, w, h, 8, 0))
    ref_pad = big[16 - 4 : 16 + h + 5, 16 - 4 : 16 + w + 5]
    (mv_r, mv_c), sad = M.subpel_refine(src, ref_pad, (0, 0))
    assert sad == 0
    assert (mv_r, mv_c) == (0, 4)  # +1/2 pel in 1/8-pel units


def test_batched_subpel_refine():
    rng = np.random.default_rng(29)
    h = w = 8
    B = 3
    big = rng.integers(0, 256, (B, h + 32, w + 32), np.int32)
    phases = [(0, 0), (4, 0), (0, 12)]  # quarter-pel lattice (1/16 units)
    srcs = []
    for b, (sy, sx) in enumerate(phases):
        reg = big[b, 16 - 3 : 16 + h + 4, 16 - 3 : 16 + w + 4]
        srcs.append(np.asarray(C.predict_subpel(reg, w, h, sx, sy)))
    src = np.stack(srcs)
    ref_win = big[:, 16 - 4 : 16 + h + 5, 16 - 4 : 16 + w + 5]
    mv8, sads = M.batched_subpel_refine(src, ref_win,
                                        np.zeros((B, 2), np.int32))
    assert (np.asarray(sads) == 0).all()
    got = np.asarray(mv8)
    want = np.array([[sy // 2, sx // 2] for (sy, sx) in phases])
    np.testing.assert_array_equal(got, want)
