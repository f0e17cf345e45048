"""Metric kernel tests (reference analogue: sad_test.cc, variance_test.cc,
hadamard_test.cc; ssim validated against aom_ssim2 to 1e-10)."""
import numpy as np

from aom_av1_psy_tpu.ops import metrics as M


def test_sad_and_x4():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (5, 16, 16), np.uint8)
    b = rng.integers(0, 256, (5, 16, 16), np.uint8)
    want = np.abs(a.astype(int) - b.astype(int)).sum((1, 2))
    np.testing.assert_array_equal(M.sad(a, b), want)
    refs = rng.integers(0, 256, (5, 4, 16, 16), np.uint8)
    got = M.sad_x4(a, refs)
    for i in range(4):
        np.testing.assert_array_equal(got[:, i], M.sad(a, refs[:, i]))


def test_variance():
    rng = np.random.default_rng(1)
    s = rng.integers(0, 256, (3, 8, 8), np.uint8)
    r = rng.integers(0, 256, (3, 8, 8), np.uint8)
    var, ss, se = M.variance(s, r)
    d = s.astype(int) - r.astype(int)
    np.testing.assert_array_equal(ss, (d * d).sum((1, 2)))
    np.testing.assert_array_equal(se, d.sum((1, 2)))


def test_satd_reference_value():
    # golden value from aom_hadamard_8x8_c + aom_satd_c on an LCG block
    st = [7]

    def lcg():
        st[0] = (st[0] * 1103515245 + 12345) & 0xFFFFFFFF
        return st[0] >> 16

    src = np.array([(lcg() % 511) - 255 for _ in range(64)],
                   np.int32).reshape(8, 8)
    assert int(M.satd(src[None])[0]) == 52796


def test_ssim_reference_value():
    # golden from aom_ssim2 on an LCG-driven 160x128 pair
    st = [99]

    def lcg():
        st[0] = (st[0] * 1103515245 + 12345) & 0xFFFFFFFF
        return st[0] >> 16

    a = np.zeros(128 * 160, np.uint8)
    b = np.zeros(128 * 160, np.uint8)
    for i in range(128 * 160):
        a[i] = lcg() & 255
        b[i] = (int(a[i]) + (lcg() % 21) - 10) & 255
    v = M.ssim(a.reshape(128, 160), b.reshape(128, 160))
    assert abs(v - 0.8864113436) < 1e-9


def test_psnr():
    a = np.full((32, 32), 100, np.uint8)
    assert M.psnr(a, a) == 100.0
    b = a.copy()
    b[0, 0] += 8
    assert 40 < M.psnr(a, b) < 100


def test_jax_parity():
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (4, 16, 16), np.uint8)
    b = rng.integers(0, 256, (4, 16, 16), np.uint8)
    np.testing.assert_array_equal(np.asarray(M.sad(jnp.asarray(a),
                                                   jnp.asarray(b))),
                                  M.sad(a, b))
