"""K-means / palette kernel golden tests vs av1_calc_indices_dim1/2_c
(reference analogue: test/av1_k_means_test.cc)."""
import os

import numpy as np
import pytest

from aom_av1_psy_tpu.ops import palette as P

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "golden_kmeans.npz")


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


def test_calc_indices(golden):
    g = golden
    for c in range(6):
        n, k = (int(v) for v in g[f"km{c}_meta"])
        data = g[f"km{c}_data"][: n * 2]
        cents = g[f"km{c}_cents"][: k * 2]
        i1, d1 = P.calc_indices(data[:n], cents[:k], 1)
        i2, d2 = P.calc_indices(data, cents, 2)
        np.testing.assert_array_equal(i1, g[f"km{c}_idx1"][:n])
        np.testing.assert_array_equal(i2, g[f"km{c}_idx2"][:n])
        assert d1 == int(g[f"km{c}_dist"][0])
        assert d2 == int(g[f"km{c}_dist"][1])


def test_k_means_converges():
    rng = np.random.default_rng(2)
    data = np.concatenate([rng.normal(40, 4, 100), rng.normal(200, 4, 100)])
    data = np.clip(data, 0, 255).astype(np.int64)
    cents, idx, total = P.k_means(data, 2, 1)
    assert abs(int(cents.min()) - 40) < 8
    assert abs(int(cents.max()) - 200) < 8
