"""C++ native host library vs numpy fallbacks (skipped if no toolchain)."""

import numpy as np
import pytest

from spectral_tpu.native import NATIVE_AVAILABLE

pytestmark = pytest.mark.skipif(not NATIVE_AVAILABLE, reason="native lib not built")


def test_sanitize_matches_numpy():
    from spectral_tpu.native import corpus as nc
    from spectral_tpu.train.data import sanitize_ascii as np_sanitize

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, 10000).astype(np.uint8)
    np.testing.assert_array_equal(nc.sanitize_ascii(arr), np_sanitize(arr))


def test_gather_matches_numpy():
    from spectral_tpu.native import corpus as nc

    rng = np.random.default_rng(1)
    corpus = rng.integers(0, 256, 5000).astype(np.uint8)
    starts = rng.integers(0, 4000, 16).astype(np.int64)
    got = nc.gather_windows(corpus, starts, 64)
    idx = starts[:, None] + np.arange(64)
    np.testing.assert_array_equal(got, corpus[idx].astype(np.int32))


def test_lm_batch():
    from spectral_tpu.native import corpus as nc

    rng = np.random.default_rng(2)
    corpus = rng.integers(0, 256, 5000).astype(np.uint8)
    starts = rng.integers(0, 4000, 8).astype(np.int64)
    x, y = nc.lm_batch(corpus, starts, 32)
    idx = starts[:, None] + np.arange(33)
    w = corpus[idx]
    np.testing.assert_array_equal(x, w[:, :-1].astype(np.int32))
    np.testing.assert_array_equal(y, w[:, 1:].astype(np.int32))


def test_word_boundaries_match_python():
    from spectral_tpu.models.segmentation_head import get_word_boundaries
    from spectral_tpu.native import corpus as nc

    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (4, 100)).astype(np.int32)
    np.testing.assert_array_equal(nc.word_boundaries(x), get_word_boundaries(x))


def test_data_module_routes_through_native():
    import spectral_tpu.train.data as data

    assert data._native_corpus is not None
