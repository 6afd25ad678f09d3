"""SparseSpectralTensor + MemoryManager unit tests.

Port of the reference suite tests/unit/test_tensor.py (creation, round-trip,
arithmetic, matmul, compression bounds, ND shapes, memory-limit enforcement).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.core.tensor import MemoryManager, SparseSpectralTensor, randn_sst, sst, zeros_sst


@pytest.fixture(autouse=True)
def clean_memory_manager():
    MemoryManager.clear_all()
    MemoryManager.set_limit(5000)
    yield
    MemoryManager.clear_all()
    MemoryManager.set_limit(5000)


def smooth_signal(shape, seed=0):
    """Low-frequency-dominated test signal (compresses well)."""
    rng = np.random.default_rng(seed)
    n = shape[0]
    t = np.linspace(0, 4 * np.pi, n)
    base = np.sin(t)[(...,) + (None,) * (len(shape) - 1)]
    return (base + 0.1 * rng.standard_normal(shape)).astype(np.float32)


class TestSparseSpectralTensor:
    def test_creation_from_spatial(self):
        t = sst(np.random.default_rng(0).standard_normal((64, 64)).astype(np.float32), sparsity=0.1)
        assert t.shape == (64, 64)
        assert t.freq_coeffs.shape[0] == int(64 * 64 * 0.1)
        assert t.freq_coeffs.dtype == jnp.complex64

    def test_creation_from_coeffs(self):
        t = SparseSpectralTensor(
            freq_coeffs=jnp.ones(4, jnp.complex64), indices=jnp.arange(4, dtype=jnp.int32), shape=(8, 8)
        )
        assert t.shape == (8, 8)

    def test_creation_requires_args(self):
        with pytest.raises(ValueError):
            SparseSpectralTensor()
        with pytest.raises(ValueError):
            SparseSpectralTensor(freq_coeffs=jnp.ones(4, jnp.complex64), indices=jnp.arange(4))

    def test_roundtrip_smooth_signal(self):
        x = smooth_signal((128, 32))
        t = sst(x, sparsity=0.2)
        back = np.asarray(t.to_spatial())
        err = np.linalg.norm(back - x) / np.linalg.norm(x)
        assert err < 0.25  # lossy but bounded for a low-freq signal

    def test_roundtrip_full_sparsity_exact(self):
        x = np.random.default_rng(1).standard_normal((16, 16)).astype(np.float32)
        t = sst(x, sparsity=1.0)
        np.testing.assert_allclose(np.asarray(t.to_spatial()), x, atol=1e-4)

    def test_add(self):
        a = sst(smooth_signal((64, 16), 0), sparsity=0.5)
        b = sst(smooth_signal((64, 16), 1), sparsity=0.5)
        c = a + b
        expected = np.asarray(a.to_spatial()) + np.asarray(b.to_spatial())
        err = np.linalg.norm(np.asarray(c.to_spatial()) - expected) / np.linalg.norm(expected)
        assert err < 0.3

    def test_add_shape_mismatch(self):
        with pytest.raises(ValueError):
            zeros_sst((8, 8)) + zeros_sst((4, 4))

    def test_scalar_mul_is_exact_in_freq(self):
        t = randn_sst((32, 32), sparsity=0.1)
        t2 = t * 2.0
        np.testing.assert_allclose(np.asarray(t2.freq_coeffs), np.asarray(t.freq_coeffs) * 2.0, rtol=1e-6)
        t3 = 3.0 * t
        np.testing.assert_allclose(np.asarray(t3.freq_coeffs), np.asarray(t.freq_coeffs) * 3.0, rtol=1e-6)

    def test_matmul_shapes(self):
        a = sst(smooth_signal((32, 16)), sparsity=1.0)
        b = sst(smooth_signal((16, 8)), sparsity=1.0)
        c = a.matmul(b)
        assert c.shape == (32, 8)
        expected = np.asarray(a.to_spatial()) @ np.asarray(b.to_spatial())
        err = np.linalg.norm(np.asarray(c.to_spatial()) - expected) / np.linalg.norm(expected)
        assert err < 1e-3

    def test_hadamard(self):
        """The op the reference declared but never implemented (ops.py:26)."""
        a = sst(smooth_signal((32, 8), 0), sparsity=1.0)
        b = sst(smooth_signal((32, 8), 1), sparsity=1.0)
        h = a._hadamard(b)
        expected = np.asarray(jnp.fft.fftn(jnp.asarray(a.to_spatial()))) * np.asarray(
            jnp.fft.fftn(jnp.asarray(b.to_spatial()))
        )
        dense = np.asarray(h.dense_spectrum())
        # top-k of the product spectrum: kept modes must match the product
        nz = np.abs(dense) > 0
        np.testing.assert_allclose(dense[nz], expected[nz], rtol=1e-3, atol=1e-3)

    def test_compress_ratio_bounds(self):
        t = sst(np.zeros((100, 100), np.float32) + smooth_signal((100, 100)), sparsity=0.05)
        assert 15 < t.compress_ratio() <= 21  # ~1/0.05 = 20x

    @pytest.mark.parametrize("shape", [(64,), (32, 16), (8, 8, 8), (4, 4, 4, 4)])
    def test_nd_shapes(self, shape):
        t = sst(np.random.default_rng(0).standard_normal(shape).astype(np.float32), sparsity=0.5)
        assert t.to_spatial().shape == shape

    def test_memory_mb_positive(self):
        t = randn_sst((64, 64), sparsity=0.1)
        assert 0 < t.memory_mb() < 1

    def test_repr(self):
        assert "compression" in repr(randn_sst((16, 16)))


class TestMemoryManager:
    def test_register_and_stats(self):
        t = randn_sst((64, 64), sparsity=0.1)
        stats = MemoryManager.get_stats()
        assert stats["n_tensors"] >= 1
        assert stats["total_memory_mb"] > 0
        assert 0 <= stats["utilization"] <= 1

    def test_limit_enforced(self):
        MemoryManager.set_limit(1)  # 1 MB
        with pytest.raises(MemoryError, match="limit exceeded"):
            for _ in range(64):
                # keep references so GC can't save us
                MemoryManager._tensors.append(randn_sst((256, 256), sparsity=0.5))

    def test_set_limit_validation(self):
        with pytest.raises(ValueError):
            MemoryManager.set_limit(0)

    def test_clear_all(self):
        randn_sst((32, 32))
        MemoryManager.clear_all()
        assert MemoryManager.get_stats()["n_tensors"] == 0


class TestProductionReady:
    def test_cached_sst_and_dispatch(self):
        from spectral_tpu.core.production_ready import (
            OptimizedSparseSpectralTensor,
            ProductionFrequencyOps,
        )

        x = smooth_signal((64, 32))
        t = OptimizedSparseSpectralTensor(data=x, sparsity=0.5)
        a = t.to_spatial()
        b = t.to_spatial()
        assert a is b  # cached
        t.invalidate_cache()
        assert t.to_spatial() is not a

        # adaptive dispatch entry points
        c = ProductionFrequencyOps.compress(jnp.asarray(x), sparsity=0.2)
        assert c.compress_ratio() > 4
        y = ProductionFrequencyOps.matmul(jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 64)).astype(np.float32)), sst(np.random.default_rng(1).standard_normal((64, 16)).astype(np.float32), sparsity=1.0))
        assert y.shape == (1, 4, 16)


class TestSSTOps:
    def test_spectral_conv_via_hadamard(self):
        from spectral_tpu.core.ops import spectral_conv

        a = sst(smooth_signal((32, 8), 0), sparsity=1.0)
        b = sst(smooth_signal((32, 8), 1), sparsity=1.0)
        c = spectral_conv(a, b)
        assert c.shape == (32, 8)
        # circular convolution theorem check at full sparsity
        want = np.fft.ifftn(np.fft.fftn(np.asarray(a.to_spatial())) * np.fft.fftn(np.asarray(b.to_spatial()))).real
        np.testing.assert_allclose(np.asarray(c.to_spatial()), want, atol=1e-3)

    def test_spectral_pool(self):
        from spectral_tpu.core.ops import spectral_pool

        t = sst(smooth_signal((32, 32)), sparsity=0.5)
        for mode in ("max", "avg"):
            p = spectral_pool(t, kernel_size=2, mode=mode)
            assert p.shape == (16, 16)
        with pytest.raises(ValueError):
            spectral_pool(t, mode="nope")

    def test_spectral_normalize(self):
        from spectral_tpu.core.ops import spectral_normalize

        t = sst(smooth_signal((16, 16)), sparsity=0.5)
        n = spectral_normalize(t)
        mag_sum = float(jnp.sum(jnp.abs(n.freq_coeffs)))
        assert abs(mag_sum - 1.0) < 1e-3  # normalized to unit total magnitude

    def test_spectral_activation(self):
        from spectral_tpu.core.ops import spectral_activation

        t = sst(smooth_signal((16, 16)), sparsity=1.0)
        for act in ("relu", "gelu", "silu", "tanh"):
            a = spectral_activation(t, act)
            assert a.shape == t.shape
        r = spectral_activation(t, "relu")
        assert float(jnp.min(r.to_spatial())) >= -0.05  # relu-ish (lossy re-sst)

    def test_implicit_weights_and_matmul(self):
        from spectral_tpu.core.ops import ImplicitWeights, implicit_matmul

        iw = ImplicitWeights((16, 16), rank=4, sparsity=0.5)
        assert iw.compression_ratio() == 16 * 16 / (4 * 16 * 16)  # <1 at this toy size
        w = iw.generate_weights()
        assert w.shape == (16, 16)
        x = sst(smooth_signal((8, 16)), sparsity=1.0)
        y = implicit_matmul(x, iw, streaming=False)
        assert y.shape == (8, 16)
        y2 = implicit_matmul(x, iw, streaming=True, chunk_size_mb=0)  # force streaming
        np.testing.assert_allclose(
            np.asarray(y.to_spatial()), np.asarray(y2.to_spatial()), atol=0.3
        )
