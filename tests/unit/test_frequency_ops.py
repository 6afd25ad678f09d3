"""Frequency-ops tests (port of reference tests/test_frequency_ops.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.core.frequency_ops import (
    ComplexSemanticEmbedding,
    FrequencyAttention,
    FrequencyMatMul,
    FrequencyTransformerLayer,
    frequency_layernorm,
    frequency_relu,
)
from spectral_tpu.core.tensor import MemoryManager, sst


@pytest.fixture(autouse=True)
def clean_mm():
    MemoryManager.clear_all()
    yield
    MemoryManager.clear_all()


class TestStreamingMatMul:
    def test_block_streaming_matches_dense(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 8, 32)).astype(np.float32)
        w = rng.standard_normal((32, 64)).astype(np.float32)
        w_sst = sst(w, sparsity=1.0)
        got = np.asarray(FrequencyMatMul.block_streaming_matmul(jnp.asarray(x), w_sst, block_size=16))
        want = x @ np.asarray(w_sst.to_spatial())
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_block_streaming_sparse(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 4, 16)).astype(np.float32)
        w_sst = sst(rng.standard_normal((16, 48)).astype(np.float32), sparsity=0.1)
        got = np.asarray(FrequencyMatMul.block_streaming_matmul(jnp.asarray(x), w_sst, block_size=16))
        want = x @ np.asarray(w_sst.to_spatial())
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)

    def test_circulant_fallback_shapes(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 4, 8)).astype(np.float32))
        w_freq = jnp.fft.fft(jnp.asarray(rng.standard_normal((6, 8)).astype(np.float32)), axis=-1)
        y = FrequencyMatMul.circulant_matmul(x, w_freq)
        assert y.shape == (2, 4, 6)


class TestComplexEmbedding:
    def test_similarity_self_highest(self):
        emb = ComplexSemanticEmbedding(vocab_size=50, embed_dim=16)
        e = emb.lookup(jnp.arange(10))
        self_sim = np.asarray(emb.semantic_similarity(e, e))
        cross = np.asarray(emb.semantic_similarity(e, jnp.roll(e, 1, axis=0)))
        assert (self_sim > cross).mean() > 0.7  # self-similarity dominates

    def test_phase_relationship_zero_for_self(self):
        emb = ComplexSemanticEmbedding(vocab_size=10, embed_dim=8)
        e = emb.lookup(jnp.arange(5))
        phase = np.asarray(emb.phase_relationship(e, e))
        np.testing.assert_allclose(phase, 0.0, atol=1e-4)

    def test_freq_decay_prior(self):
        """Low-frequency dims must carry more energy (1/f init prior)."""
        emb = ComplexSemanticEmbedding(vocab_size=200, embed_dim=32)
        mag = np.abs(np.asarray(emb.freq_embeddings)).mean(axis=0)
        assert mag[:8].mean() > 3 * mag[-8:].mean()


class TestFrequencyAttention:
    def test_shapes_and_normalization(self):
        rng = np.random.default_rng(3)
        q = jnp.asarray((rng.standard_normal((2, 4, 8, 16)) + 1j * rng.standard_normal((2, 4, 8, 16))).astype(np.complex64))
        out = FrequencyAttention.frequency_attention(q, q, q)
        assert out.shape == q.shape
        assert out.dtype == jnp.complex64

    def test_fnet_attention(self):
        x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 8, 4)).astype(np.float32))
        y = FrequencyAttention.fnet_attention(x.astype(jnp.complex64))
        assert y.shape == x.shape and jnp.iscomplexobj(y)

    def test_transformer_layer_no_materialization(self):
        layer = FrequencyTransformerLayer(d_model=16, n_heads=4)
        x = jnp.asarray(
            (np.random.default_rng(5).standard_normal((2, 6, 16)) + 0j).astype(np.complex64)
        )
        y = layer(x)
        assert y.shape == x.shape and y.dtype == jnp.complex64


class TestFrequencyActivations:
    def test_relu_magnitude_phase(self):
        z = jnp.asarray(np.array([1 + 1j, -2 - 2j, 0.5j], np.complex64))
        y = np.asarray(frequency_relu(z))
        # magnitudes are nonneg already -> relu(|z|) == |z|; phase preserved
        np.testing.assert_allclose(np.abs(y), np.abs(np.asarray(z)), rtol=1e-5)
        np.testing.assert_allclose(np.angle(y), np.angle(np.asarray(z)), atol=1e-5)

    def test_layernorm_preserves_phase(self):
        rng = np.random.default_rng(6)
        z = jnp.asarray((rng.standard_normal((2, 8)) + 1j * rng.standard_normal((2, 8))).astype(np.complex64))
        y = np.asarray(frequency_layernorm(z))
        # phase is preserved modulo pi flips where normalized magnitude < 0
        ratio = np.angle(y) - np.angle(np.asarray(z))
        ratio = np.mod(np.abs(ratio), np.pi)
        ok = (ratio < 1e-4) | (np.abs(ratio - np.pi) < 1e-4)
        assert ok.all()


class TestOptimizedOps:
    def test_fast_topk_sparse_roundtrip(self):
        from spectral_tpu.core.optimized_ops import OptimizedFrequencyOps as O

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((32, 32)).astype(np.float32))
        coeffs, idx, shape = O.optimized_sparse_fft(x, sparsity=1.0)
        back = O.optimized_sparse_ifft(coeffs, idx, shape)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)

    def test_fast_topk_static_k(self):
        from spectral_tpu.core.optimized_ops import OptimizedFrequencyOps as O

        freq = jnp.asarray((np.arange(16) + 0j).astype(np.complex64))
        coeffs, idx = O.fast_topk_sparse(freq, 4)
        assert sorted(np.asarray(idx).tolist()) == [12, 13, 14, 15]

    def test_adaptive_conv_dispatch(self):
        import torch

        from spectral_tpu.core.optimized_ops import OptimizedFrequencyOps as O

        rng = np.random.default_rng(8)
        x = rng.standard_normal((2, 3, 50)).astype(np.float32)
        for K in (5, 80):  # below/above the direct-vs-FFT switch
            k = rng.standard_normal((4, 3, K)).astype(np.float32)
            pad = K // 2
            got = np.asarray(O.fast_frequency_conv1d(jnp.asarray(x), jnp.asarray(k), padding=pad))
            want = torch.nn.functional.conv1d(torch.tensor(x), torch.tensor(k), padding=pad).numpy()
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
