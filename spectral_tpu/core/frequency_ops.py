"""Pure frequency-domain operations — no materialization.

Reference: fft_tensor/frequency_ops.py.  Complex frequency space as the
native representation: streaming matmuls over sparse weights, frequency
attention, complex semantic embeddings, and frequency-native activations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.core.tensor import SparseSpectralTensor


def _polar(mag, phase):
    return jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))


class FrequencyMatMul:
    """Streaming / circulant matmuls over compressed weights."""

    @staticmethod
    def circulant_matmul(x: jax.Array, w_freq: jax.Array) -> jax.Array:
        """DEPRECATED (honest fallback, reference frequency_ops.py:31-72):
        circulant embedding is only a real matmul replacement for structured
        (Toeplitz/circulant) matrices; for arbitrary weights this
        ifft-materializes the rows and falls back to a standard matmul.
        Use :meth:`block_streaming_matmul` instead.
        """
        B, M, K = x.shape
        if w_freq.ndim != 2:
            raise ValueError(f"Unexpected w_freq shape: {w_freq.shape}")
        d_out, d_in = w_freq.shape
        w_spatial = jnp.fft.ifft(w_freq, axis=-1).real
        if d_in == K:
            return x @ w_spatial.T  # (B, M, D_out)
        if d_out == K:
            return x @ w_spatial  # (B, M, N)
        raise ValueError(f"Dimension mismatch: x has {K}, w_freq is {w_freq.shape}")

    @staticmethod
    def block_streaming_matmul(
        x: jax.Array, w_sst: SparseSpectralTensor, block_size: int = 512
    ) -> jax.Array:
        """x @ W with W materialized only ``block_size`` columns at a time.

        Peak extra memory: one (K, block) column block plus the sparse
        coefficients — never the full (K, N) matrix.

        EXACTNESS FIX vs the reference (frequency_ops.py:101-129): the
        reference sliced the 2-D frequency grid by output column and
        ifftn'd the slice, but a column range of the spectrum is NOT the
        spectrum of the column range — its streamed product did not equal
        ``x @ W.to_spatial()``.  Here each block is reconstructed exactly by
        a partial inverse DFT of the sparse coefficients:

            G[k1, j]  = (1/N) * sum_{kept (k1,k2)} S[k1,k2] e^{2 pi i k2 j / N}
            W[:, blk] = Re(ifft_axis0(G))

        evaluated only at the block's columns j (a segment-sum over the kept
        modes), so the streamed result matches the dense matmul to float
        tolerance.
        """
        B, M, K = x.shape
        N = w_sst.shape[1]

        flat_idx = w_sst.indices
        coeffs = w_sst.freq_coeffs
        rows = (flat_idx // N).astype(jnp.int32)
        cols = (flat_idx % N).astype(jnp.int32)

        outs = []
        for n_start in range(0, N, block_size):
            n_end = min(n_start + block_size, N)
            j = jnp.arange(n_start, n_end)
            # per-kept-mode phases at the block's columns: [nnz, width]
            ang = 2.0 * np.pi * cols[:, None].astype(jnp.float32) * j[None, :].astype(jnp.float32) / N
            contrib = coeffs[:, None] * jax.lax.complex(jnp.cos(ang), jnp.sin(ang)) / N
            # sum contributions per spectral row k1 (real/imag separately —
            # complex segment/scatter ops are unsupported on the TPU backend)
            g_re = jax.ops.segment_sum(jnp.real(contrib), rows, num_segments=K)
            g_im = jax.ops.segment_sum(jnp.imag(contrib), rows, num_segments=K)
            g = jax.lax.complex(g_re, g_im)  # [K, width]
            w_block = jnp.fft.ifft(g, axis=0).real  # only this block materializes
            outs.append(x @ w_block.astype(x.dtype))
        return jnp.concatenate(outs, axis=-1)


class FrequencyAttention:
    """Attention analogues in the frequency domain."""

    @staticmethod
    def frequency_attention(
        q_freq: jax.Array, k_freq: jax.Array, v_freq: jax.Array, temperature: float = 1.0
    ) -> jax.Array:
        """q·conj(k) magnitude -> softmax over sequence -> reweight v.

        All inputs (B, H, N, D) complex (reference frequency_ops.py:147-185).
        """
        attention_freq = q_freq * jnp.conj(k_freq)  # (B, H, N, D)
        scores = jnp.abs(attention_freq) / temperature
        scores = jnp.mean(scores, axis=-1)  # (B, H, N)
        probs = jax.nn.softmax(scores, axis=-1)
        return probs[..., None] * v_freq

    @staticmethod
    def fnet_attention(x_freq: jax.Array) -> jax.Array:
        """FNet-style: FFT along the sequence axis, no QKV at all."""
        return jnp.fft.fft(x_freq, axis=1)


class ComplexSemanticEmbedding:
    """vocab x D complex64 embeddings with freq-decay + phase-structure init.

    Reference frequency_ops.py:207-310: low frequencies = broad semantic
    categories, high = fine distinctions; phase differences encode
    relationship types.
    """

    def __init__(self, vocab_size: int, embed_dim: int, seed: int = 0):
        self.vocab_size = int(vocab_size)
        self.embed_dim = int(embed_dim)
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        emb = (
            jax.random.normal(k1, (vocab_size, embed_dim))
            + 1j * jax.random.normal(k2, (vocab_size, embed_dim))
        ).astype(jnp.complex64) * 0.02
        # decay higher frequencies (natural 1/f prior)
        freq_decay = jnp.exp(-jnp.arange(embed_dim) / 10.0)
        emb = emb * freq_decay[None, :]
        # phase structure for relationship encoding
        phase = jax.random.normal(k3, (vocab_size, embed_dim))
        self.freq_embeddings = emb * _polar(jnp.ones_like(phase), phase)

    def lookup(self, token_ids: jax.Array) -> jax.Array:
        """(B, N) ids -> (B, N, D) complex frequency embeddings."""
        return self.freq_embeddings[token_ids]

    def semantic_similarity(self, freq1: jax.Array, freq2: jax.Array) -> jax.Array:
        """|complex conjugate inner product| (magnitude = similarity)."""
        return jnp.abs(jnp.sum(freq1 * jnp.conj(freq2), axis=-1))

    def phase_relationship(self, freq1: jax.Array, freq2: jax.Array) -> jax.Array:
        """Relative phase (relationship type: 0 same, pi opposite, ...)."""
        return jnp.angle(freq1 / (freq2 + 1e-8))


class FrequencyTransformerLayer:
    """Transformer layer that never leaves the frequency domain.

    Reference frequency_ops.py:313-363.  Like the original it holds fixed
    random complex projections (no trainable params — preserved contract).
    """

    def __init__(self, d_model: int, n_heads: int, seed: int = 0):
        self.d_model = int(d_model)
        self.n_heads = int(n_heads)
        self.head_dim = d_model // n_heads
        keys = jax.random.split(jax.random.PRNGKey(seed), 8)

        def cmat(kr, ki):
            return (
                jax.random.normal(kr, (d_model, d_model)) + 1j * jax.random.normal(ki, (d_model, d_model))
            ).astype(jnp.complex64) * 0.02

        self.q_proj_freq = cmat(keys[0], keys[1])
        self.k_proj_freq = cmat(keys[2], keys[3])
        self.v_proj_freq = cmat(keys[4], keys[5])
        self.o_proj_freq = cmat(keys[6], keys[7])

    def forward(self, x_freq: jax.Array) -> jax.Array:
        B, N, D = x_freq.shape
        q = (x_freq @ self.q_proj_freq).reshape(B, N, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
        k = (x_freq @ self.k_proj_freq).reshape(B, N, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
        v = (x_freq @ self.v_proj_freq).reshape(B, N, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
        attn = FrequencyAttention.frequency_attention(q, k, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, N, D)
        return attn @ self.o_proj_freq

    __call__ = forward


def frequency_relu(x_freq: jax.Array) -> jax.Array:
    """ReLU on magnitude, phase preserved (reference :367-381)."""
    from spectral_tpu.ops.complex_utils import safe_magnitude_phase

    magnitude, phase = safe_magnitude_phase(x_freq)
    return _polar(jax.nn.relu(magnitude), phase)


def frequency_layernorm(x_freq: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Normalize magnitude (last axis), preserve phase (reference :384-401)."""
    from spectral_tpu.ops.complex_utils import safe_magnitude_phase

    magnitude, phase = safe_magnitude_phase(x_freq)
    mean = jnp.mean(magnitude, axis=-1, keepdims=True)
    std = jnp.std(magnitude, axis=-1, keepdims=True, ddof=1)
    normalized = (magnitude - mean) / (std + eps)
    return _polar(normalized, phase)
