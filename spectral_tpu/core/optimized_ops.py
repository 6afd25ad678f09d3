"""Optimized / size-adaptive frequency operations.

Reference: fft_tensor/optimized_ops.py — jit-compiled top-k sparsify, sparse
FFT round-trips, size-adaptive matmul dispatch, and convs that pick direct
(MXU) vs FFT execution by kernel size.  On TPU the "cuDNN path" is
``jax.lax.conv_general_dilated`` (lowers onto the MXU) and the "cuFFT path"
is the zero_materialize linear-conv FFT.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from spectral_tpu.core.tensor import SparseSpectralTensor, _scatter_dense
from spectral_tpu.core.zero_materialize import ConvolutionTheoremMatMul


class OptimizedFrequencyOps:
    """Size-adaptive dispatch (reference optimized_ops.py:13-265)."""

    @staticmethod
    @partial(jax.jit, static_argnums=(1,))
    def fast_topk_sparse(freq: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
        """Top-k magnitude selection over a flattened spectrum (jitted;
        k is a static argument — lax.top_k needs a compile-time k)."""
        flat = freq.reshape(-1)
        mag = jnp.abs(flat)
        _, idx = jax.lax.top_k(mag, k)
        return flat[idx], idx.astype(jnp.int32)

    @staticmethod
    def optimized_sparse_fft(x: jax.Array, sparsity: float) -> Tuple[jax.Array, jax.Array, Tuple[int, ...]]:
        """FFT + top-k in one pass; returns (coeffs, flat_indices, shape)."""
        freq = jnp.fft.fftn(x.astype(jnp.float32))
        k = max(1, int(freq.size * sparsity))
        coeffs, idx = OptimizedFrequencyOps.fast_topk_sparse(freq, k)
        return coeffs, idx, tuple(x.shape)

    @staticmethod
    def optimized_sparse_ifft(coeffs: jax.Array, indices: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
        """Dense scatter + IFFT (scatter-free-complex per TPU constraint)."""
        return jnp.fft.ifftn(_scatter_dense(coeffs, indices, shape)).real

    # ------------------------------------------------------------------
    @staticmethod
    def fast_frequency_matmul(x: jax.Array, w_sst: SparseSpectralTensor, block_size: int = 512) -> jax.Array:
        """Size-adaptive: small weights -> materialize once and matmul on the
        MXU; large weights -> block-streaming (bounded memory)."""
        from spectral_tpu.core.frequency_ops import FrequencyMatMul

        full_mb = float(np.prod(w_sst.shape)) * 4 / (1024**2)
        if full_mb <= 64:  # small: a single dense matmul wins on the MXU
            return x @ w_sst.to_spatial()
        return FrequencyMatMul.block_streaming_matmul(x, w_sst, block_size=block_size)

    # ------------------------------------------------------------------
    @staticmethod
    def fast_frequency_conv1d(x: jax.Array, kernel: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
        """Adaptive conv1d: direct (MXU) below K=64, FFT above.

        x: (B, C_in, L); kernel: (C_out, C_in, K) TIME-domain taps.
        """
        K = kernel.shape[-1]
        if K < 64:
            return jax.lax.conv_general_dilated(
                x.astype(jnp.float32),
                kernel.astype(jnp.float32),
                window_strides=(stride,),
                padding=[(padding, padding)],
                dimension_numbers=("NCH", "OIH", "NCH"),
            )
        w_freq = jnp.fft.fft(kernel, axis=-1)
        return ConvolutionTheoremMatMul.frequency_conv1d(x, w_freq, stride=stride, padding=padding)

    @staticmethod
    def fast_frequency_conv2d(
        x: jax.Array, kernel: jax.Array, stride: Tuple[int, int] = (1, 1), padding: Tuple[int, int] = (0, 0)
    ) -> jax.Array:
        """Adaptive conv2d: direct below 7x7, FFT above.

        x: (B, C_in, H, W); kernel: (C_out, C_in, Kh, Kw) time-domain.
        """
        Kh, Kw = kernel.shape[-2:]
        if Kh <= 7 and Kw <= 7:
            return jax.lax.conv_general_dilated(
                x.astype(jnp.float32),
                kernel.astype(jnp.float32),
                window_strides=stride,
                padding=[(padding[0], padding[0]), (padding[1], padding[1])],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
        w_freq = jnp.fft.fft2(kernel, axes=(-2, -1))
        return ConvolutionTheoremMatMul.frequency_conv2d(x, w_freq, stride=stride, padding=padding)


class ProductionFrequencyLinear(nn.Module):
    """Dense-compatible linear whose weight is stored as a sparse spectrum
    and lazily materialized, with the cache invalidated while training
    (reference optimized_ops.py:268-346).

    Under jit the "cache" is XLA's own CSE — the materialization
    (ifft of the sparse spectrum) is hoisted/fused by the compiler; we keep
    the explicit API for eval-mode host callers.
    """

    in_features: int
    out_features: int
    sparsity: float = 0.05
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from spectral_tpu.core.zero_materialize import sparse_freq_init

        w_ri = self.param(
            "weight_freq_ri",
            lambda k: jnp.stack(
                [
                    jnp.real(sparse_freq_init(k, self.out_features, self.in_features, self.sparsity)),
                    jnp.imag(sparse_freq_init(k, self.out_features, self.in_features, self.sparsity)),
                ]
            ),
        )
        w_freq = jax.lax.complex(w_ri[0], w_ri[1])
        # materialize spatial rows from the row spectra (lazy: traced once,
        # then cached by XLA across calls)
        w_spatial = jnp.fft.ifft(w_freq, axis=-1).real  # (out, in)
        y = x @ w_spatial.T
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.out_features,))
        return y
