"""SST operations: conv, pool, normalize, activation + implicit weights.

Reference: fft_tensor/ops.py.  Two latent reference bugs are fixed here and
documented: ``spectral_conv`` called a nonexistent ``SST._hadamard``
(ops.py:26 — now implemented in tensor.py), and ``implicit_matmul``
referenced ``np`` without importing it (ops.py:229).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.core.tensor import SparseSpectralTensor, sst


def spectral_conv(input_sst: SparseSpectralTensor, kernel_sst: SparseSpectralTensor) -> SparseSpectralTensor:
    """Convolution via the convolution theorem: elementwise multiply of the
    two (sparse) spectra — O(n log n) instead of O(n^2).

    Note: like the reference intends, this is the *circular* convolution of
    the two same-shape signals (no linear-conv padding here; see
    zero_materialize.frequency_convNd for exact linear conv semantics).
    """
    if input_sst.shape != kernel_sst.shape:
        raise ValueError(f"spectral_conv requires matching shapes, got {input_sst.shape} vs {kernel_sst.shape}")
    return input_sst._hadamard(kernel_sst)


def spectral_pool(
    input_sst: SparseSpectralTensor, kernel_size: int = 2, mode: str = "max"
) -> SparseSpectralTensor:
    """Pooling: spatial max/avg pool then re-sparsify at reduced sparsity
    (downsampling = low-pass filtering; reference ops.py:29-60)."""
    if mode not in ("max", "avg"):
        raise ValueError(f"Unknown pooling mode: {mode}")
    new_sparsity = input_sst.sparsity / (kernel_size**2)
    new_sparsity = max(0.01, min(new_sparsity, input_sst.sparsity))

    spatial = input_sst.to_spatial()
    if spatial.ndim != 2:
        raise ValueError("spectral_pool expects a 2-D SST")
    x = spatial[None, :, :, None]  # NHWC
    if mode == "max":
        pooled = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, kernel_size, kernel_size, 1), (1, kernel_size, kernel_size, 1), "VALID"
        )
    else:
        pooled = (
            jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, kernel_size, kernel_size, 1), (1, kernel_size, kernel_size, 1), "VALID"
            )
            / (kernel_size**2)
        )
    return sst(pooled[0, :, :, 0], sparsity=new_sparsity)


def spectral_normalize(input_sst: SparseSpectralTensor, eps: float = 1e-5) -> SparseSpectralTensor:
    """Normalize by the total coefficient magnitude (reference ops.py:63-83)."""
    magnitude = jnp.abs(input_sst.freq_coeffs)
    norm = jnp.sum(magnitude) + eps
    return SparseSpectralTensor(
        freq_coeffs=input_sst.freq_coeffs / norm,
        indices=input_sst.indices,
        shape=input_sst.shape,
        sparsity=input_sst.sparsity,
        dtype=input_sst.dtype,
    )


def spectral_activation(input_sst: SparseSpectralTensor, activation: str = "relu") -> SparseSpectralTensor:
    """Nonlinearity needs the spatial domain: materialize -> act -> re-sst."""
    spatial = input_sst.to_spatial()
    acts = {
        "relu": jax.nn.relu,
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "silu": jax.nn.silu,
        "tanh": jnp.tanh,
    }
    if activation not in acts:
        raise ValueError(f"Unknown activation: {activation}")
    return sst(acts[activation](spatial), sparsity=input_sst.sparsity)


class ImplicitWeights:
    """Weights as rank-R spectral coefficients, generated on demand via IFFT.

    "Run 120B on 6GB" concept (reference ops.py:108-208): store
    ``(rank, *shape[-2:])`` complex coefficients instead of the dense matrix;
    materialize slices only when needed.
    """

    def __init__(self, shape: Tuple[int, ...], rank: int = 256, sparsity: float = 0.01, seed: int = 0):
        self.shape = tuple(int(s) for s in shape)
        self.rank = int(rank)
        self.sparsity = float(sparsity)
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        self.spectral_params = (
            jax.random.normal(k1, (self.rank,) + self.shape[-2:])
            + 1j * jax.random.normal(k2, (self.rank,) + self.shape[-2:])
        ).astype(jnp.complex64) * 0.02

    def generate_weights(self, slice_idx: Optional[Tuple[slice, ...]] = None) -> SparseSpectralTensor:
        """Materialize (a slice of) the weights: sum of per-rank IFFTs."""
        # one batched ifftn over the rank axis, summed (the reference loops)
        contributions = jnp.fft.ifftn(self.spectral_params, axes=(-2, -1)).real
        weights = jnp.sum(contributions, axis=0)
        if slice_idx is not None:
            weights = weights[slice_idx]
        return sst(weights, sparsity=self.sparsity)

    def memory_mb(self) -> float:
        return self.spectral_params.size * 8 / (1024**2)

    def compression_ratio(self) -> float:
        return float(np.prod(self.shape)) / float(self.spectral_params.size)

    def update_spectral_params(self, grad_sst: SparseSpectralTensor, lr: float = 0.001) -> None:
        """Update spectral params directly from a frequency-domain gradient."""
        grad_freq = jnp.fft.fftn(grad_sst.to_spatial())
        r = min(self.rank, grad_freq.shape[0])
        self.spectral_params = self.spectral_params.at[:r].add(-lr * grad_freq[:r])


def implicit_matmul(
    input_sst: SparseSpectralTensor,
    implicit_weights: ImplicitWeights,
    streaming: bool = True,
    chunk_size_mb: int = 512,
) -> SparseSpectralTensor:
    """Matmul against implicit weights, streamed in row chunks.

    (Reference ops.py:211-251; its ``np.ceil`` without an import — fixed.)
    """
    if not streaming or implicit_weights.memory_mb() < chunk_size_mb:
        return input_sst.matmul(implicit_weights.generate_weights())

    # Stream over the OUTPUT columns of W so each chunk is a valid
    # (K, chunk) matmul operand.  (The reference chunked W's rows — the
    # contraction dim — which cannot type-check for x @ W; divergence
    # documented, see SURVEY.md §7 "reference bugs".)
    x = input_sst.to_spatial()
    n_chunks = max(1, int(np.ceil(implicit_weights.memory_mb() / max(chunk_size_mb, 1e-6))))
    cols = implicit_weights.shape[-1]
    chunk = max(1, cols // n_chunks)
    outs = []
    for i in range(0, cols, chunk):
        w_chunk = implicit_weights.generate_weights(slice_idx=(slice(None), slice(i, min(i + chunk, cols))))
        outs.append(x @ w_chunk.to_spatial())
    return sst(jnp.concatenate(outs, axis=-1), sparsity=input_sst.sparsity)


def spectral_backward(
    output_grad_sst: SparseSpectralTensor,
    input_sst: SparseSpectralTensor,
    weights_sst: SparseSpectralTensor,
) -> Tuple[SparseSpectralTensor, SparseSpectralTensor]:
    """Hand-rolled freq-domain gradients for a linear layer (simplified chain
    rule as in the reference ops.py:255-272)."""
    input_grad = output_grad_sst.matmul(weights_sst)
    weight_grad = input_sst.matmul(output_grad_sst)
    return input_grad, weight_grad
