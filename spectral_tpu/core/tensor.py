"""Sparse Spectral Tensor (SST) — a tensor living in the frequency domain.

Reference: fft_tensor/tensor.py:21-412.

An SST stores only the top-K frequency modes of an ND tensor (FFT + top-K
magnitude selection).  ``to_spatial`` scatters the sparse coefficients back
into a dense spectrum and inverse-FFTs.  Arithmetic materializes, computes,
and re-compresses (same contract as the reference).

TPU-native notes:
* sparsify = ``jax.lax.top_k`` over |spectrum| (the reference's CUDA
  ``sparsify_topk`` kernel, tensor.py:117-126);
* scatter happens on the REAL and IMAG planes separately — complex scatter
  is unimplemented on the target TPU backend (see .claude/skills/verify);
* ``MemoryManager`` keeps the reference's hard-limit semantics
  (raises MemoryError on breach) with device stats from
  ``jax.local_devices()[0].memory_stats()`` instead of the CUDA allocator.
"""

from __future__ import annotations

import gc
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def _topk_sparsify(freq: jax.Array, sparsity: float) -> Tuple[jax.Array, jax.Array]:
    """Top-K magnitude selection over the flattened spectrum.

    Returns (coeffs [k] complex64, flat_indices [k] int32).
    """
    flat = freq.reshape(-1)
    k = max(1, int(flat.shape[0] * sparsity))
    mag = jnp.abs(flat)
    _, idx = jax.lax.top_k(mag, k)
    return flat[idx], idx.astype(jnp.int32)


def _scatter_dense(coeffs: jax.Array, flat_idx: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    """Scatter sparse complex coeffs into a dense complex spectrum.

    Real/imag planes scattered separately (TPU backend constraint)."""
    n = int(np.prod(shape))
    re = jnp.zeros((n,), jnp.float32).at[flat_idx].set(jnp.real(coeffs))
    im = jnp.zeros((n,), jnp.float32).at[flat_idx].set(jnp.imag(coeffs))
    return jax.lax.complex(re, im).reshape(shape)


class SparseSpectralTensor:
    """Tensor stored as top-K frequency modes (1-10% of the dense data).

    Examples:
        >>> spatial = np.random.randn(1000, 1000).astype(np.float32)
        >>> t = SparseSpectralTensor(data=spatial, sparsity=0.05)
        >>> t.compress_ratio()
        20.0
        >>> back = t.to_spatial()          # lossy reconstruction
        >>> s = t + t                      # arithmetic re-compresses
    """

    def __init__(
        self,
        data: Optional[Union[np.ndarray, jax.Array]] = None,
        freq_coeffs: Optional[jax.Array] = None,
        indices: Optional[jax.Array] = None,
        shape: Optional[Tuple[int, ...]] = None,
        sparsity: float = 0.05,
        dtype=jnp.float32,
    ):
        self.sparsity = float(sparsity)
        self.dtype = dtype

        if data is not None:
            self._from_spatial(jnp.asarray(data))
        elif freq_coeffs is not None and indices is not None:
            if shape is None:
                raise ValueError("shape required when providing freq_coeffs")
            self.freq_coeffs = jnp.asarray(freq_coeffs, jnp.complex64)
            self.indices = jnp.asarray(indices, jnp.int32)
            self.shape = tuple(shape)
        else:
            raise ValueError("Must provide either data or (freq_coeffs, indices, shape)")

        MemoryManager.register(self)

    # ------------------------------------------------------------------
    def _from_spatial(self, data: jax.Array) -> None:
        self.shape = tuple(int(s) for s in data.shape)
        freq = jnp.fft.fftn(data.astype(self.dtype))
        self.freq_coeffs, self.indices = _topk_sparsify(freq, self.sparsity)

    def to_spatial(self) -> jax.Array:
        """Materialize: scatter sparse coeffs -> dense spectrum -> IFFT."""
        freq = _scatter_dense(self.freq_coeffs, self.indices, self.shape)
        return jnp.fft.ifftn(freq).real.astype(self.dtype)

    def dense_spectrum(self) -> jax.Array:
        """The dense complex spectrum (zeros off the kept modes)."""
        return _scatter_dense(self.freq_coeffs, self.indices, self.shape)

    # ------------------------------------------------------------------
    def _hadamard(self, other: "SparseSpectralTensor") -> "SparseSpectralTensor":
        """Frequency-domain elementwise product of two sparse spectra.

        The reference declares this op but never implemented it
        (fft_tensor/ops.py:26 calls a nonexistent ``_hadamard`` — a latent
        bug).  Implemented here: the product spectrum is nonzero only where
        both inputs kept a mode, so multiply on the dense grids and
        re-sparsify at the input sparsity.
        """
        if self.shape != other.shape:
            raise ValueError(f"Shape mismatch: {self.shape} vs {other.shape}")
        prod = self.dense_spectrum() * other.dense_spectrum()
        coeffs, idx = _topk_sparsify(prod, self.sparsity)
        return SparseSpectralTensor(
            freq_coeffs=coeffs, indices=idx, shape=self.shape, sparsity=self.sparsity, dtype=self.dtype
        )

    def __add__(self, other: "SparseSpectralTensor") -> "SparseSpectralTensor":
        """Addition in the frequency domain (materialize-add-recompress)."""
        if self.shape != other.shape:
            raise ValueError(f"Shape mismatch: {self.shape} vs {other.shape}")
        return SparseSpectralTensor(data=self.to_spatial() + other.to_spatial(), sparsity=self.sparsity)

    def __mul__(self, other: Union["SparseSpectralTensor", float, int]) -> "SparseSpectralTensor":
        if isinstance(other, (int, float)):
            return SparseSpectralTensor(
                freq_coeffs=self.freq_coeffs * other,
                indices=self.indices,
                shape=self.shape,
                sparsity=self.sparsity,
                dtype=self.dtype,
            )
        return SparseSpectralTensor(data=self.to_spatial() * other.to_spatial(), sparsity=self.sparsity)

    def __rmul__(self, other: Union[float, int]) -> "SparseSpectralTensor":
        return self.__mul__(other)

    def matmul(self, other: "SparseSpectralTensor") -> "SparseSpectralTensor":
        """Matmul by materialize-compute-recompress (reference contract)."""
        result = self.to_spatial() @ other.to_spatial()
        return SparseSpectralTensor(data=result, sparsity=self.sparsity)

    # ------------------------------------------------------------------
    def compress_ratio(self) -> float:
        spatial_size = float(np.prod(self.shape))
        n = int(self.freq_coeffs.shape[0])
        return spatial_size / n if n > 0 else 0.0

    def memory_mb(self) -> float:
        coeffs_bytes = self.freq_coeffs.size * 8  # complex64
        indices_bytes = self.indices.size * 4  # int32
        return (coeffs_bytes + indices_bytes) / (1024**2)

    def __del__(self):
        try:
            MemoryManager.unregister(self)
        except Exception:
            pass  # interpreter shutdown

    def __repr__(self) -> str:
        return (
            f"SparseSpectralTensor(shape={self.shape}, sparsity={self.sparsity:.3f}, "
            f"n_coeffs={int(self.freq_coeffs.shape[0])}, "
            f"compression={self.compress_ratio():.1f}x, memory={self.memory_mb():.2f}MB)"
        )


class MemoryManager:
    """Global SST registry with a hard memory limit.

    Keeps the reference's semantics (fft_tensor/tensor.py:300-393): breach =>
    aggressive GC, then ``MemoryError`` if still over.  Device-level stats
    come from the TPU runtime instead of the CUDA allocator.
    """

    _tensors: List[SparseSpectralTensor] = []
    _max_memory_mb: int = 5000

    @classmethod
    def register(cls, tensor: SparseSpectralTensor) -> None:
        cls._tensors.append(tensor)
        cls._check_memory()

    @classmethod
    def unregister(cls, tensor: SparseSpectralTensor) -> None:
        try:
            cls._tensors.remove(tensor)
        except ValueError:
            pass

    @classmethod
    def total_memory_mb(cls) -> float:
        cls._tensors = [t for t in cls._tensors if t is not None]
        return sum(t.memory_mb() for t in cls._tensors)

    @classmethod
    def _check_memory(cls) -> None:
        total = cls.total_memory_mb()
        if total > cls._max_memory_mb:
            gc.collect()
            total = cls.total_memory_mb()
            if total > cls._max_memory_mb:
                raise MemoryError(
                    f"SST memory limit exceeded: {total:.1f}MB / {cls._max_memory_mb}MB\n"
                    f"Consider:\n"
                    f"  1. Increasing sparsity\n"
                    f"  2. Processing in smaller batches\n"
                    f"  3. Calling MemoryManager.clear_all()"
                )

    @classmethod
    def set_limit(cls, mb: int) -> None:
        if mb <= 0:
            raise ValueError("Memory limit must be positive")
        cls._max_memory_mb = int(mb)

    @classmethod
    def clear_all(cls) -> None:
        cls._tensors.clear()
        gc.collect()
        jax.clear_caches()

    @classmethod
    def get_stats(cls) -> dict:
        stats = {
            "n_tensors": len(cls._tensors),
            "total_memory_mb": cls.total_memory_mb(),
            "limit_mb": cls._max_memory_mb,
            "utilization": cls.total_memory_mb() / cls._max_memory_mb,
        }
        try:
            dev_stats = jax.local_devices()[0].memory_stats()
            if dev_stats:
                stats["device_bytes_in_use"] = dev_stats.get("bytes_in_use")
                stats["device_bytes_limit"] = dev_stats.get("bytes_limit")
        except Exception:
            pass
        return stats


# Convenience constructors (reference: tensor.py:397-411)
def sst(data, sparsity: float = 0.05) -> SparseSpectralTensor:
    """Quick SST creation."""
    return SparseSpectralTensor(data=data, sparsity=sparsity)


def zeros_sst(shape: Tuple[int, ...], sparsity: float = 0.05) -> SparseSpectralTensor:
    return SparseSpectralTensor(data=jnp.zeros(shape), sparsity=sparsity)


def randn_sst(shape: Tuple[int, ...], sparsity: float = 0.05, seed: int = 0) -> SparseSpectralTensor:
    return SparseSpectralTensor(data=jax.random.normal(jax.random.PRNGKey(seed), shape), sparsity=sparsity)
