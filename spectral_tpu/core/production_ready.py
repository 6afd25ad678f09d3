"""Honest adaptive dispatch + cached SST.

Reference: fft_tensor/production_ready.py:17-133 — "honest" means the
dispatcher picks whichever backend actually wins for the size at hand
(compression: FFT wins; small-kernel conv: direct/MXU wins), measured, not
assumed.
"""

from __future__ import annotations

from typing import Optional

import jax

from spectral_tpu.core.optimized_ops import OptimizedFrequencyOps
from spectral_tpu.core.tensor import SparseSpectralTensor


class ProductionFrequencyOps:
    """Adaptive dispatch between spectral and direct execution."""

    @staticmethod
    def compress(x: jax.Array, sparsity: float = 0.05) -> SparseSpectralTensor:
        """Compression is where FFT wins: top-k spectral beats int8 on ratio
        for smooth signals (the reference's honest benchmark)."""
        return SparseSpectralTensor(data=x, sparsity=sparsity)

    @staticmethod
    def conv1d(x: jax.Array, kernel: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
        """Small kernels: direct conv (MXU) wins; large kernels: FFT conv."""
        return OptimizedFrequencyOps.fast_frequency_conv1d(x, kernel, stride, padding)

    @staticmethod
    def conv2d(x: jax.Array, kernel: jax.Array, stride=(1, 1), padding=(0, 0)) -> jax.Array:
        return OptimizedFrequencyOps.fast_frequency_conv2d(x, kernel, stride, padding)

    @staticmethod
    def matmul(x: jax.Array, w_sst: SparseSpectralTensor) -> jax.Array:
        return OptimizedFrequencyOps.fast_frequency_matmul(x, w_sst)


class OptimizedSparseSpectralTensor(SparseSpectralTensor):
    """SST with a spatial-domain cache (reference production_ready.py).

    ``to_spatial`` is the hot call in mixed pipelines; cache the dense
    reconstruction until the coefficients change.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._spatial_cache: Optional[jax.Array] = None

    def to_spatial(self) -> jax.Array:
        if self._spatial_cache is None:
            self._spatial_cache = super().to_spatial()
        return self._spatial_cache

    def invalidate_cache(self) -> None:
        self._spatial_cache = None
