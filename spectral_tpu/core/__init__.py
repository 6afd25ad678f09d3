"""spectral_tpu.core — the spectral tensor core (reference L2, fft_tensor/).

Sparse spectral tensors, frequency-domain ops, zero-materialization linears
and convs, quantizers, adaptive dispatch, and the HF model converter.
"""

from spectral_tpu.core.tensor import (
    SparseSpectralTensor,
    MemoryManager,
    sst,
    zeros_sst,
    randn_sst,
)

__all__ = ["SparseSpectralTensor", "MemoryManager", "sst", "zeros_sst", "randn_sst"]
