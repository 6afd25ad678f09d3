"""spectral_tpu.core — the spectral tensor core (reference L2, fft_tensor/).

Sparse spectral tensors, frequency-domain ops, zero-materialization linears
and convs, quantizers, adaptive dispatch, and the HF model converter.

The export surface mirrors fft_tensor/__init__.py:10-50 (minus its import
side effects: no global memory-limit mutation, no banner print — importing
a library should not reconfigure the process).
"""

from spectral_tpu.core.frequency_ops import (
    ComplexSemanticEmbedding,
    FrequencyAttention,
    FrequencyMatMul,
    FrequencyTransformerLayer,
    frequency_layernorm,
    frequency_relu,
)
from spectral_tpu.core.ops import (
    ImplicitWeights,
    implicit_matmul,
    spectral_activation,
    spectral_backward,
    spectral_conv,
    spectral_normalize,
    spectral_pool,
)
from spectral_tpu.core.tensor import (
    MemoryManager,
    SparseSpectralTensor,
    randn_sst,
    sst,
    zeros_sst,
)

__all__ = [
    "SparseSpectralTensor",
    "MemoryManager",
    "sst",
    "zeros_sst",
    "randn_sst",
    "spectral_conv",
    "spectral_pool",
    "spectral_normalize",
    "spectral_activation",
    "ImplicitWeights",
    "implicit_matmul",
    "spectral_backward",
    "FrequencyMatMul",
    "FrequencyAttention",
    "ComplexSemanticEmbedding",
    "FrequencyTransformerLayer",
    "frequency_relu",
    "frequency_layernorm",
]
