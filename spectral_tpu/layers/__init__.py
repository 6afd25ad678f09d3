"""spectral_tpu.layers — spectral NN layers (reference L3).

Flax re-expressions of fft_tensor/spectral_layers.py, complex_rope.py,
spectral_enhancements.py and byte_spectral*.py.
"""

from spectral_tpu.layers.spectral_layers import (
    SpectralMixingLayer,
    SpectralMLPBlock,
    HybridSpectralAttention,
    WirtingerSpectralFilter,
)
from spectral_tpu.layers.complex_rope import (
    ComplexRoPE,
    ComplexRoPESpectralLayer,
    GatedLinearUnit,
)
from spectral_tpu.layers.spectral_enhancements import (
    CausalFrequencyMask,
    EnhancedSpectralBlock,
    GatedSpectralUnit,
    MultiScaleSpectralFeatures,
    PhaseAwareSpectralMixing,
    RotaryFrequencyEmbedding,
)
from spectral_tpu.layers.byte_spectral import (
    ByteSpectralEmbedding,
    ByteSpectralEncoder,
    CharacterLevelSpectral,
    SpectralLanguageModel,
    TritonByteEncoder,
    TritonSpectralLanguageModel,
)

__all__ = [
    "SpectralMixingLayer",
    "SpectralMLPBlock",
    "HybridSpectralAttention",
    "WirtingerSpectralFilter",
    "ComplexRoPE",
    "ComplexRoPESpectralLayer",
    "GatedLinearUnit",
    "CausalFrequencyMask",
    "EnhancedSpectralBlock",
    "GatedSpectralUnit",
    "MultiScaleSpectralFeatures",
    "PhaseAwareSpectralMixing",
    "RotaryFrequencyEmbedding",
    "ByteSpectralEmbedding",
    "ByteSpectralEncoder",
    "CharacterLevelSpectral",
    "SpectralLanguageModel",
    "TritonByteEncoder",
    "TritonSpectralLanguageModel",
]
