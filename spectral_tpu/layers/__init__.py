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

__all__ = [
    "SpectralMixingLayer",
    "SpectralMLPBlock",
    "HybridSpectralAttention",
    "WirtingerSpectralFilter",
]
