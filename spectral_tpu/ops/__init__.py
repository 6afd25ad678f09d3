"""spectral_tpu.ops — kernel layer.

TPU-native equivalent of the reference's L1 native layer (the absent
``fft_tensor_cuda`` extension, setup.py:21-50, plus its Triton kernels).
Every op here has a pure-jnp reference implementation used as a parity gate,
mirroring the reference's CUDA-vs-PyTorch fallback design.
"""

from spectral_tpu.ops.fftc import (
    next_pow2,
    conv_freq_bins,
    cutoff_mask,
    causal_fft_conv,
    rfft_time,
    irfft_time,
)
from spectral_tpu.ops.wirtinger import (
    wirtinger_multiply,
    wirtinger_multiply_ri,
    frequency_conv,
    ComplexParameter,
    complex_init,
)
from spectral_tpu.ops.complex_utils import polar, safe_magnitude_phase

__all__ = [
    "next_pow2",
    "conv_freq_bins",
    "cutoff_mask",
    "causal_fft_conv",
    "rfft_time",
    "irfft_time",
    "wirtinger_multiply",
    "wirtinger_multiply_ri",
    "frequency_conv",
    "ComplexParameter",
    "complex_init",
    "polar",
    "safe_magnitude_phase",
]

# Pallas kernels import lazily (jax.experimental.pallas is heavy):
#   from spectral_tpu.ops.pallas_spectral import fused_spectral_conv
#   from spectral_tpu.ops.pallas_byte import byte_encode_pallas
