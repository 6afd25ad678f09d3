"""spectral_tpu — a TPU-native spectral deep-learning framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the
``fricker2025-star/Tensor-Cuda-FFT-`` reference (see SURVEY.md):

* a frequency-domain tensor core (``spectral_tpu.core``): sparse spectral
  tensors, Wirtinger-calculus complex gradients, zero-materialization
  frequency-domain linear/conv ops, polar/log8 quantization, HF converter;
* spectral NN layers (``spectral_tpu.layers``): spectral mixing, complex
  RoPE, enhancement blocks, byte-spectral encoders;
* a byte-level spectral LM zoo (``spectral_tpu.models``): causal
  FFT-convolution backbone with standard / frequency-native / bicameral
  blocks, chunk / dual / segmentation / phase-clock heads, spectral-EMA SSM;
* a training stack (``spectral_tpu.train``): spectral curriculum (JPEG /
  plateau-rule cutoff), sawtooth LR restarts, byte-corpus loaders,
  checkpointing with SHA-256 integrity;
* streaming decoders (``spectral_tpu.streaming``): exact overlap-save and
  O(K)-per-token FIR state updates as ``lax.scan``-able functions;
* TPU kernels (``spectral_tpu.ops``): fused Pallas spectral-filter kernels,
  byte→spectral encoders, top-k sparsify, plus pure-jnp references used as
  parity gates (mirroring the reference's CUDA-vs-PyTorch fallback design,
  /root/reference/fft_tensor/tensor.py:13-18);
* multi-chip parallelism (``spectral_tpu.parallel``): device meshes,
  batch/tensor/sequence sharding with XLA collectives over ICI.

Unlike the reference's ``fft_tensor/__init__.py:53-56`` this package has NO
import side effects (no global memory limit mutation, no banner).
"""

__version__ = "0.1.0"

# Re-export the flat public surface lazily to keep `import spectral_tpu` cheap
# (JAX-heavy submodules are only pulled in when first touched).
_EXPORTS = {
    # core tensor (reference: fft_tensor/tensor.py)
    "SparseSpectralTensor": "spectral_tpu.core.tensor",
    "sst": "spectral_tpu.core.tensor",
    "zeros_sst": "spectral_tpu.core.tensor",
    "randn_sst": "spectral_tpu.core.tensor",
    "MemoryManager": "spectral_tpu.core.tensor",
    # layers (reference: fft_tensor/spectral_layers.py)
    "SpectralMixingLayer": "spectral_tpu.layers.spectral_layers",
    "SpectralMLPBlock": "spectral_tpu.layers.spectral_layers",
    "HybridSpectralAttention": "spectral_tpu.layers.spectral_layers",
    # wirtinger (reference: fft_tensor/wirtinger_ops.py)
    "wirtinger_multiply": "spectral_tpu.ops.wirtinger",
    "ComplexParameter": "spectral_tpu.ops.wirtinger",
    "WirtingerSpectralFilter": "spectral_tpu.layers.spectral_layers",
    # models (reference: fft_lm/train_fixed_full.py)
    "TrainConfig": "spectral_tpu.models.config",
    "FixedSpectralBlock": "spectral_tpu.models.backbone",
    "FixedSpectralLM": "spectral_tpu.models.backbone",
    # SST ops (reference: fft_tensor/ops.py)
    "spectral_conv": "spectral_tpu.core.ops",
    "spectral_pool": "spectral_tpu.core.ops",
    "spectral_normalize": "spectral_tpu.core.ops",
    "spectral_activation": "spectral_tpu.core.ops",
    "ImplicitWeights": "spectral_tpu.core.ops",
    "implicit_matmul": "spectral_tpu.core.ops",
    "spectral_backward": "spectral_tpu.core.ops",
    # frequency ops (reference: fft_tensor/frequency_ops.py)
    "FrequencyMatMul": "spectral_tpu.core.frequency_ops",
    "FrequencyAttention": "spectral_tpu.core.frequency_ops",
    "ComplexSemanticEmbedding": "spectral_tpu.core.frequency_ops",
    "FrequencyTransformerLayer": "spectral_tpu.core.frequency_ops",
    "frequency_relu": "spectral_tpu.core.frequency_ops",
    "frequency_layernorm": "spectral_tpu.core.frequency_ops",
    # zero-materialization (reference: fft_tensor/zero_materialize.py)
    "ConvolutionTheoremMatMul": "spectral_tpu.core.zero_materialize",
    "FrequencyLinearLayer": "spectral_tpu.core.zero_materialize",
    "LogarithmicQuantizer": "spectral_tpu.core.zero_materialize",
    "frequency_linear": "spectral_tpu.core.zero_materialize",
    "frequency_conv1d": "spectral_tpu.core.zero_materialize",
    "frequency_conv2d": "spectral_tpu.core.zero_materialize",
    "frequency_conv3d": "spectral_tpu.core.zero_materialize",
    # quantization / conversion
    "PolarQuantizer": "spectral_tpu.core.polar_quantization",
    "FFTConverter": "spectral_tpu.core.llamaizer",
    "FFTLlama": "spectral_tpu.core.llamaizer",
    "FFTGPT": "spectral_tpu.core.llamaizer",
    "FFTBERT": "spectral_tpu.core.llamaizer",
}


def __getattr__(name):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module 'spectral_tpu' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), name)


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))
