"""spectral_tpu.models — the byte-level spectral LM zoo (reference L4, fft_lm/)."""

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.models.backbone import FixedSpectralBlock, FixedSpectralLM

__all__ = ["TrainConfig", "FixedSpectralBlock", "FixedSpectralLM"]
