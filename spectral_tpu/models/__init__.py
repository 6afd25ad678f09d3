"""spectral_tpu.models — the byte-level spectral LM zoo (reference L4, fft_lm/)."""

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.models.backbone import FixedSpectralBlock, FixedSpectralLM
from spectral_tpu.models.bicameral import BicameralBlock, hemisphere_balance
from spectral_tpu.models.chunk_head import ChunkLM
from spectral_tpu.models.dual_head import DualHead, TokenAwareChunkLM, compute_dual_loss
from spectral_tpu.models.frequency_native import (
    FrequencyNativeBlock,
    PhaseShift,
    SpectralFFN,
    SpectralLayerNorm,
)
from spectral_tpu.models.phase_clock import (
    PhaseClockChunkLM,
    PhaseClockHead,
    compute_phase_clock_loss,
    generate_phase_targets,
)
from spectral_tpu.models.segmentation_head import (
    SegmentationHead,
    SegmentedChunkLM,
    compute_segmented_loss,
    get_word_boundaries,
)
from spectral_tpu.models.spectral_ssm import SpectralEMA

__all__ = [
    "TrainConfig", "FixedSpectralBlock", "FixedSpectralLM",
    "BicameralBlock", "hemisphere_balance", "ChunkLM",
    "DualHead", "TokenAwareChunkLM", "compute_dual_loss",
    "FrequencyNativeBlock", "PhaseShift", "SpectralFFN", "SpectralLayerNorm",
    "PhaseClockChunkLM", "PhaseClockHead", "compute_phase_clock_loss", "generate_phase_targets",
    "SegmentationHead", "SegmentedChunkLM", "compute_segmented_loss", "get_word_boundaries",
    "SpectralEMA",
]
