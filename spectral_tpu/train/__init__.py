"""spectral_tpu.train — curriculum schedules, data, trainer, sampling, ckpt."""

from spectral_tpu.train.schedules import (
    jpeg_cutoff,
    curriculum_cutoff,
    adaptive_cutoff,
    plateau_cutoff,
    sawtooth_lr,
    lr_stage_params,
)

__all__ = [
    "jpeg_cutoff",
    "curriculum_cutoff",
    "adaptive_cutoff",
    "plateau_cutoff",
    "sawtooth_lr",
    "lr_stage_params",
]
