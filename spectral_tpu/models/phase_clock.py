"""The phase-clock head: words as rotating waves.

Reference: fft_lm/phase_clock.py.  A 2-neuron head predicts an (x, y) phase
vector per position: within a word the target sweeps 0 -> pi (a half wave
cycle), spaces/punctuation map to the origin.  The model cannot jump from
mid-word phase to the origin — the wave must complete — which holds letters
together ("no more 't e s t' letter islands").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from spectral_tpu.train.evaluate import cross_entropy

_head_init = nn.initializers.normal(stddev=0.02)


class PhaseClockHead(nn.Module):
    """2-neuron (x, y) phase-vector head (zero-init)."""

    d_model: int

    @nn.compact
    def __call__(self, hidden: jax.Array) -> jax.Array:
        return nn.Dense(2, kernel_init=nn.initializers.zeros, name="head")(hidden)  # [B, T, 2]


def generate_phase_targets(text_bytes: np.ndarray) -> np.ndarray:
    """[B, T] bytes -> [B, T, 2] phase targets (vectorized per row).

    Word separators for this head are space + punctuation 33-47/58-64
    (reference phase_clock.py:89 — note: narrower than the segmentation
    head's set; preserved).  Each word of length L gets angles
    linspace(0, pi, L); separators get the origin.
    """
    x = np.asarray(text_bytes)
    B, T = x.shape
    sep = (x == 32) | ((x >= 33) & (x <= 47)) | ((x >= 58) & (x <= 64))
    out = np.zeros((B, T, 2), dtype=np.float32)
    idx = np.arange(T)

    for b in range(B):
        s = sep[b]
        nonsep = ~s
        if not nonsep.any():
            continue
        starts = nonsep & np.concatenate([[True], s[:-1]])
        # start index of the run covering each position
        start_marks = np.where(starts, idx, -1)
        start_per_pos = np.maximum.accumulate(start_marks)
        pos_in_run = idx - start_per_pos
        # run ids (1-based on starts), 0 elsewhere
        run_id = np.cumsum(starts)
        lens = np.bincount(run_id[nonsep], minlength=int(run_id.max()) + 1)
        L = lens[run_id]
        denom = np.maximum(L - 1, 1).astype(np.float32)
        ang = np.pi * pos_in_run.astype(np.float32) / denom
        ang = np.where(L == 1, 0.0, ang)  # torch.linspace(0, pi, 1) == [0]
        out[b, :, 0] = np.where(nonsep, np.cos(ang), 0.0)
        out[b, :, 1] = np.where(nonsep, np.sin(ang), 0.0)
    return out


class PhaseClockChunkLM(nn.Module):
    """Backbone + chunk char head + 2-neuron phase-clock head."""

    backbone: nn.Module
    chunk: int

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        cutoff: Optional[jax.Array] = None,
        deterministic: bool = True,
        return_phase_vectors: bool = True,
    ):
        h = self.backbone.forward_hidden(x, cutoff=cutoff, deterministic=deterministic)
        d_model = h.shape[-1]
        char_logits = nn.Dense(256, kernel_init=_head_init, name="char_head")(h[:, -self.chunk :, :])
        if return_phase_vectors:
            phase_vectors = PhaseClockHead(d_model, name="phase_head")(h)
            return char_logits, phase_vectors
        return char_logits


def compute_phase_clock_loss(
    char_logits: jax.Array,
    phase_vectors: jax.Array,
    char_targets: jax.Array,
    phase_targets: jax.Array,
    char_weight: float = 1.0,
    phase_weight: float = 5.0,
):
    """total = char_weight*CE + phase_weight*MSE (phase values are small,
    hence the 5.0 default weight)."""
    char_loss = cross_entropy(char_logits, char_targets)
    phase_loss = jnp.mean((phase_vectors.astype(jnp.float32) - phase_targets.astype(jnp.float32)) ** 2)
    total = char_weight * char_loss + phase_weight * phase_loss
    return total, char_loss, phase_loss
