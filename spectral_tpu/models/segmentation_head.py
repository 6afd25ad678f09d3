"""The 1-neuron segmentation head: explicit word-boundary supervision.

Reference: fft_lm/segmentation_head.py.  Predicts "does the word end here?"
(next char is space/punct/newline) — one neuron of "rhythm" supervision that
fixes the "Space Virus" without any tokenizer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from spectral_tpu.train.evaluate import cross_entropy

_head_init = nn.initializers.normal(stddev=0.02)


class SegmentationHead(nn.Module):
    """Single-neuron word-boundary predictor (zero-init: starts undecided)."""

    d_model: int

    @nn.compact
    def __call__(self, hidden: jax.Array) -> jax.Array:
        out = nn.Dense(1, kernel_init=nn.initializers.zeros, name="head")(hidden)
        return out[..., 0]  # [B, T] logits


def get_word_boundaries(text_bytes: np.ndarray) -> np.ndarray:
    """[B, T] bytes -> [B, T] float boundary labels (vectorized).

    Position t is a boundary iff byte t+1 is space (32), punctuation
    (33-47, 58-64, 91-96, 123-126), or newline (10/13); the last position is
    always a boundary.
    """
    b = np.asarray(text_bytes)
    nxt = b[:, 1:]
    is_sep = (
        (nxt == 32)
        | ((nxt >= 33) & (nxt <= 47))
        | ((nxt >= 58) & (nxt <= 64))
        | ((nxt >= 91) & (nxt <= 96))
        | ((nxt >= 123) & (nxt <= 126))
        | (nxt == 10)
        | (nxt == 13)
    )
    out = np.zeros(b.shape, dtype=np.float32)
    out[:, :-1] = is_sep.astype(np.float32)
    out[:, -1] = 1.0
    return out


class SegmentedChunkLM(nn.Module):
    """Backbone + chunk char head + 1-neuron segmentation head."""

    backbone: nn.Module
    chunk: int

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        cutoff: Optional[jax.Array] = None,
        deterministic: bool = True,
        return_seg_logits: bool = True,
    ):
        h = self.backbone.forward_hidden(x, cutoff=cutoff, deterministic=deterministic)
        d_model = h.shape[-1]
        char_logits = nn.Dense(256, kernel_init=_head_init, name="char_head")(h[:, -self.chunk :, :])
        if return_seg_logits:
            seg_logits = SegmentationHead(d_model, name="seg_head")(h)
            return char_logits, seg_logits
        return char_logits


def compute_segmented_loss(
    char_logits: jax.Array,
    seg_logits: jax.Array,
    char_targets: jax.Array,
    seg_targets: jax.Array,
    char_weight: float = 1.0,
    seg_weight: float = 0.1,
):
    """total = char_weight*CE + seg_weight*BCE-with-logits."""
    char_loss = cross_entropy(char_logits, char_targets)
    seg = seg_logits.astype(jnp.float32)
    tgt = seg_targets.astype(jnp.float32)
    bce = jnp.maximum(seg, 0) - seg * tgt + jnp.log1p(jnp.exp(-jnp.abs(seg)))
    seg_loss = jnp.mean(bce)
    total = char_weight * char_loss + seg_weight * seg_loss
    return total, char_loss, seg_loss
