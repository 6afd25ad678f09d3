"""Chunk-predicting head: non-autoregressive N-bytes-at-once prediction.

Reference: fft_lm/chunk_head.py:16-79.  Enables "piston engine" generation:
one backbone pass predicts a whole chunk of future bytes.

Optional SpectralEMA path: rFFT of normalized byte chunks scanned through the
complex EMA gives an "infinite memory" summary added to the last hidden state.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spectral_tpu.models.spectral_ssm import SpectralEMA

_head_init = nn.initializers.normal(stddev=0.01)


class ChunkLM(nn.Module):
    """Backbone + non-AR chunk head (+ optional spectral-EMA memory).

    ``backbone`` is any FixedSpectralLM-compatible module (standard /
    frequency-native / bicameral).
    """

    backbone: nn.Module
    chunk: int
    use_ema: bool = False
    ema_chunk_len: int = 16
    ema_rho_init: float = 0.95
    ema_mode: str = "aligned"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        cutoff: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """x: [B, T] int32 -> logits [B, chunk, 256] for the next chunk."""
        h = self.backbone.forward_hidden(x, cutoff=cutoff, deterministic=deterministic)
        last = h[:, -1, :]  # [B, C]
        d_model = last.shape[-1]

        if self.use_ema:
            B, T = x.shape
            L = self.ema_chunk_len
            n_chunks = T // L
            if n_chunks > 0:
                n_freqs = L // 2 + 1
                xx = x[:, : n_chunks * L].reshape(B, n_chunks, L).astype(jnp.float32)
                xx = (xx / 127.5) - 1.0  # normalize bytes to [-1, 1]
                fft_chunks = jnp.fft.rfft(xx, axis=-1)  # [B, S, F] complex
                ema = SpectralEMA(
                    n_freqs=n_freqs, rho_init=self.ema_rho_init, mode=self.ema_mode, name="ema"
                )
                ema_state = ema.scan(fft_chunks)  # [B, F] complex
                # view_as_real layout: (re, im) interleaved per frequency
                feat = jnp.stack([jnp.real(ema_state), jnp.imag(ema_state)], axis=-1).reshape(B, -1)
                proj = nn.Dense(d_model, kernel_init=_head_init, name="ema_proj")
                last = last + proj(feat.astype(last.dtype))

        head = nn.Dense(256 * self.chunk, kernel_init=_head_init, name="head")
        flat = head(last)  # [B, chunk*256]
        return flat.reshape(x.shape[0], self.chunk, 256)
