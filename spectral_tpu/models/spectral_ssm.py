"""Spectral EMA — a tiny complex state-space memory over chunk spectra.

Reference: fft_lm/spectral_ssm.py:30-125.

Stable complex recurrence over rFFT'd byte chunks:

    H_t = a ⊙ H_{t-1} + (1 - ρ) ⊙ F_t,     a = ρ · e^{iθ}

* ρ = sigmoid(rho_logit) ∈ (0,1) — stability (no exploding resonance)
* θ = π · tanh(theta_raw) — optional phase rotation
* ``aligned`` mode rotates the previous state to the current chunk's phase
  before decaying (prevents destructive interference at phase gaps ~π);
  ``polar`` mode EMAs the magnitude and takes the current phase.

TPU-native: training runs the recurrence as one ``lax.scan`` (the reference
loops in Python); generation uses the same ``update`` as a carried state.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _polar(mag: jax.Array, phase: jax.Array) -> jax.Array:
    return jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))


class SpectralEMA(nn.Module):
    n_freqs: int
    rho_init: float = 0.95
    theta_init: float = 0.0
    mode: str = "aligned"  # "aligned" | "polar"

    def setup(self):
        rho_init = min(max(float(self.rho_init), 1e-4), 1 - 1e-4)
        rho_logit0 = math.log(rho_init / (1 - rho_init))
        self.rho_logit = self.param(
            "rho_logit", lambda k, s: jnp.full(s, rho_logit0, jnp.float32), (self.n_freqs,)
        )
        self.theta_raw = self.param(
            "theta_raw", lambda k, s: jnp.full(s, float(self.theta_init), jnp.float32), (self.n_freqs,)
        )

    def decay_params(self):
        rho = jax.nn.sigmoid(self.rho_logit)
        theta = math.pi * jnp.tanh(self.theta_raw)
        a = _polar(rho, theta)
        return a, rho, 1.0 - rho

    @staticmethod
    def init_state(batch: int, n_freqs: int) -> jax.Array:
        return jnp.zeros((batch, n_freqs), jnp.complex64)

    def update(self, state: jax.Array, fft_chunk: jax.Array) -> jax.Array:
        """One EMA step.  state/fft_chunk: [B, F] complex64."""
        a, rho, one_minus_rho = self.decay_params()

        from spectral_tpu.ops.complex_utils import safe_magnitude_phase

        if self.mode == "polar":
            m_prev, _ = safe_magnitude_phase(state)
            m_cur, phi = safe_magnitude_phase(fft_chunk)
            m_new = rho[None] * m_prev + one_minus_rho[None] * m_cur
            return _polar(m_new, phi)

        if self.mode != "aligned":
            raise ValueError(f"Unknown SpectralEMA mode: {self.mode}")

        # phase-aligned EMA: rotate prev state to the new signal's phase first
        _, prev_ang = safe_magnitude_phase(state)
        _, cur_ang = safe_magnitude_phase(fft_chunk)
        rot = _polar(jnp.ones_like(prev_ang), cur_ang - prev_ang)
        state_aligned = state * rot
        return a[None] * state_aligned + one_minus_rho[None].astype(jnp.complex64) * fft_chunk

    def scan(self, fft_chunks: jax.Array, init: Optional[jax.Array] = None) -> jax.Array:
        """EMA over a [B, S, F] complex chunk sequence -> final [B, F] state."""
        B, S, F = fft_chunks.shape
        assert F == self.n_freqs
        state = init if init is not None else self.init_state(B, F)

        def step(carry, chunk):
            new = self.update(carry, chunk)
            return new, None

        final, _ = jax.lax.scan(step, state, jnp.swapaxes(fft_chunks, 0, 1))
        return final

    def __call__(self, fft_chunks: jax.Array, init: Optional[jax.Array] = None) -> jax.Array:
        return self.scan(fft_chunks, init)
