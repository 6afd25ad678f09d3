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

    def _update_ri(self, sre, sim, fre, fim):
        """One EMA step on REAL/IMAG planes ([B, F] fp32 each).

        Same arithmetic as the complex form, spelled out on pairs — the
        tunneled TPU backend hangs compiling a lax.scan with a complex64
        carry (chip-bisected: ChunkLM+EMA forward never returned while the
        no-EMA twin ran fine), and real planes are the repo's standard
        workaround for backend complex gaps (core/tensor.py scatter,
        ops/pallas_spectral.py).  Complex multiply (a+bi)(c+di) =
        (ac-bd) + (ad+bc)i is exactly what XLA emits for complex64, so the
        numerics are bit-identical (CPU parity test pins it).
        """
        from spectral_tpu.ops.complex_utils import safe_magnitude_phase_ri

        a_cplx, rho, one_minus_rho = self.decay_params()
        if self.mode == "polar":
            m_prev, _ = safe_magnitude_phase_ri(sre, sim)
            m_cur, phi = safe_magnitude_phase_ri(fre, fim)
            m_new = rho[None] * m_prev + one_minus_rho[None] * m_cur
            return m_new * jnp.cos(phi), m_new * jnp.sin(phi)
        if self.mode != "aligned":
            raise ValueError(f"Unknown SpectralEMA mode: {self.mode}")
        a_re, a_im = jnp.real(a_cplx), jnp.imag(a_cplx)
        _, prev_ang = safe_magnitude_phase_ri(sre, sim)
        _, cur_ang = safe_magnitude_phase_ri(fre, fim)
        d = cur_ang - prev_ang
        rot_re, rot_im = jnp.cos(d), jnp.sin(d)
        al_re = sre * rot_re - sim * rot_im
        al_im = sre * rot_im + sim * rot_re
        new_re = a_re[None] * al_re - a_im[None] * al_im + one_minus_rho[None] * fre
        new_im = a_re[None] * al_im + a_im[None] * al_re + one_minus_rho[None] * fim
        return new_re, new_im

    def update(self, state: jax.Array, fft_chunk: jax.Array) -> jax.Array:
        """One EMA step.  state/fft_chunk: [B, F] complex64."""
        new_re, new_im = self._update_ri(
            jnp.real(state), jnp.imag(state),
            jnp.real(fft_chunk), jnp.imag(fft_chunk),
        )
        return jax.lax.complex(new_re, new_im)

    def scan(self, fft_chunks: jax.Array, init: Optional[jax.Array] = None) -> jax.Array:
        """EMA over a [B, S, F] complex chunk sequence -> final [B, F] state.

        The scan CARRY is a (re, im) pair of fp32 planes — never complex64
        (see _update_ri for the chip finding); input/output stay complex at
        the API boundary (in-graph complex compute is fine, only the
        complex scan carry hangs)."""
        B, S, F = fft_chunks.shape
        assert F == self.n_freqs
        if init is not None:
            s0 = (jnp.real(init), jnp.imag(init))
        else:
            z = jnp.zeros((B, F), jnp.float32)
            s0 = (z, z)
        seq = jnp.swapaxes(fft_chunks, 0, 1)

        def step(carry, chunk):
            new = self._update_ri(carry[0], carry[1],
                                  jnp.real(chunk), jnp.imag(chunk))
            return new, None

        (fre, fim), _ = jax.lax.scan(step, s0, seq)
        return jax.lax.complex(fre, fim)

    def __call__(self, fft_chunks: jax.Array, init: Optional[jax.Array] = None) -> jax.Array:
        return self.scan(fft_chunks, init)
