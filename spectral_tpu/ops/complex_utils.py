"""Gradient-safe complex magnitude/phase decomposition.

JAX's autodiff of ``jnp.abs``/``jnp.angle`` at exactly 0+0j yields NaN
(d|z|/dz = z/|z|); torch defines the subgradient there as 0.  The curriculum
cutoff mask creates EXACT zeros in the spectrum, so every magnitude/phase
decomposition downstream of a masked spectrum (PhaseShift, SpectralLayerNorm,
magnitude dropout, frequency activations) must use these helpers or
frequency-native training NaNs as soon as the curriculum is active.

The double-where trick keeps forward values identical and routes the zero
entries' gradients through the constant branch (=> 0, the torch convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_magnitude_phase(z: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(|z|, angle(z)) with zero — not NaN — gradients at z == 0."""
    return safe_magnitude_phase_ri(jnp.real(z), jnp.imag(z))


def safe_magnitude_phase_ri(re: jax.Array, im: jax.Array) -> tuple[jax.Array, jax.Array]:
    """:func:`safe_magnitude_phase` on (re, im) PLANES — for code paths that
    must stay complex-dtype-free (e.g. scan carries; the tunneled TPU
    backend hangs on complex64 scan carries, models/spectral_ssm.py)."""
    zero = (re == 0) & (im == 0)
    re_s = jnp.where(zero, 1.0, re)
    im_s = jnp.where(zero, 0.0, im)
    mag = jnp.where(zero, 0.0, jnp.sqrt(re_s * re_s + im_s * im_s))
    phase = jnp.where(zero, 0.0, jnp.arctan2(im_s, re_s))
    return mag, phase


def polar(mag: jax.Array, phase: jax.Array) -> jax.Array:
    """mag * e^{i phase} via cos/sin (VPU-friendly, no complex exp)."""
    return jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))
