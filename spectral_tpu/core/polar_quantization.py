"""Polar quantization of complex spectra: log-magnitude + linear phase.

Reference: fft_tensor/polar_quantization.py.

Phase carries the semantics, so it gets more bits: the recommended config is
4-bit magnitude (16 log-scale levels, adaptive range) + 8-bit phase (256
levels = 1.41 degrees) => 12 bits vs 64-bit complex64 = 5.33x compression at
~14% reconstruction error.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PolarQuantizer:
    def __init__(self, mag_bits: int = 4, phase_bits: int = 8):
        self.mag_bits = int(mag_bits)
        self.phase_bits = int(phase_bits)
        self.mag_levels = 2**self.mag_bits
        self.phase_levels = 2**self.phase_bits
        # codes must hold levels-1 without wrapping: >8 bits needs uint16
        self._mag_dtype = jnp.uint8 if self.mag_levels <= 256 else jnp.uint16
        self._phase_dtype = jnp.uint8 if self.phase_levels <= 256 else jnp.uint16
        self.mag_range: Optional[Tuple[float, float]] = None

    def quantize(self, z: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """complex64 -> (uint8 magnitude codes, uint8 phase codes)."""
        mag = jnp.abs(z)
        phase = jnp.angle(z)

        log_mag = jnp.log2(jnp.clip(mag, 1e-9, None))
        if self.mag_range is None:
            self.mag_range = (float(jnp.min(log_mag)), float(jnp.max(log_mag)))
        mag_min, mag_max = self.mag_range
        mag_norm = (log_mag - mag_min) / (mag_max - mag_min + 1e-9)
        mag_q = jnp.clip(jnp.round(mag_norm * (self.mag_levels - 1)), 0, self.mag_levels - 1).astype(
            self._mag_dtype
        )

        phase_norm = (phase + np.pi) / (2 * np.pi)
        phase_q = jnp.clip(jnp.round(phase_norm * (self.phase_levels - 1)), 0, self.phase_levels - 1).astype(
            self._phase_dtype
        )
        return mag_q, phase_q

    def dequantize(self, mag_q: jax.Array, phase_q: jax.Array) -> jax.Array:
        """(uint8, uint8) -> complex64."""
        assert self.mag_range is not None, "quantize() must run first (adaptive range)"
        mag_min, mag_max = self.mag_range
        mag_norm = mag_q.astype(jnp.float32) / (self.mag_levels - 1)
        log_mag = mag_norm * (mag_max - mag_min) + mag_min
        mag = jnp.power(2.0, log_mag)

        phase_norm = phase_q.astype(jnp.float32) / (self.phase_levels - 1)
        phase = phase_norm * 2 * np.pi - np.pi
        return jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))

    def compression_ratio(self) -> float:
        return 64.0 / (self.mag_bits + self.phase_bits)

    def phase_precision_degrees(self) -> float:
        return 360.0 / self.phase_levels


def sweep(seed: int = 0) -> list:
    """The reference's bit-allocation comparison (polar_quantization.py:59-111)."""
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    z = ((jax.random.normal(k1, (256, 128)) + 1j * jax.random.normal(k2, (256, 128))) * 0.5).astype(
        jnp.complex64
    )
    results = []
    for mag_bits, phase_bits, label in [(3, 5, "Extreme"), (4, 8, "Balanced"), (6, 10, "High-quality")]:
        q = PolarQuantizer(mag_bits=mag_bits, phase_bits=phase_bits)
        z_recon = q.dequantize(*q.quantize(z))
        error = float(jnp.linalg.norm(z_recon - z) / jnp.linalg.norm(z))
        results.append(
            {
                "label": label,
                "bits": mag_bits + phase_bits,
                "error": error,
                "compression": q.compression_ratio(),
                "phase_precision_deg": q.phase_precision_degrees(),
            }
        )
    return results


if __name__ == "__main__":
    for r in sweep():
        print(
            f"{r['label']}: {r['bits']} bits | error {r['error']*100:.1f}% | "
            f"compression {r['compression']:.2f}x | phase {r['phase_precision_deg']:.2f} deg"
        )
