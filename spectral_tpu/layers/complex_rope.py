"""Complex RoPE: rotary position embeddings in the frequency domain.

Reference: fft_tensor/complex_rope.py.  "Timestamp the frequency components":
without position encoding, FFT features are a bag-of-words — rotating the
phase of pair k at position t by e^{i t theta_k} makes
"Dog bites Man" != "Man bites Dog".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _polar(mag, phase):
    return jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))


class ComplexRoPE(nn.Module):
    """Rotation e^{i * pos * theta_k} applied to a complex tensor; pairs of
    feature dims share a rotation (reference complex_rope.py:16-119).

    The rotation table is a fixed function of (max_seq_len, dim, base) — here
    it's computed at trace time and constant-folded by XLA (the reference
    precomputes a buffer).
    """

    dim: int
    max_seq_len: int = 4096
    base: float = 10000.0

    def _rotation(self, T: int) -> jax.Array:
        inv_freq = 1.0 / (self.base ** (jnp.arange(0, self.dim, 2, dtype=jnp.float32) / self.dim))
        t = jnp.arange(T, dtype=jnp.float32)
        freqs = jnp.outer(t, inv_freq)  # (T, dim//2)
        return _polar(jnp.ones_like(freqs), freqs)

    def __call__(self, x_freq: jax.Array) -> jax.Array:
        """x_freq: (B, T, D) complex -> rotated complex."""
        B, T, D = x_freq.shape
        if not jnp.iscomplexobj(x_freq):
            raise ValueError("ComplexRoPE requires complex input from FFT")
        rot = self._rotation(T)[None]  # (1, T, D//2)
        x_pairs = x_freq.reshape(B, T, D // 2, 2)
        x0 = x_pairs[..., 0] * rot
        x1 = x_pairs[..., 1] * rot
        return jnp.stack([x0, x1], axis=-1).reshape(B, T, D)

    def apply_to_fft(self, x: jax.Array) -> jax.Array:
        """Convenience: FFT -> RoPE -> IFFT on a real (B, T, D) tensor."""
        x_freq = jnp.fft.fft(x.astype(jnp.float32), axis=1)
        return jnp.fft.ifft(self(x_freq), axis=1).real.astype(x.dtype)


class GatedLinearUnit(nn.Module):
    """GLU for frequency selection: sigmoid(gate) * value -> out proj."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gate = jax.nn.sigmoid(nn.Dense(self.dim, name="gate_proj")(x))
        value = nn.Dense(self.dim, name="value_proj")(x)
        return nn.Dense(self.dim, name="out_proj")(gate * value)


class ComplexRoPESpectralLayer(nn.Module):
    """Full layer: FFT -> ComplexRoPE -> learnable complex filter -> IFFT ->
    GLU, with pre-norm residuals (reference complex_rope.py:162-226)."""

    dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        residual = x
        h = nn.LayerNorm(name="norm1")(x)

        x_freq = jnp.fft.fft(h.astype(jnp.float32), axis=1)
        x_freq = ComplexRoPE(self.dim, name="rope")(x_freq)
        f_real = self.param("freq_filter_real", nn.initializers.ones, (self.dim,))
        f_imag = self.param("freq_filter_imag", nn.initializers.zeros, (self.dim,))
        x_freq = x_freq * jax.lax.complex(f_real, f_imag)[None, None, :]
        h = jnp.fft.ifft(x_freq, axis=1).real.astype(x.dtype)

        x = residual + nn.Dropout(self.dropout)(h, deterministic=deterministic)

        residual = x
        h = nn.LayerNorm(name="norm2")(x)
        h = GatedLinearUnit(self.dim, name="glu")(h)
        return residual + nn.Dropout(self.dropout)(h, deterministic=deterministic)


def _self_test():  # pragma: no cover - CLI self-test (reference :229-309)
    """python -m spectral_tpu.layers.complex_rope"""
    import numpy as np

    print("COMPLEX ROPE TEST")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 256, 128)).astype(np.float32))
    rope = ComplexRoPE(dim=128)
    xf = jnp.fft.fft(x, axis=1)
    out = rope(xf)
    applied = np.mod(np.angle(np.asarray(out)) - np.angle(np.asarray(xf)), 2 * np.pi)
    print(f"  rotation at pos 1, pair 0: {applied[0,1,0]:.4f} rad (theta_0 = 1.0)")
    assert abs(applied[0, 1, 0] - 1.0) < 1e-2, "position must rotate phase"
    print("  [OK] Position changes phase")

    layer = ComplexRoPESpectralLayer(dim=128)
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == x.shape
    print("  [OK] Full ComplexRoPE spectral layer working")


if __name__ == "__main__":
    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    _self_test()
