"""Byte-level spectral encoding: delete the tokenizer.

Reference: fft_tensor/byte_spectral.py, byte_spectral_model.py,
triton_byte_encoder.py / byte_spectral_triton.py.

Text as waveform: raw UTF-8 bytes normalized to [-1, 1], FFT over the
sequence; magnitude = content (shift-invariant), phase = position.  No
embedding table (the headline 94.9% embedding-param savings).

TPU-native wins (outputs identical to the reference, asymptotics not):

* ``ByteSpectralEmbedding`` — the reference computes a FRESH FFT of the
  rolled signal per position (O(T^2 log T), byte_spectral_model.py:63-97).
  By the DFT shift theorem  fft(roll(s, -p))[f] = fft(s)[f] * e^{+2pi i f p/T},
  so ONE fft plus a phase ramp reproduces every per-position spectrum
  exactly: O(T*k) total.
* ``byte_dft_features`` — the reference's Triton kernel computes per-
  (pos, dim) DFT magnitudes at frequency (pos*dim) mod T
  (triton_byte_encoder.py:20-74).  All of those are entries of the one
  length-T DFT, so the kernel collapses to fft + gather.  (The Triton
  source actually held its phase constant over t — a bug that made every
  feature equal |sum(s)|; we implement the documented intent.  The
  Pallas MXU cos/sin-matmul variant lives in spectral_tpu.ops.pallas_byte.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from spectral_tpu.layers.spectral_layers import SpectralMLPBlock


class ByteSpectralEncoder(nn.Module):
    """Whole-sequence spectral signature -> MLP -> broadcast embedding.

    Reference byte_spectral.py:20-108: one spectral feature vector per
    SEQUENCE (magnitude + sin/cos phase of the lowest k bins), projected and
    broadcast to every position.
    """

    embed_dim: int = 256
    max_freq_components: int = 512

    @nn.compact
    def __call__(self, byte_ids: jax.Array) -> jax.Array:
        B, T = byte_ids.shape
        freq_weights = self.param("freq_weights", nn.initializers.ones, (self.max_freq_components,))

        signal = (byte_ids.astype(jnp.float32) / 127.5) - 1.0
        signal_freq = jnp.fft.fft(signal, axis=1)  # (B, T)

        k = min(self.max_freq_components, T // 2)
        magnitude = jnp.abs(signal_freq[:, :k]) * freq_weights[:k]
        phase = jnp.angle(signal_freq[:, :k])
        feats = jnp.concatenate([magnitude, jnp.sin(phase), jnp.cos(phase)], axis=-1)  # (B, 3k)

        want = self.max_freq_components * 2
        if feats.shape[-1] < want:
            feats = jnp.pad(feats, ((0, 0), (0, want - feats.shape[-1])))
        else:
            feats = feats[:, :want]

        h = nn.Dense(self.embed_dim * 2, name="proj_in")(feats)
        h = nn.LayerNorm(name="proj_ln")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.embed_dim, name="proj_out")(h)
        return jnp.broadcast_to(h[:, None, :], (B, T, self.embed_dim))


class CharacterLevelSpectral(nn.Module):
    """Char value -> linear -> low-pass FFT mixing along the sequence.

    Reference byte_spectral.py:111-153 (its per-dim Python FFT loop is one
    batched FFT here — identical output)."""

    embed_dim: int = 256

    @nn.compact
    def __call__(self, char_ids: jax.Array) -> jax.Array:
        B, T = char_ids.shape
        chars_norm = char_ids.astype(jnp.float32)[..., None] / 255.0
        emb = nn.Dense(self.embed_dim, name="char_to_freq")(chars_norm)  # (B, T, D)

        freq = jnp.fft.fft(emb, axis=1)
        k = T // 4
        bins = jnp.arange(T)
        # keep bins [0,k) and the mirrored top-k tail (the reference zeroes
        # freq[:, k:-k])
        mask = ((bins < k) | (bins >= T - k)).astype(jnp.float32)
        return jnp.fft.ifft(freq * mask[None, :, None], axis=1).real


def analyze_text_spectrum(text: str) -> dict:
    """Shift-invariance demo (reference byte_spectral.py:156-249): shifting
    text changes phase, not magnitude."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.float32)
    signal = (b / 127.5) - 1.0
    spec = np.fft.fft(signal)
    shifted = np.roll(signal, 3)
    spec_shift = np.fft.fft(shifted)
    return {
        "magnitude": np.abs(spec),
        "phase": np.angle(spec),
        "magnitude_shift_invariant": bool(np.allclose(np.abs(spec), np.abs(spec_shift), atol=1e-4)),
        "phase_changed": not np.allclose(np.angle(spec), np.angle(spec_shift), atol=1e-3),
    }


class ByteSpectralEmbedding(nn.Module):
    """Per-position spectral features via the DFT shift theorem (exact, fast).

    Feature layout per position p (byte_spectral_model.py:60-97):
    [mag * freq_bands, sin(phase_p), cos(phase_p)] of the lowest k bins of
    fft(roll(signal, -p)), padded to embed_dim, then a 2-layer MLP.
    """

    embed_dim: int = 256
    max_seq_len: int = 512

    @nn.compact
    def __call__(self, byte_ids: jax.Array) -> jax.Array:
        B, T = byte_ids.shape
        freq_bands = self.param("freq_bands", nn.initializers.ones, (self.embed_dim // 2,))

        signal = (byte_ids.astype(jnp.float32) / 127.5) - 1.0
        base = jnp.fft.fft(signal, axis=1)  # (B, T)
        k = min(self.embed_dim // 2, T // 2)

        # shift theorem: spectrum_p[f] = base[f] * e^{2pi i f p / T}
        mag = jnp.abs(base[:, :k]) * freq_bands[:k]  # (B, k) — position-independent
        base_phase = jnp.angle(base[:, :k])  # (B, k)
        f = jnp.arange(k, dtype=jnp.float32)
        p = jnp.arange(T, dtype=jnp.float32)
        ramp = 2.0 * jnp.pi * p[:, None] * f[None, :] / T  # (T, k)
        phase = base_phase[:, None, :] + ramp[None]  # (B, T, k)

        feats = jnp.concatenate(
            [jnp.broadcast_to(mag[:, None, :], (B, T, k)), jnp.sin(phase), jnp.cos(phase)], axis=-1
        )  # (B, T, 3k)
        if feats.shape[-1] < self.embed_dim:
            feats = jnp.pad(feats, ((0, 0), (0, 0), (0, self.embed_dim - feats.shape[-1])))
        else:
            feats = feats[..., : self.embed_dim]

        h = nn.Dense(self.embed_dim * 2, name="proj_in")(feats)
        h = nn.LayerNorm(name="proj_ln")(h)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.embed_dim, name="proj_out")(h)


class SpectralLanguageModel(nn.Module):
    """Byte LM: spectral embedding + SpectralMLPBlock stack + 256-way head.

    Reference byte_spectral_model.py:105-208.
    """

    embed_dim: int = 256
    num_layers: int = 6
    max_seq_len: int = 512
    dropout: float = 0.1

    @nn.compact
    def __call__(self, byte_ids: jax.Array, deterministic: bool = True) -> jax.Array:
        h = ByteSpectralEmbedding(self.embed_dim, self.max_seq_len, name="byte_encoder")(byte_ids)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        for i in range(self.num_layers):
            h = SpectralMLPBlock(self.embed_dim, dropout=self.dropout, name=f"layer_{i}")(
                h, deterministic=deterministic
            )
        h = nn.LayerNorm(name="norm")(h)
        return nn.Dense(256, name="output")(h)

    def generate(self, params, prompt_bytes: list[int], max_new: int = 64, temperature: float = 0.8, seed: int = 0):
        """Simple AR sampling loop (byte_spectral_model.py .generate)."""
        rng = np.random.default_rng(seed)
        ctx = list(prompt_bytes)
        for _ in range(max_new):
            window = ctx[-self.max_seq_len :]
            x = jnp.asarray(np.asarray(window, np.int32)[None])
            logits = np.asarray(self.apply(params, x)[0, -1], np.float64) / temperature
            z = logits - logits.max()
            probs = np.exp(z)
            probs /= probs.sum()
            ctx.append(int(rng.choice(256, p=probs)))
        return ctx


def byte_dft_features(byte_ids: jax.Array, embed_dim: int) -> jax.Array:
    """Per-(pos, dim) DFT magnitude features — pure-jnp reference.

    feature[b, p, d] = |DFT_T(signal_b)[(p*d) mod T]|  via fft + gather
    (the documented intent of the reference Triton kernel,
    triton_byte_encoder.py:20-74).
    """
    B, T = byte_ids.shape
    signal = (byte_ids.astype(jnp.float32) / 127.5) - 1.0
    mag = jnp.abs(jnp.fft.fft(signal, axis=1))  # (B, T)
    p = jnp.arange(T)[:, None]
    d = jnp.arange(embed_dim)[None, :]
    freq_idx = (p * d) % T  # (T, D)
    return mag[:, freq_idx]  # (B, T, D)


class TritonByteEncoder(nn.Module):
    """DFT-magnitude byte encoder + learned projection (reference
    triton_byte_encoder.py:77-160; 'Triton' kept in the name for API parity —
    the fast path on TPU is the fused Pallas kernel, else fft+gather)."""

    embed_dim: int = 256
    max_seq_len: int = 512
    use_pallas: bool = False

    @nn.compact
    def __call__(self, byte_ids: jax.Array) -> jax.Array:
        if self.use_pallas:
            from spectral_tpu.ops.pallas_byte import byte_encode_pallas

            feats = byte_encode_pallas(byte_ids, self.embed_dim)
        else:
            feats = byte_dft_features(byte_ids, self.embed_dim)
        h = nn.Dense(self.embed_dim * 2, name="proj_in")(feats)
        h = nn.LayerNorm(name="proj_ln")(h)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.embed_dim, name="proj_out")(h)


class TritonSpectralLanguageModel(nn.Module):
    """Byte LM over the DFT-feature encoder (byte_spectral_triton.py:70-232)."""

    embed_dim: int = 256
    num_layers: int = 4
    max_seq_len: int = 512
    dropout: float = 0.1
    use_pallas: bool = False

    @nn.compact
    def __call__(self, byte_ids: jax.Array, deterministic: bool = True) -> jax.Array:
        h = TritonByteEncoder(self.embed_dim, self.max_seq_len, self.use_pallas, name="encoder")(byte_ids)
        for i in range(self.num_layers):
            h = SpectralMLPBlock(self.embed_dim, dropout=self.dropout, name=f"layer_{i}")(
                h, deterministic=deterministic
            )
        h = nn.LayerNorm(name="norm")(h)
        return nn.Dense(256, name="output")(h)


def _self_test():  # pragma: no cover - CLI self-test
    """python -m spectral_tpu.layers.byte_spectral"""
    import numpy as np

    print("BYTE-SPECTRAL TEST")
    r = analyze_text_spectrum("the cat sat on the mat")
    print(f"  magnitude shift-invariant: {r['magnitude_shift_invariant']}  phase changed: {r['phase_changed']}")
    assert r["magnitude_shift_invariant"] and r["phase_changed"]

    x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 64)).astype(np.int32))
    emb = ByteSpectralEmbedding(embed_dim=32)
    p = emb.init(jax.random.PRNGKey(0), x)
    print(f"  ByteSpectralEmbedding: {emb.apply(p, x).shape} [OK] (no embedding table)")

    lm = SpectralLanguageModel(embed_dim=32, num_layers=1, max_seq_len=64, dropout=0.0)
    pl_ = lm.init(jax.random.PRNGKey(0), x)
    print(f"  SpectralLanguageModel logits: {lm.apply(pl_, x).shape} [OK]")
    print("ALL BYTE-SPECTRAL TESTS PASSED")


if __name__ == "__main__":
    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    _self_test()
