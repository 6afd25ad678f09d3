"""Frequency-native components: the block that never leaves the spectrum.

TPU-native re-expression of reference fft_lm/frequency_native.py:

* ``PhaseShift``      — unitary nonlinearity via learned phase rotation
  (:22-77), implemented with cos/sin instead of complex exp (the target TPU
  backend's complex transcendentals are limited; cos/sin lower to the VPU).
* ``SpectralLayerNorm`` — magnitude LayerNorm preserving phase (:205-241).
* ``SpectralFFN``     — complex FFN with shared real/imag linears (:124-202).
* ``FrequencyNativeBlock`` — rfft -> custom-vjp freq conv -> gates -> cutoff
  -> SpectralFFN residual in the frequency domain -> single irfft (:244-362).

All complex math stays fp32/complex64 (the reference explicitly disables AMP
for this mode, scripts/train_frequency_native.py:70-72).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spectral_tpu.ops.fftc import (
    conv_freq_bins,
    conv_n_fft,
    cutoff_mask,
    irfft_time,
    kernel_rfft,
    rfft_time,
)
from spectral_tpu.ops.complex_utils import safe_magnitude_phase
from spectral_tpu.ops.wirtinger import frequency_conv

_small_normal = nn.initializers.normal(stddev=0.01)
_kernel_init = nn.initializers.normal(stddev=0.001)


def _gate_bias_init(key, shape, dtype=jnp.float32):
    return jnp.full(shape, 2.0, dtype)


def _polar(mag: jax.Array, phase: jax.Array) -> jax.Array:
    """mag * e^{i phase} via cos/sin (VPU-friendly, no complex exp)."""
    return jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))


def _pad_bins(p: jax.Array, fbins: int) -> jax.Array:
    """Slice (or zero-pad) a bin-indexed param to ``fbins`` rows.  Padding
    only occurs on the sp path, where the spectrum's bin axis is padded to
    divide the mesh — padded bins are dropped before the inverse
    transform, so their (garbage) values never reach the output."""
    if fbins <= p.shape[0]:
        return p[:fbins]
    return jnp.pad(p, ((0, fbins - p.shape[0]),) + ((0, 0),) * (p.ndim - 1))


class PhaseShift(nn.Module):
    """Frequency-native "nonlinearity": learned per-(bin, channel) phase
    rotation.  Despite the reference's framing it is a LINEAR map — a
    parameter-only complex multiplier ``(1 + 0.1·tanh(m)) · e^{i·tanh(w)·π}``
    per (bin, channel) — which is what lets the bicameral freq path fold it
    into a causalizable filter.  Reference: frequency_native.py:22-77.
    """

    d_model: int
    n_freqs: int

    def setup(self):
        self.phase_weights = self.param("phase_weights", _small_normal, (self.n_freqs, self.d_model))
        self.magnitude_logits = self.param(
            "magnitude_logits", nn.initializers.zeros, (self.n_freqs, self.d_model)
        )

    def multiplier(self, fbins: int) -> jax.Array:
        """The [fbins, C] complex constant this module multiplies by."""
        rotation = jnp.tanh(_pad_bins(self.phase_weights, fbins)) * math.pi
        mag_scale = 1.0 + 0.1 * jnp.tanh(_pad_bins(self.magnitude_logits, fbins))
        return _polar(mag_scale, rotation)

    def __call__(self, z_freq: jax.Array) -> jax.Array:
        # z·(m·e^{ir}) == polar(|z|·m, arg(z)+r), without the NaN-prone
        # magnitude/phase decomposition of the reference at exact zeros
        return z_freq * self.multiplier(z_freq.shape[1])[None]


class SpectralLayerNorm(nn.Module):
    """Normalize magnitude across channels per frequency bin, preserve phase.

    Reference: frequency_native.py:205-241.
    """

    d_model: int
    n_freqs: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x_freq: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.ones, (self.n_freqs, self.d_model))
        beta = self.param("beta", nn.initializers.zeros, (self.n_freqs, self.d_model))

        fbins = x_freq.shape[1]
        magnitude, phase = safe_magnitude_phase(x_freq)  # NaN-safe at masked zeros
        mean = jnp.mean(magnitude, axis=-1, keepdims=True)
        var = jnp.var(magnitude, axis=-1, keepdims=True)
        mag_norm = (magnitude - mean) / jnp.sqrt(var + self.eps)
        mag_scaled = (mag_norm * _pad_bins(gamma, fbins)[None]
                      + _pad_bins(beta, fbins)[None])
        return _polar(mag_scaled, phase)


class SpectralFFN(nn.Module):
    """Complex feedforward that stays in the frequency domain.

    SpectralLayerNorm -> shared-weight linear on (real, imag) -> PhaseShift
    -> magnitude dropout -> shared-weight linear back.
    Reference: frequency_native.py:124-202.
    """

    d_model: int
    n_freqs: int
    expansion: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x_freq: jax.Array, deterministic: bool = True) -> jax.Array:
        hidden = self.d_model * self.expansion
        x_freq = SpectralLayerNorm(self.d_model, self.n_freqs, name="ln")(x_freq)

        w1 = nn.Dense(hidden, kernel_init=_small_normal, name="w1")
        # the SAME linear applied to real and imag parts (a complex-linear map
        # with a real weight matrix)
        h = jax.lax.complex(w1(jnp.real(x_freq)), w1(jnp.imag(x_freq)))
        h = PhaseShift(hidden, self.n_freqs, name="activation")(h)

        if self.dropout > 0:
            mag, phase = safe_magnitude_phase(h)
            mag = nn.Dropout(self.dropout)(mag, deterministic=deterministic)
            h = _polar(mag, phase)

        w2 = nn.Dense(self.d_model, kernel_init=_small_normal, name="w2")
        return jax.lax.complex(w2(jnp.real(h)), w2(jnp.imag(h)))


class FrequencyNativeBlock(nn.Module):
    """FixedSpectralBlock-compatible block with a frequency-domain FFN.

    rfft -> frequency_conv (custom Wirtinger vjp) -> gates -> cutoff ->
    complex FFN residual IN the spectrum -> one irfft at the end.
    Reference: frequency_native.py:244-362.
    """

    d_model: int
    seq_len: int
    kernel_len: int
    transition_bins: int
    dropout: float = 0.1
    ffn_mult: int = 2  # kept for constructor parity; SpectralFFN uses expansion=2
    # project the gated kernel spectrum onto its first n_fft-T taps (see
    # models/backbone.py / ops/fftc.causal_filter_taps).  NOTE: the
    # in-spectrum SpectralFFN below is nonlinear per bin and remains
    # non-causal BY THE REFERENCE'S DESIGN — only the linear conv chain is
    # causalized here.
    causal_taps: bool = True
    # Sequence parallelism (mesh sp>1): the spectrum is produced
    # CHANNEL-sharded by one Ulysses all-to-all + local matmul-rfft
    # (parallel/distributed_fft.sharded_rfft_channel), the diagonal conv
    # runs channel-sharded, then a sharding CONSTRAINT re-shards to
    # BIN-sharded for the per-bin SpectralFFN (XLA partitions its
    # channel-contracting Dense/LN collective-free — every op is batched
    # over bins), and the inverse transform restores time sharding.  One
    # fused pipeline: the conv and the in-spectrum FFN share a single
    # forward/inverse transform pair.
    mesh: Optional[jax.sharding.Mesh] = None
    sp_axis: str = "sp"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        cutoff: Optional[jax.Array] = None,
        deterministic: bool = True,
        length: Optional[jax.Array] = None,
    ) -> jax.Array:
        B, T, C = x.shape
        max_freq_bins = conv_freq_bins(self.seq_len, self.kernel_len)

        kernel = self.param("kernel", _kernel_init, (self.kernel_len,))
        gain = self.param("gain", nn.initializers.ones, (C,))
        gate_freq_logits = self.param("gate_freq_logits", _gate_bias_init, (max_freq_bins,))

        residual = x
        x = nn.LayerNorm(name="ln")(x)
        if length is not None:
            valid = (jnp.arange(T) < length).astype(x.dtype)[None, :, None]
            x = x * valid
            pooled = jnp.sum(x, axis=1) / length.astype(x.dtype)
        else:
            pooled = jnp.mean(x, axis=1)

        n_fft = conv_n_fft(T, self.kernel_len)
        fbins = n_fft // 2 + 1

        k_freq = kernel_rfft(kernel, n_fft)

        g_freq = jax.nn.sigmoid(gate_freq_logits[:fbins])
        g_ctx = jax.nn.sigmoid(
            nn.Dense(C, kernel_init=nn.initializers.zeros, bias_init=_gate_bias_init, name="gate_ctx")(pooled)
        )
        mask = cutoff_mask(fbins, cutoff, self.transition_bins)
        # fold gate+mask into the kernel spectrum so the whole linear chain
        # can be tap-projected; diagonal multiplies commute
        k_eff = k_freq * g_freq * mask
        if self.causal_taps:
            from spectral_tpu.ops.fftc import causal_filter_taps

            # budget follows the valid length (see models/backbone.py)
            budget = (n_fft - T) if length is None else (jnp.int32(n_fft) - length)
            k_eff = causal_filter_taps(k_eff, n_fft, budget)

        ffn = SpectralFFN(C, max_freq_bins, expansion=2, dropout=self.dropout, name="ffn")
        use_sp = self.mesh is not None and dict(self.mesh.shape).get(self.sp_axis, 1) > 1
        if use_sp:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from spectral_tpu.parallel.distributed_fft import (
                sharded_irfft_time,
                sharded_rfft_channel,
            )

            zr, zi = sharded_rfft_channel(x, self.mesh, axis=self.sp_axis, n_fft=n_fft)
            z = jax.lax.complex(zr, zi)
            # the SAME custom-vjp conv as the unsharded branch (elementwise
            # — sharding propagates through it): its hand-rolled gain
            # gradient reproduces the reference's FrequencyConvFunc rule,
            # which deviates from the true adjoint (ops/wirtinger.py) —
            # a plain multiply here would silently train gain differently
            # under sp (sharded==unsharded grad parity pins this)
            z = frequency_conv(z, k_eff, gain)
            z = z * g_ctx[:, None, :]
            batch_ax = "dp" if "dp" in self.mesh.axis_names else None
            bin_s = NamedSharding(self.mesh, P(batch_ax, self.sp_axis, None))
            chan_s = NamedSharding(self.mesh, P(batch_ax, None, self.sp_axis))
            # the odd bin count (2^k + 1) must divide the sp axis for the
            # bin-sharded constraint: zero-pad the spectrum (the bin-indexed
            # FFN params pad via _pad_bins; padded bins are sliced off
            # before the inverse transform, so their values never land)
            nsp = dict(self.mesh.shape)[self.sp_axis]
            f_pad = ((fbins + nsp - 1) // nsp) * nsp
            z = jnp.pad(z, ((0, 0), (0, f_pad - fbins), (0, 0)))
            # re-shard bins<->channels around the per-bin FFN (XLA lowers
            # the constraint moves to all-to-alls; the FFN itself then
            # partitions collective-free — Dense contracts the replicated
            # channel axis, batched over the sharded bins)
            z = jax.lax.with_sharding_constraint(z, bin_s)
            z = z + ffn(z, deterministic=deterministic)
            z = jax.lax.with_sharding_constraint(z, chan_s)
            z = z[:, :fbins]
            y = sharded_irfft_time(jnp.real(z), jnp.imag(z), self.mesh,
                                   axis=self.sp_axis, n_fft=n_fft, T=T)
        else:
            x_freq = rfft_time(x, n_fft)
            y_freq = frequency_conv(x_freq, k_eff, gain)
            y_freq = y_freq * g_ctx[:, None, :]

            # Frequency-native FFN residual — stays complex, no time roundtrip.
            y_freq = y_freq + ffn(y_freq, deterministic=deterministic)

            y = irfft_time(y_freq, n_fft, T)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return residual + y


def _self_test():  # pragma: no cover - CLI self-test (reference :365-388)
    """python -m spectral_tpu.models.frequency_native"""
    import numpy as np

    print("Testing frequency-native components...")
    B, F, C = 4, 128, 512
    ps = PhaseShift(C, F)
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((B, F, C)) + 1j * rng.standard_normal((B, F, C))).astype(np.complex64))
    params = ps.init(jax.random.PRNGKey(0), x)
    y = ps.apply(params, x)
    e_in = float(jnp.sum(jnp.abs(x) ** 2))
    e_out = float(jnp.sum(jnp.abs(y) ** 2))
    print(f"Energy in: {e_in:.2f}  out: {e_out:.2f}  ratio: {e_out/e_in:.4f}")
    assert abs(e_out / e_in - 1.0) < 0.1, "PhaseShift must be ~energy-preserving"
    print("[OK] PhaseShift preserves energy")

    blk = FrequencyNativeBlock(d_model=64, seq_len=64, kernel_len=16, transition_bins=8, dropout=0.0)
    xb = jnp.asarray(rng.standard_normal((2, 64, 64)).astype(np.float32))
    p = blk.init(jax.random.PRNGKey(0), xb)
    g = jax.grad(lambda p: jnp.sum(blk.apply(p, xb, cutoff=jnp.int32(16)) ** 2))(p)
    gn = sum(float(jnp.linalg.norm(l)) for l in jax.tree.leaves(g))
    print(f"[OK] fwd/bwd through the freq-native block (grad norm {gn:.2f})")
    print("[SUCCESS] All tests passed!")


if __name__ == "__main__":
    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    _self_test()
