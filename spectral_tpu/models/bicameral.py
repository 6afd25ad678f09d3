"""The bicameral (two-hemisphere) block: frequency (global) + time (local).

TPU-native re-expression of reference fft_lm/bicameral.py:26-272.

* RIGHT hemisphere (frequency): causal FFT conv + gates + PhaseShift; the
  curriculum cutoff applies ONLY here (progressive structure learning).
* LEFT hemisphere (time): depthwise causal conv (k=3, trigram window) at full
  bandwidth always (sharp details, spelling).
* Corpus callosum: normalized sigmoid alpha-weighted sum of the two paths
  plus 0.1 x cross-interaction Linear on their concatenation; shared FFN.

The depthwise conv is expressed with ``lax.conv_general_dilated``
(feature_group_count = C) and reproduces the reference's shift-then-pad
receptive field exactly: y[t] = w0*x[t-2] + w1*x[t-1] + w2*x[t].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spectral_tpu.models.backbone import SpectralFFNTime
from spectral_tpu.models.frequency_native import PhaseShift
from spectral_tpu.ops.fftc import (
    conv_freq_bins,
    conv_n_fft,
    cutoff_mask,
    irfft_time,
    kernel_rfft,
    rfft_time,
)

_small_normal = nn.initializers.normal(stddev=0.01)
_kernel_init = nn.initializers.normal(stddev=0.001)


def _gate_bias_init(key, shape, dtype=jnp.float32):
    return jnp.full(shape, 2.0, dtype)


class BicameralBlock(nn.Module):
    d_model: int
    seq_len: int
    kernel_len: int
    transition_bins: int
    dropout: float = 0.1
    ffn_mult: int = 2
    # project the fused freq-path filter onto its first n_fft-T taps so the
    # RIGHT-BRAIN conv is truly causal for trained gates/mask — the
    # PhaseShift "activation" is a parameter-only complex multiplier, so the
    # whole freq path is linear-diagonal and causalizable
    # (ops/fftc.causal_filter_taps)
    causal_taps: bool = True
    # Sequence parallelism (mesh sp>1): the RIGHT hemisphere routes its
    # causal FFT conv through the Ulysses all-to-all with the per-channel
    # fused filter (parallel/distributed_fft.py), the LEFT hemisphere's
    # k=3 depthwise conv through a 2-element halo ppermute; everything
    # else is positionwise and rides jit's sharding propagation.
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

        residual = x
        x = nn.LayerNorm(name="ln")(x)
        if length is not None:
            valid = (jnp.arange(T) < length).astype(x.dtype)[None, :, None]
            x = x * valid
            pooled = jnp.sum(x, axis=1) / length.astype(x.dtype)
        else:
            pooled = jnp.mean(x, axis=1)  # [B, C] shared context summary

        # ============================================================
        # RIGHT BRAIN: frequency path (follows the curriculum cutoff)
        # ============================================================
        kernel_freq = self.param("kernel_freq", _kernel_init, (self.kernel_len,))
        gain_freq = self.param("gain_freq", nn.initializers.ones, (C,))
        gate_freq_logits = self.param("gate_freq_logits", _gate_bias_init, (max_freq_bins,))

        n_fft = conv_n_fft(T, self.kernel_len)
        fbins = n_fft // 2 + 1

        k_freq = kernel_rfft(kernel_freq, n_fft)

        g_freq = jax.nn.sigmoid(gate_freq_logits[:fbins])
        g_ctx = jax.nn.sigmoid(
            nn.Dense(C, kernel_init=nn.initializers.zeros, bias_init=_gate_bias_init, name="gate_ctx_freq")(pooled)
        )
        # phase "activation" is a parameter-only complex multiplier [F, C];
        # curriculum cutoff applies to the RIGHT BRAIN ONLY.  All diagonal
        # factors commute — fuse them into one per-channel filter so it can
        # be tap-projected for true causality.
        phase = PhaseShift(C, max_freq_bins, name="phase_activation")
        mask = cutoff_mask(fbins, cutoff, self.transition_bins)
        h_eff = (
            k_freq[:, None]
            * g_freq[:, None]
            * mask[:, None]
            * phase.multiplier(fbins)
        )  # [F, C]
        if self.causal_taps:
            from spectral_tpu.ops.fftc import causal_filter_taps

            # budget follows the valid length (see models/backbone.py)
            budget = (n_fft - T) if length is None else (jnp.int32(n_fft) - length)
            h_eff = causal_filter_taps(h_eff, n_fft, budget)

        use_sp = self.mesh is not None and dict(self.mesh.shape).get(self.sp_axis, 1) > 1
        scale_freq = (gain_freq[None, :] * g_ctx)[:, None, :]  # real, commutes with irfft
        if use_sp:
            # Ulysses all-to-all conv with the PER-CHANNEL fused filter
            # (PhaseShift makes h_eff [F, C]); the real per-channel scale
            # is applied to the time-domain output (diagonal ops commute)
            from spectral_tpu.parallel.distributed_fft import (
                sequence_sharded_spectral_conv,
            )

            y_spectral = sequence_sharded_spectral_conv(
                x, h_eff, self.mesh, axis=self.sp_axis, n_fft=n_fft
            ) * scale_freq
        else:
            # unsharded: scale applied in the freq domain (bit-identical to
            # the original path; mathematically the same as scaling after)
            x_freq = rfft_time(x, n_fft)
            y_freq = x_freq * h_eff[None] * scale_freq
            y_spectral = irfft_time(y_freq, n_fft, T)  # [B, T, C]

        # ============================================================
        # LEFT BRAIN: time path (no cutoff — always full resolution)
        # ============================================================
        conv_w = self.param("conv1d_kernel", _small_normal, (3, 1, C))  # (W, I/g, O) depthwise
        conv_b = self.param("conv1d_bias", nn.initializers.zeros, (C,))

        # reference: shift right by one (drop last), then conv1d(k=3, pad=1):
        # y[t] = w0*x[t-2] + w1*x[t-1] + w2*x[t]
        if use_sp:
            from spectral_tpu.parallel.distributed_fft import (
                sequence_sharded_depthwise_conv3,
            )

            y_time = sequence_sharded_depthwise_conv3(
                x, conv_w, conv_b, self.mesh, axis=self.sp_axis
            )
        else:
            x_shift = jnp.pad(x[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
            y_time = jax.lax.conv_general_dilated(
                x_shift,
                conv_w,
                window_strides=(1,),
                padding=[(1, 1)],
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=C,
            ) + conv_b[None, None, :]

        g_time = jax.nn.sigmoid(
            nn.Dense(C, kernel_init=nn.initializers.zeros, bias_init=_gate_bias_init, name="gate_time")(pooled)
        )
        y_time = y_time * g_time[:, None, :]

        # ============================================================
        # CORPUS CALLOSUM: fusion
        # ============================================================
        alpha_freq = self.param("alpha_freq", lambda k, s: jnp.asarray(0.5), ())
        alpha_time = self.param("alpha_time", lambda k, s: jnp.asarray(0.5), ())
        a_f = jax.nn.sigmoid(alpha_freq)
        a_t = jax.nn.sigmoid(alpha_time)
        total = a_f + a_t + 1e-8
        w_freq = a_f / total
        w_time = a_t / total

        y_concat = jnp.concatenate([y_spectral, y_time], axis=-1)
        y_cross = nn.Dense(C, kernel_init=_small_normal, name="cross_interact")(y_concat)

        y = w_freq * y_spectral + w_time * y_time + 0.1 * y_cross

        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        out = residual + y

        ffn = SpectralFFNTime(C, self.ffn_mult, self.dropout, name="ffn")
        h = ffn(out, deterministic=deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return out + h


def hemisphere_balance(params: dict) -> dict:
    """Diagnostic: which hemisphere dominates (bicameral.py:326-388).

    Args:
        params: a BicameralBlock param subtree (contains alpha_freq/alpha_time).
    Returns:
        dict with normalized weights {"w_freq": ..., "w_time": ...}.
    """
    import numpy as np

    a_f = 1.0 / (1.0 + np.exp(-float(params["alpha_freq"])))
    a_t = 1.0 / (1.0 + np.exp(-float(params["alpha_time"])))
    total = a_f + a_t
    return {"w_freq": a_f / total, "w_time": a_t / total}


def _self_test():  # pragma: no cover - CLI self-test (reference :390-441)
    """python -m spectral_tpu.models.bicameral"""
    import numpy as np

    print("Testing Bicameral (Two-Hemisphere) Architecture...")
    B, T, C = 4, 256, 128
    blk = BicameralBlock(d_model=C, seq_len=T, kernel_len=32, transition_bins=16, dropout=0.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x)

    for cutoff in (64, 128, 256):
        y = blk.apply(params, x, cutoff=jnp.int32(cutoff))
        assert y.shape == x.shape
        print(f"   Cutoff {cutoff}: output {y.shape} [OK]")

    w = hemisphere_balance(params["params"])
    print(f"   Balance: freq {w['w_freq']:.1%} / time {w['w_time']:.1%}")

    g = jax.grad(lambda p: jnp.sum(blk.apply(p, x, cutoff=jnp.int32(64)) ** 2))(params)
    gf = float(jnp.linalg.norm(g["params"]["gain_freq"]))
    gt = float(jnp.linalg.norm(g["params"]["conv1d_kernel"]))
    print(f"   Frequency path gradient: {gf:.2f}")
    print(f"   Time path gradient:      {gt:.2f}")
    assert gf > 0 and gt > 0, "both hemispheres must receive gradients"
    print("[OK] Bicameral architecture works!")


if __name__ == "__main__":
    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    _self_test()
