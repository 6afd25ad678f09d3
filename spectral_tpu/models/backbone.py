"""The causal spectral LM backbone.

TPU-native re-expression of the reference's center of gravity: the causal
``FixedSpectralBlock`` and ``FixedSpectralLM``
(reference: fft_lm/train_fixed_full.py:427-618).

Causality: an earlier non-causal frequency filter leaks FUTURE tokens during
training (FFT mixes the whole window); the fix — preserved here — is a causal
*linear* convolution via zero-padding to ``n_fft = next_pow2(T + K - 1)`` with
a one-sided K-tap time-domain kernel, taking the first T outputs.

TPU-native differences from the torch original:
* static ``n_fft`` resolved at trace time from ``x.shape`` (no dynamic FFT
  sizes inside jit);
* the curriculum ``cutoff`` is a *traced* scalar — the cosine roll-off mask is
  branchless, so per-epoch cutoff changes don't recompile;
* gates/FFN matmuls can run in bf16 (``compute_dtype``) while the FFT path
  stays fp32/complex64;
* everything is a pure function of (params, x, cutoff, rng) — ready for pjit
  sharding (batch over ``dp``, channels over ``tp``: the time-axis FFT is
  embarrassingly parallel over channels).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.ops.fftc import (
    causal_filter_taps,
    conv_freq_bins,
    conv_n_fft,
    cutoff_mask,
    irfft_time,
    kernel_rfft,
    rfft_time,
)

# init helpers shared by all block variants
_small_normal = nn.initializers.normal(stddev=0.01)
_kernel_init = nn.initializers.normal(stddev=0.001)


def _gate_bias_init(key, shape, dtype=jnp.float32):
    """Gates start 'mostly open': sigmoid(2.0) ~ 0.88 (train_fixed_full.py:475-480)."""
    return jnp.full(shape, 2.0, dtype)


class SpectralFFNTime(nn.Module):
    """The standard time-domain FFN residual branch (pre-LN, GELU, small init).

    Reference: train_fixed_full.py:484-495 (hidden = 2x d_model by default).
    ``compute_dtype`` runs the matmuls in bf16 on TPU (params stay fp32;
    LayerNorm and the residual stay fp32 — the reference's AMP analogue).
    """

    d_model: int
    ffn_mult: int = 2
    dropout: float = 0.1
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cdt = jnp.dtype(self.compute_dtype)
        h = nn.LayerNorm(name="ffn_ln")(x)
        h = nn.Dense(self.d_model * self.ffn_mult, kernel_init=_small_normal, dtype=cdt, name="ffn_in")(h)
        h = nn.gelu(h, approximate=False)  # exact erf GELU (torch nn.GELU parity)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, kernel_init=_small_normal, dtype=cdt, name="ffn_out")(h)
        return h.astype(jnp.float32)


class FixedSpectralBlock(nn.Module):
    """A single causal spectral mixing block (the hottest code in the model).

    Pipeline (reference: train_fixed_full.py:497-563):
      pre-LN -> zero-pad -> rfft over time -> x k̂ x gain
      -> sigmoid per-frequency gate x sigmoid context gate (mean-pooled)
      -> curriculum cutoff cosine roll-off -> irfft, first T (causal)
      -> dropout residual -> pre-LN FFN (GELU 2x) residual.

    The two gates are the "valve" that prevents resonant attractors
    ("888888" loops) from dominating.
    """

    d_model: int
    seq_len: int
    kernel_len: int
    transition_bins: int
    dropout: float = 0.1
    ffn_mult: int = 2
    use_pallas_kernel: bool = False  # fused FFT->filter->IFFT Pallas path
    fft_backend: str = "xla"  # "xla" | "matmul" (MXU four-step FFT)
    fft_precision: str = "highest"  # matmul-FFT stage precision
    compute_dtype: str = "float32"  # bf16 for the FFN matmuls (complex stays fp32)
    # Sequence parallelism: when a mesh with sp > 1 is supplied, the conv
    # routes through the Ulysses all-to-all (parallel/distributed_fft.py):
    # time-sharded -> channel-sharded, local full-length FFT, and back —
    # instead of letting XLA all-gather the time axis around jnp.fft.
    mesh: Optional[jax.sharding.Mesh] = None
    sp_axis: str = "sp"
    # Causality fix (DELIBERATE divergence from the reference): project the
    # fused filter k̂·gate·mask onto its first n_fft-T time taps so the conv
    # is truly causal for ANY trained gate values.  The reference's circular
    # tail leaks future tokens once the per-bin gate trains away from its
    # uniform init (ops/fftc.causal_filter_taps has the measurement).
    # False reproduces the reference equations bit-for-bit (golden tests).
    causal_taps: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        cutoff: Optional[jax.Array] = None,
        deterministic: bool = True,
        length: Optional[jax.Array] = None,
    ) -> jax.Array:
        """``length``: optional traced scalar marking the valid prefix of the
        time axis.  Positions >= length are zeroed after the pre-LN and
        excluded from the pooled context gate, making a fixed-size buffer
        bit-identical to running the reference on the length-L window (the
        TPU-native alternative to per-length recompiles during generation)."""
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
            pooled = jnp.sum(x, axis=1) / length.astype(x.dtype)  # [B, C]
        else:
            pooled = jnp.mean(x, axis=1)  # [B, C]

        n_fft = conv_n_fft(T, self.kernel_len)
        fbins = n_fft // 2 + 1

        k_freq = kernel_rfft(kernel, n_fft)  # [F]
        g_freq = jax.nn.sigmoid(gate_freq_logits[:fbins])  # [F]
        g_ctx = jax.nn.sigmoid(
            nn.Dense(C, kernel_init=nn.initializers.zeros, bias_init=_gate_bias_init, name="gate_ctx")(pooled)
        )  # [B, C]
        mask = cutoff_mask(fbins, cutoff, self.transition_bins)

        # ONE fused complex filter for every backend; the real per-channel
        # scales (gain · ctx gate) commute with the linear transform and are
        # applied to the time-domain output.
        h_fused = k_freq * g_freq * mask  # [F] complex
        if self.causal_taps:
            # budget follows the VALID length: with a traced ``length`` the
            # zero-padded buffer projects the filter exactly as the length-L
            # window would (fftc.causal_filter_taps), keeping the bucketed
            # generation path bit-identical to the exact-window forward.
            budget = (n_fft - T) if length is None else (jnp.int32(n_fft) - length)
            h_fused = causal_filter_taps(h_fused, n_fft, budget)

        use_sp = self.mesh is not None and self.mesh.shape.get(self.sp_axis, 1) > 1
        if use_sp:
            # THE headline TPU feature (SURVEY §5.7/§7): sequence-sharded
            # conv via Ulysses all-to-alls.  Gates/gain are real diagonal
            # scales commuting with the linear transform — folded into the
            # replicated filter (g_freq·mask) and the time-local output
            # multiply (gain·g_ctx), so only the conv itself communicates.
            from spectral_tpu.parallel.distributed_fft import sequence_sharded_spectral_conv

            scale = gain[None, :] * g_ctx  # [B, C]
            local_backend = (
                "pallas" if self.use_pallas_kernel
                else ("matmul" if self.fft_backend == "matmul" else "xla")
            )
            y = sequence_sharded_spectral_conv(
                x, h_fused, self.mesh, axis=self.sp_axis, n_fft=n_fft, backend=local_backend
            )
            y = y * scale[:, None, :]
        elif self.use_pallas_kernel:
            # ONE VMEM-resident pass: FFT -> fused filter -> IFFT, real
            # per-channel scales (gain · ctx gate) folded into the
            # time-domain output — mathematically identical to the XLA path.
            from spectral_tpu.ops.pallas_spectral import fused_spectral_conv

            scale = gain[None, :] * g_ctx  # [B, C]
            y = fused_spectral_conv(x, h_fused, scale, n_fft)
        elif self.fft_backend == "direct":
            # Fastest training path on TPU (v5e flagship accum recipe:
            # 48.8 ms/step vs 90.0 matmul-FFT, 42.1 with bf16 compute —
            # experiments/profile_train_step.py): materialize the (T, T)
            # Toeplitz filter matrix once per step — it depends only on
            # (params, cutoff), so XLA hoists it out of the
            # grad-accumulation scan — and run the conv as ONE
            # full-utilization MXU matmul.  O(T^2), so past seq ~2048 the
            # FFT backends win back.  Identical math to the XLA branch for
            # both causal_taps settings (the mod-n_fft construction
            # reproduces the circular wrap exactly).
            from spectral_tpu.ops.toeplitz import spectral_conv_direct

            scale = gain[None, :] * g_ctx  # [B, C]
            prec = (
                jax.lax.Precision.HIGHEST
                if self.fft_precision == "highest"
                else jax.lax.Precision.DEFAULT
            )
            y = spectral_conv_direct(x, h_fused, n_fft, precision=prec)
            y = y * scale[:, None, :]
        elif self.fft_backend == "matmul":
            # MXU path: both transforms as batched DFT matmuls (T-minor
            # layout), real per-channel scales folded after — identical math
            # to the XLA branch (gain/g_ctx are real diagonal ops commuting
            # with the linear irfft).
            from spectral_tpu.ops.matfft import spectral_conv_matmul

            scale = gain[None, :] * g_ctx  # [B, C]
            prec = (
                jax.lax.Precision.HIGHEST
                if self.fft_precision == "highest"
                else jax.lax.Precision.DEFAULT
            )
            y = spectral_conv_matmul(jnp.swapaxes(x, 1, 2), h_fused, n_fft, precision=prec)
            y = jnp.swapaxes(y, 1, 2) * scale[:, None, :]
        else:
            x_freq = rfft_time(x, n_fft)  # [B, F, C] complex64
            y_freq = x_freq * h_fused[None, :, None]  # kernel x "valve" x roll-off
            y_freq = y_freq * (gain[None, :] * g_ctx)[:, None, :]
            y = irfft_time(y_freq, n_fft, T)  # causal: first T of the linear conv
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = residual + y

        ffn = SpectralFFNTime(C, self.ffn_mult, self.dropout, self.compute_dtype, name="ffn")
        h = ffn(x, deterministic=deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class FixedSpectralLM(nn.Module):
    """Byte-level LM: Embedding(256, d) -> N spectral blocks -> LN -> tied logits.

    Block class dispatched by config flags (train_fixed_full.py:572-583):
    ``bicameral`` > ``frequency_native`` > standard.
    """

    cfg: TrainConfig
    # optional device mesh: sp>1 routes the conv through the Ulysses
    # all-to-all (sequence parallelism); passed by the sharded trainer.
    mesh: Optional[jax.sharding.Mesh] = None

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.vocab_size, cfg.d_model, name="embed")
        if cfg.bicameral:
            from spectral_tpu.models.bicameral import BicameralBlock

            block_cls = BicameralBlock
        elif cfg.frequency_native:
            from spectral_tpu.models.frequency_native import FrequencyNativeBlock

            block_cls = FrequencyNativeBlock
        else:
            block_cls = FixedSpectralBlock
        extra = {"causal_taps": cfg.causal_taps}
        # every block class carries its own sp route now (round-4: the
        # r2/r3 loud-error for variants is gone): the standard block and
        # the bicameral right hemisphere ride the Ulysses all-to-all conv,
        # the bicameral left hemisphere a 2-element halo ppermute, and the
        # frequency-native block the sharded-transform + bin-sharded-FFN
        # pipeline (parallel/distributed_fft.py).
        if self.mesh is not None:
            extra["mesh"] = self.mesh
        if block_cls is FixedSpectralBlock and cfg.use_pallas_kernel:
            extra["use_pallas_kernel"] = True
        if block_cls is FixedSpectralBlock and cfg.fft_backend != "xla":
            extra["fft_backend"] = cfg.fft_backend
            extra["fft_precision"] = cfg.fft_precision
        if block_cls is FixedSpectralBlock and cfg.compute_dtype != "float32":
            extra["compute_dtype"] = cfg.compute_dtype
        if cfg.remat:
            # trade FLOPs for HBM: recompute each block's activations in the
            # backward pass (jax.checkpoint) — the long-context memory lever
            block_cls = nn.remat(block_cls, static_argnums=(3,))  # deterministic (self=0)
        self.blocks = [
            block_cls(
                d_model=cfg.d_model,
                seq_len=cfg.seq_len,
                kernel_len=cfg.kernel_len,
                transition_bins=cfg.jpeg_transition,
                dropout=cfg.dropout,
                name=f"block_{i}",
                **extra,
            )
            for i in range(cfg.n_layers)
        ]
        self.ln_f = nn.LayerNorm(name="ln_f")

    def forward_hidden(
        self,
        x: jax.Array,
        cutoff: Optional[jax.Array] = None,
        deterministic: bool = True,
        length: Optional[jax.Array] = None,
    ) -> jax.Array:
        """x: [B, T] int32 byte ids -> final hidden states [B, T, C]."""
        h = self.embed(x)
        for blk in self.blocks:
            # positional call: nn.remat static_argnums indexes positionally
            h = blk(h, cutoff, deterministic, length)
        return self.ln_f(h)

    def __call__(
        self,
        x: jax.Array,
        cutoff: Optional[jax.Array] = None,
        deterministic: bool = True,
        length: Optional[jax.Array] = None,
    ) -> jax.Array:
        """x: [B, T] int32 -> logits [B, T, V] (weight-tied via embed.T)."""
        h = self.forward_hidden(x, cutoff=cutoff, deterministic=deterministic, length=length)
        cdt = jnp.dtype(self.cfg.compute_dtype)
        logits = h.astype(cdt) @ self.embed.embedding.T.astype(cdt)
        return logits.astype(jnp.float32)
