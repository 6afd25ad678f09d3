"""Causal FFT-convolution primitives.

TPU-native re-expression of the reference's causal spectral-conv machinery
(reference: fft_lm/train_fixed_full.py:129-139 ``conv_freq_bins`` and
:497-563 ``FixedSpectralBlock.forward``).  Key design differences from the
CUDA/torch original:

* **Static shapes.**  The reference computes ``n_fft`` from the runtime ``T``
  (train_fixed_full.py:508-510).  Under ``jax.jit`` the sequence length is a
  trace-time constant, so ``n_fft`` is resolved in Python from ``x.shape`` —
  every FFT here has a static length XLA can plan for.
* **Traced cutoff masks.**  The reference branches on a Python ``cutoff`` int
  and slices (train_fixed_full.py:539-551); here the curriculum cutoff is a
  traced scalar and the cosine roll-off mask is computed branchlessly, so
  changing the cutoff between epochs does NOT retrigger compilation.
* rFFT/irFFT run in float32/complex64 (TPU FFT units + the reference's own
  choice of fp32 for complex math, scripts/train_frequency_native.py:70-72).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (static, Python int)."""
    n = int(n)
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def conv_n_fft(seq_len: int, kernel_len: int) -> int:
    """FFT length for a linear (non-circular) causal convolution.

    Zero-pad to ``next_pow2(T + K - 1)`` so the circular FFT conv equals the
    linear conv on the first T samples (reference: train_fixed_full.py:129-139).
    """
    return next_pow2(int(seq_len) + int(kernel_len) - 1)


def conv_freq_bins(seq_len: int, kernel_len: int) -> int:
    """rFFT bin count used by the causal FFT-conv: n_fft//2 + 1."""
    return conv_n_fft(seq_len, kernel_len) // 2 + 1


def rfft_time(x: jax.Array, n_fft: int) -> jax.Array:
    """rFFT along the time axis (axis=1) of a [B, T, C] real tensor.

    Zero-pads T -> n_fft.  Returns [B, F, C] complex64 with F = n_fft//2+1.
    """
    B, T, C = x.shape
    if T > n_fft:
        raise ValueError(f"T={T} exceeds n_fft={n_fft}")
    x = x.astype(jnp.float32)
    if T < n_fft:
        x = jnp.pad(x, ((0, 0), (0, n_fft - T), (0, 0)))
    return jnp.fft.rfft(x, axis=1)


def irfft_time(y_freq: jax.Array, n_fft: int, seq_len: int) -> jax.Array:
    """Inverse of :func:`rfft_time`: irFFT along axis 1, keep first ``seq_len``.

    Taking the first T samples of the length-(T+K-1) linear-conv output is what
    makes the convolution causal (reference: train_fixed_full.py:553-555).
    """
    y = jnp.fft.irfft(y_freq, n=n_fft, axis=1)
    return y[:, :seq_len, :]


def kernel_rfft(kernel: jax.Array, n_fft: int) -> jax.Array:
    """rFFT of a length-K causal time-domain kernel zero-padded to n_fft.

    Returns [F] complex64 (reference: train_fixed_full.py:513-515).
    """
    (K,) = kernel.shape
    # jnp.pad instead of .at[:K].set — scatter lowering is unimplemented for
    # some dtypes on the target TPU backend, and pad fuses better anyway.
    k = jnp.pad(kernel.astype(jnp.float32), (0, n_fft - K))
    return jnp.fft.rfft(k)


def cutoff_mask(
    n_bins: int,
    cutoff: jax.Array | int | None,
    transition_bins: int,
    dtype=jnp.float32,
) -> jax.Array:
    """Progressive-frequency ("JPEG schedule") roll-off mask over rFFT bins.

    Semantics match the reference exactly (train_fixed_full.py:539-551):

    * ``cutoff`` is clipped to ``n_bins``; if the clipped value equals
      ``n_bins`` the mask is all-ones (no roll-off at Nyquist).
    * otherwise, with ``trans = min(transition_bins, cutoff)``, bins in
      ``[cutoff-trans, cutoff)`` follow a raised-cosine ramp
      ``0.5*(1+cos(pi * i/(trans-1)))`` (the reference's
      ``torch.linspace(0, 1, steps=trans)``), bins ``>= cutoff`` are zero,
      bins below the ramp are one.

    Unlike the reference this is branchless over a *traced* cutoff scalar, so
    curriculum changes don't recompile the training step.

    Args:
        n_bins: static number of rFFT bins F.
        cutoff: traced or static scalar (int). ``None`` => all-ones.
        transition_bins: static soft roll-off width.
    Returns:
        [n_bins] real mask.
    """
    if cutoff is None:
        return jnp.ones((n_bins,), dtype=dtype)
    cutoff = jnp.minimum(jnp.asarray(cutoff, dtype=jnp.int32), n_bins)
    trans = jnp.minimum(jnp.int32(max(1, int(transition_bins))), cutoff)
    start = cutoff - trans
    idx = jnp.arange(n_bins, dtype=jnp.int32)
    # torch.linspace(0, 1, steps=trans): t_i = i/(trans-1); for trans==1 torch
    # yields [0.0] so the single ramp bin gets mask 1.0 — i/(max(trans-1,1))
    # reproduces that (i=0 -> t=0 -> ramp=1).
    denom = jnp.maximum(trans - 1, 1).astype(dtype)
    t = (idx - start).astype(dtype) / denom
    ramp = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
    mask = jnp.where(idx < start, jnp.asarray(1.0, dtype), jnp.where(idx < cutoff, ramp, jnp.asarray(0.0, dtype)))
    # cutoff >= n_bins (after clipping: == n_bins): reference applies NO mask.
    return jnp.where(cutoff >= n_bins, jnp.ones((n_bins,), dtype=dtype), mask)


def causal_filter_taps(h_rfft: jax.Array, n_fft: int, budget) -> jax.Array:
    """Project a fused rFFT-domain filter onto its first ``budget`` time taps.

    WHY (the reference's causality defect): the backbone's conv is "causal"
    only while the effective kernel ``irfft(k̂·gate·mask)`` is short.  A
    TRAINED per-bin gate (or the curriculum mask) spreads it over all n_fft
    taps, and the circular conv's tail taps ``τ > n_fft - T`` wrap around
    onto FUTURE positions — training learns to read tokens a few steps
    ahead through that tail (measured: perturbing the last token moved past
    logits by ~10 on a round-2 trained model), which makes eval loss
    meaningless and generation garbage.  The reference
    (train_fixed_full.py:497-563) has the same leak; this projection fixes
    it: zeroing taps ``>= budget`` (with ``budget <= n_fft - T``) makes the
    padded circular conv a TRUE causal linear conv for any gate values,
    while keeping the gate's full expressivity on the first ``budget``
    taps.  Cost: two length-n_fft transforms of the [F]-vector filter per
    block per step — negligible.

    ``budget`` may be a TRACED scalar (the keep mask is branchless): the
    generation path passes ``n_fft - length`` so a zero-padded fixed buffer
    with a traced valid ``length`` projects the filter EXACTLY as the
    length-L window would (with the suffix zeroed, taps up to ``n_fft - L``
    wrap onto the zero region, so the larger traced budget stays causal).
    """
    g_eff = jnp.fft.irfft(h_rfft, n=n_fft, axis=0)
    keep = (jnp.arange(n_fft) < budget).astype(g_eff.dtype)
    keep = keep.reshape((n_fft,) + (1,) * (g_eff.ndim - 1))
    return jnp.fft.rfft(g_eff * keep, axis=0)


def causal_fft_conv(
    x: jax.Array,
    kernel: jax.Array,
    gain: jax.Array | None = None,
    n_fft: int | None = None,
) -> jax.Array:
    """Causal linear convolution of [B, T, C] with a length-K kernel via FFT.

    y[t] = sum_{i=0..K-1} kernel[i] * x[t-i]  (per channel, optionally scaled
    by a per-channel ``gain``).  Equivalent to the hot path of
    ``FixedSpectralBlock`` without gates (reference: train_fixed_full.py:507-555).
    """
    B, T, C = x.shape
    (K,) = kernel.shape
    if n_fft is None:
        n_fft = conv_n_fft(T, K)
    x_freq = rfft_time(x, n_fft)
    k_freq = kernel_rfft(kernel, n_fft)
    y_freq = x_freq * k_freq[None, :, None]
    if gain is not None:
        y_freq = y_freq * gain[None, None, :].astype(y_freq.real.dtype)
    return irfft_time(y_freq, n_fft, T)


def causal_fft_conv_reference(x: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """O(T*K) direct-FIR reference used only in parity tests."""
    B, T, C = x.shape
    K = kernel.shape[0]
    y = np.zeros_like(x, dtype=np.float64)
    for i in range(K):
        y[:, i:, :] += kernel[i] * x[:, : T - i if i else T, :]
    return y
