"""Direct Toeplitz-matmul causal spectral convolution.

The block's conv is, mathematically, ONE circulant matrix applied to the
time axis:  y[i] = sum_j h_time[(i-j) mod n_fft] * x[j]  with x zero-padded
beyond T (reference equations: fft_lm/train_fixed_full.py:497-563, which
evaluates them with cuFFT).  The FFT route is asymptotically cheaper, but
on the MXU at training sequence lengths the constant factors invert:
materializing the (T, T) filter matrix once per step and applying it as a
single [T, T] x [T, B*C] matmul runs the whole conv at full systolic-array
utilization, with zero VPU relayouts between stages.

TPU construction note (hard-won): the obvious build — ``jnp.take(h_time,
(i - j) % n_fft)`` with a (T, T) index table — lowers to a serialized
gather and measured **23.8 ms** per block on v5e (20x slower than the FFT
it replaces).  The build below uses only slice/concat/tile/reshape, which
lower to contiguous copies:

  1. re-order the taps into the diagonal range h2[k] = h[(k-(T-1)) mod n],
     k in [0, 2T-1) — two static slices (no wrap arithmetic at runtime);
  2. reverse and zero-pad to w (length 2T);
  3. tile w T times, truncate to T*(2T-1), reshape (T, 2T-1): because
     consecutive rows start 2T-1 (not 2T) elements apart, row i is w
     left-rolled by i — the classic shear;
  4. the last T columns are exactly M[i, j] = h[(i-j) mod n].

Backward (custom_vjp): XLA's own einsum adjoint would form the (T, T)
filter-matrix cotangent dM = sum_{b,c} gy x^T — a THIRD O(T^2 B C) matmul
(plus a 67 MB intermediate at T=4096) for a filter with only n_fft degrees
of freedom.  The vjp below keeps the data cotangent on the MXU
(d_x = M^T gy, same cost as forward) but computes the filter cotangent
directly as the circular cross-correlation

    d_h[d] = sum_{b,c,j} x[b,j,c] * gy[b,(j+d) mod n_fft,c]
           = irfft( sum_{b,c} conj(rfft(x, n)) * rfft(gy, n) )

— two batched MXU rfft's (ops/matfft.py) + one length-n irfft, ~1/10 the
FLOPs of the dM matmul at T=4096.  Chip win: the conv's train-step share
drops from 3 to ~2 matmul passes.

The matrix depends only on (params, cutoff), so XLA hoists the build out
of the gradient-accumulation scan; its cost amortizes over B*C columns.

Exactness: identical values to ``irfft_time(rfft_time(x, n_fft) * H,
n_fft, T)`` for BOTH ``causal_taps=True`` (h_time has no tail, wrap
diagonals vanish) and the reference equations (``causal_taps=False`` —
wrap terms ride the mod-n_fft diagonal reorder).  Parity + gradient gates:
tests/unit/test_toeplitz.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _precision(p):
    return jax.lax.Precision.HIGHEST if p is None else p


def toeplitz_matrix(h_time: jax.Array, T: int, n_fft: int) -> jax.Array:
    """[n_fft] time-domain filter -> (T, T) conv matrix M[i, j] =
    h_time[(i-j) mod n_fft] via shear (slice/tile/reshape only — see module
    docstring for why gather is forbidden here)."""
    if n_fft < T:
        raise ValueError(f"n_fft={n_fft} < T={T}")
    if T == 1:
        return h_time[:1].reshape(1, 1)
    # diagonal-range taps: h2[k] = h_time[(k - (T-1)) mod n_fft], k in [0, 2T-1)
    # negative diagonals d in [-(T-1), -1] live at h[(d + n) mod n] = h[n-T+1 : n]
    h2 = jnp.concatenate([h_time[n_fft - T + 1 :], h_time[:T]])  # (2T-1,)
    w = jnp.concatenate([h2[::-1], jnp.zeros((1,), h2.dtype)])  # (2T,)
    flat = jnp.tile(w, T)[: T * (2 * T - 1)]
    sheared = flat.reshape(T, 2 * T - 1)  # row i = roll(w, -i)[:2T-1]
    return sheared[:, T - 1 :]


def _conv_apply(x: jax.Array, h_time: jax.Array, n_fft: int, precision) -> jax.Array:
    """The raw forward: (T, T) shear matrix @ [B, T, C] (no custom vjp)."""
    B, T, C = x.shape
    M = toeplitz_matrix(h_time, T, n_fft)
    return jnp.einsum(
        "ij,bjc->bic", M, x, precision=_precision(precision), preferred_element_type=jnp.float32
    )


def _filter_corr(x: jax.Array, gy: jax.Array, n_fft: int, precision) -> jax.Array:
    """d_h_time[d] = sum_{b,c,j} x[b,j,c] * gy[b,(j+d) mod n_fft,c] — the
    circular cross-correlation, via two batched MXU rfft's + one irfft."""
    if n_fft & (n_fft - 1):  # non-pow2: vector-op FFT fallback (exact)
        xf = jnp.fft.rfft(x, n=n_fft, axis=1)
        gf = jnp.fft.rfft(gy, n=n_fft, axis=1)
        prod = jnp.sum(jnp.conj(xf) * gf, axis=(0, 2))
        return jnp.fft.irfft(prod, n=n_fft).astype(jnp.float32)

    from spectral_tpu.ops.matfft import irfft_ri, rfft_ri

    # matfft transforms the LAST axis: ride as [B, C, T]
    p = _precision(precision)
    xr, xi = rfft_ri(jnp.swapaxes(x, 1, 2), n_fft, p)
    gr, gi = rfft_ri(jnp.swapaxes(gy, 1, 2), n_fft, p)
    # sum_{b,c} conj(X) * G
    sr = jnp.sum(xr * gr + xi * gi, axis=(0, 1))
    si = jnp.sum(xr * gi - xi * gr, axis=(0, 1))
    return irfft_ri(sr, si, n_fft, p).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv_vjp(x, h_time, n_fft, precision):
    return _conv_apply(x, h_time, n_fft, precision)


def _conv_vjp_fwd(x, h_time, n_fft, precision):
    return _conv_apply(x, h_time, n_fft, precision), (x, h_time)


def _conv_vjp_bwd(n_fft, precision, res, gy):
    x, h_time = res
    T = x.shape[1]
    # d_x = M^T @ gy — the transposed-matrix contraction, same MXU cost as
    # the forward (M rebuilt from taps: slice/tile/reshape, ~free)
    M = toeplitz_matrix(h_time, T, n_fft)
    d_x = jnp.einsum(
        "ij,bic->bjc", M, gy, precision=_precision(precision), preferred_element_type=jnp.float32
    )
    d_h = _filter_corr(x, gy, n_fft, precision)
    return d_x, d_h


_conv_vjp.defvjp(_conv_vjp_fwd, _conv_vjp_bwd)


def toeplitz_conv(x: jax.Array, h_time: jax.Array, n_fft: int, precision=None) -> jax.Array:
    """Causal spectral conv as one full-MXU matmul.

    x: [B, T, C] real; h_time: [n_fft] real time-domain filter taps (the
    irfft of the fused frequency filter).  Returns [B, T, C] — identical
    values to ``irfft_time(rfft_time(x, n_fft) * H, n_fft, T)``.

    Carries the custom vjp described in the module docstring: d_x rides the
    MXU as M^T gy; d_h_time is the FFT-domain circular correlation instead
    of XLA's O(T^2 B C) dM matmul.
    """
    return _conv_vjp(x, h_time, n_fft, precision)


def spectral_conv_direct(
    x: jax.Array, h_fused: jax.Array, n_fft: int, precision=None
) -> jax.Array:
    """Drop-in alternative to ``matfft.spectral_conv_matmul`` (but taking
    [B, T, C] directly): frequency filter in, causal conv out, via the
    Toeplitz path.  h_fused: [F] complex rfft-domain filter."""
    h_time = jnp.fft.irfft(h_fused, n=n_fft)  # [n_fft] real taps (vector op)
    return toeplitz_conv(x, h_time.astype(jnp.float32), n_fft, precision)


def _self_test() -> None:  # pragma: no cover - exercised via tests/unit
    from spectral_tpu.ops.fftc import irfft_time, rfft_time

    rng = np.random.default_rng(0)
    B, T, C = 2, 64, 8
    n_fft = 128
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    h = jnp.asarray(
        rng.normal(size=(n_fft // 2 + 1,)) + 1j * rng.normal(size=(n_fft // 2 + 1,))
    ).astype(jnp.complex64)

    ref = irfft_time(rfft_time(x, n_fft) * h[None, :, None], n_fft, T)
    got = spectral_conv_direct(x, h, n_fft)
    assert np.allclose(ref, got, atol=1e-4), np.abs(ref - got).max()
    print("toeplitz self-test ok")


if __name__ == "__main__":  # pragma: no cover
    _self_test()
