"""Direct Toeplitz-matmul causal spectral convolution.

The block's conv is, mathematically, ONE circulant matrix applied to the
time axis:  y[i] = sum_j h_time[(i-j) mod n_fft] * x[j]  with x zero-padded
beyond T (reference equations: fft_lm/train_fixed_full.py:497-563, which
evaluates them with cuFFT).  The FFT route is asymptotically cheaper, but
on the MXU at training sequence lengths the constant factors invert: the
four-step matmul-FFT spends most of its time in small-K stages and
relayouts, while materializing the (T, T) filter matrix ONCE per step and
applying it as a single [T, T] x [T, B*C] matmul runs the whole conv at
full systolic-array utilization.

Measured on v5e at the flagship micro-batch ([4, 1024, 512], fwd+bwd,
experiments/profile_block.py): matmul-FFT conv 0.694 ms, this path ~0.1 ms
— despite doing ~4x the nominal FLOPs.  MXU cycles are cheaper than VPU
relayouts.

The trailing dims contract over B*C, so the matrix build cost (a [T, T]
gather from the n_fft-tap time kernel) amortizes over every batch element
and channel — and because it depends only on (params, cutoff), XLA hoists
it out of the gradient-accumulation scan entirely.

Exactness: the construction is the SAME circular-conv-on-padded-buffer the
FFT path computes, so it is bit-compatible with both ``causal_taps=True``
(h_time has no tail, wrap diagonals vanish) and the reference equations
(``causal_taps=False`` — wrap terms included via the mod-n_fft gather).

Gradients are custom:
  dx = M^T applied to gy (one more full-MXU matmul);
  dh_time[d] = sum of the (i-j ≡ d mod n_fft) diagonal of A = gy x^T,
    where A is ONE [T, B*C] x [B*C, T] matmul; the diagonal sums are a
    static-index gather-reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# contraction helpers: preferred fp32 accumulation; stage precision follows
# the caller (DEFAULT = bf16 inputs ~2e-3 rel err, HIGHEST = fp32-accurate)


def _precision(p):
    return jax.lax.Precision.HIGHEST if p is None else p


@functools.lru_cache(maxsize=32)
def _mod_diff_idx(T: int, n_fft: int) -> np.ndarray:
    """(T, T) int32 table: idx[i, j] = (i - j) mod n_fft."""
    i = np.arange(T)[:, None]
    j = np.arange(T)[None, :]
    return ((i - j) % n_fft).astype(np.int32)


@functools.lru_cache(maxsize=32)
def _diag_gather_idx(T: int, n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Static indices for the dh diagonal reduction.

    Returns (flat_idx, valid) of shape (n_fft, T): for diagonal d and output
    row i, the contributing element of A is A[i, j] with j = (i - d) mod
    n_fft, valid iff j < T.  flat_idx indexes A.reshape(-1) (clipped where
    invalid; the mask zeroes those lanes).
    """
    d = np.arange(n_fft)[:, None]
    i = np.arange(T)[None, :]
    j = (i - d) % n_fft
    valid = j < T
    flat = i * T + np.minimum(j, T - 1)
    return flat.astype(np.int32), valid


def toeplitz_matrix(h_time: jax.Array, T: int, n_fft: int) -> jax.Array:
    """[n_fft] time-domain filter -> the (T, T) conv matrix M[i, j] =
    h_time[(i-j) mod n_fft] (circular conv on the zero-padded buffer,
    restricted to the valid T x T corner — exactly what irfft(rfft(x_pad)
    * H)[:T] computes)."""
    idx = jnp.asarray(_mod_diff_idx(T, n_fft))
    return jnp.take(h_time, idx, axis=0)


def _apply(M: jax.Array, x: jax.Array, precision) -> jax.Array:
    # y[b, i, c] = sum_j M[i, j] x[b, j, c]
    return jnp.einsum("ij,bjc->bic", M, x, precision=precision, preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def toeplitz_conv(x: jax.Array, h_time: jax.Array, n_fft: int, precision=None) -> jax.Array:
    """Causal spectral conv as one full-MXU matmul.

    x: [B, T, C] real; h_time: [n_fft] real time-domain filter taps (the
    irfft of the fused frequency filter).  Returns [B, T, C] — identical
    values to ``irfft_time(rfft_time(x, n_fft) * H, n_fft, T)``.
    """
    B, T, C = x.shape
    M = toeplitz_matrix(h_time, T, n_fft)
    return _apply(M, x, _precision(precision))


def _toeplitz_fwd(x, h_time, n_fft, precision):
    return toeplitz_conv(x, h_time, n_fft, precision), (x, h_time)


def _toeplitz_bwd(n_fft, precision, res, gy):
    x, h_time = res
    B, T, C = x.shape
    prec = _precision(precision)
    M = toeplitz_matrix(h_time, T, n_fft)
    # dx[b, j, c] = sum_i M[i, j] gy[b, i, c]  (M^T conv — one matmul)
    dx = jnp.einsum("ij,bic->bjc", M, gy, precision=prec, preferred_element_type=jnp.float32)
    # dh[d] = sum_{(i-j) mod n_fft = d} A[i, j],  A = gy contracted with x
    # over (b, c): ONE [T, BC] x [BC, T] matmul, then a static diagonal
    # gather-reduction.
    A = jnp.einsum("bic,bjc->ij", gy, x, precision=prec, preferred_element_type=jnp.float32)
    flat_idx, valid = _diag_gather_idx(T, n_fft)
    picked = jnp.take(A.reshape(-1), jnp.asarray(flat_idx), axis=0)
    dh = jnp.sum(picked * jnp.asarray(valid, picked.dtype), axis=1)
    return dx, dh


toeplitz_conv.defvjp(_toeplitz_fwd, _toeplitz_bwd)


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
    B, T, C, K = 2, 64, 8, 16
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
