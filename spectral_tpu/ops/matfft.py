"""MXU-native FFT: Cooley-Tukey with matmul stages ("four-step" FFT).

Why: XLA's built-in FFT on TPU runs on the VPU with poor fusion — measured
~5% of HBM roofline for the seq-4k spectral mix (BENCHMARKS.md).  The MXU
(systolic array) is the fast path on TPU, and a DFT is a matmul.  Factoring
N = f1*f2*...*fL turns the transform into L batched (f_i x f_i) matmuls plus
twiddle multiplies — all MXU/VPU-friendly, fully fuseable by XLA.

Algorithm (decimation-in-time, one level; applied recursively):
  n = n1*N2 + n2,  k = k1 + N1*k2     (N = N1*N2)
  B[k1, n2] = sum_n1 A[n1, n2] W_N1^{n1 k1}     -- N1xN1 matmul
  C[k1, n2] = B[k1, n2] * W_N^{k1 n2}           -- twiddle
  D[k1, k2] = sum_n2 C[k1, n2] W_N2^{n2 k2}     -- recurse over N2
  X[k1 + N1*k2] = D[k1, k2]

Everything is explicit real/imag fp32 einsums (`preferred_element_type`
float32) so the contractions land on the MXU regardless of how the backend
handles complex dtypes.  Transform axis is the LAST (minor) axis — callers
arrange layout so no hidden transposes appear.

Reference parity: fft_tensor uses torch.fft (cuFFT) as its transform
backend (e.g. fft_tensor/tensor.py:108,118); this module is the TPU-native
equivalent backend, exact vs jnp.fft to fp32 tolerance
(tests/unit/test_matfft.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# Largest DFT applied as a single dense matmul.  256x256 is MXU-sweet;
# anything bigger is factored.
_BASE = 256
# Preferred leading factor: 128 keeps every stage matmul at MXU tile size.
_FACTOR = 128


def plan_factors(n: int) -> tuple[int, ...]:
    """Factor n into matmul stage sizes (n must be a power of two here)."""
    if n & (n - 1):
        raise ValueError(f"matmul FFT requires power-of-two n, got {n}")
    fs = []
    while n > _BASE:
        fs.append(_FACTOR)
        n //= _FACTOR
    fs.append(n)
    return tuple(fs)


@functools.lru_cache(maxsize=64)
def _dft_mat(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(cos, -sin) of the n x n DFT matrix W[n1, k1] = exp(-2i pi n1 k1 / n)."""
    idx = np.outer(np.arange(n), np.arange(n)).astype(np.float64)
    ang = -2.0 * np.pi * idx / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _twiddle(n1: int, n2: int) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) of W_N^{k1 n2}, shape (n1, n2), N = n1*n2."""
    idx = np.outer(np.arange(n1), np.arange(n2)).astype(np.float64)
    ang = -2.0 * np.pi * idx / (n1 * n2)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


# TPU matmuls round fp32 inputs to bf16 at DEFAULT precision (measured
# 2e-3 relative error on the DFT); HIGHEST runs the 3-pass bf16 scheme,
# recovering fp32 accuracy at ~1/3 the bf16 rate — still MXU, still far
# ahead of the VPU FFT.  Callers wanting raw speed can flip this to
# 'default' via set_precision().
_PRECISION = jax.lax.Precision.HIGHEST


def set_precision(p) -> None:
    """Set the matmul precision for all FFT stages ('default'/'highest')."""
    global _PRECISION
    _PRECISION = p


def _stage_matmul(ar, ai, fr, fi):
    """Complex contraction over the second-to-last axis: (..., n, m) @ (n, k)."""
    mm = functools.partial(
        jnp.einsum,
        "...nm,nk->...km",
        preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )
    if ai is None:  # purely real input (first rfft stage): half the matmuls
        return mm(ar, fr), mm(ar, fi)
    return mm(ar, fr) - mm(ai, fi), mm(ar, fi) + mm(ai, fr)


def _fft_ri(xr, xi, factors):
    """Complex FFT along the last axis via matmul stages. xi=None means 0."""
    n = xr.shape[-1]
    if len(factors) == 1:
        fr, fi = (jnp.asarray(m) for m in _dft_mat(n))
        # single-stage: contraction over the last axis itself
        mm = functools.partial(
            jnp.einsum,
            "...n,nk->...k",
            preferred_element_type=jnp.float32,
            precision=_PRECISION,
        )
        if xi is None:
            return mm(xr, fr), mm(xr, fi)
        return mm(xr, fr) - mm(xi, fi), mm(xr, fi) + mm(xi, fr)

    n1, rest = factors[0], factors[1:]
    n2 = n // n1
    ar = xr.reshape(*xr.shape[:-1], n1, n2)
    ai = None if xi is None else xi.reshape(*xi.shape[:-1], n1, n2)

    fr, fi = (jnp.asarray(m) for m in _dft_mat(n1))
    br, bi = _stage_matmul(ar, ai, fr, fi)  # (..., k1, n2)

    tr, ti = (jnp.asarray(m) for m in _twiddle(n1, n2))
    cr = br * tr - bi * ti
    ci = br * ti + bi * tr

    dr, di = _fft_ri(cr, ci, rest)  # transform over n2 (last axis)

    # X[k1 + n1*k2] = D[k1, k2]  ->  axes (..., k1, k2) -> (..., k2, k1) -> flat
    xr_out = jnp.swapaxes(dr, -2, -1).reshape(*dr.shape[:-2], n)
    xi_out = jnp.swapaxes(di, -2, -1).reshape(*di.shape[:-2], n)
    return xr_out, xi_out


def fft_ri(xr: jax.Array, xi: jax.Array | None, n: int) -> tuple[jax.Array, jax.Array]:
    """Complex FFT (re, im) along the last axis, zero-padding to n."""
    if xr.shape[-1] < n:
        pad = [(0, 0)] * (xr.ndim - 1) + [(0, n - xr.shape[-1])]
        xr = jnp.pad(xr, pad)
        xi = None if xi is None else jnp.pad(xi, pad)
    return _fft_ri(xr, xi, plan_factors(n))


def rfft_matmul(x: jax.Array, n: int) -> jax.Array:
    """jnp.fft.rfft(x, n, axis=-1) equivalent; returns complex64 (n//2+1 bins)."""
    r, i = fft_ri(x, None, n)
    return jax.lax.complex(r[..., : n // 2 + 1], i[..., : n // 2 + 1])


def _full_from_half_ri(hr, hi, n):
    """Conjugate-symmetric full spectrum (re, im) from n//2+1 bins."""
    tail_r = hr[..., 1:-1][..., ::-1]
    tail_i = -hi[..., 1:-1][..., ::-1]
    return (
        jnp.concatenate([hr, tail_r], axis=-1),
        jnp.concatenate([hi, tail_i], axis=-1),
    )


def irfft_matmul(xf: jax.Array, n: int) -> jax.Array:
    """jnp.fft.irfft(xf, n, axis=-1) equivalent for xf with n//2+1 bins.

    ifft(X) = conj(fft(conj(X)))/n; for a conjugate-symmetric X the result
    is real, so only the real part of the forward transform is needed.
    """
    fr, fi = _full_from_half_ri(jnp.real(xf), jnp.imag(xf), n)
    # conj input -> fft -> real part (imag cancels for symmetric spectra)
    yr, _ = _fft_ri(fr, -fi, plan_factors(n))
    return yr / n


def spectral_conv_matmul(x: jax.Array, h_half: jax.Array, n: int) -> jax.Array:
    """irfft(rfft(x, n) * h, n)[..., :T] with both transforms on the MXU.

    ``x``: (..., T) real; ``h_half``: broadcastable to the (..., n//2+1)
    spectrum (complex).  The filter multiply happens in the half-spectrum
    (the conjugate-symmetric tail is derived after), so the parameter count
    matches the rfft formulation exactly.
    """
    t = x.shape[-1]
    xr, xi = fft_ri(x, None, n)
    half = n // 2 + 1
    hr_, hi_ = jnp.real(h_half), jnp.imag(h_half)
    pr = xr[..., :half] * hr_ - xi[..., :half] * hi_
    pi = xr[..., :half] * hi_ + xi[..., :half] * hr_
    fr, fi = _full_from_half_ri(pr, pi, n)
    yr, _ = _fft_ri(fr, -fi, plan_factors(n))
    return yr[..., :t] / n


def _self_test() -> None:
    rng = np.random.default_rng(0)
    for n in (256, 512, 1024, 2048, 8192):
        x = jnp.asarray(rng.standard_normal((3, min(n, 1500))).astype(np.float32))
        ref = jnp.fft.rfft(x, n=n, axis=-1)
        got = rfft_matmul(x, n)
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        assert err < 2e-5, (n, err)
        back = irfft_matmul(got, n)
        ref_b = jnp.fft.irfft(ref, n=n, axis=-1)
        err_b = float(jnp.max(jnp.abs(back - ref_b)))
        assert err_b < 2e-5, (n, err_b)
    print("matfft self-test OK")


if __name__ == "__main__":
    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    _self_test()
