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


@functools.lru_cache(maxsize=32)
def _lowbin_np(T: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    t = np.arange(T)[:, None].astype(np.float64)
    j = np.arange(k)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * t * j / T
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def lowbin_tables(T: int, k: int) -> tuple[jax.Array, jax.Array]:
    """(T, k) cos/sin tables of the lowest k DFT bins (ang = 2π·t·j/T).

    The shared table source for the band-limited mixing paths
    (layers/spectral_layers.py and ops/pallas_bandlimited.py).

    Only the NUMPY tables are cached: a cached ``jnp.asarray`` created
    while TRACING is a DynamicJaxprTracer, and serving it to a later
    trace raises UnexpectedTracerError (hit by bench.py calling two
    pooled-harness jits in one process).  jnp conversion per call is a
    dedup'd trace constant — free."""
    c, s = _lowbin_np(T, k)
    return jnp.asarray(c), jnp.asarray(s)


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


def _stage_matmul(ar, ai, fr, fi, precision=None):
    """Complex contraction over the second-to-last axis: (..., n, m) @ (n, k)."""
    mm = functools.partial(
        jnp.einsum,
        "...nm,nk->...km",
        preferred_element_type=jnp.float32,
        precision=_PRECISION if precision is None else precision,
    )
    if ai is None:  # purely real input (first rfft stage): half the matmuls
        return mm(ar, fr), mm(ar, fi)
    return mm(ar, fr) - mm(ai, fi), mm(ar, fi) + mm(ai, fr)


def _fft_ri(xr, xi, factors, precision=None):
    """Complex FFT along the last axis via matmul stages. xi=None means 0."""
    n = xr.shape[-1]
    if len(factors) == 1:
        fr, fi = (jnp.asarray(m) for m in _dft_mat(n))
        # single-stage: contraction over the last axis itself
        mm = functools.partial(
            jnp.einsum,
            "...n,nk->...k",
            preferred_element_type=jnp.float32,
            precision=_PRECISION if precision is None else precision,
        )
        if xi is None:
            return mm(xr, fr), mm(xr, fi)
        return mm(xr, fr) - mm(xi, fi), mm(xr, fi) + mm(xi, fr)

    n1, rest = factors[0], factors[1:]
    n2 = n // n1
    ar = xr.reshape(*xr.shape[:-1], n1, n2)
    ai = None if xi is None else xi.reshape(*xi.shape[:-1], n1, n2)

    fr, fi = (jnp.asarray(m) for m in _dft_mat(n1))
    br, bi = _stage_matmul(ar, ai, fr, fi, precision)  # (..., k1, n2)

    tr, ti = (jnp.asarray(m) for m in _twiddle(n1, n2))
    cr = br * tr - bi * ti
    ci = br * ti + bi * tr

    dr, di = _fft_ri(cr, ci, rest, precision)  # transform over n2 (last axis)

    # X[k1 + n1*k2] = D[k1, k2]  ->  axes (..., k1, k2) -> (..., k2, k1) -> flat
    xr_out = jnp.swapaxes(dr, -2, -1).reshape(*dr.shape[:-2], n)
    xi_out = jnp.swapaxes(di, -2, -1).reshape(*di.shape[:-2], n)
    return xr_out, xi_out


def fft_ri(
    xr: jax.Array, xi: jax.Array | None, n: int, precision=None
) -> tuple[jax.Array, jax.Array]:
    """Complex FFT (re, im) along the last axis, zero-padding to n."""
    if xr.shape[-1] < n:
        pad = [(0, 0)] * (xr.ndim - 1) + [(0, n - xr.shape[-1])]
        xr = jnp.pad(xr, pad)
        xi = None if xi is None else jnp.pad(xi, pad)
    return _fft_ri(xr, xi, plan_factors(n), precision)


def rfft_matmul(x: jax.Array, n: int) -> jax.Array:
    """jnp.fft.rfft(x, n, axis=-1) equivalent; returns complex64 (n//2+1 bins)."""
    r, i = rfft_ri(x, n)
    return jax.lax.complex(r, i)


@functools.lru_cache(maxsize=64)
def _half_twiddle(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) of W_n^k = exp(-2i pi k / n), k = 0..n/2-1."""
    ang = -2.0 * np.pi * np.arange(n // 2, dtype=np.float64) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _rev_half(a):
    """a[(m - k) mod m] along the last axis (m = a.shape[-1])."""
    return jnp.concatenate([a[..., :1], a[..., 1:][..., ::-1]], axis=-1)


def rfft_ri(x: jax.Array, n: int, precision=None) -> tuple[jax.Array, jax.Array]:
    """Real-input FFT via the packed half-length trick: one complex
    FFT of size n/2 instead of size n (classic even/odd packing) —
    halves both matmul FLOPs and passes vs the naive real-as-complex
    transform.  Returns (re, im) of the n//2+1 rfft bins."""
    if x.shape[-1] < n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
        x = jnp.pad(x, pad)
    m = n // 2
    zr, zi = x[..., 0::2], x[..., 1::2]  # z = even + i*odd
    fr, fi = _fft_ri(zr, zi, plan_factors(m), precision)

    # E = (Z + conj(Z_rev))/2 (FFT of even part); O = (Z - conj(Z_rev))/(2i)
    rr, ri_ = _rev_half(fr), _rev_half(fi)
    er = 0.5 * (fr + rr)
    ei = 0.5 * (fi - ri_)
    our = 0.5 * (fi + ri_)  # O = ((fr - rr) + i(fi + ri)) / (2i) => re = (fi+ri)/2
    oui = -0.5 * (fr - rr)  # im = -(fr-rr)/2

    tr, ti = (jnp.asarray(t) for t in _half_twiddle(n))
    # X[k] = E[k] + W^k O[k], k < n/2
    xr = er + our * tr - oui * ti
    xi = ei + our * ti + oui * tr
    # X[n/2] = E[0] - O[0]
    last_r = (er[..., :1] - our[..., :1])
    last_i = (ei[..., :1] - oui[..., :1])
    return (
        jnp.concatenate([xr, last_r], axis=-1),
        jnp.concatenate([xi, last_i], axis=-1),
    )


def irfft_ri(hr: jax.Array, hi: jax.Array, n: int, precision=None) -> jax.Array:
    """Inverse of rfft_ri: (re, im) of n//2+1 bins -> real signal length n,
    via one complex IFFT of size n/2 (packed trick, run backwards)."""
    m = n // 2
    # jnp.fft.irfft convention: Im(X[0]) and Im(X[n/2]) only ever feed the
    # discarded imaginary output — zero them so arbitrary (non-Hermitian-
    # consistent) inputs match jnp bit-for-bit (branchless, no scatter)
    k = jnp.arange(m + 1)
    hi = hi * ((k != 0) & (k != m)).astype(hi.dtype)
    # k = 0..m-1; the reversed index n/2-k hits bin m..1 of the half spectrum
    ar, ai = hr[..., :m], hi[..., :m]
    br = hr[..., 1:][..., ::-1]  # X[n/2 - k], k=0 -> X[m]
    bi = hi[..., 1:][..., ::-1]
    er = 0.5 * (ar + br)
    ei = 0.5 * (ai - bi)
    dr = 0.5 * (ar - br)  # D = (X[k] - conj(X[m-k]))/2;  O = W^{-k} D
    di = 0.5 * (ai + bi)
    tr, ti = (jnp.asarray(t) for t in _half_twiddle(n))  # W^{+k}: (tr, ti)
    # W^{-k} = conj(W^k) = (tr, -ti)
    our = dr * tr + di * ti
    oui = di * tr - dr * ti
    # Z = E + i O
    zr = er - oui
    zi = ei + our
    # z = IFFT_m(Z) = conj(FFT_m(conj(Z))) / m
    wr, wi = _fft_ri(zr, -zi, plan_factors(m), precision)
    even = wr / m
    odd = -wi / m
    return jnp.stack([even, odd], axis=-1).reshape(*even.shape[:-1], n)


def _full_from_half_ri(hr, hi, n):
    """Conjugate-symmetric full spectrum (re, im) from n//2+1 bins."""
    tail_r = hr[..., 1:-1][..., ::-1]
    tail_i = -hi[..., 1:-1][..., ::-1]
    return (
        jnp.concatenate([hr, tail_r], axis=-1),
        jnp.concatenate([hi, tail_i], axis=-1),
    )


def irfft_matmul(xf: jax.Array, n: int) -> jax.Array:
    """jnp.fft.irfft(xf, n, axis=-1) equivalent for xf with n//2+1 bins."""
    return irfft_ri(jnp.real(xf), jnp.imag(xf), n)


def spectral_conv_matmul(x: jax.Array, h_half: jax.Array, n: int, precision=None) -> jax.Array:
    """irfft(rfft(x, n) * h, n)[..., :T] with both transforms on the MXU.

    ``x``: (..., T) real; ``h_half``: broadcastable to the (..., n//2+1)
    spectrum (complex).  Both directions use the packed half-length real
    transform (one complex FFT of n/2 each way).
    """
    t = x.shape[-1]
    xr, xi = rfft_ri(x, n, precision)
    hr_, hi_ = jnp.real(h_half), jnp.imag(h_half)
    pr = xr * hr_ - xi * hi_
    pi = xr * hi_ + xi * hr_
    return irfft_ri(pr, pi, n, precision)[..., :t]


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
