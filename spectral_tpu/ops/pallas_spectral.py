"""Fused Pallas spectral-conv kernel: rFFT -> complex filter -> irFFT in one
VMEM-resident pass.

This is the BASELINE.json north-star kernel: the hot path of every spectral
block (reference: the cuFFT round-trips in train_fixed_full.py:507-555 and
the absent ``fft_tensor_cuda`` extension) executed without touching HBM
between the transforms.

Design:
* grid = (B, C/C_BLOCK); each program owns a (n_fft, C_BLOCK) panel.
* the FFT is a radix-2 **Stockham autosort** (no bit-reversal gathers — each
  stage is reshape + butterfly, which Mosaic lowers to VPU ops on VMEM
  values), real/imag carried as separate fp32 arrays (complex dtypes are not
  first-class in Mosaic).
* the filter H is the PRE-FUSED product  k̂ * sigmoid(gate_freq) * cutoff_mask
  extended to the full conjugate-symmetric spectrum, so one complex multiply
  applies kernel, frequency gate and curriculum mask at once; the real
  per-channel scales (gain * context gate) fold into the time-domain output.
* backward reuses the SAME kernel with conj(H) (the adjoint of a real
  convolution), with grad_H computed by an XLA rfft reduction — registered
  via ``jax.custom_vjp``.

Every entry point has a pure-jnp reference (`*_reference`) used as the
parity gate, mirroring the reference repo's CUDA-vs-PyTorch fallback design.
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
import numpy as np

try:  # Pallas is TPU/Mosaic-specific; keep the module importable anywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


# ---------------------------------------------------------------------------
# In-kernel Stockham radix-2 FFT on (N, C) panels, re/im separate
# ---------------------------------------------------------------------------


def _stockham_fft(re, im, inverse: bool):
    """Radix-2 Stockham autosort FFT along axis 0 of (N, C) fp32 arrays.

    Pure jnp on VALUES — usable both inside a Pallas kernel and as the
    interpret-mode/CPU reference.  Returns (re, im); the inverse includes the
    1/N scale.
    """
    n, c = re.shape
    stages = int(math.log2(n))
    assert 1 << stages == n, "n_fft must be a power of two"
    sign = 1.0 if inverse else -1.0

    for t in range(stages):
        ls = 1 << t  # half-butterfly length at this stage
        r = n // (2 * ls)
        # split into the two halves that combine at this stage
        a_re = re[: n // 2].reshape(r, ls, c)
        a_im = im[: n // 2].reshape(r, ls, c)
        b_re = re[n // 2 :].reshape(r, ls, c)
        b_im = im[n // 2 :].reshape(r, ls, c)

        # Mosaic requires integer iota; cast after
        j = jax.lax.broadcasted_iota(jnp.int32, (1, ls, 1), 1).astype(jnp.float32)
        ang = sign * 2.0 * np.pi * j / float(2 * ls)
        w_re = jnp.cos(ang)
        w_im = jnp.sin(ang)

        tb_re = w_re * b_re - w_im * b_im
        tb_im = w_re * b_im + w_im * b_re

        y_top_re = a_re + tb_re
        y_top_im = a_im + tb_im
        y_bot_re = a_re - tb_re
        y_bot_im = a_im - tb_im

        re = jnp.concatenate([y_top_re, y_bot_re], axis=1).reshape(n, c)
        im = jnp.concatenate([y_top_im, y_bot_im], axis=1).reshape(n, c)

    if inverse:
        re = re / n
        im = im / n
    return re, im


def full_filter_from_rfft(h_rfft: jax.Array, n_fft: int) -> jax.Array:
    """Extend an rFFT-domain filter [F=n_fft//2+1] (optionally per-channel
    [F, C]) to the full conjugate-symmetric spectrum [n_fft(, C)]."""
    tail = jnp.conj(h_rfft[1:-1][::-1])
    return jnp.concatenate([h_rfft, tail], axis=0)


# ---------------------------------------------------------------------------
# In-kernel MXU FFT: two DFT-matmul stages (four-step Cooley-Tukey)
# ---------------------------------------------------------------------------


def _split_factor(n: int) -> tuple[int, int]:
    """n = n1 * n2 with n1 the largest power of two <= 128."""
    n1 = min(128, n)
    while n % n1:
        n1 //= 2
    return n1, n // n1


@functools.lru_cache(maxsize=64)
def _dft_consts(n: int, sign: float) -> tuple[np.ndarray, np.ndarray]:
    """cos/sin of sign*2*pi*n1*k1/n as fp32 numpy (kernel constants)."""
    idx = np.outer(np.arange(n), np.arange(n)).astype(np.float64)
    ang = sign * 2.0 * np.pi * idx / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _twiddle_consts(n1: int, n2: int, sign: float) -> tuple[np.ndarray, np.ndarray]:
    idx = np.outer(np.arange(n1), np.arange(n2)).astype(np.float64)
    ang = sign * 2.0 * np.pi * idx / (n1 * n2)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _mat_stage1(re, im, f1c, f1s, n1, n2):
    """Stage 1: B[k1, (n2 c)] = sum_n1 F[n1,k1] A[n1,(n2 c)]; returns (n, c)."""
    n, c = re.shape
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    a_re = re.reshape(n1, n2 * c)
    if im is None:
        return dot(f1c.T, a_re).reshape(n, c), dot(f1s.T, a_re).reshape(n, c)
    a_im = im.reshape(n1, n2 * c)
    b_re = dot(f1c.T, a_re) - dot(f1s.T, a_im)
    b_im = dot(f1c.T, a_im) + dot(f1s.T, a_re)
    return b_re.reshape(n, c), b_im.reshape(n, c)


def _mat_stage2(re, im, twc, tws, f2c, f2s, n1, n2):
    """Twiddle + stage 2 + output reorder: (n, c) -> (n, c) FFT result."""
    n, c = re.shape
    b_re = re.reshape(n1, n2, c)
    b_im = im.reshape(n1, n2, c)
    c_re = b_re * twc[:, :, None] - b_im * tws[:, :, None]
    c_im = b_re * tws[:, :, None] + b_im * twc[:, :, None]
    # contract axis 1 (n2) with f2: dot_general -> (n1, c, k2), no pre-transpose
    dn = (((1,), (0,)), ((), ()))
    dg = functools.partial(jax.lax.dot_general, dimension_numbers=dn, preferred_element_type=jnp.float32)
    d_re = dg(c_re, f2c) - dg(c_im, f2s)  # (n1, c, k2)
    d_im = dg(c_re, f2s) + dg(c_im, f2c)
    # X[k1 + n1*k2]: (n1, c, k2) -> (k2, n1, c) -> (n, c)
    out_re = jnp.transpose(d_re, (2, 0, 1)).reshape(n, c)
    out_im = jnp.transpose(d_im, (2, 0, 1)).reshape(n, c)
    return out_re, out_im


def _matfft_panel(re, im, inverse: bool, mats=None):
    """FFT along axis 0 of an (n, c) panel via two MXU matmul stages.

    Values-based (usable in-kernel and as interpret reference).  ``im`` may
    be None (real input — first stage runs half the matmuls).  The inverse
    includes the 1/n scale.  ``mats``: optional FORWARD-sign
    (f1c, f1s, twc, tws, f2c, f2s); inverse negates the sine parts.
    """
    n, c = re.shape
    n1, n2 = _split_factor(n)
    if mats is None:
        f1c, f1s = (jnp.asarray(a) for a in _dft_consts(n1, -1.0))
        twc, tws = (jnp.asarray(a) for a in _twiddle_consts(n1, max(n2, 2), -1.0))
        f2c, f2s = (jnp.asarray(a) for a in _dft_consts(max(n2, 2), -1.0))
    else:
        f1c, f1s, twc, tws, f2c, f2s = mats
    if inverse:  # forward-sign tables, odd symmetry of sin
        f1s, tws, f2s = -f1s, -tws, -f2s

    out_re, out_im = _mat_stage1(re, im, f1c, f1s, n1, n2)
    if n2 > 1:
        out_re, out_im = _mat_stage2(out_re, out_im, twc, tws, f2c, f2s, n1, n2)
    if inverse:
        out_re = out_re / n
        out_im = out_im / n
    return out_re, out_im


def _conv_tables(n_fft: int):
    """FORWARD-sign DFT/twiddle tables for the transpose-free fused conv.

    Returns (f1c, f1s, tw1c, tw1s, f2c, f2s, twAc, twAs):
      f1 (n1, n1), tw1 (n1, n2), f2 (n2, n2) — forward stages;
      twA (n2, n1) — the INVERSE mid-twiddle exp(+2i pi k1 t2 / n) laid out
      (t2, k1) so the kernel needs no transposes (host-side tables only).
    """
    n1, n2 = _split_factor(n_fft)
    f1c, f1s = _dft_consts(n1, -1.0)
    tw1c, tw1s = _twiddle_consts(n1, max(n2, 2), -1.0)
    f2c, f2s = _dft_consts(max(n2, 2), -1.0)
    twAc, twAs = tw1c.T.copy(), (-tw1s.T).copy()
    return f1c, f1s, tw1c, tw1s, f2c, f2s, twAc, twAs


def _fused_conv_mxu_panel(x, h_re, h_im, tables, n_fft):
    """Transpose-free four-step conv on one (n_fft, c) REAL panel.

    Forward FFT is computed in digit-reversed (k2, k1) order, the filter is
    pre-permuted to that order, and the inverse consumes it back to natural
    time order — so every step is a `dot_general` with channels minor and
    there are NO in-kernel transposes (the VMEM killer of the naive
    formulation).  Returns the real time-domain result, NOT yet /n.
    """
    f1c, f1s, tw1c, tw1s, f2c, f2s, twAc, twAs = tables
    n1, n2 = _split_factor(n_fft)
    c = x.shape[-1]
    dg0 = functools.partial(  # contract lhs axis0 with rhs axis0
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dg1 = functools.partial(  # contract lhs axis0 with rhs axis1
        jax.lax.dot_general,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    if n2 == 1:  # single-stage DFT: everything stays 2-D
        b_re = dg0(f1c, x)
        b_im = dg0(f1s, x)
        hr2, hi2 = h_re[0], h_im[0]
        p_re = b_re * hr2 - b_im * hi2
        p_im = b_re * hi2 + b_im * hr2
        return dg0(f1c, p_re) + dg0(f1s, p_im)

    # ---- forward: A (n1, n2, c) -> D (k2, k1, c), digit-reversed ----
    a = x.reshape(n1, n2, c)
    b_re = dg0(f1c, a)  # (k1, n2, c); real input: half the matmuls
    b_im = dg0(f1s, a)
    c_re = b_re * tw1c[:, :, None] - b_im * tw1s[:, :, None]
    c_im = b_re * tw1s[:, :, None] + b_im * tw1c[:, :, None]
    d_re = dg1(f2c, c_re) - dg1(f2s, c_im)  # (k2, k1, c)
    d_im = dg1(f2c, c_im) + dg1(f2s, c_re)

    # ---- filter in (k2, k1, c) order ----
    p_re = d_re * h_re - d_im * h_im
    p_im = d_re * h_im + d_im * h_re

    # ---- inverse (sign-flipped tables), consuming (k2, k1, c) ----
    q_re = dg0(f2c, p_re) + dg0(f2s, p_im)  # G2 = (f2c, -f2s): (t2, k1, c)
    q_im = dg0(f2c, p_im) - dg0(f2s, p_re)
    r_re = q_re * twAc[:, :, None] - q_im * twAs[:, :, None]
    r_im = q_re * twAs[:, :, None] + q_im * twAc[:, :, None]
    # G1 = (f1c, -f1s), contract k1 (axis1 of r): output (t1, t2, c)
    y_re = dg1(f1c, r_re) + dg1(f1s, r_im)
    return y_re.reshape(n1 * n2, c)


def _fused_kernel_mxu(
    x_ref,
    hre_ref,
    him_ref,
    scale_ref,
    f1c_ref,
    f1s_ref,
    tw1c_ref,
    tw1s_ref,
    f2c_ref,
    f2s_ref,
    twAc_ref,
    twAs_ref,
    out_ref,
    *,
    n_fft: int,
    seq_len: int,
):
    """One (n_fft, C_BLOCK) panel, transpose-free MXU four-step conv."""
    tables = (
        f1c_ref[:, :],
        f1s_ref[:, :],
        tw1c_ref[:, :],
        tw1s_ref[:, :],
        f2c_ref[:, :],
        f2s_ref[:, :],
        twAc_ref[:, :],
        twAs_ref[:, :],
    )
    y = _fused_conv_mxu_panel(x_ref[0], hre_ref[:, :, :], him_ref[:, :, :], tables, n_fft)
    out_ref[0] = y[:seq_len, :] * (scale_ref[0] / float(n_fft))


def _fused_kernel_matmul(
    x_ref,
    hre_ref,
    him_ref,
    scale_ref,
    f1c_ref,
    f1s_ref,
    twc_ref,
    tws_ref,
    f2c_ref,
    f2s_ref,
    out_ref,
    *,
    n_fft: int,
    seq_len: int,
):
    """One (n_fft, C_BLOCK) panel via MXU matmul FFT stages: FFT -> *H ->
    IFFT -> *scale -> first T.  Intermediates ping-pong through two explicit
    VMEM scratch pairs so the live set stays bounded (the free-form values
    formulation stacked ~35 MB of temporaries at n_fft=2048)."""
    cb = x_ref.shape[2]
    n1, n2 = _split_factor(n_fft)
    f1c = f1c_ref[:, :]
    f1s = f1s_ref[:, :]
    twc = twc_ref[:, :]
    tws = tws_ref[:, :]
    f2c = f2c_ref[:, :]
    f2s = f2s_ref[:, :]

    def body(a_re, a_im, b_re, b_im):
        # forward stage 1 (real input)
        o_re, o_im = _mat_stage1(x_ref[0], None, f1c, f1s, n1, n2)
        a_re[:, :] = o_re
        a_im[:, :] = o_im
        # forward stage 2
        if n2 > 1:
            o_re, o_im = _mat_stage2(a_re[:, :], a_im[:, :], twc, tws, f2c, f2s, n1, n2)
            b_re[:, :] = o_re
            b_im[:, :] = o_im
            fr, fi = b_re, b_im
            dr, di = a_re, a_im
        else:
            fr, fi = a_re, a_im
            dr, di = b_re, b_im
        # fused filter multiply
        h_re = hre_ref[:, :]
        h_im = him_ref[:, :]
        dr[:, :] = fr[:, :] * h_re - fi[:, :] * h_im
        di[:, :] = fr[:, :] * h_im + fi[:, :] * h_re
        # inverse stage 1 (negated sines)
        o_re, o_im = _mat_stage1(dr[:, :], di[:, :], f1c, -f1s, n1, n2)
        fr[:, :] = o_re
        fi[:, :] = o_im
        # inverse stage 2 + 1/n + scale + causal slice
        if n2 > 1:
            o_re, _ = _mat_stage2(fr[:, :], fi[:, :], twc, -tws, f2c, -f2s, n1, n2)
        else:
            o_re = fr[:, :]
        out_ref[0] = o_re[:seq_len, :] * (scale_ref[0] / float(n_fft))

    pl.run_scoped(
        body,
        a_re=pltpu.VMEM((n_fft, cb), jnp.float32),
        a_im=pltpu.VMEM((n_fft, cb), jnp.float32),
        b_re=pltpu.VMEM((n_fft, cb), jnp.float32),
        b_im=pltpu.VMEM((n_fft, cb), jnp.float32),
    )


# ---------------------------------------------------------------------------
# Kernel body + pallas_call wrapper
# ---------------------------------------------------------------------------


def _stockham_stage(re, im, t: int, sign: float):
    """One radix-2 Stockham butterfly stage on (N, C) value pairs."""
    n, c = re.shape
    ls = 1 << t
    r = n // (2 * ls)
    a_re = re[: n // 2].reshape(r, ls, c)
    a_im = im[: n // 2].reshape(r, ls, c)
    b_re = re[n // 2 :].reshape(r, ls, c)
    b_im = im[n // 2 :].reshape(r, ls, c)
    j = jax.lax.broadcasted_iota(jnp.int32, (1, ls, 1), 1).astype(jnp.float32)
    ang = sign * 2.0 * np.pi * j / float(2 * ls)
    w_re = jnp.cos(ang)
    w_im = jnp.sin(ang)
    tb_re = w_re * b_re - w_im * b_im
    tb_im = w_re * b_im + w_im * b_re
    out_re = jnp.concatenate([a_re + tb_re, a_re - tb_re], axis=1).reshape(n, c)
    out_im = jnp.concatenate([a_im + tb_im, a_im - tb_im], axis=1).reshape(n, c)
    return out_re, out_im


def _fused_kernel_batched(x_ref, hre_ref, him_ref, scale_ref, out_ref, *, n_fft: int, seq_len: int):
    """One (n_fft, C_BLOCK) panel: FFT -> *H -> IFFT -> *scale -> first T.

    Batched operands carry a leading block dim of 1 (grid over B); squeeze
    with index 0.  The butterfly stages ping-pong between two explicit VMEM
    scratch pairs so the live set stays at ~4 panels + one stage's
    temporaries (letting Mosaic fit n_fft=2048 panels in 16 MB VMEM; a naive
    values-only formulation allocated ~17 panels and OOM'd the scoped vmem).
    """
    cb = x_ref.shape[2]
    stages = int(math.log2(n_fft))

    def body(a_re, a_im, b_re, b_im):
        a_re[:, :] = x_ref[0]
        a_im[:, :] = jnp.zeros((n_fft, cb), jnp.float32)
        bufs = [(a_re, a_im), (b_re, b_im)]
        src = 0
        for t in range(stages):
            sre, sim = bufs[src]
            dre, dim_ = bufs[1 - src]
            o_re, o_im = _stockham_stage(sre[:, :], sim[:, :], t, sign=-1.0)
            dre[:, :] = o_re
            dim_[:, :] = o_im
            src = 1 - src

        # fused filter multiply (kernel x gate x mask, conjugate-symmetric)
        sre, sim = bufs[src]
        dre, dim_ = bufs[1 - src]
        h_re = hre_ref[:, :]
        h_im = him_ref[:, :]
        re = sre[:, :]
        im = sim[:, :]
        dre[:, :] = re * h_re - im * h_im
        dim_[:, :] = re * h_im + im * h_re
        src = 1 - src

        for t in range(stages):
            sre, sim = bufs[src]
            dre, dim_ = bufs[1 - src]
            o_re, o_im = _stockham_stage(sre[:, :], sim[:, :], t, sign=1.0)
            dre[:, :] = o_re
            dim_[:, :] = o_im
            src = 1 - src

        final_re, _ = bufs[src]
        out_ref[0] = final_re[:seq_len, :] * (scale_ref[0] / float(n_fft))

    pl.run_scoped(
        body,
        a_re=pltpu.VMEM((n_fft, cb), jnp.float32),
        a_im=pltpu.VMEM((n_fft, cb), jnp.float32),
        b_re=pltpu.VMEM((n_fft, cb), jnp.float32),
        b_im=pltpu.VMEM((n_fft, cb), jnp.float32),
    )


# ---------------------------------------------------------------------------
# Public op with custom vjp
# ---------------------------------------------------------------------------


def fused_spectral_conv_reference(x: jax.Array, h_rfft: jax.Array, scale: jax.Array, n_fft: int) -> jax.Array:
    """Pure-jnp reference: y = irfft(rfft(pad(x)) * H)[:T] * scale.

    x: [B, T, C] real; h_rfft: [F] complex; scale: [B, C] real.
    """
    B, T, C = x.shape
    x_pad = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, n_fft - T), (0, 0)))
    xf = jnp.fft.rfft(x_pad, axis=1)
    h_b = h_rfft[None, :, None] if h_rfft.ndim == 1 else h_rfft[None, :, :]
    yf = xf * h_b
    y = jnp.fft.irfft(yf, n=n_fft, axis=1)[:, :T, :]
    return y * scale[:, None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_spectral_conv(
    x: jax.Array,
    h_rfft: jax.Array,
    scale: jax.Array,
    n_fft: int,
    c_block: int = 128,
    interpret: bool = False,
    algo: str = "matmul",
) -> jax.Array:
    """Fused causal spectral conv (Pallas): one VMEM pass per (b, C-block).

    y[b, :T, c] = (irfft(rfft(pad_T->n_fft(x[b,:,c])) * H))[:T] * scale[b, c]

    Args:
        x: [B, T, C] real input (pre-norm activations).
        h_rfft: [n_fft//2+1] complex fused filter = k̂·sigmoid(gate)·mask.
        scale: [B, C] real per-channel scale = gain * context gate.
        n_fft: static pow2 FFT length (>= T + K - 1).
        c_block: channel tile (multiple of 128 for fp32 lanes).
        interpret: run the kernel in interpreter mode (CPU testing).
    """
    return _forward_impl(x, h_rfft, scale, n_fft, c_block, interpret, algo)


def _forward_impl(x, h_rfft, scale, n_fft, c_block, interpret, algo="matmul"):
    B, T, C = x.shape
    if not PALLAS_AVAILABLE:
        return fused_spectral_conv_reference(x, h_rfft, scale, n_fft)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # Mosaic compiles only for TPU; interpret elsewhere
    h_full = full_filter_from_rfft(h_rfft, n_fft)
    x_pad = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, n_fft - T), (0, 0)))
    kernel_fn = _fused_kernel_mxu if algo == "matmul" else _fused_kernel_batched
    kernel = functools.partial(kernel_fn, n_fft=n_fft, seq_len=T)
    cb = min(c_block, C)
    while C % cb:
        cb //= 2
    # VMEM budget: ~8 live (n_fft, cb) fp32 panels (4 scratch + stage
    # temporaries) should fit the 16 MB scoped limit with headroom.
    # Mosaic requires the minor block dim to be a multiple of 128, so the
    # block can never shrink below that — past it, VMEM pressure has to be
    # solved inside the kernel (see PALLAS_OPTIMIZATION.md).
    while cb > 128 and 8 * n_fft * cb * 4 > 12 * 2**20:
        cb //= 2
    if h_full.ndim == 1:  # shared filter: one (n_fft, 1) column, broadcast in-kernel
        h_re, h_im = jnp.real(h_full)[:, None], jnp.imag(h_full)[:, None]
        h_spec = pl.BlockSpec((n_fft, 1), lambda b, c: (0, 0), memory_space=pltpu.VMEM)
    else:  # per-channel filter [n_fft, C]: tile the channel block with the data
        h_re, h_im = jnp.real(h_full), jnp.imag(h_full)
        h_spec = pl.BlockSpec((n_fft, cb), lambda b, c: (0, c), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, n_fft, cb), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
        h_spec,
        h_spec,
        pl.BlockSpec((1, 1, cb), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
    ]
    operands = [x_pad, h_re, h_im, scale.astype(jnp.float32)[:, None, :]]
    if algo == "matmul":
        # transpose-free kernel: the filter rides in digit-reversed
        # (k2, k1, c) order (a pure reshape of the natural spectrum), and the
        # DFT/twiddle tables ride as inputs (Pallas: no captured constants)
        n1, n2 = _split_factor(n_fft)
        if h_full.ndim == 1:
            h_re = jnp.real(h_full).reshape(n2, n1, 1)
            h_im = jnp.imag(h_full).reshape(n2, n1, 1)
            h_spec = pl.BlockSpec((n2, n1, 1), lambda b, c: (0, 0, 0), memory_space=pltpu.VMEM)
        else:
            h_re = jnp.real(h_full).reshape(n2, n1, C)
            h_im = jnp.imag(h_full).reshape(n2, n1, C)
            h_spec = pl.BlockSpec((n2, n1, cb), lambda b, c: (0, 0, c), memory_space=pltpu.VMEM)
        in_specs[1] = h_spec
        in_specs[2] = h_spec
        operands[1] = h_re
        operands[2] = h_im
        for m in _conv_tables(n_fft):
            in_specs.append(
                pl.BlockSpec(m.shape, functools.partial(lambda b, c, _s=(0, 0): _s), memory_space=pltpu.VMEM)
            )
            operands.append(jnp.asarray(m))
    return pl.pallas_call(
        kernel,
        grid=(B, C // cb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, cb), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
        interpret=interpret,
    )(*operands)


def _fsc_fwd(x, h_rfft, scale, n_fft, c_block, interpret, algo):
    # run the kernel with unit scale and apply scale outside (XLA fuses the
    # elementwise multiply) so the unscaled conv can ride in the residuals —
    # grad_scale then needs NO extra kernel run in the backward pass
    conv = _forward_impl(x, h_rfft, jnp.ones_like(scale), n_fft, c_block, interpret, algo)
    y = conv * scale[:, None, :]
    return y, (x, h_rfft, scale, conv)


def _fsc_bwd(n_fft, c_block, interpret, algo, res, g):
    x, h_rfft, scale, conv = res
    B, T, C = x.shape
    # grad wrt x: adjoint of a real conv = same kernel with conj(H), applied
    # to (g * scale) — reuses the fused Pallas kernel.
    gs = g * scale[:, None, :]
    grad_x = _forward_impl(gs, jnp.conj(h_rfft), jnp.ones_like(scale), n_fft, c_block, interpret, algo)
    # grad wrt H (JAX convention, verified against jax.vjp of the reference):
    #   grad_H[f] = w[f] * sum conj(rfft(pad(g*scale)))[f] * rfft(pad(x))[f]
    # with w = [1, 2, ..., 2, 1]/n (the irfft middle-bin doubling).  Both
    # transforms run on the MXU (ops/matfft packed rfft) instead of XLA's
    # VPU FFT — this was the backward-pass bottleneck of the kernel path.
    from spectral_tpu.ops import matfft

    gr, gi = matfft.rfft_ri(jnp.swapaxes(gs, 1, 2), n_fft)  # (B, C, F)
    xr, xi = matfft.rfft_ri(jnp.swapaxes(x.astype(jnp.float32), 1, 2), n_fft)
    prod_re = gr * xr + gi * xi  # conj(gf) * xf
    prod_im = gr * xi - gi * xr
    fbins = n_fft // 2 + 1
    w = jnp.concatenate(
        [
            jnp.full((1,), 1.0 / n_fft, jnp.float32),
            jnp.full((fbins - 2,), 2.0 / n_fft, jnp.float32),
            jnp.full((1,), 1.0 / n_fft, jnp.float32),
        ]
    )
    if h_rfft.ndim == 1:
        grad_h = jax.lax.complex(jnp.sum(prod_re, axis=(0, 1)) * w, jnp.sum(prod_im, axis=(0, 1)) * w)
    else:  # per-channel filter [F, C]: sum over batch only, axes back to (F, C)
        grad_h = jax.lax.complex(
            jnp.sum(prod_re, axis=0).T * w[:, None],
            jnp.sum(prod_im, axis=0).T * w[:, None],
        )
    # grad wrt scale: y = conv(x) * scale elementwise over (B, C); conv was
    # cached by the forward rule — no extra kernel run.
    grad_scale = jnp.sum(g * conv, axis=1)
    return grad_x, grad_h, grad_scale


fused_spectral_conv.defvjp(_fsc_fwd, _fsc_bwd)
