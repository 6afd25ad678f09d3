"""Fused Pallas spectral-conv kernel: rFFT -> complex filter -> irFFT in one
VMEM-resident pass.

STATUS (round 3, revised): PROMOTED BACK into the training default.  The
round-2 whole-block kernel (ops/pallas_block.py) superseded this kernel at
seq <= 2048-where-it-fits, and for a while it survived only as the sp
local backend + vjp canary — but the round-3 tail route (ops/pallas_tail.py)
made it the CONV of the long-sequence default: `tail_conv_backend="pallas"`
(models/fused_apply._tail_conv) dispatches here for 2048 < T <= 4096,
measured 1.70x the direct-Toeplitz tail at seq 4096 (45.25 ms/step, 724K
tok/s — BENCHMARKS.md "Tail-route conv crossover").  Its jobs now:
  1. the tail route's conv backend at 2048 < T <= 4096 (fwd kernel + the
     fused/unslabbed or k2-slabbed backward below);
  2. the sequence-parallel LOCAL backend (parallel/distributed_fft.py
     dispatches backend="pallas" for the per-shard full-length conv);
  3. the driver-tracked custom-vjp canary (bench.py --backend pallas /
     the `pallas_*` fields of the train-step metric line);
  4. the in-kernel Stockham/four-step FFT reference implementation.
The SHORT-sequence negative result stands: at seq 1024 the whole-block
kernel's Toeplitz conv wins (BENCHMARKS.md round 2) — the crossover lives
in fused_apply._tail_conv, not here.

This is the BASELINE.json north-star kernel of round 1: the hot path of
every spectral block (reference: the cuFFT round-trips in
train_fixed_full.py:507-555 and the absent ``fft_tensor_cuda`` extension)
executed without touching HBM between the transforms.

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
      f1 (n1, n1), f2 (n2, n2) — forward stage matrices;
      tw1 (n2, 1, n1) — the forward mid-twiddle exp(-2i pi k1 n2' / n) laid
      out for the kernel's (n2, c, k1) intermediate order;
      twA (n2, 1, n1) — the INVERSE mid-twiddle exp(+2i pi k1 t2 / n), same
      layout.  Host-side tables only — the kernel does no transposes.
    """
    n1, n2 = _split_factor(n_fft)
    f1c, f1s = _dft_consts(n1, -1.0)
    tw1c, tw1s = _twiddle_consts(n1, max(n2, 2), -1.0)
    f2c, f2s = _dft_consts(max(n2, 2), -1.0)
    m = max(n2, 2)
    tw1c_p = tw1c.T.copy().reshape(m, 1, n1)
    tw1s_p = tw1s.T.copy().reshape(m, 1, n1)
    twAc_p = tw1c.T.copy().reshape(m, 1, n1)  # cos is even
    twAs_p = (-tw1s.T).copy().reshape(m, 1, n1)  # sign-flipped sin
    return f1c, f1s, tw1c_p, tw1s_p, f2c, f2s, twAc_p, twAs_p


# dot_general helpers shared by the panel pipelines
_dg_kw = dict(preferred_element_type=jnp.float32)
_dg00 = functools.partial(  # contract lhs axis0 with rhs axis0
    jax.lax.dot_general, dimension_numbers=(((0,), (0,)), ((), ())), **_dg_kw
)
_dg12 = functools.partial(  # contract lhs axis1 with rhs axis2 (both minor)
    jax.lax.dot_general, dimension_numbers=(((1,), (2,)), ((), ())), **_dg_kw
)


def _dots_for(cdt):
    """(dg00, dg12) casting matmul OPERANDS to ``cdt`` (accumulation stays
    fp32 via preferred_element_type).  cdt=None keeps fp32 operands.

    WHY: Mosaic fp32 dots run the accurate multi-pass scheme (~1/3 the
    bf16 MXU rate — they do NOT replicate XLA DEFAULT's operand rounding,
    chip parity finding).  The conv profile at seq 4096 showed the fused
    conv fwd+bwd is fp32-MXU-bound (2.38 ms of the 45 ms step x12); bf16
    operands are the same numerics class as the XLA DEFAULT-precision
    convs the descent gates already validated.  Elementwise twiddle and
    filter products stay fp32 on the VPU either way.
    """
    if cdt is None or jnp.dtype(cdt) == jnp.float32:
        return _dg00, _dg12
    dt = jnp.dtype(cdt)
    return (
        lambda a, b: _dg00(a.astype(dt), b.astype(dt)),
        lambda a, b: _dg12(a.astype(dt), b.astype(dt)),
    )


def _fused_conv_mxu_panel(x, h_re, h_im, tables, n_fft, cdt=None):
    """Transpose-free four-step conv on one (n_fft, c) REAL panel.

    Intermediates ride in (stage, c, k1) order — k1 on the lane axis — so
    every contraction is over axis 0 or the minor axis and Mosaic never
    relayouts a panel (measured 12% faster than the earlier (k2, k1, c)
    order at n_fft=4096, and much cheaper to compile).  The filter is
    pre-permuted host-side to (k2, c, k1); the inverse consumes it straight
    back to natural time order.  Returns the real result, NOT yet /n.
    """
    f1c, f1s, tw1c, tw1s, f2c, f2s, twAc, twAs = tables
    n1, n2 = _split_factor(n_fft)
    c = x.shape[-1]
    dg0, dg12 = _dots_for(cdt)

    if n2 == 1:  # single-stage DFT: everything stays 2-D
        b_re = dg0(f1c, x)
        b_im = dg0(f1s, x)
        hr2, hi2 = h_re[0], h_im[0]
        p_re = b_re * hr2 - b_im * hi2
        p_im = b_re * hi2 + b_im * hr2
        return dg0(f1c, p_re) + dg0(f1s, p_im)

    # ---- forward: A (n1, n2, c) -> D (k2, c, k1), digit-reversed ----
    a = x.reshape(n1, n2, c)
    b_re = dg0(a, f1c)  # (n2, c, k1); real input: half the matmuls
    b_im = dg0(a, f1s)
    c_re = b_re * tw1c - b_im * tw1s  # tw (n2, 1, k1)
    c_im = b_re * tw1s + b_im * tw1c
    d_re = dg0(f2c, c_re) - dg0(f2s, c_im)  # (k2, c, k1)
    d_im = dg0(f2c, c_im) + dg0(f2s, c_re)

    # ---- filter in (k2, c, k1) order ----
    p_re = d_re * h_re - d_im * h_im
    p_im = d_re * h_im + d_im * h_re

    # ---- inverse (sign-flipped tables), consuming (k2, c, k1) ----
    q_re = dg0(f2c, p_re) + dg0(f2s, p_im)  # G2 = (f2c, -f2s): (t2, c, k1)
    q_im = dg0(f2c, p_im) - dg0(f2s, p_re)
    r_re = q_re * twAc - q_im * twAs  # twA (t2, 1, k1)
    r_im = q_re * twAs + q_im * twAc
    # G1 = (f1c, -f1s), contract k1 (minor of both): output (t1, t2, c)
    y_re = dg12(f1c, r_re) + dg12(f1s, r_im)
    return y_re.reshape(n1 * n2, c)


def _pad_panel(x2d, n_fft: int):
    """Zero-extend a (T, c) panel to (n_fft, c) inside the kernel (keeps the
    HBM block at T rows — the padding never travels over the memory bus)."""
    t, c = x2d.shape
    if t == n_fft:
        return x2d
    return jnp.concatenate([x2d, jnp.zeros((n_fft - t, c), jnp.float32)], axis=0)


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
    slab: int = 0,
    cdt=None,
):
    """One (n_fft, C_BLOCK) panel, transpose-free MXU four-step conv.

    ``slab`` > 0 switches to the k1-slabbed pipeline (see
    :func:`_fused_conv_mxu_slabbed`) for n_fft where the unslabbed live set
    exceeds VMEM (the VERDICT round-1 "n_fft >= 4096 cliff").  ``cdt``
    casts the matmul operands (see :func:`_dots_for`).
    """
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
    x2d = _pad_panel(x_ref[0], n_fft)
    if slab:
        _fused_conv_mxu_slabbed(
            x2d, hre_ref, him_ref, tables, n_fft, slab, out_ref, scale_ref,
            seq_len, cdt,
        )
    else:
        y = _fused_conv_mxu_panel(x2d, hre_ref[:, :, :], him_ref[:, :, :], tables, n_fft, cdt)
        out_ref[0] = y[:seq_len, :] * (scale_ref[0] / float(n_fft))


def _fused_conv_mxu_slabbed(
    x2d, hre_ref, him_ref, tables, n_fft: int, slab: int, out_ref, scale_ref,
    seq_len: int, cdt=None,
):
    """k1-slabbed transpose-free four-step conv on one (n_fft, c) panel.

    The unslabbed pipeline's intermediates are all full (n_fft, c) panels —
    ~8 live at once, which exceeds VMEM at n_fft >= 4096.  Every stage
    between the two n1-contractions is elementwise in k1, so the pipeline
    runs per k1-slab of ``slab`` columns: stage-1 produces only the slab's
    rows, the filter/twiddles are slab-sliced, and the inverse stage-1
    contribution of each slab accumulates into ``out_ref``.  Live set:
    x panel + filter + output + O(slab) temporaries + ONE full partial
    (the inverse stage-1 output spans all t1) — bounded regardless of n_fft.
    """
    f1c, f1s, tw1c, tw1s, f2c, f2s, twAc, twAs = tables
    n1, n2 = _split_factor(n_fft)
    assert n2 > 1 and n1 % slab == 0
    c = x2d.shape[-1]

    a = x2d.reshape(n1, n2, c)
    inv_n = 1.0 / float(n_fft)
    dg0, dg12 = _dots_for(cdt)
    for j in range(n1 // slab):
        sl = slice(j * slab, (j + 1) * slab)
        f1c_s = f1c[:, sl]  # (n1, slab) — f1 is symmetric: cols S == rows S
        f1s_s = f1s[:, sl]
        # forward stage 1, slab k1 columns only: (n2, c, slab)
        b_re = dg0(a, f1c_s)
        b_im = dg0(a, f1s_s)
        twc = tw1c[:, :, sl]  # (n2, 1, slab)
        tws = tw1s[:, :, sl]
        c_re = b_re * twc - b_im * tws
        c_im = b_re * tws + b_im * twc
        # forward stage 2: (k2, c, slab)
        d_re = dg0(f2c, c_re) - dg0(f2s, c_im)
        d_im = dg0(f2c, c_im) + dg0(f2s, c_re)
        # filter in digit-reversed (k2, c, k1) order, slab-sliced on k1
        h_re = hre_ref[:, :, sl]
        h_im = him_ref[:, :, sl]
        p_re = d_re * h_re - d_im * h_im
        p_im = d_re * h_im + d_im * h_re
        # inverse stage 2 (sign-flipped): (t2, c, slab)
        q_re = dg0(f2c, p_re) + dg0(f2s, p_im)
        q_im = dg0(f2c, p_im) - dg0(f2s, p_re)
        tAc = twAc[:, :, sl]
        tAs = twAs[:, :, sl]
        r_re = q_re * tAc - q_im * tAs
        r_im = q_re * tAs + q_im * tAc
        # inverse stage 1: contract the slab's k1 -> full (t1, t2, c) partial
        y_re = dg12(f1c_s, r_re) + dg12(f1s_s, r_im)
        part = y_re.reshape(n_fft, c)[:seq_len, :]
        if j == 0:
            out_ref[0] = part
        else:
            out_ref[0] += part
    out_ref[0] *= scale_ref[0] * inv_n


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
        a_re[:, :] = _pad_panel(x_ref[0], n_fft)
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
# Fused backward kernel: grad_x + grad_H products in ONE VMEM pass
# ---------------------------------------------------------------------------


def _panel_fwd_stages(x2d, tables, n_fft, cdt=None):
    """Forward four-step stages of one real (n_fft, c) panel -> digit-
    reversed (k2, c, k1) spectrum (re, im).  Shared by the bwd kernel."""
    f1c, f1s, tw1c, tw1s, f2c, f2s, _, _ = tables
    n1, n2 = _split_factor(n_fft)
    dg0, _ = _dots_for(cdt)
    a = x2d.reshape(n1, n2, x2d.shape[-1])
    b_re = dg0(a, f1c)
    b_im = dg0(a, f1s)
    c_re = b_re * tw1c - b_im * tw1s
    c_im = b_re * tw1s + b_im * tw1c
    d_re = dg0(f2c, c_re) - dg0(f2s, c_im)
    d_im = dg0(f2c, c_im) + dg0(f2s, c_re)
    return d_re, d_im


def _panel_inv_stages(p_re, p_im, tables, n_fft, cdt=None):
    """Inverse four-step stages: digit-reversed (k2, c, k1) -> real
    (n_fft, c) time panel (NOT yet /n).  Shared by the bwd kernel."""
    f1c, f1s, _, _, f2c, f2s, twAc, twAs = tables
    n1, n2 = _split_factor(n_fft)
    c = p_re.shape[1]
    dg0, dg12 = _dots_for(cdt)
    q_re = dg0(f2c, p_re) + dg0(f2s, p_im)
    q_im = dg0(f2c, p_im) - dg0(f2s, p_re)
    r_re = q_re * twAc - q_im * twAs
    r_im = q_re * twAs + q_im * twAc
    y_re = dg12(f1c, r_re) + dg12(f1s, r_im)
    return y_re.reshape(n_fft, c)


def _fused_bwd_kernel_mxu(
    gs_ref,
    x_ref,
    hre_ref,
    him_ref,
    f1c_ref,
    f1s_ref,
    tw1c_ref,
    tw1s_ref,
    f2c_ref,
    f2s_ref,
    twAc_ref,
    twAs_ref,
    gx_ref,
    ghre_ref,
    ghim_ref,
    *,
    n_fft: int,
    seq_len: int,
    per_channel: bool,
    cdt=None,
):
    """Fused backward: per (c-block, b) cell compute BOTH
    grad_x = irfft(rfft(pad(gs)) * conj(H))[:T]  and the filter-cotangent
    product conj(Ĝ)·X̂ accumulated into a digit-reversed full-spectrum
    output (the host reorders to natural bins, slices the rfft half and
    applies the irfft bin weights).  One VMEM pass, 3 in-kernel transforms,
    no HBM spectra — replaces the 2 standalone XLA/matfft rffts of the
    unfused rule.  b is the inner grid axis, so the grad-H output block is
    revisited consecutively (legal accumulation).
    """
    tables = (
        f1c_ref[:, :],
        f1s_ref[:, :],
        tw1c_ref[:, :, :],
        tw1s_ref[:, :, :],
        f2c_ref[:, :],
        f2s_ref[:, :],
        twAc_ref[:, :, :],
        twAs_ref[:, :, :],
    )
    gs2d = _pad_panel(gs_ref[0], n_fft)
    x2d = _pad_panel(x_ref[0], n_fft)

    g_re, g_im = _panel_fwd_stages(gs2d, tables, n_fft, cdt)  # (k2, c, k1)
    x_re, x_im = _panel_fwd_stages(x2d, tables, n_fft, cdt)

    # grad_x: multiply by conj(H) and invert
    h_re = hre_ref[:, :, :]
    h_im = him_ref[:, :, :]
    p_re = g_re * h_re + g_im * h_im
    p_im = g_im * h_re - g_re * h_im
    gx = _panel_inv_stages(p_re, p_im, tables, n_fft, cdt)
    gx_ref[0] = gx[:seq_len, :] * (1.0 / float(n_fft))

    # grad_H product: conj(Ĝ)·X̂, accumulated over the batch grid axis
    # (and over channels in-kernel when the filter is shared)
    gh_re = g_re * x_re + g_im * x_im
    gh_im = g_re * x_im - g_im * x_re
    if not per_channel:
        gh_re = jnp.sum(gh_re, axis=1, keepdims=True)
        gh_im = jnp.sum(gh_im, axis=1, keepdims=True)

    b = pl.program_id(1)
    first = (b == 0) if per_channel else ((b == 0) & (pl.program_id(0) == 0))

    @pl.when(first)
    def _init():
        ghre_ref[:, :, :] = gh_re
        ghim_ref[:, :, :] = gh_im

    @pl.when(jnp.logical_not(first))
    def _acc():
        ghre_ref[:, :, :] += gh_re
        ghim_ref[:, :, :] += gh_im


def _fused_bwd_kernel_mxu_slabbed(
    gs_ref,
    x_ref,
    hre_ref,
    him_ref,
    f1c_ref,
    f1s_ref,
    tw1c_ref,
    tw1s_ref,
    f2c_ref,
    f2s_ref,
    twAc_ref,
    twAs_ref,
    f2oc_ref,
    f2os_ref,
    f2ic_ref,
    f2is_ref,
    gx_ref,
    ghre_ref,
    ghim_ref,
    *,
    n_fft: int,
    seq_len: int,
    per_channel: bool,
    slab: int,
    cdt=None,
):
    """k2-slabbed fused backward (same math as ``_fused_bwd_kernel_mxu``;
    shared-filter panels only).

    The unslabbed backward holds ~10 full (n_fft, c) panels live (two
    input spectra, the conj-filter product, the inverse pipeline), which
    stops fitting VMEM at n_fft >= 16384 — the round-3 reason seq-8192
    training fell back to the XLA matmul-FFT conv.  Slabbing choices:

    * k1 CANNOT be the slab axis: k1 is the LANE dimension of every
      intermediate, and Mosaic rejects dot_generals over sub-128 lane
      extents ("infer-vector-layout: unsupported shape cast" — chip-
      found).  Every op here keeps k1 = n1 = 128 full lanes.
    * k2 CAN: the stage-2 contraction is independent per k2 output row
      (slice f2's columns), the filter/grad-H products are elementwise in
      k2, and the inverse stage-2 contraction over k2 accumulates across
      slabs into full (t2, c, k1) carries.  Only the twiddled stage-1
      spectra (2 panels each for gs and x) and the q accumulators stay
      full — the full stage-2 spectra of the unslabbed kernel are never
      materialized.
    * stage 1 skips the zero-pad rows: time rows t = i*n2 + j vanish for
      i >= ceil(T/n2), so the contraction runs over the first ceil(T/n2)
      rows of f1 — no (n_fft, c) padded panel is built at all.
    """
    f1c, f1s = f1c_ref[:, :], f1s_ref[:, :]
    tw1c, tw1s = tw1c_ref[:, :, :], tw1s_ref[:, :, :]
    f2c, f2s = f2c_ref[:, :], f2s_ref[:, :]
    twAc, twAs = twAc_ref[:, :, :], twAs_ref[:, :, :]
    n1, n2 = _split_factor(n_fft)
    inv_n = 1.0 / float(n_fft)
    c = gs_ref.shape[-1]

    # truncated stage 1: only rows i < r0 of the (n1, n2, c) view are nonzero
    r0 = -(-seq_len // n2)
    gs2d = _pad_panel(gs_ref[0], r0 * n2)
    x2d = _pad_panel(x_ref[0], r0 * n2)
    g_a = gs2d.reshape(r0, n2, c)
    x_a = x2d.reshape(r0, n2, c)
    f1c_t, f1s_t = f1c[:r0, :], f1s[:r0, :]

    dg0, dg12 = _dots_for(cdt)
    gb_re, gb_im = dg0(g_a, f1c_t), dg0(g_a, f1s_t)  # (n2, c, k1)
    gc_re = gb_re * tw1c - gb_im * tw1s
    gc_im = gb_re * tw1s + gb_im * tw1c
    xb_re, xb_im = dg0(x_a, f1c_t), dg0(x_a, f1s_t)
    xc_re = xb_re * tw1c - xb_im * tw1s
    xc_im = xb_re * tw1s + xb_im * tw1c

    b = pl.program_id(1)
    first = (b == 0) if per_channel else ((b == 0) & (pl.program_id(0) == 0))
    nslab = n2 // slab

    def body(q_re, q_im):
        q_re[:, :, :] = jnp.zeros((n2, c, n1), jnp.float32)
        q_im[:, :, :] = jnp.zeros((n2, c, n1), jnp.float32)

        # one fori_loop iteration per k2-slab (NOT a Python unroll: the
        # unrolled form at nslab=16 produced a ~200-dot_general Mosaic
        # program whose compile exceeded 50 minutes — chip-found).  The
        # stacked slab tables ride as refs indexed on their outer axis;
        # the filter/grad-H refs use pl.ds sublane windows.
        def step(j, _):
            sl = pl.ds(j * slab, slab)
            f2c_o, f2s_o = f2oc_ref[j], f2os_ref[j]  # (n2, slab)
            # stage-2 spectra, k2-slab rows only: (slab, c, k1)
            g_re = dg0(f2c_o, gc_re) - dg0(f2s_o, gc_im)
            g_im = dg0(f2c_o, gc_im) + dg0(f2s_o, gc_re)
            x_re = dg0(f2c_o, xc_re) - dg0(f2s_o, xc_im)
            x_im = dg0(f2c_o, xc_im) + dg0(f2s_o, xc_re)

            # grad_H product slab: conj(Ĝ)·X̂ (digit-reversed rows sl)
            gh_re = g_re * x_re + g_im * x_im
            gh_im = g_re * x_im - g_im * x_re
            if not per_channel:
                gh_re = jnp.sum(gh_re, axis=1, keepdims=True)
                gh_im = jnp.sum(gh_im, axis=1, keepdims=True)

            @pl.when(first)
            def _init():
                ghre_ref[sl, :, :] = gh_re
                ghim_ref[sl, :, :] = gh_im

            @pl.when(jnp.logical_not(first))
            def _acc():
                ghre_ref[sl, :, :] += gh_re
                ghim_ref[sl, :, :] += gh_im

            # grad_x: conj(H) multiply + the slab's partial inverse stage 2
            h_re, h_im = hre_ref[sl, :, :], him_ref[sl, :, :]
            p_re = g_re * h_re + g_im * h_im
            p_im = g_im * h_re - g_re * h_im
            f2c_i, f2s_i = f2ic_ref[j], f2is_ref[j]  # (slab, n2)
            q_re[:, :, :] += dg0(f2c_i, p_re) + dg0(f2s_i, p_im)
            q_im[:, :, :] += dg0(f2c_i, p_im) - dg0(f2s_i, p_re)
            return 0

        jax.lax.fori_loop(0, nslab, step, 0)

        # inverse twiddle + inverse stage 1 (full k1 lanes — proven ops)
        r_re = q_re[:, :, :] * twAc - q_im[:, :, :] * twAs
        r_im = q_re[:, :, :] * twAs + q_im[:, :, :] * twAc
        y_re = dg12(f1c, r_re) + dg12(f1s, r_im)  # (n1, t2, c)
        gx_ref[0] = y_re.reshape(n_fft, c)[:seq_len, :] * inv_n

    pl.run_scoped(
        body,
        q_re=pltpu.VMEM((n2, c, n1), jnp.float32),
        q_im=pltpu.VMEM((n2, c, n1), jnp.float32),
    )


@functools.lru_cache(maxsize=32)
def _bwd_slab_tables(n_fft: int, slab: int) -> tuple[np.ndarray, ...]:
    """Stacked k2-slab views of the stage-2 DFT matrix for the slabbed
    backward's fori_loop: output slabs f2[:, sl] as (nslab, n2, slab) and
    contraction slabs f2[sl, :] as (nslab, slab, n2) — dynamic indexing
    stays on the OUTER axis (lane/sublane dynamic slicing of values is
    what Mosaic rejects)."""
    n1, n2 = _split_factor(n_fft)
    f2c, f2s = _dft_consts(max(n2, 2), -1.0)
    nslab = n2 // slab
    f2oc = np.stack([f2c[:, j * slab:(j + 1) * slab] for j in range(nslab)])
    f2os = np.stack([f2s[:, j * slab:(j + 1) * slab] for j in range(nslab)])
    f2ic = np.stack([f2c[j * slab:(j + 1) * slab, :] for j in range(nslab)])
    f2is = np.stack([f2s[j * slab:(j + 1) * slab, :] for j in range(nslab)])
    return f2oc, f2os, f2ic, f2is


def _bwd_vmem_estimate(n_fft: int, cb: int, seq_len: int, slab: int) -> int:
    """Planning model of the k2-SLABBED backward kernel's VMEM footprint
    (shared filter)."""
    row = cb * 4
    # double-buffered HBM blocks: gs + x in, gx out
    blocks = 2 * row * 3 * seq_len
    n1, n2 = _split_factor(n_fft)
    # 4 twiddled stage-1 spectra + 2 q accumulators + the final y panel
    # (+ its reshape copy), each (n2, c, n1) = n_fft * row bytes, plus
    # ~10 slab-sized stage-2/product temporaries
    temps = row * (8 * n_fft + 10 * slab * n1)
    return blocks + temps + (2 << 20)


def _pick_bwd_slab(n_fft: int, cb: int, seq_len: int, per_channel: bool) -> int | None:
    """Slab width for the fused backward: 0 = unslabbed fits, None = no fit."""
    n1, n2 = _split_factor(n_fft)
    if n2 <= 1:
        return None  # single-stage shapes keep the unfused rule
    if 2 * _kernel_vmem_estimate(n_fft, cb, seq_len, per_channel, 0) <= _VMEM_LIMIT:
        return 0
    if per_channel:
        return None  # slabbed kernel carries shared-filter blocks only
    for s in (64, 32, 16, 8, 4):
        if n2 % s:
            continue
        if _bwd_vmem_estimate(n_fft, cb, seq_len, s) <= _VMEM_LIMIT:
            return s
    return None


def _fused_bwd_impl(gs, x, h_rfft, n_fft, c_block, interpret, slab: int = 0,
                    compute_dtype="float32"):
    """pallas_call wrapper for the fused backward.  Returns
    (grad_x [B,T,C], grad_h [F] or [F,C] complex)."""
    B, T, C = x.shape
    per_channel = h_rfft.ndim > 1
    h_full = full_filter_from_rfft(h_rfft, n_fft)
    n1, n2 = _split_factor(n_fft)
    cb = min(c_block, C)
    while C % cb:
        cb //= 2
    if not interpret and jax.default_backend() == "cpu":
        interpret = True

    if per_channel:
        h_re = jnp.transpose(jnp.real(h_full).reshape(n2, n1, C), (0, 2, 1))
        h_im = jnp.transpose(jnp.imag(h_full).reshape(n2, n1, C), (0, 2, 1))
        h_spec = pl.BlockSpec((n2, cb, n1), lambda c, b: (0, c, 0), memory_space=pltpu.VMEM)
        gh_shape = (n2, C, n1)
        gh_spec = pl.BlockSpec((n2, cb, n1), lambda c, b: (0, c, 0), memory_space=pltpu.VMEM)
    else:
        h_re = jnp.real(h_full).reshape(n2, 1, n1)
        h_im = jnp.imag(h_full).reshape(n2, 1, n1)
        h_spec = pl.BlockSpec((n2, 1, n1), lambda c, b: (0, 0, 0), memory_space=pltpu.VMEM)
        gh_shape = (n2, 1, n1)
        gh_spec = pl.BlockSpec((n2, 1, n1), lambda c, b: (0, 0, 0), memory_space=pltpu.VMEM)

    data_spec = pl.BlockSpec((1, T, cb), lambda c, b: (b, 0, c), memory_space=pltpu.VMEM)
    in_specs = [data_spec, data_spec, h_spec, h_spec]
    operands = [gs.astype(jnp.float32), x.astype(jnp.float32), h_re, h_im]
    tables = list(_conv_tables(n_fft))
    if slab:
        tables += list(_bwd_slab_tables(n_fft, slab))
    for m in tables:
        in_specs.append(
            pl.BlockSpec(
                m.shape,
                functools.partial(lambda c, b, _s: _s, _s=(0,) * m.ndim),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(jnp.asarray(m))

    cdt = None if jnp.dtype(compute_dtype) == jnp.float32 else jnp.dtype(compute_dtype)
    if slab:
        kernel = functools.partial(
            _fused_bwd_kernel_mxu_slabbed, n_fft=n_fft, seq_len=T,
            per_channel=per_channel, slab=slab, cdt=cdt,
        )
    else:
        kernel = functools.partial(
            _fused_bwd_kernel_mxu, n_fft=n_fft, seq_len=T,
            per_channel=per_channel, cdt=cdt,
        )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    grad_x, ghre, ghim = pl.pallas_call(
        kernel,
        grid=(C // cb, B),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, T, cb), lambda c, b: (b, 0, c), memory_space=pltpu.VMEM),
            gh_spec,
            gh_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), jnp.float32),
            jax.ShapeDtypeStruct(gh_shape, jnp.float32),
            jax.ShapeDtypeStruct(gh_shape, jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(*operands)

    # digit-reversed (k2, c, k1) -> natural bins (n, c): k = k1 + n1*k2,
    # i.e. (k2, k1, c) k2-major flattens to the natural order
    fbins = n_fft // 2 + 1
    ghre_n = jnp.transpose(ghre, (0, 2, 1)).reshape(n_fft, -1)[:fbins]
    ghim_n = jnp.transpose(ghim, (0, 2, 1)).reshape(n_fft, -1)[:fbins]
    w = jnp.concatenate(
        [
            jnp.full((1,), 1.0 / n_fft, jnp.float32),
            jnp.full((fbins - 2,), 2.0 / n_fft, jnp.float32),
            jnp.full((1,), 1.0 / n_fft, jnp.float32),
        ]
    )[:, None]
    grad_h = jax.lax.complex(ghre_n * w, ghim_n * w)
    if not per_channel:
        grad_h = grad_h[:, 0]
    return grad_x, grad_h


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_spectral_conv(
    x: jax.Array,
    h_rfft: jax.Array,
    scale: jax.Array,
    n_fft: int,
    c_block: int = 128,
    interpret: bool = False,
    algo: str = "matmul",
    compute_dtype: str = "float32",
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
        compute_dtype: dtype of the in-kernel matmul OPERANDS ("float32"
            default; "bfloat16" runs single-pass MXU dots with fp32
            accumulation — the XLA DEFAULT-precision numerics class, ~2e-3
            relative on the transform, descent-gate before defaulting).
    """
    return _forward_impl(x, h_rfft, scale, n_fft, c_block, interpret, algo,
                         compute_dtype)


#: Scoped-VMEM limit requested from Mosaic.  The default scoped limit is
#: 16 MiB — a soft cap well under the physical VMEM (128 MiB on v5e); the
#: round-1 "n_fft >= 4096 cliff" was this soft cap: Pallas double-buffers
#: every HBM block (x, filter, out), which alone fills 16 MiB at n_fft=4096
#: before any compute temporaries.
_VMEM_LIMIT = 96 * 2**20


def _kernel_vmem_estimate(n_fft: int, cb: int, seq_len: int, per_channel: bool, slab: int) -> int:
    """Planning model of the kernel's scoped-VMEM footprint (bytes)."""
    row = cb * 4
    # Pallas double-buffers each HBM-blocked operand: x, filter re+im, out
    blocks = 2 * row * (2 * seq_len + (2 * n_fft if per_channel else 0))
    if slab == 0:
        temps = 8 * n_fft * row  # ~8 live full panels in the unslabbed chain
    else:
        n1, n2 = _split_factor(n_fft)
        # padded copy + full inverse-stage-1 partial + 12 slab-sized stages
        temps = row * ((n_fft if seq_len < n_fft else 0) + n_fft + 12 * slab * n2)
    return blocks + temps + (2 << 20)  # tables + headroom


def _pick_slab(n_fft: int, cb: int, seq_len: int, per_channel: bool) -> int:
    """Choose the k1 slab width (0 = unslabbed) from the VMEM live-set model.

    Unslabbed (largest matmuls, best MXU utilization) whenever it fits the
    requested scoped limit; otherwise the smallest slabbing that fits.
    """
    n1, n2 = _split_factor(n_fft)
    if n2 <= 1 or _kernel_vmem_estimate(n_fft, cb, seq_len, per_channel, 0) <= _VMEM_LIMIT:
        return 0
    for s in (64, 32, 16, 8, 4):
        if n1 % s:
            continue
        if _kernel_vmem_estimate(n_fft, cb, seq_len, per_channel, s) <= _VMEM_LIMIT:
            return s
    return 4  # smallest slab; may still exceed budget at extreme shapes


def _forward_impl(x, h_rfft, scale, n_fft, c_block, interpret, algo="matmul",
                  compute_dtype="float32"):
    B, T, C = x.shape
    if not PALLAS_AVAILABLE:
        return fused_spectral_conv_reference(x, h_rfft, scale, n_fft)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # Mosaic compiles only for TPU; interpret elsewhere
    h_full = full_filter_from_rfft(h_rfft, n_fft)
    per_channel = h_full.ndim > 1
    cb = min(c_block, C)
    while C % cb:
        cb //= 2
    # Mosaic requires the minor block dim to be a multiple of 128, so the
    # block can never shrink below that — past it, VMEM pressure is solved
    # inside the kernel by the k1-slab pipeline (see PALLAS_OPTIMIZATION.md).
    while cb > 128 and 8 * n_fft * cb * 4 > 12 * 2**20:
        cb //= 2
    slab = _pick_slab(n_fft, cb, T, per_channel) if algo == "matmul" else 0
    cdt = None if jnp.dtype(compute_dtype) == jnp.float32 else jnp.dtype(compute_dtype)
    kernel_fn = _fused_kernel_mxu if algo == "matmul" else _fused_kernel_batched
    kernel = (
        functools.partial(kernel_fn, n_fft=n_fft, seq_len=T, slab=slab, cdt=cdt)
        if algo == "matmul"
        else functools.partial(kernel_fn, n_fft=n_fft, seq_len=T)
    )
    # Grid order (C-block, batch): batch is the INNER loop, so per-channel
    # filter blocks (index map constant in b) stay VMEM-resident across all
    # B panels instead of being re-fetched from HBM per (b, c) cell.
    if not per_channel:  # shared filter: one (n_fft, 1) column, broadcast in-kernel
        h_re, h_im = jnp.real(h_full)[:, None], jnp.imag(h_full)[:, None]
        h_spec = pl.BlockSpec((n_fft, 1), lambda c, b: (0, 0), memory_space=pltpu.VMEM)
    else:  # per-channel filter [n_fft, C]: tile the channel block with the data
        h_re, h_im = jnp.real(h_full), jnp.imag(h_full)
        h_spec = pl.BlockSpec((n_fft, cb), lambda c, b: (0, c), memory_space=pltpu.VMEM)
    in_specs = [
        # x rides UNPADDED (T rows); the kernel zero-extends in VMEM
        pl.BlockSpec((1, T, cb), lambda c, b: (b, 0, c), memory_space=pltpu.VMEM),
        h_spec,
        h_spec,
        pl.BlockSpec((1, 1, cb), lambda c, b: (b, 0, c), memory_space=pltpu.VMEM),
    ]
    operands = [x.astype(jnp.float32), h_re, h_im, scale.astype(jnp.float32)[:, None, :]]
    if algo == "matmul":
        # transpose-free kernel: the filter rides in digit-reversed
        # (k2, c, k1) order matching the kernel's (stage, c, k1)
        # intermediates (a host-side permute of the natural spectrum), and
        # the DFT/twiddle tables ride as inputs (Pallas: no captured
        # constants).  The single-stage (n2 == 1) path is 2-D and keeps the
        # (1, n_fft, c) layout.
        n1, n2 = _split_factor(n_fft)
        if n2 == 1:
            if not per_channel:
                h_re = jnp.real(h_full).reshape(1, n_fft, 1)
                h_im = jnp.imag(h_full).reshape(1, n_fft, 1)
                h_spec = pl.BlockSpec((1, n_fft, 1), lambda c, b: (0, 0, 0), memory_space=pltpu.VMEM)
            else:
                h_re = jnp.real(h_full).reshape(1, n_fft, C)
                h_im = jnp.imag(h_full).reshape(1, n_fft, C)
                h_spec = pl.BlockSpec((1, n_fft, cb), lambda c, b: (0, 0, c), memory_space=pltpu.VMEM)
        elif not per_channel:
            h_re = jnp.real(h_full).reshape(n2, 1, n1)
            h_im = jnp.imag(h_full).reshape(n2, 1, n1)
            h_spec = pl.BlockSpec((n2, 1, n1), lambda c, b: (0, 0, 0), memory_space=pltpu.VMEM)
        else:
            h_re = jnp.transpose(jnp.real(h_full).reshape(n2, n1, C), (0, 2, 1))
            h_im = jnp.transpose(jnp.imag(h_full).reshape(n2, n1, C), (0, 2, 1))
            h_spec = pl.BlockSpec((n2, cb, n1), lambda c, b: (0, c, 0), memory_space=pltpu.VMEM)
        in_specs[1] = h_spec
        in_specs[2] = h_spec
        operands[1] = h_re
        operands[2] = h_im
        for m in _conv_tables(n_fft):
            in_specs.append(
                pl.BlockSpec(
                    m.shape,
                    functools.partial(lambda c, b, _s: _s, _s=(0,) * m.ndim),
                    memory_space=pltpu.VMEM,
                )
            )
            operands.append(jnp.asarray(m))
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    return pl.pallas_call(
        kernel,
        grid=(C // cb, B),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, cb), lambda c, b: (b, 0, c), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(*operands)


def _fsc_fwd(x, h_rfft, scale, n_fft, c_block, interpret, algo, compute_dtype):
    # run the kernel with unit scale and apply scale outside (XLA fuses the
    # elementwise multiply) so the unscaled conv can ride in the residuals —
    # grad_scale then needs NO extra kernel run in the backward pass
    conv = _forward_impl(x, h_rfft, jnp.ones_like(scale), n_fft, c_block,
                         interpret, algo, compute_dtype)
    y = conv * scale[:, None, :]
    return y, (x, h_rfft, scale, conv)


def _fsc_bwd(n_fft, c_block, interpret, algo, compute_dtype, res, g):
    x, h_rfft, scale, conv = res
    B, T, C = x.shape
    gs = g * scale[:, None, :]

    n1, n2 = _split_factor(n_fft)
    cb = min(c_block, C)
    while C % cb:
        cb //= 2
    bwd_slab = (
        _pick_bwd_slab(n_fft, cb, T, h_rfft.ndim > 1)
        if PALLAS_AVAILABLE and algo == "matmul"
        else None
    )
    if bwd_slab is not None:
        # ONE VMEM pass: grad_x (adjoint conv with conj(H)) + the grad_H
        # product conj(Ĝ)·X̂ — no standalone rffts, no HBM spectra.
        # slab=0 runs the unslabbed kernel; larger n_fft pipelines per
        # k1-slab (_fused_bwd_kernel_mxu_slabbed).
        grad_x, grad_h = _fused_bwd_impl(gs, x, h_rfft, n_fft, c_block,
                                         interpret, slab=bwd_slab,
                                         compute_dtype=compute_dtype)
        grad_scale = jnp.sum(g * conv, axis=1)
        return grad_x, grad_h, grad_scale

    # fallback (slabbed sizes / stockham algo): adjoint conv through the
    # forward kernel + grad_H via two MXU rfft reductions.
    grad_x = _forward_impl(gs, jnp.conj(h_rfft), jnp.ones_like(scale), n_fft,
                           c_block, interpret, algo, compute_dtype)
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
