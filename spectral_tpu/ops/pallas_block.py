"""Fused whole-block Pallas kernel: LN -> Toeplitz conv -> gates -> residual
-> LN -> FFN in ONE VMEM-resident pass per batch element.

Motivation (round-2 profiling, BENCHMARKS.md "flagship accum-config
profile"): the flagship train step is dominated not by FLOPs but by
activation HBM traffic — every LayerNorm, gate, dropout and residual in
``FixedSpectralBlock`` (models/backbone.py, reference equations:
fft_lm/train_fixed_full.py:497-563) is a separate XLA fusion that round-trips
the [B, T, C] activation through HBM.  This kernel keeps the activation in
VMEM across the whole block: per program, HBM traffic is one read of x, one
read of the (T, T) filter matrix + weights, one write of the output.

Design:
* the spectral conv enters as the **direct Toeplitz matmul** (ops/toeplitz.py
  — the fastest measured conv backend): the (T, T) matrix M is built OUTSIDE
  the kernel from the fused filter k̂·gate·mask (it depends only on params and
  cutoff, so XLA hoists it out of the gradient-accumulation scan and its
  cotangent flows through XLA autodiff of the build); the kernel consumes M
  as a plain operand.
* grid = (B,); each program owns the full (T, C) activation panel.
* matmuls (conv, FFN) cast to ``compute_dtype`` with fp32 accumulation —
  matching the unfused path's DEFAULT-precision/bf16 semantics; LayerNorms,
  residuals, gates run fp32.
* dropout uses the in-kernel TPU PRNG (`pltpu.prng_seed` +
  `prng_random_bits`), seeded per (step-seed, program): masks are
  *statistically* equivalent to the flax path, not bit-identical (documented
  divergence; the backward regenerates identical masks by re-seeding).
* backward is a second Pallas kernel (``jax.custom_vjp``): it RECOMPUTES the
  forward intermediates from (x, params) in VMEM — no residual tensors ever
  hit HBM — and accumulates parameter gradients across the sequential grid.

Parity gates: tests/unit/test_pallas_block.py — fp32 interpret-mode value +
gradient parity vs ``FixedSpectralBlock.apply`` at rtol 1e-5 (dropout=0).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

try:  # Pallas is TPU/Mosaic-specific; keep the module importable anywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

_LN_EPS = 1e-6  # flax.linen.LayerNorm default
_VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128 MiB physical VMEM
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


# ---------------------------------------------------------------------------
# value-level helpers (usable in-kernel and as the interpret reference)
# ---------------------------------------------------------------------------


def _ln_fwd(x, scale, bias):
    """flax LayerNorm (fast-variance): returns (out, xhat, inv)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    mean2 = jnp.mean(x * x, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (x - mean) * inv
    return xhat * scale + bias, xhat, inv


def layernorm(x, scale, bias):
    """The repo's ONE value-level LayerNorm (flax fast-variance semantics);
    used by the fused apply path and the streaming decoders so numerics
    can't drift between them."""
    return _ln_fwd(x, scale, bias)[0]


def _ln_bwd(u, xhat, inv, scale):
    """dx for LayerNorm given upstream u; also returns (dscale, dbias) sums."""
    su = u * scale
    m1 = jnp.mean(su, axis=-1, keepdims=True)
    m2 = jnp.mean(su * xhat, axis=-1, keepdims=True)
    dx = inv * (su - m1 - xhat * m2)
    return dx, jnp.sum(u * xhat, axis=0), jnp.sum(u, axis=0)


def _erf(x):
    """erf to fp32 accuracy (Abramowitz & Stegun 7.1.26, |err| < 1.5e-7).

    Mosaic has no erf lowering; this rational approximation is exact at
    fp32 resolution (fp32 eps ~1.2e-7), preserving the repo's exact-erf
    GELU contract (torch parity) inside the kernel.
    """
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(a):
    return a * 0.5 * (1.0 + _erf(a * _INV_SQRT2))


def _gelu_grad(a):
    phi = jnp.exp(-0.5 * a * a) * _INV_SQRT2PI
    return 0.5 * (1.0 + _erf(a * _INV_SQRT2)) + a * phi


def _dropout_masks(shape_list, p):
    """Generate inverted-dropout scale masks in a fixed draw order.

    Returns fp32 arrays valued 0 or 1/(1-p).  Caller must have seeded the
    PRNG.  Draw order is part of the fwd/bwd contract.
    """
    thresh = jnp.uint32(min(int(round(p * 4294967296.0)), 4294967295))
    inv_q = 1.0 / (1.0 - p)
    masks = []
    for shape in shape_list:
        # prng_random_bits returns int32 on TPU — MUST bitcast before the
        # unsigned compare (signed compare drops ~50% extra; verified by
        # mask-statistics probe: zero-frac 0.1008, mean 0.9991 at p=0.1)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        masks.append(jnp.where(bits >= thresh, inv_q, 0.0).astype(jnp.float32))
    return masks


def _block_forward_values(x, M, ln1s, ln1b, Wg, bg, gain, ln2s, ln2b,
                          W1, b1, W2, b2, cdt, masks=None):
    """The whole block on VALUES; returns (out, intermediates-dict).

    ``masks``: optional (D1, D2, D3) inverted-dropout masks (None = eval).
    Mirrors FixedSpectralBlock.__call__ exactly (backbone.py:128-238) with
    the conv as the Toeplitz matmul.
    """
    f32 = jnp.float32
    xn, xhat1, inv1 = _ln_fwd(x, ln1s, ln1b)
    pooled = jnp.mean(xn, axis=0, keepdims=True)  # [1, C]
    g = jax.nn.sigmoid(
        jnp.dot(pooled.astype(cdt), Wg.astype(cdt), preferred_element_type=f32) + bg
    )  # [1, C]
    s = gain * g  # [1, C]
    conv = jnp.dot(M.astype(cdt), xn.astype(cdt), preferred_element_type=f32)
    y = conv * s
    if masks is not None:
        y = y * masks[0]
    x1 = x + y
    h1, xhat2, inv2 = _ln_fwd(x1, ln2s, ln2b)
    # FFN matmuls in compute dtype with bf16-rounded outputs (flax Dense(dtype=cdt))
    a = (jnp.dot(h1.astype(cdt), W1.astype(cdt), preferred_element_type=f32)
         .astype(cdt) + b1.astype(cdt))
    ge = _gelu_exact(a.astype(f32)).astype(cdt)
    ged = ge * masks[1].astype(cdt) if masks is not None else ge
    f = (jnp.dot(ged.astype(cdt), W2.astype(cdt), preferred_element_type=f32)
         .astype(cdt) + b2.astype(cdt))
    f = f.astype(f32)
    if masks is not None:
        f = f * masks[2]
    out = x1 + f
    inter = dict(xn=xn, xhat1=xhat1, inv1=inv1, pooled=pooled, g=g, s=s,
                 conv=conv, x1=x1, h1=h1, xhat2=xhat2, inv2=inv2, a=a, ged=ged)
    return out, inter


def _block_backward_values(gout, x, M, ln1s, ln1b, Wg, bg, gain, ln2s, ln2b,
                           W1, b1, W2, b2, cdt, masks, inter):
    """Gradients for every operand given upstream gout. Returns a dict."""
    f32 = jnp.float32
    xn, xhat1, inv1 = inter["xn"], inter["xhat1"], inter["inv1"]
    pooled, g, s, conv = inter["pooled"], inter["g"], inter["s"], inter["conv"]
    x1, xhat2, inv2, a, ged = inter["x1"], inter["xhat2"], inter["inv2"], inter["a"], inter["ged"]
    h1 = inter["h1"]
    T = x.shape[0]

    # FFN output path
    gf = gout * masks[2] if masks is not None else gout
    d_b2 = jnp.sum(gf, axis=0)
    d_W2 = jnp.dot(ged.astype(cdt).T, gf.astype(cdt), preferred_element_type=f32)
    d_ged = jnp.dot(gf.astype(cdt), W2.astype(cdt).T, preferred_element_type=f32)
    d_ge = d_ged * masks[1] if masks is not None else d_ged
    d_a = d_ge * _gelu_grad(a.astype(f32))
    d_b1 = jnp.sum(d_a, axis=0)
    d_W1 = jnp.dot(h1.astype(cdt).T, d_a.astype(cdt), preferred_element_type=f32)
    d_h1 = jnp.dot(d_a.astype(cdt), W1.astype(cdt).T, preferred_element_type=f32)
    d_x1_ln, d_ln2s, d_ln2b = _ln_bwd(d_h1, xhat2, inv2, ln2s)
    d_x1 = gout + d_x1_ln

    # conv/gate path
    gy = d_x1 * masks[0] if masks is not None else d_x1
    d_s = jnp.sum(gy * conv, axis=0, keepdims=True)  # [1, C]
    d_gain = (d_s * g)[0]
    d_g = d_s * gain
    d_pre = d_g * g * (1.0 - g)  # sigmoid'
    d_bg = d_pre[0]
    d_Wg = jnp.dot(pooled.astype(cdt).T, d_pre.astype(cdt), preferred_element_type=f32)
    d_pooled = jnp.dot(d_pre.astype(cdt), Wg.astype(cdt).T, preferred_element_type=f32)
    d_conv = gy * s
    d_M = jnp.dot(d_conv.astype(cdt), xn.astype(cdt).T, preferred_element_type=f32)
    d_xn = jnp.dot(M.astype(cdt).T, d_conv.astype(cdt), preferred_element_type=f32)
    d_xn = d_xn + d_pooled / T
    d_x_ln, d_ln1s, d_ln1b = _ln_bwd(d_xn, xhat1, inv1, ln1s)
    d_x = d_x1 + d_x_ln
    return dict(d_x=d_x, d_M=d_M, d_ln1s=d_ln1s, d_ln1b=d_ln1b, d_Wg=d_Wg,
                d_bg=d_bg, d_gain=d_gain, d_ln2s=d_ln2s, d_ln2b=d_ln2b,
                d_W1=d_W1, d_b1=d_b1, d_W2=d_W2, d_b2=d_b2)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(seed_ref, x_ref, M_ref, ln1s_ref, ln1b_ref, Wg_ref, bg_ref,
                gain_ref, ln2s_ref, ln2b_ref, W1_ref, b1_ref, W2_ref, b2_ref,
                out_ref, *, cdt, p, hidden):
    b = pl.program_id(0)
    masks = None
    if p > 0.0:
        pltpu.prng_seed(seed_ref[0] + jnp.uint32(b))
        T, C = x_ref.shape[-2:]
        masks = _dropout_masks([(T, C), (T, hidden), (T, C)], p)
    out, _ = _block_forward_values(
        x_ref[0], M_ref[...], ln1s_ref[0], ln1b_ref[0], Wg_ref[...], bg_ref[0],
        gain_ref[0], ln2s_ref[0], ln2b_ref[0], W1_ref[...], b1_ref[0],
        W2_ref[...], b2_ref[0], cdt, masks,
    )
    out_ref[0] = out


def _bwd_kernel(seed_ref, gout_ref, x_ref, M_ref, ln1s_ref, ln1b_ref, Wg_ref,
                bg_ref, gain_ref, ln2s_ref, ln2b_ref, W1_ref, b1_ref, W2_ref,
                b2_ref,
                dx_ref, dM_ref, dln1s_ref, dln1b_ref, dWg_ref, dbg_ref,
                dgain_ref, dln2s_ref, dln2b_ref, dW1_ref, db1_ref, dW2_ref,
                db2_ref, *, cdt, p, hidden):
    b = pl.program_id(0)
    masks = None
    if p > 0.0:
        pltpu.prng_seed(seed_ref[0] + jnp.uint32(b))  # same seed => same masks
        T, C = x_ref.shape[-2:]
        masks = _dropout_masks([(T, C), (T, hidden), (T, C)], p)
    args = (
        x_ref[0], M_ref[...], ln1s_ref[0], ln1b_ref[0], Wg_ref[...], bg_ref[0],
        gain_ref[0], ln2s_ref[0], ln2b_ref[0], W1_ref[...], b1_ref[0],
        W2_ref[...], b2_ref[0],
    )
    _, inter = _block_forward_values(*args, cdt, masks)
    grads = _block_backward_values(gout_ref[0], *args, cdt, masks, inter)
    dx_ref[0] = grads["d_x"]

    # parameter grads accumulate across the sequential grid
    @pl.when(b == 0)
    def _init():
        dM_ref[...] = jnp.zeros_like(dM_ref)
        dln1s_ref[...] = jnp.zeros_like(dln1s_ref)
        dln1b_ref[...] = jnp.zeros_like(dln1b_ref)
        dWg_ref[...] = jnp.zeros_like(dWg_ref)
        dbg_ref[...] = jnp.zeros_like(dbg_ref)
        dgain_ref[...] = jnp.zeros_like(dgain_ref)
        dln2s_ref[...] = jnp.zeros_like(dln2s_ref)
        dln2b_ref[...] = jnp.zeros_like(dln2b_ref)
        dW1_ref[...] = jnp.zeros_like(dW1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dW2_ref[...] = jnp.zeros_like(dW2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dM_ref[...] += grads["d_M"]
    dln1s_ref[...] += grads["d_ln1s"][None, :]
    dln1b_ref[...] += grads["d_ln1b"][None, :]
    dWg_ref[...] += grads["d_Wg"]
    dbg_ref[...] += grads["d_bg"][None, :]
    dgain_ref[...] += grads["d_gain"][None, :]
    dln2s_ref[...] += grads["d_ln2s"][None, :]
    dln2b_ref[...] += grads["d_ln2b"][None, :]
    dW1_ref[...] += grads["d_W1"]
    db1_ref[...] += grads["d_b1"][None, :]
    dW2_ref[...] += grads["d_W2"]
    db2_ref[...] += grads["d_b2"][None, :]


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom_vjp
# ---------------------------------------------------------------------------


def _specs_common(B, T, C, H):
    """BlockSpecs for (x-like, M, vectors, matrices) shared by fwd/bwd.

    Index maps accept (grid idx, *scalar-prefetch refs)."""
    per_b = pl.BlockSpec((1, T, C), lambda b, *_: (b, 0, 0))
    whole = lambda shape: pl.BlockSpec(shape, lambda b, *_: tuple(0 for _ in shape))
    vec = whole((1, C))
    return dict(
        x=per_b, M=whole((T, T)), vec=vec, Wg=whole((C, C)),
        W1=whole((C, H)), b1=whole((1, H)), W2=whole((H, C)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16))
def fused_block(x, M, ln1s, ln1b, Wg, bg, gain, ln2s, ln2b, W1, b1, W2, b2,
                seed, p: float = 0.0,
                compute_dtype: str = "bfloat16", interpret: bool = False):
    """One spectral block, fully fused.

    x: [B, T, C] fp32; M: [T, T] Toeplitz conv matrix (ops/toeplitz.py);
    vectors as [C]/[H]; Wg [C, C]; W1 [C, H]; W2 [H, C].
    ``seed``: uint32 scalar/array (may be traced — changes per train step);
    ``p``: static dropout rate (0 disables the in-kernel PRNG entirely).
    Returns [B, T, C] fp32.
    """
    return _fused_fwd_impl(x, M, ln1s, ln1b, Wg, bg, gain, ln2s, ln2b,
                           W1, b1, W2, b2, seed, p, compute_dtype, interpret)


def _as2d(v):
    return v.reshape(1, -1)


def fused_block_bwd_vmem_bytes(T: int, C: int, H: int) -> int:
    """Conservative fp32 working-set estimate of the BACKWARD kernel (its
    recompute-everything design holds M+dM, ~14 (T, C) intermediates, 4
    (T, H) tensors and the four FFN weight/grad matrices in VMEM at once).
    Callers gate the fused default on this fitting the VMEM budget —
    otherwise Mosaic rejects the program AFTER a multi-minute remote
    compile instead of falling back."""
    return 4 * (2 * T * T + 14 * T * C + 4 * T * H + 4 * C * H + 2 * C * C)


def fused_block_fits(T: int, C: int, H: int,
                     budget: int = int(_VMEM_LIMIT * 0.8)) -> bool:
    return fused_block_bwd_vmem_bytes(T, C, H) <= budget


def _host_masks(seed, B, T, C, H, p):
    """Inverted-dropout masks from the host PRNG (the interpret-mode path:
    pltpu.prng_seed has no CPU lowering).  Deterministic in (seed, p,
    shapes) so fwd and bwd regenerate identical masks; a DIFFERENT stream
    than the in-kernel TPU PRNG (documented — dropout streams are
    statistically, not bitwise, specified)."""
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    ks = jax.random.split(key, 3)
    q = 1.0 - p
    return tuple(
        jax.random.bernoulli(k, q, (B,) + shape).astype(jnp.float32) / q
        for k, shape in zip(ks, ((T, C), (T, H), (T, C)))
    )


def _values_fwd(x, M, ln1s, ln1b, Wg, bg, gain, ln2s, ln2b, W1, b1, W2, b2,
                seed, p, cdt):
    """vmapped value-level forward with host masks (off-TPU dropout path)."""
    B, T, C = x.shape
    masks = _host_masks(seed, B, T, C, W1.shape[1], p)

    def one(xb, m1, m2, m3):
        out, _ = _block_forward_values(
            xb, M, ln1s, ln1b, Wg, bg, gain, ln2s, ln2b, W1, b1, W2, b2,
            cdt, (m1, m2, m3))
        return out

    return jax.vmap(one)(x, *masks)


def _values_bwd(gout, x, M, ln1s, ln1b, Wg, bg, gain, ln2s, ln2b,
                W1, b1, W2, b2, seed, p, cdt):
    B, T, C = x.shape
    masks = _host_masks(seed, B, T, C, W1.shape[1], p)
    args = (M, ln1s, ln1b, Wg, bg, gain, ln2s, ln2b, W1, b1, W2, b2)

    def one(gb, xb, m1, m2, m3):
        _, inter = _block_forward_values(xb, *args, cdt, (m1, m2, m3))
        return _block_backward_values(gb, xb, *args, cdt, (m1, m2, m3), inter)

    g = jax.vmap(one)(gout, x, *masks)
    dx = g.pop("d_x")
    summed = {k: jnp.sum(v, axis=0) for k, v in g.items()}
    return (dx, summed["d_M"], summed["d_ln1s"], summed["d_ln1b"],
            summed["d_Wg"], summed["d_bg"], summed["d_gain"],
            summed["d_ln2s"], summed["d_ln2b"], summed["d_W1"],
            summed["d_b1"], summed["d_W2"], summed["d_b2"])


def _fused_fwd_impl(x, M, ln1s, ln1b, Wg, bg, gain, ln2s, ln2b, W1, b1, W2, b2,
                    seed, p, compute_dtype, interpret):
    B, T, C = x.shape
    H = W1.shape[1]
    cdt = jnp.dtype(compute_dtype)
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if interpret and p > 0.0:
        # interpret mode can't lower the TPU PRNG — run the value-level
        # reference with host-derived masks (same math, different stream)
        return _values_fwd(x, M, _as2d(ln1s)[0], _as2d(ln1b)[0], Wg,
                           _as2d(bg)[0], _as2d(gain)[0], _as2d(ln2s)[0],
                           _as2d(ln2b)[0], W1, _as2d(b1)[0], W2,
                           _as2d(b2)[0], seed, p, cdt)
    sp = _specs_common(B, T, C, H)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.uint32))
    fn = pl.pallas_call(
        functools.partial(_fwd_kernel, cdt=cdt, p=p, hidden=H),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[sp["x"], sp["M"], sp["vec"], sp["vec"], sp["Wg"],
                      sp["vec"], sp["vec"], sp["vec"], sp["vec"], sp["W1"],
                      sp["b1"], sp["W2"], sp["vec"]],
            out_specs=sp["x"],
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
        interpret=interpret,
        **kwargs,
    )
    return fn(seed_arr, x, M, _as2d(ln1s), _as2d(ln1b), Wg, _as2d(bg),
              _as2d(gain), _as2d(ln2s), _as2d(ln2b), W1, _as2d(b1), W2,
              _as2d(b2))


def _fused_bwd_impl(gout, x, M, ln1s, ln1b, Wg, bg, gain, ln2s, ln2b,
                    W1, b1, W2, b2, seed, p, compute_dtype, interpret):
    B, T, C = x.shape
    H = W1.shape[1]
    cdt = jnp.dtype(compute_dtype)
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if interpret and p > 0.0:
        return _values_bwd(gout, x, M, _as2d(ln1s)[0], _as2d(ln1b)[0], Wg,
                           _as2d(bg)[0], _as2d(gain)[0], _as2d(ln2s)[0],
                           _as2d(ln2b)[0], W1, _as2d(b1)[0], W2,
                           _as2d(b2)[0], seed, p, cdt)
    sp = _specs_common(B, T, C, H)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.uint32))
    f32 = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct((B, T, C), f32),   # dx
        jax.ShapeDtypeStruct((T, T), f32),      # dM
        jax.ShapeDtypeStruct((1, C), f32),      # dln1s
        jax.ShapeDtypeStruct((1, C), f32),      # dln1b
        jax.ShapeDtypeStruct((C, C), f32),      # dWg
        jax.ShapeDtypeStruct((1, C), f32),      # dbg
        jax.ShapeDtypeStruct((1, C), f32),      # dgain
        jax.ShapeDtypeStruct((1, C), f32),      # dln2s
        jax.ShapeDtypeStruct((1, C), f32),      # dln2b
        jax.ShapeDtypeStruct((C, H), f32),      # dW1
        jax.ShapeDtypeStruct((1, H), f32),      # db1
        jax.ShapeDtypeStruct((H, C), f32),      # dW2
        jax.ShapeDtypeStruct((1, C), f32),      # db2
    ]
    out_specs = [sp["x"], sp["M"], sp["vec"], sp["vec"], sp["Wg"], sp["vec"],
                 sp["vec"], sp["vec"], sp["vec"], sp["W1"], sp["b1"],
                 sp["W2"], sp["vec"]]
    fn = pl.pallas_call(
        functools.partial(_bwd_kernel, cdt=cdt, p=p, hidden=H),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[sp["x"], sp["x"], sp["M"], sp["vec"], sp["vec"],
                      sp["Wg"], sp["vec"], sp["vec"], sp["vec"], sp["vec"],
                      sp["W1"], sp["b1"], sp["W2"], sp["vec"]],
            out_specs=out_specs,
        ),
        out_shape=out_shapes,
        interpret=interpret,
        **kwargs,
    )
    outs = fn(seed_arr, gout, x, M, _as2d(ln1s), _as2d(ln1b), Wg, _as2d(bg),
              _as2d(gain), _as2d(ln2s), _as2d(ln2b), W1, _as2d(b1), W2,
              _as2d(b2))
    (dx, dM, dln1s, dln1b, dWg, dbg, dgain, dln2s, dln2b, dW1, db1, dW2,
     db2) = outs
    return (dx, dM, dln1s[0], dln1b[0], dWg, dbg[0], dgain[0], dln2s[0],
            dln2b[0], dW1, db1[0], dW2, db2[0])


def _vjp_fwd(x, M, ln1s, ln1b, Wg, bg, gain, ln2s, ln2b, W1, b1, W2, b2,
             seed, p, compute_dtype, interpret):
    out = _fused_fwd_impl(x, M, ln1s, ln1b, Wg, bg, gain, ln2s, ln2b,
                          W1, b1, W2, b2, seed, p, compute_dtype, interpret)
    return out, (x, M, ln1s, ln1b, Wg, bg, gain, ln2s, ln2b, W1, b1, W2, b2,
                 seed)


def _vjp_bwd(p, compute_dtype, interpret, res, gout):
    *arrs, seed = res
    grads = _fused_bwd_impl(gout, *arrs, seed, p, compute_dtype, interpret)
    import numpy as _np

    d_seed = _np.zeros(_np.shape(seed), jax.dtypes.float0)  # int arg: no grad
    return (*grads, d_seed)


fused_block.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# pure-jnp reference (the parity oracle, and the CPU fallback)
# ---------------------------------------------------------------------------


def fused_block_reference(x, M, ln1s, ln1b, Wg, bg, gain, ln2s, ln2b,
                          W1, b1, W2, b2, compute_dtype="float32"):
    """vmapped value-level forward (no dropout) — the parity oracle."""
    cdt = jnp.dtype(compute_dtype)

    def one(xb):
        out, _ = _block_forward_values(
            xb, M, _as2d(ln1s)[0], _as2d(ln1b)[0], Wg, _as2d(bg)[0],
            _as2d(gain)[0], _as2d(ln2s)[0], _as2d(ln2b)[0], W1, _as2d(b1)[0],
            W2, _as2d(b2)[0], cdt, None,
        )
        return out

    return jax.vmap(one)(x)
