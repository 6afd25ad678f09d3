"""Fused positionwise block *tail*: gate-mul -> dropout -> residual -> LN ->
FFN(GELU) -> dropout -> residual, chunked over (batch, time) — any T.

WHY A SECOND FUSED KERNEL: the whole-block kernel (ops/pallas_block.py)
keeps the full (T, C) activation panel AND the (T, T) Toeplitz conv matrix
VMEM-resident, which stops working past seq 2048 (the round-2 cliff: M is
64 MB fp32 at T=4096 and the recompute backward's working set outgrows
VMEM).  Everything in the block EXCEPT the conv is positionwise, so the
long-sequence factorization is:

    XLA:    xn = LN1(x);  s = gain * sigmoid(mean_t(xn) @ Wg + bg)
    XLA:    conv = spectral_conv(xn, h_fused)      (matmul-FFT or Toeplitz)
    Pallas: out  = tail(x, conv, s)                (THIS kernel)

The conv is a single big XLA op (matmul-FFT at long T — the same backend
the flax path dispatches to), and the ~12 remaining elementwise/LN/FFN
fusions — the HBM-traffic bulk the round-2 profile identified — collapse
into ONE kernel that tiles the time axis in VMEM-sized chunks.  HBM
traffic per block drops from ~15 activation round-trips to 4 (xn write,
conv write/read, tail read/write); there is NO sequence-length cliff
because each program touches only a (chunk, C) panel.

Autodiff: only the tail carries a custom_vjp (recompute-in-VMEM backward,
parameter grads accumulated across the sequential grid).  The conv, LN1,
gate and filter build stay plain XLA ops, so their cotangents come from
XLA autodiff — no hand-written FFT adjoint.

Reference equations: fft_lm/train_fixed_full.py:497-563 (block tail);
parity gates: tests/unit/test_pallas_tail.py (value+grad vs the flax
block at rtol 1e-5, fp32, interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spectral_tpu.ops.pallas_block import (
    PALLAS_AVAILABLE,
    _as2d,
    _dropout_masks,
    _gelu_exact,
    _gelu_grad,
    _ln_bwd,
    _ln_fwd,
    _VMEM_LIMIT,
)

if PALLAS_AVAILABLE:  # pragma: no branch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# value-level tail (usable in-kernel and as the interpret/host-mask reference)
# ---------------------------------------------------------------------------


def _tail_forward_values(x, conv, s, ln2s, ln2b, W1, b1, W2, b2, cdt,
                         masks=None, alpha=1.0):
    """Block tail on VALUES; x/conv [S, C], s [1, C] (broadcasts over rows).

    Same dtype conventions as pallas_block._block_forward_values: matmuls in
    ``cdt`` with fp32 accumulation + bf16-rounded outputs (flax
    Dense(dtype=cdt)); LN/residual/gate-mul fp32.

    ``alpha`` scales ONLY the residual (x1) term of the output:
    out = alpha*x1 + drop(FFN(LN(x1))).  With alpha=1/tp and the FFN
    weights hidden-sharded (W1 columns, W2 rows, b2/tp), a psum over tp
    shards reconstructs the unsharded tail EXACTLY — the tensor-parallel
    fused route (models/fused_apply._tail_mesh).
    """
    f32 = jnp.float32
    y = conv * s
    if masks is not None:
        y = y * masks[0]
    x1 = x + y
    h1, xhat2, inv2 = _ln_fwd(x1, ln2s, ln2b)
    a = (jnp.dot(h1.astype(cdt), W1.astype(cdt), preferred_element_type=f32)
         .astype(cdt) + b1.astype(cdt))
    ge = _gelu_exact(a.astype(f32)).astype(cdt)
    ged = ge * masks[1].astype(cdt) if masks is not None else ge
    f = (jnp.dot(ged.astype(cdt), W2.astype(cdt), preferred_element_type=f32)
         .astype(cdt) + b2.astype(cdt))
    f = f.astype(f32)
    if masks is not None:
        f = f * masks[2]
    out = (x1 * alpha if alpha != 1.0 else x1) + f
    inter = dict(x1=x1, h1=h1, xhat2=xhat2, inv2=inv2, a=a, ged=ged)
    return out, inter


def _tail_backward_values(gout, x, conv, s, ln2s, ln2b, W1, b1, W2, b2, cdt,
                          masks, inter, alpha=1.0):
    """Tail gradients for upstream gout [S, C].  Returns a dict; d_s is the
    per-chunk PARTIAL sum over rows (caller accumulates over chunks)."""
    f32 = jnp.float32
    h1, xhat2, inv2 = inter["h1"], inter["xhat2"], inter["inv2"]
    a, ged = inter["a"], inter["ged"]

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
    d_x1 = (gout * alpha if alpha != 1.0 else gout) + d_x1_ln

    gy = d_x1 * masks[0] if masks is not None else d_x1
    d_s = jnp.sum(gy * conv, axis=0, keepdims=True)  # [1, C] chunk-partial
    d_conv = gy * s
    return dict(d_x=d_x1, d_conv=d_conv, d_s=d_s, d_ln2s=d_ln2s,
                d_ln2b=d_ln2b, d_W1=d_W1, d_b1=d_b1, d_W2=d_W2, d_b2=d_b2)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


# distinct stream constants per mask so the three dropout streams stay
# decorrelated even when the shared and hidden seeds are equal
_MASK_STREAM = (0, 0x9E3779B9, 0x3C6EF372)


def _tail_masks(seed_ref, b, t, nchunks, sc_shape, sh_shape, p):
    """Draw the (conv, hidden, output) dropout masks for one program.

    conv/output masks come from the SHARED seed (``seed_ref[0]``) — under
    tensor parallelism they MUST agree across tp shards for the psum
    linearity (they multiply pre-split / post-sum values).  The hidden
    mask comes from ``seed_ref[1]``: the mesh route folds the tp shard
    index into it (models/fused_apply._tail_mesh), so each H-shard draws
    an INDEPENDENT hidden mask — the psum then reconstructs the unsharded
    tail with a full-H mask whose units are independent draws, i.e.
    statistically identical to unsharded dropout (pinned by
    tests/unit/test_pallas_tail.py::test_tp_dropout_psum_linearity).
    """
    prog = jnp.uint32(b * nchunks + t)
    sA = seed_ref[0] + prog
    sH = seed_ref[1] + prog
    pltpu.prng_seed(sA + jnp.uint32(_MASK_STREAM[0]))
    m0 = _dropout_masks([sc_shape], p)[0]
    pltpu.prng_seed(sH + jnp.uint32(_MASK_STREAM[1]))
    m1 = _dropout_masks([sh_shape], p)[0]
    pltpu.prng_seed(sA + jnp.uint32(_MASK_STREAM[2]))
    m2 = _dropout_masks([sc_shape], p)[0]
    return (m0, m1, m2)


def _seed_pair(seed):
    """Normalize a dropout seed to a (2,) uint32 [shared, hidden] array.
    A scalar seed means hidden == shared (the single-device case; the
    per-mask stream constants keep the three streams decorrelated)."""
    arr = jnp.asarray(seed, jnp.uint32)
    if arr.ndim == 0:
        arr = jnp.stack([arr, arr])
    return arr


def _tail_fwd_kernel(seed_ref, x_ref, conv_ref, s_ref, ln2s_ref, ln2b_ref,
                     W1_ref, b1_ref, W2_ref, b2_ref, out_ref,
                     *, cdt, p, hidden, nchunks, alpha):
    b, t = pl.program_id(0), pl.program_id(1)
    masks = None
    if p > 0.0:
        S, C = x_ref.shape[-2:]
        masks = _tail_masks(seed_ref, b, t, nchunks, (S, C), (S, hidden), p)
    out, _ = _tail_forward_values(
        x_ref[0], conv_ref[0], s_ref[0], ln2s_ref[0], ln2b_ref[0],
        W1_ref[...], b1_ref[0], W2_ref[...], b2_ref[0], cdt, masks, alpha,
    )
    out_ref[0] = out


def _tail_bwd_kernel(seed_ref, gout_ref, x_ref, conv_ref, s_ref, ln2s_ref,
                     ln2b_ref, W1_ref, b1_ref, W2_ref, b2_ref,
                     dx_ref, dconv_ref, ds_ref, dln2s_ref, dln2b_ref,
                     dW1_ref, db1_ref, dW2_ref, db2_ref,
                     *, cdt, p, hidden, nchunks, alpha):
    b, t = pl.program_id(0), pl.program_id(1)
    masks = None
    if p > 0.0:  # same seeds, same draw order -> same masks as fwd
        S, C = x_ref.shape[-2:]
        masks = _tail_masks(seed_ref, b, t, nchunks, (S, C), (S, hidden), p)
    args = (x_ref[0], conv_ref[0], s_ref[0], ln2s_ref[0], ln2b_ref[0],
            W1_ref[...], b1_ref[0], W2_ref[...], b2_ref[0])
    _, inter = _tail_forward_values(*args, cdt, masks, alpha)
    g = _tail_backward_values(gout_ref[0], *args, cdt, masks, inter, alpha)
    dx_ref[0] = g["d_x"]
    dconv_ref[0] = g["d_conv"]

    # d_s accumulates over the chunk axis (per batch row)
    @pl.when(t == 0)
    def _init_ds():
        ds_ref[...] = jnp.zeros_like(ds_ref)

    ds_ref[0] += g["d_s"]

    # parameter grads accumulate across the whole sequential grid
    @pl.when((b == 0) & (t == 0))
    def _init_params():
        dln2s_ref[...] = jnp.zeros_like(dln2s_ref)
        dln2b_ref[...] = jnp.zeros_like(dln2b_ref)
        dW1_ref[...] = jnp.zeros_like(dW1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dW2_ref[...] = jnp.zeros_like(dW2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dln2s_ref[...] += g["d_ln2s"][None, :]
    dln2b_ref[...] += g["d_ln2b"][None, :]
    dW1_ref[...] += g["d_W1"]
    db1_ref[...] += g["d_b1"][None, :]
    dW2_ref[...] += g["d_W2"]
    db2_ref[...] += g["d_b2"][None, :]


# ---------------------------------------------------------------------------
# plumbing
# ---------------------------------------------------------------------------


def tail_vmem_bytes(S: int, C: int, H: int) -> int:
    """Conservative fp32 working-set estimate of the BACKWARD tail program:
    ~10 (S, C) panels, 4 (S, H) panels, FFN weights + grads, dropout masks."""
    return 4 * (10 * S * C + 4 * S * H + 4 * C * H + S * H + 2 * S * C)


def pick_chunk(T: int, C: int, H: int,
               budget: int = int(_VMEM_LIMIT * 0.6)) -> int | None:
    """Largest chunk S (multiple of 8, divides T) whose bwd fits VMEM."""
    for S in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if S <= T and T % S == 0 and tail_vmem_bytes(S, C, H) <= budget:
            return S
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def fused_tail(x, conv, s, ln2s, ln2b, W1, b1, W2, b2, seed,
               p: float = 0.0, compute_dtype: str = "bfloat16",
               chunk: int | None = None, interpret: bool = False,
               residual_alpha: float = 1.0):
    """Fused block tail: out = (x + drop(conv*s)) + drop(FFN(LN(x + drop(conv*s)))).

    x, conv: [B, T, C] fp32; s: [B, C] per-(batch, channel) scale
    (gain * context gate); FFN params as in the flax block.  ``seed``:
    uint32 scalar (traced ok); ``p``: static dropout rate.
    Works for ANY T that has a multiple-of-8 divisor; no (T, T) operand.

    ``residual_alpha`` (static) scales only the x1 residual term of the
    output — the tensor-parallel hook: with alpha=1/tp, hidden-sharded
    W1/b1/W2 and b2/tp, psum over tp reconstructs the tail exactly
    (see _tail_forward_values).
    """
    return _tail_fwd_impl(x, conv, s, ln2s, ln2b, W1, b1, W2, b2, seed,
                          p, compute_dtype, chunk, interpret, residual_alpha)


def _host_masks3(seed, B, T, C, H, p):
    """Host-PRNG dropout masks for the interpret path (pltpu.prng_seed has
    no CPU lowering).  Different stream than the in-kernel PRNG — dropout
    streams are statistically, not bitwise, specified (pallas_block doc).
    Same seed-pair contract as ``_tail_masks``: conv/output masks from the
    shared seed, the hidden mask from the hidden seed."""
    seed = _seed_pair(seed)
    kA = jax.random.fold_in(jax.random.PRNGKey(1), seed[0])
    kH = jax.random.fold_in(jax.random.PRNGKey(2), seed[1])
    k0, k2 = jax.random.split(kA)
    q = 1.0 - p

    def mk(k, shape):
        return jax.random.bernoulli(k, q, (B,) + shape).astype(jnp.float32) / q

    return (mk(k0, (T, C)), mk(kH, (T, H)), mk(k2, (T, C)))


def _values_tail_fwd(x, conv, s, ln2s, ln2b, W1, b1, W2, b2, seed, p, cdt,
                     alpha=1.0):
    B, T, C = x.shape
    masks = _host_masks3(seed, B, T, C, W1.shape[1], p)

    def one(xb, cb, sb, m1, m2, m3):
        out, _ = _tail_forward_values(xb, cb, sb[None, :], ln2s, ln2b,
                                      W1, b1, W2, b2, cdt, (m1, m2, m3),
                                      alpha)
        return out

    return jax.vmap(one)(x, conv, s, *masks)


def _values_tail_bwd(gout, x, conv, s, ln2s, ln2b, W1, b1, W2, b2, seed, p,
                     cdt, alpha=1.0):
    B, T, C = x.shape
    masks = _host_masks3(seed, B, T, C, W1.shape[1], p)

    def one(gb, xb, cb, sb, m1, m2, m3):
        args = (xb, cb, sb[None, :], ln2s, ln2b, W1, b1, W2, b2)
        _, inter = _tail_forward_values(*args, cdt, (m1, m2, m3), alpha)
        return _tail_backward_values(gb, *args, cdt, (m1, m2, m3), inter,
                                     alpha)

    g = jax.vmap(one)(gout, x, conv, s, *masks)
    return (g["d_x"], g["d_conv"], g["d_s"][:, 0, :],
            jnp.sum(g["d_ln2s"], axis=0), jnp.sum(g["d_ln2b"], axis=0),
            jnp.sum(g["d_W1"], axis=0), jnp.sum(g["d_b1"], axis=0),
            jnp.sum(g["d_W2"], axis=0), jnp.sum(g["d_b2"], axis=0))


def _tail_specs(B, T, C, H, S):
    NC = T // S
    per_bt = pl.BlockSpec((1, S, C), lambda b, t, *_: (b, t, 0))
    # s rides as [B, 1, C]: Mosaic requires the last two block dims be
    # (8, 128)-divisible or equal to the array dims — a (1, C) block of a
    # (B, C) array violates that for B > 1 (chip-verified), a (1, 1, C)
    # block of (B, 1, C) doesn't.
    per_b_vec = pl.BlockSpec((1, 1, C), lambda b, t, *_: (b, 0, 0))
    whole = lambda shape: pl.BlockSpec(shape, lambda b, t, *_: tuple(0 for _ in shape))
    return dict(x=per_bt, s=per_b_vec, vec=whole((1, C)), W1=whole((C, H)),
                b1=whole((1, H)), W2=whole((H, C)), NC=NC)


def _tail_fwd_impl(x, conv, s, ln2s, ln2b, W1, b1, W2, b2, seed,
                   p, compute_dtype, chunk, interpret, alpha=1.0):
    B, T, C = x.shape
    H = W1.shape[1]
    cdt = jnp.dtype(compute_dtype)
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    S = chunk if chunk is not None else pick_chunk(T, C, H)
    if S is None or (interpret and p > 0.0):
        return _values_tail_fwd(x, conv, s, _as2d(ln2s)[0], _as2d(ln2b)[0],
                                W1, _as2d(b1)[0], W2, _as2d(b2)[0],
                                seed, p, cdt, alpha)
    sp = _tail_specs(B, T, C, H, S)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    seed_arr = _seed_pair(seed)
    fn = pl.pallas_call(
        functools.partial(_tail_fwd_kernel, cdt=cdt, p=p, hidden=H,
                          nchunks=sp["NC"], alpha=alpha),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, sp["NC"]),
            in_specs=[sp["x"], sp["x"], sp["s"], sp["vec"], sp["vec"],
                      sp["W1"], sp["b1"], sp["W2"], sp["vec"]],
            out_specs=sp["x"],
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
        interpret=interpret,
        **kwargs,
    )
    return fn(seed_arr, x, conv, s[:, None, :], _as2d(ln2s), _as2d(ln2b), W1,
              _as2d(b1), W2, _as2d(b2))


def _tail_bwd_impl(gout, x, conv, s, ln2s, ln2b, W1, b1, W2, b2, seed,
                   p, compute_dtype, chunk, interpret, alpha=1.0):
    B, T, C = x.shape
    H = W1.shape[1]
    cdt = jnp.dtype(compute_dtype)
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    S = chunk if chunk is not None else pick_chunk(T, C, H)
    if S is None or (interpret and p > 0.0):
        return _values_tail_bwd(gout, x, conv, s, _as2d(ln2s)[0],
                                _as2d(ln2b)[0], W1, _as2d(b1)[0], W2,
                                _as2d(b2)[0], seed, p, cdt, alpha)
    sp = _tail_specs(B, T, C, H, S)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    seed_arr = _seed_pair(seed)
    f32 = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct((B, T, C), f32),   # dx
        jax.ShapeDtypeStruct((B, T, C), f32),   # dconv
        jax.ShapeDtypeStruct((B, 1, C), f32),   # ds
        jax.ShapeDtypeStruct((1, C), f32),      # dln2s
        jax.ShapeDtypeStruct((1, C), f32),      # dln2b
        jax.ShapeDtypeStruct((C, H), f32),      # dW1
        jax.ShapeDtypeStruct((1, H), f32),      # db1
        jax.ShapeDtypeStruct((H, C), f32),      # dW2
        jax.ShapeDtypeStruct((1, C), f32),      # db2
    ]
    out_specs = [sp["x"], sp["x"], sp["s"], sp["vec"], sp["vec"], sp["W1"],
                 sp["b1"], sp["W2"], sp["vec"]]
    fn = pl.pallas_call(
        functools.partial(_tail_bwd_kernel, cdt=cdt, p=p, hidden=H,
                          nchunks=sp["NC"], alpha=alpha),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, sp["NC"]),
            in_specs=[sp["x"], sp["x"], sp["x"], sp["s"], sp["vec"],
                      sp["vec"], sp["W1"], sp["b1"], sp["W2"], sp["vec"]],
            out_specs=out_specs,
        ),
        out_shape=out_shapes,
        interpret=interpret,
        **kwargs,
    )
    outs = fn(seed_arr, gout, x, conv, s[:, None, :], _as2d(ln2s),
              _as2d(ln2b), W1, _as2d(b1), W2, _as2d(b2))
    dx, dconv, ds, dln2s, dln2b, dW1, db1, dW2, db2 = outs
    return (dx, dconv, ds[:, 0, :], dln2s[0], dln2b[0], dW1, db1[0], dW2,
            db2[0])


def _tail_vjp_fwd(x, conv, s, ln2s, ln2b, W1, b1, W2, b2, seed,
                  p, compute_dtype, chunk, interpret, residual_alpha):
    out = _tail_fwd_impl(x, conv, s, ln2s, ln2b, W1, b1, W2, b2, seed,
                         p, compute_dtype, chunk, interpret, residual_alpha)
    return out, (x, conv, s, ln2s, ln2b, W1, b1, W2, b2, seed)


def _tail_vjp_bwd(p, compute_dtype, chunk, interpret, residual_alpha, res,
                  gout):
    *arrs, seed = res
    grads = _tail_bwd_impl(gout, *arrs, seed, p, compute_dtype, chunk,
                           interpret, residual_alpha)
    import numpy as _np

    d_seed = _np.zeros(_np.shape(seed), jax.dtypes.float0)
    return (*grads, d_seed)


fused_tail.defvjp(_tail_vjp_fwd, _tail_vjp_bwd)
