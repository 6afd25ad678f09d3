"""Fused rank-k band-limited spectral mix: ONE VMEM-resident Pallas pass.

The seq-4k headline op (`SpectralMixingLayer(fft_backend="bandlimited")`,
layers/spectral_layers.py:163 — reference equations spectral_layers.py:
97-109 of /root/reference) is algebraically two (T, k) DFT matmuls around a
(k, D) complex filter.  This kernel runs the whole projection in one
Pallas program per batch element.

**Measured result (v5e, seq-4k headline shape): the XLA einsum path WINS —
0.29 ms vs 0.42 ms fp32-accurate, and 4x in bf16 fast mode.**  XLA already
fuses the elementwise filter into the matmuls, and inside a jitted
benchmark/training loop keeps the loop carry VMEM-resident across
iterations; a pallas_call is an HBM round trip per invocation plus launch
overhead, which at this arithmetic intensity (4 matmuls of ~0.27 GFLOP per
program) never pays for itself.  Contrast with ops/pallas_block.py, where
fusing ~15 XLA fusions' worth of HBM traffic wins 1.5x.

Kept as an explicit opt-in (NOT auto-dispatched by the layer) for contexts
XLA cannot fuse — e.g. as a building block inside a larger hand-written
kernel — and as the documented negative result for "pallas-ify every op":
kernel fusion pays where XLA's fusion boundary forces traffic, not where
XLA already fuses.

Forward (s = 1/T reconstruction scale folded into the filter outside):

    xr =  tcᵀ x          (k, D)     tc/ts: (T, k) cos/sin tables
    xi = -tsᵀ x
    yr = xr·wr - xi·wi   (elementwise, filter already s-scaled)
    yi = xr·wi + xi·wr
    y  = tc yr - ts yi   (T, D)     [+ bias]

Backward (second kernel, param grads accumulated across the grid):

    u = tcᵀ g,  v = tsᵀ g
    dx   = tc (u·wr - v·wi) + ts (u·wi + v·wr)
    dwr += u·xr - v·xi,   dwi += -(u·xi + v·xr),   db += Σ_t g

Parity gates: tests/unit/test_pallas_bandlimited.py (value + grad vs the
XLA einsum path in interpret mode, fp32, rtol 1e-5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # keep importable off-TPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

_VMEM_LIMIT = 100 * 1024 * 1024


def _tables(T: int, k: int):
    """(T, k) cos/sin low-bin DFT tables — shared source: ops.matfft."""
    from spectral_tpu.ops.matfft import lowbin_tables

    return lowbin_tables(T, k)


def _dotT(a, b, prec):
    """aᵀ @ b contracting the leading axis (no materialized transpose)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )


def _dot(a, b, prec):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )


def _fwd_values(x, tc, ts, wr, wi, bias, prec):
    xr = _dotT(tc, x, prec)
    xi = -_dotT(ts, x, prec)
    yr = xr * wr - xi * wi
    yi = xr * wi + xi * wr
    y = _dot(tc, yr, prec) - _dot(ts, yi, prec)
    return y + bias


def _fwd_kernel(x_ref, tc_ref, ts_ref, wr_ref, wi_ref, b_ref, out_ref, *, prec):
    out_ref[0] = _fwd_values(
        x_ref[0], tc_ref[...], ts_ref[...], wr_ref[...], wi_ref[...],
        b_ref[...], prec,
    )


def _bwd_kernel(g_ref, x_ref, tc_ref, ts_ref, wr_ref, wi_ref,
                dx_ref, dwr_ref, dwi_ref, db_ref, *, prec):
    b = pl.program_id(0)
    g = g_ref[0]
    x = x_ref[0]
    tc, ts = tc_ref[...], ts_ref[...]
    wr, wi = wr_ref[...], wi_ref[...]
    u = _dotT(tc, g, prec)
    v = _dotT(ts, g, prec)
    dx_ref[0] = _dot(tc, u * wr - v * wi, prec) + _dot(ts, u * wi + v * wr, prec)
    xr = _dotT(tc, x, prec)
    xi = -_dotT(ts, x, prec)

    @pl.when(b == 0)
    def _init():
        dwr_ref[...] = jnp.zeros_like(dwr_ref)
        dwi_ref[...] = jnp.zeros_like(dwi_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dwr_ref[...] += u * xr - v * xi
    dwi_ref[...] += -(u * xi + v * xr)
    db_ref[...] += jnp.sum(g, axis=0, keepdims=True)


def _precision(name):
    return (jax.lax.Precision.HIGHEST if name == "highest"
            else jax.lax.Precision.DEFAULT)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def bandlimited_mix(x, wr, wi, bias, precision: str = "default",
                    interpret: bool = False):
    """Rank-k band mix, fused.  x [B, T, D]; wr/wi [k, D] — the filter
    already transposed, sliced to the kept band, and 1/T-scaled (the
    caller folds the reconstruction scale); bias [D]."""
    return _impl_fwd(x, wr, wi, bias, precision, interpret)


def _impl_fwd(x, wr, wi, bias, precision, interpret):
    B, T, D = x.shape
    k = wr.shape[0]
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    tc, ts = _tables(T, k)
    prec = _precision(precision)
    per_b = pl.BlockSpec((1, T, D), lambda b: (b, 0, 0))
    whole = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape))
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    fn = pl.pallas_call(
        functools.partial(_fwd_kernel, prec=prec),
        grid=(B,),
        in_specs=[per_b, whole((T, k)), whole((T, k)), whole((k, D)),
                  whole((k, D)), whole((1, D))],
        out_specs=per_b,
        out_shape=jax.ShapeDtypeStruct((B, T, D), jnp.float32),
        interpret=interpret,
        **kwargs,
    )
    return fn(x, tc, ts, wr, wi, bias.reshape(1, -1))


def _impl_bwd(g, x, wr, wi, precision, interpret):
    B, T, D = x.shape
    k = wr.shape[0]
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    tc, ts = _tables(T, k)
    prec = _precision(precision)
    per_b = pl.BlockSpec((1, T, D), lambda b: (b, 0, 0))
    whole = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape))
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    f32 = jnp.float32
    fn = pl.pallas_call(
        functools.partial(_bwd_kernel, prec=prec),
        grid=(B,),
        in_specs=[per_b, per_b, whole((T, k)), whole((T, k)),
                  whole((k, D)), whole((k, D))],
        out_specs=[per_b, whole((k, D)), whole((k, D)), whole((1, D))],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, D), f32),
            jax.ShapeDtypeStruct((k, D), f32),
            jax.ShapeDtypeStruct((k, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
        ],
        interpret=interpret,
        **kwargs,
    )
    dx, dwr, dwi, db = fn(g, x, tc, ts, wr, wi)
    return dx, dwr, dwi, db[0]


def _vjp_fwd(x, wr, wi, bias, precision, interpret):
    out = _impl_fwd(x, wr, wi, bias, precision, interpret)
    return out, (x, wr, wi)


def _vjp_bwd(precision, interpret, res, g):
    x, wr, wi = res
    return _impl_bwd(g, x, wr, wi, precision, interpret)


bandlimited_mix.defvjp(_vjp_fwd, _vjp_bwd)


def bandlimited_mix_reference(x, wr, wi, bias):
    """Pure-jnp oracle (same algebra as the layer's XLA einsum path)."""
    B, T, D = x.shape
    k = wr.shape[0]
    tc, ts = _tables(T, k)
    xr = jnp.einsum("btc,tk->bkc", x, tc, precision=jax.lax.Precision.HIGHEST)
    xi = -jnp.einsum("btc,tk->bkc", x, ts, precision=jax.lax.Precision.HIGHEST)
    yr = xr * wr[None] - xi * wi[None]
    yi = xr * wi[None] + xi * wr[None]
    y = (jnp.einsum("bkc,tk->btc", yr, tc, precision=jax.lax.Precision.HIGHEST)
         - jnp.einsum("bkc,tk->btc", yi, ts, precision=jax.lax.Precision.HIGHEST))
    return y + bias
