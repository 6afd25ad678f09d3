"""Fused rank-k band-limited spectral mix: ONE VMEM-resident Pallas pass.

The seq-4k headline op (`SpectralMixingLayer(fft_backend="bandlimited")`,
layers/spectral_layers.py:163 — reference equations spectral_layers.py:
97-109 of /root/reference) is algebraically two (T, k) DFT matmuls around a
(k, D) complex filter.  This kernel runs the whole projection in one
Pallas program per batch element.

Two kernel generations live here; their measured verdicts DIFFER:

* ``bandlimited_mix`` (round 3, grid-per-batch, whole rows in VMEM): the
  XLA einsum path WINS against it — 0.29 ms vs 0.42 ms fp32-accurate, 4x
  in bf16 fast mode.  XLA already fuses the elementwise filter into the
  matmuls and keeps a jitted loop's carry VMEM-resident; this kernel is an
  HBM round trip per call and never pays for itself.  Kept as the
  documented negative result and an interpret-mode parity target; NOT
  dispatched by the layer.
* ``bandlimited_mix_stream`` / ``_pooled`` (round 4, two-phase streamed
  panels with VMEM scratch + split-mantissa fp32): BEATS XLA 2.2x —
  158 us vs 349 us fp32-accurate at the seq-4k headline shape, 0.78-0.80
  of the TRUE-HBM roofline in bf16 fast mode (vs a 0.82 pure-copy DMA
  floor measured on the same grid).  This IS the layer's
  ``fft_backend="bandlimited_stream"`` route and the bench.py default on
  TPU (bench.py:388).  The r3 "XLA wins" verdict against the old kernel
  was partly a harness artifact: feeding an opaque pallas_call from a
  ``dynamic_slice`` makes XLA materialize ~134 MB/iter of phantom copies
  (BENCHMARKS.md "round 4 findings", finding 2) — the streamed kernel
  indexes the pool itself (scalar-prefetch slot) and dodges it.

The durable lesson survives in refined form: kernel fusion pays where the
XLA fusion boundary forces HBM traffic (pallas_block.py: 15 fusions, 1.5x;
here: phase overlap + in-kernel pool indexing), not where XLA already
fuses a single producer-consumer chain.

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


def _cdot(a, b, cdt, transpose=False):
    """dot_general with both operands cast to ``cdt``; fp32 accumulate.
    fp32 compute pins Precision.HIGHEST — without it fp32 operands follow
    the DEFAULT bf16-rounding (chip-measured 3.3e-3 parity error); bf16
    operands run single-pass."""
    a = a.astype(cdt)
    b = b.astype(cdt)
    dims = ((((0,) if transpose else (1,)), (0,)), ((), ()))
    prec = jax.lax.Precision.HIGHEST if cdt == jnp.float32 else None
    return jax.lax.dot_general(a, b, dims, precision=prec,
                               preferred_element_type=jnp.float32)


def _split_hi_lo(a):
    """Exact mantissa split a = hi + lo + O(2^-16 |a|), both halves bf16.

    ``hi`` is a's bf16 rounding (exact as a bf16); ``lo`` is the fp32
    residual rounded to bf16 (error 2^-8 of the residual = 2^-16 of a).
    Three bf16 dots  hi@vh + hi@vl + lo@vh  then reproduce an fp32 dot to
    ~1e-5 relative (chip-measured 6.3e-6 vs the HIGHEST einsum oracle at
    the headline shape) at HALF the cost of Mosaic's fp32 HIGHEST
    lowering (156 vs 297 us measured — the 'error-compensated bf16
    scheme' of VERDICT r3 next #1)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _bdot(a, b, transpose=False):
    """Single-pass bf16 MXU dot with fp32 accumulate."""
    dims = ((((0,) if transpose else (1,)), (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _stream_kernel(s_ref, x_ref, *rest, mode, NT, B, ntab):
    """One grid step of the two-phase fused kernel (grid = (2*NT,)).

    Steps 0..NT-1   (phase A): accumulate the band spectrum of each x
    chunk into the VMEM scratch ``xr/xi`` — [B, k, D], never touches HBM —
    and stash the table chunk in a VMEM cache so phase B never refetches
    it (the table BlockSpec freezes at NT-1, so Pallas's revisit skip
    elides the DMA; chip-measured 111 -> 102 us).
    Steps NT..2NT-1 (phase B): filter the resident spectrum and
    reconstruct one y chunk.  The batch loop is a Python unroll (static
    outer-axis indices; B is small).

    ``mode``: "accurate" = split-mantissa fp32 (3 bf16 dots per logical
    dot, both operands compensated); "mid" = 2-dot scheme (split TABLES
    against bf16-rounded values — compensates the static operand, leaves
    the value rounding uncompensated); "fast" = single-pass bf16."""
    tab_refs = rest[:ntab]
    wr_ref, wi_ref, b_ref = rest[ntab:ntab + 3]
    y_ref = rest[ntab + 3]
    xr_ref, xi_ref = rest[ntab + 4:ntab + 6]
    cache_refs = rest[ntab + 6:ntab + 6 + ntab]
    # filtered-spectrum caches (round 5): phase B previously recomputed
    # the filter multiply AND the hi/lo splits of yr/yi once per CHUNK —
    # NT x redundant VPU work that showed up as strict fp32's gap to its
    # MXU bound.  Computed once at the first phase-B step, read by all.
    ycache_refs = rest[ntab + 6 + ntab:]
    i = pl.program_id(0)

    def split(v):
        """Pre-split a value operand once per (chunk, b) — the accurate
        mode uses the same split for the tc AND ts dots (hoisted; the
        per-dot split cost the VPU 2x the work)."""
        if mode == "accurate":
            return _split_hi_lo(v)
        return (v.astype(jnp.bfloat16), None)

    def dotT(tv, vs):
        """tablesᵀ @ v — tv is (hi, lo) when tables are split; vs is the
        pre-split (vh, vl) pair."""
        vh, vl = vs
        if mode == "accurate":
            h, l = tv
            return (_bdot(h, vh, True) + _bdot(h, vl, True)
                    + _bdot(l, vh, True))
        if mode == "mid":
            h, l = tv
            return _bdot(h, vh, True) + _bdot(l, vh, True)
        return _bdot(tv, vh, True)

    def dot(tv, vs):
        vh, vl = vs
        if mode == "accurate":
            h, l = tv
            return _bdot(h, vh) + _bdot(h, vl) + _bdot(l, vh)
        if mode == "mid":
            h, l = tv
            return _bdot(h, vh) + _bdot(l, vh)
        return _bdot(tv, vh)

    def pair(vals):
        if mode in ("accurate", "mid"):
            return ((vals[0], vals[1]), (vals[2], vals[3]))
        return vals

    @pl.when(i < NT)
    def _spectrum():
        tv = [r[...] for r in tab_refs]
        for c, v in zip(cache_refs, tv):
            c[i] = v
        tcv, tsv = pair(tv)
        for b in range(B):
            xs = split(x_ref[0, b])
            pr = dotT(tcv, xs)
            pi = -dotT(tsv, xs)

            @pl.when(i == 0)
            def _init():
                xr_ref[b] = pr
                xi_ref[b] = pi

            @pl.when(i != 0)
            def _acc():
                xr_ref[b] += pr
                xi_ref[b] += pi

    nsplit = 2 if mode == "accurate" else 1

    @pl.when(i == NT)
    def _filter():
        # filter the resident spectrum ONCE per batch element; stash the
        # (pre-split) operands the synthesis dots consume
        for b in range(B):
            xr, xi = xr_ref[b], xi_ref[b]
            yr = xr * wr_ref[...] - xi * wi_ref[...]
            yi = xr * wi_ref[...] + xi * wr_ref[...]
            for s, v in zip(range(nsplit), split(yr)):
                ycache_refs[s][b] = v
            for s, v in zip(range(nsplit), split(yi)):
                ycache_refs[nsplit + s][b] = v

    @pl.when(i >= NT)
    def _reconstruct():
        j = i - NT
        tcv, tsv = pair([c[j] for c in cache_refs])
        for b in range(B):
            yrs = tuple(ycache_refs[s][b] for s in range(nsplit)) + (
                (None,) if nsplit == 1 else ())
            yis = tuple(ycache_refs[nsplit + s][b] for s in range(nsplit)) + (
                (None,) if nsplit == 1 else ())
            y_ref[b] = dot(tcv, yrs) - dot(tsv, yis) + b_ref[...]


def _stream_call(xpool, slot, wr, wi, bias, chunk, compute_dtype, interpret):
    """Shared pallas_call builder: xpool is (P, B, T, D); ``slot`` (an
    int32 [1] array, scalar-prefetched) selects which pool entry to read.

    Feeding the pool THROUGH the kernel's index map instead of an XLA
    dynamic_slice is what makes the TRUE-HBM harness honest for an opaque
    pallas_call: XLA cannot fuse a dynamic_slice/dynamic_update_slice
    into an opaque call the way it fuses them into its own einsum
    fusions, so slicing outside the kernel adds ~134 MB/iter of phantom
    HBM copies at the headline shape (chip-measured: a pure-copy kernel
    timed 341 us through XLA slices vs 100 us pooled — the entire
    round-3 'pallas loses to XLA' verdict on this op was harness
    artifact).  In real training the producer's buffer is the operand
    directly, exactly like the pooled path."""
    P, B, T, D = xpool.shape
    k = wr.shape[0]
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    tc, ts = _tables(T, k)
    if compute_dtype == "mid":
        mode = "mid"
    elif jnp.dtype(compute_dtype) == jnp.float32:
        mode = "accurate"
    else:
        mode = "fast"
    if mode in ("accurate", "mid"):
        tch, tcl = _split_hi_lo(tc)
        tsh, tsl = _split_hi_lo(ts)
        tabs = (tch, tcl, tsh, tsl)
    else:
        tabs = (tc.astype(jnp.bfloat16), ts.astype(jnp.bfloat16))
    ntab = len(tabs)
    S = chunk
    while T % S:  # largest power-of-two chunk dividing T
        S //= 2
    NT = T // S
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)

    # Index maps over the fused two-phase grid i in [0, 2*NT):
    #   x:      (slot, chunk min(i, NT-1)) — frozen during phase B, so
    #           Pallas's revisit skip never re-fetches it (x read ONCE);
    #   tables: chunk min(i, NT-1) — fetched only in phase A (phase B
    #           reads the VMEM cache written by phase A);
    #   y:      chunk max(i-NT, 0) — the block buffer holds garbage
    #           during phase A but its index stays 0, and Mosaic only
    #           flushes an out block when its index CHANGES (i = NT+1, by
    #           which time step NT has overwritten it) or at grid end.
    x_blk = pl.BlockSpec((1, B, S, D),
                         lambda i, s: (s[0], 0, jnp.minimum(i, NT - 1), 0))
    y_blk = pl.BlockSpec((B, S, D), lambda i, s: (0, jnp.maximum(i - NT, 0), 0))
    tab_blk = pl.BlockSpec((S, k), lambda i, s: (jnp.minimum(i, NT - 1), 0))
    whole = lambda shape: pl.BlockSpec(shape, lambda i, s: tuple(0 for _ in shape))

    fused = pl.pallas_call(
        functools.partial(_stream_kernel, mode=mode, NT=NT, B=B,
                          ntab=ntab),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(2 * NT,),
            in_specs=[x_blk] + [tab_blk] * ntab
            + [whole((k, D)), whole((k, D)), whole((1, D))],
            out_specs=y_blk,
            scratch_shapes=[pltpu.VMEM((B, k, D), jnp.float32)] * 2
            + [pltpu.VMEM((NT, S, k), jnp.bfloat16) for _ in range(ntab)]
            # filtered-spectrum caches: (yr, yi) x (hi[, lo]) pre-split
            + [pltpu.VMEM((B, k, D), jnp.bfloat16)
               for _ in range(2 * (2 if mode == "accurate" else 1))],
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, D), jnp.float32),
        interpret=interpret,
        **kwargs,
    )
    return fused(slot, xpool, *tabs, wr, wi, bias.reshape(1, -1))


def bandlimited_mix_stream_pooled(xpool, slot, wr, wi, bias,
                                  compute_dtype: str = "float32",
                                  chunk: int = 512, interpret: bool = False):
    """Forward-only pooled entry for the TRUE-HBM harness (bench.py):
    reads pool entry ``slot`` (int32 [1]) of ``xpool`` [P, B, T, D]
    directly through the kernel's index map — zero phantom XLA copies.
    See :func:`bandlimited_mix_stream` for the kernel design."""
    return _stream_call(xpool, slot, wr, wi, bias, chunk, compute_dtype,
                        interpret)


def _stream_fwd_impl(x, wr, wi, bias, chunk, compute_dtype, interpret):
    slot = jnp.zeros((1,), jnp.int32)
    return _stream_call(x[None], slot, wr, wi, bias, chunk, compute_dtype,
                        interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def bandlimited_mix_stream(x, wr, wi, bias, compute_dtype: str = "float32",
                           chunk: int = 512, interpret: bool = False):
    """STREAMED rank-k band mix: ONE two-phase Pallas program whose grid
    pipeline double-buffers the HBM<->VMEM chunk DMA against the MXU work —
    the round-4 kernel built for the TRUE-HBM harness (VERDICT r3 next #1).

    Traffic design (why one kernel, not two passes): the [B, k, D] band
    spectrum lives in VMEM *scratch* across the whole grid, so it never
    costs HBM traffic; Pallas's revisit optimization (a block whose index
    does not change between consecutive steps is neither re-fetched nor
    flushed) means x is read exactly once and y written exactly once; and
    the table chunks are DMA'd only in phase A, phase B reading them back
    from a VMEM cache.  Total HBM traffic = x + y + ONE table read — at
    the headline shape (B8 x T4096 x D256, k=128) 67.1 MB payload +
    2.1 MB tables, 0.97 of the two-pass bound.

        phase A (steps 0..NT-1):  xr/xi[B, k, D] += tables[chunk]^T x-chunk
        phase B (steps NT..2NT-1): y-chunk = tc (x̂·w)_r - ts (x̂·w)_i + b

    Chip-measured at the headline shape through the pooled TRUE-HBM
    harness (v5e, min-marginal, experiments/profile_stream_mix.py):

        fast mode (bf16):          102 us = 0.80 of the HBM roofline
        fp32-accurate (split):     156 us = 0.52
        XLA einsum path:           130 us = 0.61 / 349 us = 0.235
        pure-copy kernel floor:    100 us = 0.82

    Two failed designs are instructive (committed history): (a) two
    separate pallas_calls on a (B, NT) grid re-read the (T, k) tables
    once per *batch element* (2x the payload bytes at k=128) — slower
    than XLA; (b) ANY design benchmarked behind an XLA dynamic_slice
    measures ~240 us of phantom copy traffic — see
    :func:`bandlimited_mix_stream_pooled`.

    ``compute_dtype``: "float32" = split-mantissa error-compensated bf16
    dots (3 per logical dot, ~6e-6 relative to the fp32 oracle — half the
    cost of Mosaic's fp32 HIGHEST lowering, 156 vs 297 us); "bfloat16" =
    single-pass fast mode.  Backward reuses the whole-panel bwd kernel of
    :func:`bandlimited_mix` (training parity; the harness measures the
    forward).
    """
    return _stream_fwd_impl(x, wr, wi, bias, chunk, compute_dtype, interpret)


def _stream_vjp_fwd(x, wr, wi, bias, compute_dtype, chunk, interpret):
    out = _stream_fwd_impl(x, wr, wi, bias, chunk, compute_dtype, interpret)
    return out, (x, wr, wi)


def _stream_vjp_bwd(compute_dtype, chunk, interpret, res, g):
    x, wr, wi = res
    # "mid" trains with the DEFAULT-precision backward (its forward error
    # class ~5e-5 sits above bf16-rounded grads anyway); strict fp32 keeps
    # the HIGHEST backward for parity gates.
    precision = ("highest" if compute_dtype != "mid"
                 and jnp.dtype(compute_dtype) == jnp.float32 else "default")
    return _impl_bwd(g, x, wr, wi, precision, interpret)


bandlimited_mix_stream.defvjp(_stream_vjp_fwd, _stream_vjp_bwd)


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
