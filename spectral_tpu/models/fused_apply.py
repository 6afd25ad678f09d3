"""Param-tree-level forward of FixedSpectralLM through the fused Pallas block.

``FixedSpectralLM`` (models/backbone.py) stays the canonical definition —
init, eval, decode and checkpoints all speak its flax param tree.  This
module re-expresses its forward as a pure function of that SAME tree so the
training hot path can run each block as ONE VMEM-resident Pallas program
(ops/pallas_block.py) instead of ~15 separate XLA fusions that round-trip
the [B, T, C] activation through HBM.

Value/grad parity with ``model.apply`` is gated in
tests/unit/test_pallas_block.py; descent parity on the real corpus in
experiments/backend_descent_check.py (--candidate-backend fused).

Reference equations: fft_lm/train_fixed_full.py:497-618 (block + LM).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.ops.fftc import (
    causal_filter_taps,
    conv_n_fft,
    cutoff_mask,
    kernel_rfft,
)
from spectral_tpu.ops.pallas_block import fused_block, fused_block_fits
from spectral_tpu.ops.pallas_block import layernorm as _layernorm
from spectral_tpu.ops.pallas_tail import fused_tail, pick_chunk
from spectral_tpu.ops.toeplitz import toeplitz_matrix

# decorrelate per-layer dropout streams (Knuth multiplicative hash step)
_LAYER_SEED_STRIDE = 2654435761


def block_conv_matrix(
    bp: dict, T: int, kernel_len: int, transition_bins: int,
    cutoff: Optional[jax.Array], causal_taps: bool = True,
) -> jax.Array:
    """The (T, T) Toeplitz matrix of a block's fused causal filter.

    Same filter chain as FixedSpectralBlock.__call__ (backbone.py:139-164):
    k̂ · sigmoid(freq gate) · curriculum mask, causal-tap projection, then
    the time-domain circulant restriction (ops/toeplitz.py).  Depends only
    on (params, cutoff) — XLA hoists it out of per-microbatch scans.
    """
    n_fft = conv_n_fft(T, kernel_len)
    fbins = n_fft // 2 + 1
    k_freq = kernel_rfft(bp["kernel"], n_fft)
    g_freq = jax.nn.sigmoid(bp["gate_freq_logits"][:fbins])
    mask = cutoff_mask(fbins, cutoff, transition_bins)
    h_fused = k_freq * g_freq * mask
    if causal_taps:
        h_fused = causal_filter_taps(h_fused, n_fft, jnp.int32(n_fft - T))
    h_time = jnp.fft.irfft(h_fused, n=n_fft).astype(jnp.float32)
    return toeplitz_matrix(h_time, T, n_fft)


def fused_block_apply(
    bp: dict, x: jax.Array, cutoff, *, kernel_len: int, transition_bins: int,
    dropout: float = 0.0, seed=0, deterministic: bool = True,
    causal_taps: bool = True, compute_dtype: str = "bfloat16",
    interpret: bool = False,
) -> jax.Array:
    """One FixedSpectralBlock forward from its param subtree, fused."""
    T = x.shape[1]
    M = block_conv_matrix(bp, T, kernel_len, transition_bins, cutoff, causal_taps)
    p = 0.0 if deterministic else dropout
    return fused_block(
        x, M, bp["ln"]["scale"], bp["ln"]["bias"],
        bp["gate_ctx"]["kernel"], bp["gate_ctx"]["bias"], bp["gain"],
        bp["ffn"]["ffn_ln"]["scale"], bp["ffn"]["ffn_ln"]["bias"],
        bp["ffn"]["ffn_in"]["kernel"], bp["ffn"]["ffn_in"]["bias"],
        bp["ffn"]["ffn_out"]["kernel"], bp["ffn"]["ffn_out"]["bias"],
        jnp.asarray(seed, jnp.uint32), p, compute_dtype, interpret,
    )




def fused_path_for(T: int, C: int, H: int) -> Optional[str]:
    """Which fused route covers shape (T, C, H): "block" (whole-block
    kernel, seq<=2048 + VMEM fit), "tail" (conv-in-XLA + positionwise tail
    kernel — any T with a multiple-of-8 divisor), or None (flax path).

    Mosaic tile alignment (d_model % 128) is the CALLER's gate
    (scripts/train_lm.py) — interpret-mode tests run at small C."""
    if T <= 2048 and T % 8 == 0 and fused_block_fits(T, C, H):
        return "block"
    if pick_chunk(T, C, H) is not None:
        return "tail"
    return None


def fused_block_apply_tail(
    bp: dict, x: jax.Array, cutoff, *, kernel_len: int, transition_bins: int,
    dropout: float = 0.0, seed=0, deterministic: bool = True,
    causal_taps: bool = True, compute_dtype: str = "bfloat16",
    conv_backend: str = "auto", interpret: bool = False,
    mesh: Optional[jax.sharding.Mesh] = None, sp_axis: str = "sp",
    tp_axis: str = "tp",
) -> jax.Array:
    """One FixedSpectralBlock forward: XLA conv + fused positionwise tail.

    The long-sequence fused route (ops/pallas_tail.py): LN1/gate/conv stay
    XLA ops (autodiff'd by XLA), the positionwise tail is one chunked
    Pallas program.  ``conv_backend``: "auto" dispatches like the flax
    path (Toeplitz matmul <= 2048, matmul-FFT above — backbone.py:191-226).

    ``mesh`` with sp>1 and/or tp>1 runs the MESH fused route (_tail_mesh):
    under sp the conv goes through the Ulysses all-to-all
    (parallel/distributed_fft.py — the same comm volume as the flax sp
    path) and the positionwise tail runs as one fused Pallas program PER
    TIME SHARD under shard_map (the tail is elementwise over time, so it
    needs no collectives); under tp the tail's FFN runs hidden-sharded
    (Megatron column/row split) with a psum over tp — the kernel's
    residual_alpha=1/tp makes the psum of per-shard tails EXACTLY the
    unsharded tail.  LN1 and the pooled context gate stay global XLA
    ops — jit's sharding propagation inserts the [B, C] mean's psum
    over sp.
    """
    B, T, C = x.shape
    n_fft = conv_n_fft(T, kernel_len)
    fbins = n_fft // 2 + 1
    xn = _layernorm(x, bp["ln"]["scale"], bp["ln"]["bias"])
    pooled = jnp.mean(xn, axis=1)  # [B, C]
    g_ctx = jax.nn.sigmoid(
        pooled @ bp["gate_ctx"]["kernel"] + bp["gate_ctx"]["bias"]
    )  # [B, C] — fp32, like the flax gate Dense
    s = bp["gain"][None, :] * g_ctx

    k_freq = kernel_rfft(bp["kernel"], n_fft)
    g_freq = jax.nn.sigmoid(bp["gate_freq_logits"][:fbins])
    mask = cutoff_mask(fbins, cutoff, transition_bins)
    h_fused = k_freq * g_freq * mask
    if causal_taps:
        h_fused = causal_filter_taps(h_fused, n_fft, jnp.int32(n_fft - T))

    if conv_backend not in ("auto", "direct", "matmul", "pallas"):
        raise ValueError(
            f"tail_conv_backend={conv_backend!r}: expected 'auto', 'direct' "
            "(Toeplitz matmul), 'matmul' (XLA-op matmul-FFT) or 'pallas' "
            "(in-kernel four-step FFT conv, one VMEM pass per (b, C-block))")

    msizes = {} if mesh is None else dict(mesh.shape)
    sp = msizes.get(sp_axis, 1)
    tp = msizes.get(tp_axis, 1)
    if sp > 1 or tp > 1:
        return _tail_mesh(
            x, xn, s, h_fused, bp, mesh, sp_axis, tp_axis, n_fft,
            conv_backend, dropout if not deterministic else 0.0, seed,
            compute_dtype, interpret,
        )

    conv = _tail_conv(xn, h_fused, n_fft, conv_backend, compute_dtype,
                      interpret)

    p = 0.0 if deterministic else dropout
    return fused_tail(
        x, conv, s, bp["ffn"]["ffn_ln"]["scale"], bp["ffn"]["ffn_ln"]["bias"],
        bp["ffn"]["ffn_in"]["kernel"], bp["ffn"]["ffn_in"]["bias"],
        bp["ffn"]["ffn_out"]["kernel"], bp["ffn"]["ffn_out"]["bias"],
        jnp.asarray(seed, jnp.uint32), p, compute_dtype, None, interpret,
    )


def _tail_conv(xn, h_fused, n_fft, conv_backend, compute_dtype, interpret):
    """The tail route's causal spectral conv of xn [B, T, C] by the fused
    filter h_fused [F] (complex), dispatched over three backends:

    * "direct": (T, T) Toeplitz matmul (ops/toeplitz.py) — pure MXU FLOPs,
      wins while O(T^2) is cheap (chip crossover tables below).
    * "matmul": XLA-op matmul-FFT (ops/matfft.py) — O(T log T) FLOPs but
      each stage einsum round-trips [B, C, n_fft] panels through HBM.
    * "pallas": the in-kernel four-step FFT conv
      (ops/pallas_spectral.fused_spectral_conv) — the same matmul-FFT
      algebra as "matmul" but ONE VMEM-resident pass per (b, C-block):
      HBM traffic drops to read-xn + write-conv.  fp32 in-kernel.

    "auto" picks by chip-measured crossover — RE-AUDITED round 5
    (experiments/profile_longseq, 32768 tok/step, whole-step ms, bf16
    compute mode, re-measured under the shipped flat-accum default AND
    with the fold disabled — BENCHMARKS.md "Round 5: crossover
    re-audit").  Every "direct wins" edge is gone:

        T=1024/d512 (forced tail): pallas 36.8 vs direct 87.9
        T=1024/d1024: pallas 46.0 (fold) / 50.3 (scan)
                      vs direct 98.6 (fold) / 81.7 (scan)
        T=2048/d512:  pallas 38.1 vs direct 89.1 (fold) / 69.7 (scan)
        T=4096/d512:  pallas 41.0 (fold) / 41.2 (scan) vs direct
                      101.8 / 91.4, matmul 151.0 (fold) / 95.3 (r3 scan)
        T=8192/d512:  pallas 90.1 vs matmul 155.8 (fold) / 106.2 (r3)

    The r3 "direct wins at T<=1024" edge (34.9 vs 53.7 at d1024) does
    NOT reproduce in either fold mode — seq2048-direct DOES reproduce
    r3 to 0.1% (69.74 vs 69.72), so the harness is faithful and the old
    d1024-direct number was an artifact of its era, not of the fold.
    "auto" is therefore pallas through T=8192.  Beyond 8192 "matmul" is
    FORCED, not assumed (VERDICT r3 weak #6 settled by measurement
    attempt): at n_fft 32768 Mosaic REJECTS the kernel outright — the
    slab dot's reshape vector<256x128x16xbf16> -> vector<256x2048xbf16>
    trips "infer-vector-layout: unsupported shape cast"
    (pallas_spectral.py:254 via _fused_conv_mxu_slabbed; chip compile
    log /tmp/tailconv16k, round 4).  There is no crossover edge to
    measure at that size until Mosaic grows the layout cast.
    """
    T = xn.shape[1]
    if conv_backend == "auto":
        if T <= 8192:
            conv_backend = "pallas"
        else:
            conv_backend = "matmul"
    # conv precision follows the compute dtype: bf16 training mode runs the
    # conv matmuls at DEFAULT (1-pass bf16) — the configuration the seq-4096
    # descent gate validated; fp32 mode keeps HIGHEST for parity tests
    prec = (jax.lax.Precision.HIGHEST if jnp.dtype(compute_dtype) == jnp.float32
            else jax.lax.Precision.DEFAULT)
    if conv_backend == "direct":
        from spectral_tpu.ops.toeplitz import spectral_conv_direct

        return spectral_conv_direct(xn, h_fused, n_fft, precision=prec)
    if conv_backend == "pallas":
        from spectral_tpu.ops.pallas_spectral import fused_spectral_conv

        B, _, C = xn.shape
        # compute_dtype follows the training mode like the other backends:
        # bf16 runs the in-kernel dots single-pass (Mosaic fp32 dots are the
        # accurate multi-pass scheme, ~1/3 rate — NOT XLA DEFAULT rounding)
        return fused_spectral_conv(
            xn, h_fused, jnp.ones((B, C), jnp.float32), n_fft,
            interpret=interpret, compute_dtype=compute_dtype,
        )
    from spectral_tpu.ops.matfft import spectral_conv_matmul

    return jnp.swapaxes(
        spectral_conv_matmul(jnp.swapaxes(xn, 1, 2), h_fused, n_fft,
                             precision=prec), 1, 2
    )


def _tail_mesh(x, xn, s, h_fused, bp, mesh, sp_axis, tp_axis, n_fft,
               conv_backend, p, seed, compute_dtype, interpret):
    """Mesh tail route: Ulysses conv (sp) + sharded fused tail (sp x tp).

    ``x``/``xn`` [B, T, C] globals with T sharded over ``mesh[sp_axis]``
    (and optionally B over dp; the FFN weights over tp).  The conv
    re-shards time<->channel via the all-to-all (custom_vjp'd in
    parallel/distributed_fft.py) when sp > 1, else runs replicated; the
    tail is positionwise, so each device runs the chunked Pallas program
    on its own [B_loc, T/sp, C] shard.

    Under tp > 1 the tail's FFN is hidden-sharded (W1 columns, b1, W2
    rows — the Megatron split parallel/mesh.param_pspecs declares) and the
    kernel's ``residual_alpha=1/tp`` + ``b2/tp`` make the psum over tp
    EXACTLY the unsharded tail (pallas_tail._tail_forward_values).  The
    in-kernel dropout seed is a PAIR: the shared stream folds (dp, sp)
    shard indices (conv/output masks must agree across tp shards for the
    psum linearity), and the hidden-mask stream additionally folds the tp
    index — each H-shard draws an independent hidden mask, so tp>1
    dropout is statistically identical to the unsharded tail
    (tests/unit/test_pallas_tail.py::test_tp_dropout_psum_linearity).
    """
    from jax.sharding import PartitionSpec as P

    try:  # jax >= 0.8
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    msizes = dict(mesh.shape)
    nsp = msizes.get(sp_axis, 1)
    ntp = msizes.get(tp_axis, 1)

    if nsp > 1:
        from spectral_tpu.parallel.distributed_fft import (
            sequence_sharded_spectral_conv,
        )

        # the Ulysses local conv runs the FULL time axis on each channel
        # shard: "matmul" = MXU DFT stages, "pallas" = the in-kernel
        # four-step conv, everything else = jnp.fft ("direct"'s (T, T)
        # Toeplitz operand has no channel-sharded local form)
        local_backend = (conv_backend if conv_backend in ("matmul", "pallas")
                         else "xla")
        conv = sequence_sharded_spectral_conv(
            xn, h_fused, mesh, axis=sp_axis, n_fft=n_fft, backend=local_backend
        )
    else:
        # tp-only mesh: conv replicated over tp (communication-free),
        # same backend dispatch as the single-device tail route
        conv = _tail_conv(xn, h_fused, n_fft, conv_backend, compute_dtype,
                          interpret)

    batch_axis = "dp" if "dp" in mesh.axis_names else None
    act_spec = P(batch_axis, sp_axis if nsp > 1 else None, None)
    rep = P()
    w1_spec = P(None, tp_axis) if ntp > 1 else rep  # column parallel
    b1_spec = P(tp_axis) if ntp > 1 else rep
    w2_spec = P(tp_axis, None) if ntp > 1 else rep  # row parallel
    alpha = 1.0 / ntp
    f = bp["ffn"]

    def local_tail(x_l, conv_l, s_l, ln2s, ln2b, W1, b1, W2, b2, seed_l):
        # decorrelate the in-kernel dropout streams across (dp, sp)
        # shards: the kernel folds only (local batch, local chunk) into
        # its seed, which would repeat identically on every shard.
        idx = jnp.uint32(0)
        if nsp > 1:
            idx = jax.lax.axis_index(sp_axis).astype(jnp.uint32)
        if batch_axis is not None:
            idx = idx + jnp.uint32(nsp) * jax.lax.axis_index(batch_axis).astype(jnp.uint32)
        # the shard-index multiplier must NOT reuse any _MASK_STREAM
        # offset (pallas_tail.py:129) or the tp multiplier below: with
        # 0x9E3779B9 (== _MASK_STREAM[1]) sp-shard i's hidden-mask seed
        # equalled sp-shard i+1's conv/output-mask seed (r4 advisor) —
        # 0xCC9E2D51 is odd (bijective mod 2^32) and distinct from all
        # stream/tp constants, so no (shard, stream) seed pair collides
        # at small shard counts.
        shard_seed = seed_l + idx * jnp.uint32(0xCC9E2D51)
        # the HIDDEN-mask stream additionally folds the tp index: each
        # H-shard draws an independent hidden mask (statistically
        # identical to unsharded dropout), while the conv/output masks —
        # which must agree across tp for the psum linearity — keep the
        # tp-independent shared seed (pallas_tail._tail_masks).
        hid_seed = shard_seed
        if ntp > 1:
            tpi = jax.lax.axis_index(tp_axis).astype(jnp.uint32)
            hid_seed = shard_seed + (jnp.uint32(1) + tpi) * jnp.uint32(0x85EBCA6B)
        out = fused_tail(x_l, conv_l, s_l, ln2s, ln2b, W1, b1, W2,
                         b2 * alpha, jnp.stack([shard_seed, hid_seed]),
                         p, compute_dtype, None, interpret, alpha)
        if ntp > 1:
            out = jax.lax.psum(out, tp_axis)
        return out

    fn = shard_map(
        local_tail, mesh=mesh,
        in_specs=(act_spec, act_spec, P(batch_axis, None),
                  rep, rep, w1_spec, b1_spec, w2_spec, rep, rep),
        out_specs=act_spec,
        check_vma=False,  # custom_vjp inside (pallas_tail)
    )
    return fn(x, conv, s, f["ffn_ln"]["scale"], f["ffn_ln"]["bias"],
              f["ffn_in"]["kernel"], f["ffn_in"]["bias"],
              f["ffn_out"]["kernel"], f["ffn_out"]["bias"],
              jnp.asarray(seed, jnp.uint32))


def dropout_seed_from_key(rng: jax.Array) -> jax.Array:
    """uint32 kernel-PRNG seed from a JAX PRNG key (any impl)."""
    return jax.random.bits(rng, (), jnp.uint32)


def fused_lm_apply(
    params: dict, tokens: jax.Array, cfg: TrainConfig,
    cutoff=None, deterministic: bool = True, rng: Optional[jax.Array] = None,
    interpret: bool = False, force_path: Optional[str] = None,
    mesh: Optional[jax.sharding.Mesh] = None, sp_axis: str = "sp",
    tp_axis: str = "tp",
) -> jax.Array:
    """FixedSpectralLM logits from its param tree via the fused kernels.

    ``params``: the ``variables["params"]`` tree of FixedSpectralLM.
    ``rng``: PRNG key for dropout (required when not deterministic).
    Route per shape (``fused_path_for``): seq<=2048 runs the whole-block
    kernel; longer sequences run the conv in XLA (matmul-FFT) + the
    positionwise tail kernel — no sequence-length cliff.  ``force_path``
    overrides the dispatch ("block"|"tail", tests/benchmarks only).

    ``mesh`` with sp>1 and/or tp>1 selects the mesh tail route (Ulysses
    all-to-all conv + per-shard tail kernels, hidden-sharded FFN under
    tp — ``_tail_mesh``); call it on GLOBAL arrays under jit with the
    trainer's (dp, sp, tp) shardings — the collectives come from the
    conv's shard_map, the tail's tp psum and jit's propagation.
    """
    emb = params["embed"]["embedding"]
    h = emb[tokens]
    T = h.shape[1]
    hidden = params["block_0"]["ffn"]["ffn_in"]["kernel"].shape[1]
    msizes = {} if mesh is None else dict(mesh.shape)
    sp = msizes.get(sp_axis, 1)
    tp = msizes.get(tp_axis, 1)
    if sp > 1 or tp > 1:
        # the whole-block kernel convs in-kernel and cannot split T (nor
        # its in-kernel pooled gate the hidden axis); the tail route is
        # built for exactly these factorizations
        path = "tail"
        if T % sp or cfg.d_model % sp:
            raise ValueError(
                f"(T={T}, C={cfg.d_model}) must divide over {sp_axis}={sp}")
        if hidden % tp:
            raise ValueError(
                f"FFN hidden={hidden} must divide over {tp_axis}={tp}")
        if pick_chunk(T // sp, cfg.d_model, hidden // tp) is None:
            raise ValueError(
                f"no tail chunking for the local shard (T/sp={T // sp})")
    else:
        path = force_path or fused_path_for(T, cfg.d_model, hidden)
    if path is None:
        raise ValueError(
            f"no fused route covers (T={T}, C={cfg.d_model}, H={hidden}); "
            f"use the flax path (cfg.use_fused_block=False)"
        )
    if deterministic or cfg.dropout == 0.0:
        seed = jnp.uint32(0)
        det = True
    else:
        assert rng is not None, "rng required for dropout"
        seed = dropout_seed_from_key(rng)
        det = False
    for i in range(cfg.n_layers):
        bp = params[f"block_{i}"]
        layer_seed = seed + jnp.uint32((i * _LAYER_SEED_STRIDE) & 0xFFFFFFFF)
        if path == "block":
            h = fused_block_apply(
                bp, h, cutoff,
                kernel_len=cfg.kernel_len, transition_bins=cfg.jpeg_transition,
                dropout=cfg.dropout, seed=layer_seed,
                deterministic=det, causal_taps=cfg.causal_taps,
                compute_dtype=cfg.compute_dtype, interpret=interpret,
            )
        else:
            h = fused_block_apply_tail(
                bp, h, cutoff,
                kernel_len=cfg.kernel_len, transition_bins=cfg.jpeg_transition,
                dropout=cfg.dropout, seed=layer_seed,
                deterministic=det, causal_taps=cfg.causal_taps,
                compute_dtype=cfg.compute_dtype,
                conv_backend=getattr(cfg, "tail_conv_backend", "auto"),
                interpret=interpret,
                mesh=mesh if (sp > 1 or tp > 1) else None,
                sp_axis=sp_axis, tp_axis=tp_axis,
            )
    h = _layernorm(h, params["ln_f"]["scale"], params["ln_f"]["bias"])
    cdt = jnp.dtype(cfg.compute_dtype)
    logits = h.astype(cdt) @ emb.T.astype(cdt)
    return logits.astype(jnp.float32)
