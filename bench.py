"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): spectral-mix tokens/sec/chip at seq 4k.

Baseline derivation (BASELINE.md): the reference's GTX 1660 Super headline is
SpectralMixingLayer fwd at B=8, D=256: 2.16 ms @ seq 2048 (BENCHMARKS.md:17).
Throughput there = 8*2048/2.16e-3 = 7.59e6 tok/s; spectral-mix cost scales
~linearly in T (O(T log T)), so the seq-4k baseline throughput is ~the same
7.59e6 tok/s (2x tokens in 2x time).  vs_baseline = ours / 7.59e6.

Usage: python bench.py            (runs on the default platform — real TPU)
       python bench.py --quick    (smaller iters, for smoke testing)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_TOK_S = 8 * 2048 / 2.16e-3  # reference GTX 1660 Super, BENCHMARKS.md:17


def bench_spectral_mix(
    seq: int = 4096,
    batch: int = 8,
    dim: int = 256,
    iters: int = 50,
    warmup: int = 5,
    backend: str = "xla",
):
    import jax
    import jax.numpy as jnp

    from spectral_tpu.layers.spectral_layers import SpectralMixingLayer

    layer = SpectralMixingLayer(embed_dim=dim, fft_backend=backend)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, seq, dim), jnp.float32)
    params = layer.init(jax.random.PRNGKey(1), x)

    # Measurement design for a (possibly tunneled) chip: the whole timing
    # loop runs INSIDE one jit program as a lax.fori_loop whose carry is
    # renormalized every iteration, and the reported time is the marginal
    # cost t(iters) - t(1) per extra iteration.  Rationale (both failure
    # modes observed on the tunneled v5e):
    #   * independent same-input dispatches can be served from a
    #     value-level cache by the relay runtime (reported 22 us/iter —
    #     under the 82 us HBM floor for the 67 MB of traffic);
    #   * host-chained dispatches pay a multi-ms tunnel round-trip per
    #     call, hiding the actual device time.
    # One dispatch with an on-device data-dependent loop suffers neither;
    # the renormalization keeps the carry off any fixed point so no
    # iteration is degenerate.
    def one(p, x):
        y = layer.apply(p, x)
        return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-12)

    def loop(p, x, n):
        out = jax.lax.fori_loop(0, n, lambda i, c: one(p, c), x)
        return jnp.sum(out)  # scalar — fetched by VALUE to force a true sync

    run = jax.jit(loop, static_argnums=(2,))

    # n must be large enough that device time dominates the dispatch round
    # trip (a tunneled chip has multi-ms RTT with >10 ms jitter, which
    # swallowed a 50-iteration marginal entirely)
    n_big = iters * 20

    float(run(params, x, 1))  # compile both programs
    float(run(params, x, n_big))

    # distinct inputs per repetition — a relay runtime may serve repeated
    # identical (executable, inputs) calls from cache
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    xs = [jax.random.normal(k, x.shape, x.dtype) for k in keys]
    for xi in xs:
        jax.block_until_ready(xi)

    def timed(n, reps=2):
        best = float("inf")
        for r in range(reps):
            xi = xs[(n + r) % len(xs)]
            t0 = time.perf_counter()
            float(run(params, xi, n))  # value fetch = unambiguous completion
            best = min(best, time.perf_counter() - t0)
        return best

    dt = max(timed(n_big) - timed(1), 1e-9) / (n_big - 1)

    tokens_per_sec = batch * seq / dt
    return tokens_per_sec, dt


def bench_spectral_mix_hbm(
    seq: int = 4096,
    batch: int = 8,
    dim: int = 256,
    iters: int = 50,
    backend: str = "xla",
    pool: int = 8,
    compute_dtype: str | None = None,
):
    """TRUE-HBM spectral-mix measurement (VERDICT r2 weak #1).

    The plain fori-loop carry of :func:`bench_spectral_mix` stays
    VMEM-resident, so its "GB/s" is *implied* traffic / time and can exceed
    the HBM roofline (r2's fast mode reported 1.33x).  This variant forces
    every iteration to READ a fresh input slice from a >VMEM input pool and
    WRITE its output to a >VMEM output pool (pool = 8 x 33.5 MB = 268 MB at
    the default shape vs 128 MB physical VMEM on v5e), so each iteration
    genuinely moves >= 2 x B x T x D x 4 bytes of HBM traffic — the
    two-pass bound the roofline fraction is named after.  By construction
    the reported fraction cannot exceed 1.0 (plus prefetch overlap slack).

    Returns (tokens_per_sec, dt_per_iter, measured_gbps_lower_bound).
    """
    import jax
    import jax.numpy as jnp

    from spectral_tpu.layers.spectral_layers import SpectralMixingLayer

    if backend == "bandlimited_stream":
        return _bench_stream_hbm_pooled(seq, batch, dim, iters, pool,
                                        compute_dtype)

    layer = SpectralMixingLayer(embed_dim=dim, fft_backend=backend)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (batch, seq, dim), jnp.float32)
    params = layer.init(jax.random.PRNGKey(1), x0)

    keys = jax.random.split(jax.random.PRNGKey(2), pool)
    xpool = jnp.stack([jax.random.normal(k, x0.shape, x0.dtype) for k in keys])

    def loop(p, xpool, n):
        ypool0 = jnp.zeros_like(xpool)

        def body(i, carry):
            acc, ypool = carry
            xi = jax.lax.dynamic_index_in_dim(xpool, i % pool, 0, keepdims=False)
            y = layer.apply(p, xi)
            ypool = jax.lax.dynamic_update_index_in_dim(ypool, y, i % pool, 0)
            return (acc + jnp.mean(y), ypool)

        acc, ypool = jax.lax.fori_loop(0, n, body, (jnp.float32(0), ypool0))
        # touch the final output pool so XLA cannot dead-code the writes;
        # scalar result — fetched by VALUE to force a true sync
        return acc + jnp.mean(ypool[0, 0, 0])

    run = jax.jit(loop, static_argnums=(2,))
    # 40x: t(1)'s ~10 ms tunnel jitter amortizes to ~5 us/iter at n_big=2000
    # (it was the +-0.02 wobble on the roofline fraction at 20x)
    n_big = iters * 40

    # compile both programs on a DEDICATED warmup input: if the warmup
    # (executable, inputs) pair reappeared in the timed loop the tunneled
    # chip could serve it from the value cache (CLAUDE.md gotcha 1) and
    # min-of-reps would pick the ~0-time hit
    xwarm = xpool + 1.0  # value-distinct for ANY pool size (roll/reverse
    # degenerate to identity/each-other at pool <= 2)
    float(run(params, xwarm, 1))
    float(run(params, xwarm, n_big))

    pools = [xpool, xpool[::-1]]  # distinct inputs per repetition (value cache)
    for pl_ in pools:
        jax.block_until_ready(pl_)

    def timed(n, reps=3):
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            float(run(params, pools[(n + r) % len(pools)], n))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = max(timed(n_big) - timed(1), 1e-9) / (n_big - 1)
    bytes_per_iter = 2 * batch * seq * dim * 4  # guaranteed read + write
    return batch * seq / dt, dt, bytes_per_iter / dt / 1e9


def _bench_stream_hbm_pooled(seq, batch, dim, iters, pool,
                             compute_dtype=None):
    """TRUE-HBM harness for the streamed Pallas kernel: the pool is fed
    THROUGH the kernel's scalar-prefetch index map rather than an XLA
    dynamic_slice.

    Why this branch exists: XLA fuses a dynamic_slice/dynamic_update_slice
    into its own einsum fusions (in-place pool update, no extra traffic),
    but around an OPAQUE pallas_call those same ops materialize ~2x the
    payload in phantom HBM copies (chip-measured: a pure-copy kernel timed
    341 us behind XLA slices vs 100 us pooled at the headline shape).  The
    pooled entry preserves the harness guarantee — every iteration reads a
    distinct >VMEM pool entry and writes a fresh >VMEM output — which is
    also how the kernel runs in real training (its operand IS the
    producer's buffer).  Weights = the layer's init values (ones/zeros —
    parity with the layer path is gated in test_pallas_bandlimited.py).
    """
    import jax
    import jax.numpy as jnp

    from spectral_tpu.ops import matfft
    from spectral_tpu.ops.pallas_bandlimited import bandlimited_mix_stream_pooled

    k = min(dim // 2, seq // 2)
    s = 1.0 / seq
    wr = jnp.full((k, dim), s, jnp.float32)
    wi = jnp.zeros((k, dim), jnp.float32)
    bias = jnp.zeros((dim,), jnp.float32)
    cdt = compute_dtype or (
        "float32" if matfft._PRECISION == jax.lax.Precision.HIGHEST
        else "bfloat16")

    keys = jax.random.split(jax.random.PRNGKey(2), pool)
    xpool = jnp.stack(
        [jax.random.normal(kk, (batch, seq, dim), jnp.float32) for kk in keys])

    def loop(xpool, n):
        def body(i, acc):
            slot = jnp.reshape(i % pool, (1,)).astype(jnp.int32)
            y = bandlimited_mix_stream_pooled(xpool, slot, wr, wi, bias, cdt)
            # consume ONE element: forces the call (and its full y write)
            # without an XLA re-read of the 33.5 MB output
            return acc + y[0, 0, 0]

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    run = jax.jit(loop, static_argnums=1)
    n_big = iters * 40  # jitter amortization — see bench_spectral_mix_hbm
    xwarm = xpool + 1.0
    float(run(xwarm, 1))
    float(run(xwarm, n_big))
    pools = [xpool, xpool[::-1]]
    for pl_ in pools:
        jax.block_until_ready(pl_)

    def timed(n, reps=3):
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            float(run(pools[(n + r) % len(pools)], n))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = max(timed(n_big) - timed(1), 1e-9) / (n_big - 1)
    bytes_per_iter = 2 * batch * seq * dim * 4
    return batch * seq / dt, dt, bytes_per_iter / dt / 1e9


def bench_train_step(iters: int = 40, use_pallas: bool = False,
                     seq_len: int = 1024, accum_steps: int = 8,
                     flatten_accum: str = "auto"):
    """ms/step + tokens/sec of the FULL jitted train step at the flagship
    recipe (reference README.md:384-397: d512 x 6, seq 1024, kernel 128,
    batch 4 x accum 8 = 32768 tokens/optimizer step).

    ``use_pallas=False`` measures the DEFAULT TPU training configuration
    (seq<=2048: the fused whole-block Pallas kernel; longer: XLA matmul-FFT
    conv + the fused positionwise tail kernel, ops/pallas_tail.py — both
    bf16, both the path scripts/train_lm.py picks on TPU, descent parity
    gated by experiments/backend_descent_check.py); ``use_pallas=True``
    instead routes the conv through the fused FFT kernel
    (ops/pallas_spectral.py) so that custom-vjp backward stays
    driver-tracked.  ``seq_len``/``accum_steps`` parameterize the long-seq
    line (seq 4096 x accum 2 keeps 32768 tokens/step — comparable).
    Returns (ms_per_step, tokens_per_sec).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.train.trainer import (
        dropout_key,
        init_model,
        make_optimizer,
        make_train_step,
    )

    on_tpu = jax.default_backend() == "tpu"
    cfg = TrainConfig(
        d_model=512,
        n_layers=6,
        seq_len=seq_len,
        kernel_len=128,
        batch_size=4,
        accum_steps=accum_steps,
        use_pallas_kernel=use_pallas and on_tpu,  # interpret mode would dominate on CPU
        use_fused_block=on_tpu and not use_pallas,
        fft_backend=("direct" if seq_len <= 2048 else "matmul") if (on_tpu and not use_pallas) else "xla",
        compute_dtype="bfloat16" if on_tpu else "float32",
        flatten_accum=flatten_accum,
    )
    model, params = init_model(cfg)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    step = make_train_step(model, cfg, tx)

    rng = np.random.default_rng(0)
    shape = (cfg.accum_steps, cfg.batch_size, cfg.seq_len)
    batches = [
        (
            jnp.asarray(rng.integers(0, 256, shape).astype(np.int32)),
            jnp.asarray(rng.integers(0, 256, shape).astype(np.int32)),
        )
        for _ in range(3)
    ]
    cutoff = jnp.int32(512)
    lr = jnp.float32(2e-4)
    key = dropout_key(cfg, 0)

    # whole timing loop inside ONE jit program (tunnel RTT + value-cache
    # hygiene — same methodology as bench_spectral_mix; the carry is the
    # mutating (params, opt_state) so no iteration is degenerate)
    def loop(params, opt_state, bx, by, n):
        def body(i, carry):
            p, o, _ = carry
            p, o, loss = step(p, o, bx, by, cutoff, lr, jax.random.fold_in(key, i))
            return (p, o, loss)

        _, _, loss = jax.lax.fori_loop(0, n, body, (params, opt_state, jnp.float32(0)))
        return loss

    run = jax.jit(loop, static_argnums=4)
    bx, by = batches[0]
    float(run(params, opt_state, bx, by, 1))
    float(run(params, opt_state, bx, by, iters))

    def timed(n, reps=2):
        best = float("inf")
        for r in range(reps):
            bx, by = batches[(n + r) % len(batches)]
            t0 = time.perf_counter()
            float(run(params, opt_state, bx, by, n))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = max(timed(iters) - timed(1), 1e-9) / (iters - 1)
    tokens = cfg.accum_steps * cfg.batch_size * cfg.seq_len
    return dt * 1e3, tokens / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument(
        "--backend", default=None,
        choices=["xla", "matmul", "pallas", "bandlimited", "bandlimited_stream"],
    )
    ap.add_argument(
        "--fft-precision",
        default="default",
        choices=["highest", "default"],
        help="matmul-FFT stage precision: bf16-input fast mode (the TPU "
        "default — corpus-level loss parity validated, BENCHMARKS.md) vs "
        "fp32-accurate",
    )
    ap.add_argument("--no-train-step", action="store_true", help="skip the train-step metric line")
    args = ap.parse_args()

    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # make JAX_PLATFORMS authoritative (sitecustomize may pre-pin)

    import jax

    # Fail fast (and loudly) if the tunneled chip is unreachable: backend
    # init blocks inside jax.devices(), so a dead tunnel would otherwise
    # hang the driver's bench run forever with no diagnostic.
    import threading

    probe_done = threading.Event()
    threading.Thread(target=lambda: (jax.devices(), probe_done.set()), daemon=True).start()
    if not probe_done.wait(timeout=float(__import__("os").environ.get("BENCH_DEVICE_TIMEOUT_S", "900"))):
        print(
            "bench.py: device backend init did not complete within the timeout "
            "(tunneled TPU unreachable?) — aborting instead of hanging",
            file=sys.stderr,
        )
        sys.exit(2)

    backend = args.backend
    if backend is None:
        # the band-limited projection is the fastest seq-4k path on TPU —
        # the layer ZEROES bins >= num_filters by contract, so the whole op
        # is two (T, k) MXU matmuls around the filter.  Round 4: the
        # STREAMED two-phase Pallas kernel (ops/pallas_bandlimited.py)
        # beats the XLA einsum fusion under the TRUE-HBM harness — 0.80 of
        # the roofline bf16 / 0.52 fp32-accurate vs 0.61 / 0.235
        # (BENCHMARKS.md round 4).  On CPU/GPU the native FFT wins.
        backend = "bandlimited_stream" if jax.default_backend() == "tpu" else "xla"

    from spectral_tpu.ops import matfft

    if args.fft_precision == "default":
        matfft.set_precision(jax.lax.Precision.DEFAULT)

    # --- secondary metric line FIRST: full train step at the flagship recipe
    # (tracks the custom-vjp backward; VERDICT round-1 weakness #5).
    # vs_baseline here = round-1's driver-era 25.2 ms/step (BENCHMARKS.md),
    # i.e. >1.0 means faster than the round-1 training path.  TPU-only: on
    # CPU the flagship step is minutes-slow and meaningless as a metric.
    import jax as _j

    if not args.no_train_step and _j.default_backend() == "tpu":
        # vs_baseline: per-token throughput vs round-1's best measured
        # training path (325K tokens/sec, fp32 matmul backend, BENCHMARKS.md
        # "TPU train-step timing") — >1.0 means the training path got faster.
        try:
            it = 10 if args.quick else 40
            ms, tok_s_train = bench_train_step(iters=it, use_pallas=False)
            trainline = {
                "metric": "train_step_flagship_d512x6_seq1024_b4xaccum8",
                "value": round(ms, 2),
                "unit": "ms/step (32768 tokens)",
                "tokens_per_sec": round(tok_s_train, 1),
                "vs_baseline": round(tok_s_train / 325_000, 3),
            }
            if not args.quick:
                ms_p, tok_p = bench_train_step(iters=it, use_pallas=True)
                trainline["pallas_ms_per_step"] = round(ms_p, 2)
                trainline["pallas_tokens_per_sec"] = round(tok_p, 1)
        except Exception as e:
            trainline = {
                "metric": "train_step_flagship_d512x6_seq1024_b4xaccum8",
                "value": 0.0,
                "unit": "ms/step (32768 tokens)",
                "vs_baseline": 0.0,
                "error": str(e)[:200],
            }
        print(json.dumps(trainline), flush=True)

        # long-sequence train line (VERDICT r2 weak #5): seq 4096 through
        # the fused tail route (ops/pallas_tail.py), accum 2 so the step
        # still covers 32768 tokens — directly comparable to the flagship
        # line.  vs_baseline: same 325K tok/s round-1 training-path anchor.
        try:
            it = 10 if args.quick else 40
            ms4, tok4 = bench_train_step(iters=it, seq_len=4096, accum_steps=2)
            longline = {
                "metric": "train_step_longseq_d512x6_seq4096_b4xaccum2",
                "value": round(ms4, 2),
                "unit": "ms/step (32768 tokens)",
                "tokens_per_sec": round(tok4, 1),
                "vs_baseline": round(tok4 / 325_000, 3),
            }
        except Exception as e:
            longline = {
                "metric": "train_step_longseq_d512x6_seq4096_b4xaccum2",
                "value": 0.0,
                "unit": "ms/step (32768 tokens)",
                "vs_baseline": 0.0,
                "error": str(e)[:200],
            }
        print(json.dumps(longline), flush=True)

    # --- headline metric line LAST (the driver parses the final line).
    # The headline value is measured at fp32 ACCURACY (Precision.HIGHEST) so
    # the roofline fraction is an honest apples-to-apples number.  The
    # roofline fraction itself comes from the TRUE-HBM pool variant
    # (bench_spectral_mix_hbm: >VMEM input AND output pools, so every
    # iteration demonstrably moves the two-pass traffic) — by construction
    # it cannot exceed 1.0 (VERDICT r2 weak #1).  The VMEM-resident marginal
    # numbers (the old methodology) ride along as *_vmem_resident fields.
    iters = 10 if args.quick else 50
    try:
        from spectral_tpu.utils.profiling import HBM_PEAK_GBPS, detect_chip

        peak = HBM_PEAK_GBPS[detect_chip()]

        matfft.set_precision(jax.lax.Precision.HIGHEST)
        tok_s, dt = bench_spectral_mix(seq=args.seq, iters=iters, backend=backend)
        tok_h, dt_h, gbps_h = bench_spectral_mix_hbm(
            seq=args.seq, iters=iters, backend=backend
        )
        result = {
            "metric": "spectral_mix_tokens_per_sec_seq4k",
            "value": round(tok_h, 1),
            "unit": "tokens/sec/chip",
            "vs_baseline": round(tok_h / BASELINE_TOK_S, 3),
            "effective_gbps": round(gbps_h, 1),
            "hbm_roofline_fraction": round(gbps_h / peak, 3),
            "hbm_method": "streamed >VMEM input+output pools (true HBM traffic)",
            "vmem_resident_tokens_per_sec": round(tok_s, 1),
            "precision": "fp32-accurate (HIGHEST)",
        }
        if jax.default_backend() == "tpu" and not args.quick:
            matfft.set_precision(jax.lax.Precision.DEFAULT)
            tok_fh, _, gbps_fh = bench_spectral_mix_hbm(
                seq=args.seq, iters=iters, backend=backend
            )
            tok_f, dt_f = bench_spectral_mix(seq=args.seq, iters=iters, backend=backend)
            result["fast_mode_tokens_per_sec"] = round(tok_fh, 1)
            result["fast_mode_roofline_fraction"] = round(gbps_fh / peak, 3)
            result["fast_mode_vmem_resident_tokens_per_sec"] = round(tok_f, 1)
            if backend == "bandlimited_stream":
                # round-5 "mid" mode: 2-dot split-table scheme — an
                # intermediate accuracy class at near-fast-mode rate
                # (chip error probe: experiments/profile_stream_mix)
                tok_mh, _, gbps_mh = bench_spectral_mix_hbm(
                    seq=args.seq, iters=iters, backend=backend,
                    compute_dtype="mid")
                result["mid_mode_tokens_per_sec"] = round(tok_mh, 1)
                result["mid_mode_roofline_fraction"] = round(gbps_mh / peak, 3)
    except Exception as e:  # emit a parseable failure record
        result = {
            "metric": "spectral_mix_tokens_per_sec_seq4k",
            "value": 0.0,
            "unit": "tokens/sec/chip",
            "vs_baseline": 0.0,
            "error": str(e)[:200],
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
