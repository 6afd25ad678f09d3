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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--backend", default=None, choices=["xla", "matmul", "pallas"])
    ap.add_argument(
        "--fft-precision",
        default="highest",
        choices=["highest", "default"],
        help="matmul-FFT stage precision: fp32-accurate vs bf16-input fast mode",
    )
    args = ap.parse_args()

    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # make JAX_PLATFORMS authoritative (sitecustomize may pre-pin)

    backend = args.backend
    if backend is None:
        # MXU matmul FFT measured 1.7x XLA's VPU FFT on TPU (BENCHMARKS.md);
        # on CPU/GPU the native FFT wins.
        import jax

        backend = "matmul" if jax.default_backend() == "tpu" else "xla"

    if args.fft_precision == "default":
        import jax as _jax

        from spectral_tpu.ops import matfft

        matfft.set_precision(_jax.lax.Precision.DEFAULT)

    iters = 10 if args.quick else 50
    try:
        tok_s, dt = bench_spectral_mix(seq=args.seq, iters=iters, backend=backend)
        # roofline accounting (BASELINE.json: "fused rFFT GB/s vs HBM roofline"):
        # ideal traffic = fp32 input read + output write of (8, seq, 256)
        from spectral_tpu.utils.profiling import HBM_PEAK_GBPS, detect_chip

        bytes_moved = 2 * 8 * args.seq * 256 * 4
        gbps = bytes_moved / dt / 1e9
        result = {
            "metric": "spectral_mix_tokens_per_sec_seq4k",
            "value": round(tok_s, 1),
            "unit": "tokens/sec/chip",
            "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
            "effective_gbps": round(gbps, 1),
            "hbm_roofline_fraction": round(gbps / HBM_PEAK_GBPS[detect_chip()], 3),
        }
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
