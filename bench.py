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


def bench_spectral_mix(seq: int = 4096, batch: int = 8, dim: int = 256, iters: int = 50, warmup: int = 5):
    import jax
    import jax.numpy as jnp

    from spectral_tpu.layers.spectral_layers import SpectralMixingLayer

    layer = SpectralMixingLayer(embed_dim=dim)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, seq, dim), jnp.float32)
    params = layer.init(jax.random.PRNGKey(1), x)

    # Chain iterations: each input is the previous output (scaled to stay
    # finite).  Independent identical dispatches can be deduplicated by the
    # runtime (observed on the tunneled TPU backend: 50 same-input calls
    # reported 22 us/iter — below the 82 us HBM-roofline floor for the
    # 67 MB of traffic, i.e. not a real execution per call).  A data
    # dependency between iterations makes every execution unavoidable.
    fwd = jax.jit(lambda p, x: layer.apply(p, x) * 0.1)
    for _ in range(warmup):
        x = fwd(params, x)
    x = jax.block_until_ready(x)

    t0 = time.perf_counter()
    for _ in range(iters):
        x = fwd(params, x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters

    tokens_per_sec = batch * seq / dt
    return tokens_per_sec, dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--seq", type=int, default=4096)
    args = ap.parse_args()

    iters = 10 if args.quick else 50
    try:
        tok_s, dt = bench_spectral_mix(seq=args.seq, iters=iters)
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
