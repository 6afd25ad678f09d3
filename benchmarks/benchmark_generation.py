"""Decode-path benchmark: tokens/sec across the generation strategies.

* full-recompute host loop (reference generate, O(T) fwd/byte)
* FIR streaming host loop (O(K)/byte, per-token host round-trip)
* FIR streaming ON-DEVICE (single lax.scan call — the serving path)
* BATCHED on-device serving (N concurrent streams, one scan — per-token
  compute is tiny, so fleet throughput scales ~linearly with B)

Run: python benchmarks/benchmark_generation.py [--quick] [--batch 32]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=32, help="batched-serving fleet size")
    args = ap.parse_args()

    import jax
    import numpy as np

    from spectral_tpu.models.backbone import FixedSpectralLM
    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.streaming.fir import FIRStream, fir_generate_on_device
    from spectral_tpu.train.sampling import generate

    if args.quick:
        cfg = TrainConfig(d_model=64, n_layers=2, seq_len=128, kernel_len=16, jpeg_transition=8, dropout=0.0)
        max_new = 64
    else:
        cfg = TrainConfig(d_model=256, n_layers=4, seq_len=512, kernel_len=64, jpeg_transition=32, dropout=0.0)
        max_new = 256
    print(f"device: {jax.devices()[0]}  model: d{cfg.d_model}x{cfg.n_layers} seq{cfg.seq_len} K{cfg.kernel_len}")

    model = FixedSpectralLM(cfg)
    import jax.numpy as jnp

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.seq_len), jnp.int32))["params"]
    prompt = "Once upon a time there was a"

    apply_gen = lambda p, x, c, length: model.apply({"params": p}, x, cutoff=c, deterministic=True, length=length)

    # warm each path once (compiles), then time with a DIFFERENT seed —
    # identical (executable, inputs) dispatches can be served from a value
    # cache on a tunneled chip (CLAUDE.md benchmarking rules)
    def timed(label, fn):
        fn(0)  # warm/compile
        t0 = time.perf_counter()
        fn(1)
        dt = time.perf_counter() - t0
        print(f"{label:<28} {max_new/dt:10.1f} bytes/sec   ({dt*1e3/max_new:6.2f} ms/byte)")
        return dt

    t_full = timed("full recompute (host loop)",
                   lambda s: generate(apply_gen, params, prompt, cfg, max_new=max_new, seed=s))

    stream = FIRStream(params, cfg)
    t_fir = timed("FIR streaming (host loop)", lambda s: stream.generate(prompt, max_new=max_new, seed=s))

    t_dev = timed("FIR streaming (on-device)",
                  lambda s: fir_generate_on_device(stream, prompt, max_new=max_new, seed=s))

    from spectral_tpu.streaming.fir import fir_generate_batch

    B = args.batch
    prompts = [f"{prompt} ({i})" for i in range(B)]

    def batched(seed):
        fir_generate_batch(stream, prompts, max_new=max_new, seed=seed)

    batched(0)  # compile
    # timed call uses a DIFFERENT seed: identical (executable, inputs)
    # dispatches can be served from a value cache on a tunneled chip
    # (CLAUDE.md benchmarking rules)
    t0 = time.perf_counter()
    batched(1)
    t_b = time.perf_counter() - t0
    print(f"{'BATCHED serving (B=%d)' % B:<28} {B*max_new/t_b:10.1f} bytes/sec   "
          f"({t_b*1e3/max_new:6.2f} ms/step for {B} streams)")

    print(f"\non-device speedup: {t_full/t_dev:.1f}x vs full recompute, {t_fir/t_dev:.1f}x vs host-loop FIR")
    print(f"batched serving: {B*t_dev/t_b:.1f}x the single-stream on-device throughput")


if __name__ == "__main__":
    main()
