"""Fleet serving benchmark on a TRAINED artifact: exact overlap-save vs FIR.

VERDICT r2 asks (missing #3 / next #4 + weak #4):
  * bytes/s of the batched EXACT decoder (streaming/overlap_save_batch.py —
    full gate stack, the reference's README-recommended math) vs the
    approximate FIR fleet at B = 8 / 32 / 128 on the flagship checkpoint;
  * a generation sample from the exact decoder (quality should track
    eval_ckpt's sampler, which uses the same full-forward math);
  * re-measurement of the non-monotone FIR fleet curve (17.4K -> 13.7K ->
    22.4K bytes/s at B=8/32/128 in round 2).

Run (chip, one job at a time, background):
    python benchmarks/benchmark_serving_exact.py \
        --ckpt checkpoints/code_d512x6.msgpack [--max-new 256] [--quick]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

PROMPTS = [
    "def binary_search(arr, target):",
    "class Stack:\n    def __init__(self):",
    "# compute the factorial of n\n",
    "import numpy as np\n\n",
    "for i in range(10):\n",
    "def quicksort(arr):\n",
    "with open('data.txt') as f:\n",
    "result = [x * 2 for x in",
]


def main() -> None:
    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/code_d512x6.msgpack")
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batches", type=int, nargs="*", default=[8, 32, 128])
    args = ap.parse_args()

    import jax

    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.streaming.fir import FIRStream, fir_generate_batch
    from spectral_tpu.streaming.overlap_save_batch import (
        OverlapSaveBatch,
        overlap_save_generate_batch,
    )
    from spectral_tpu.train.ckpt import load_checkpoint
    from spectral_tpu.train.sampling import safe_console

    ckpt = load_checkpoint(args.ckpt)
    cfg = TrainConfig(**{**ckpt["cfg"], "dropout": 0.0})
    params = ckpt["params"]
    max_new = 64 if args.quick else args.max_new
    print(f"device: {jax.devices()[0]}", flush=True)
    print(f"ckpt: {args.ckpt}  d{cfg.d_model}x{cfg.n_layers} seq{cfg.seq_len} "
          f"K{cfg.kernel_len}  max_new={max_new}", flush=True)

    fir = FIRStream(params, cfg)
    exact = OverlapSaveBatch(params, cfg)

    def prompts_for(B):
        return [f"{PROMPTS[i % len(PROMPTS)]} # stream {i}\n" for i in range(B)]

    print(f"\n{'B':>4} {'path':<14} {'bytes/s':>10} {'ms/token':>9}", flush=True)
    rows = []
    sample_text = None
    for B in args.batches:
        prompts = prompts_for(B)
        for name, fn in (
            ("fir", lambda s: fir_generate_batch(fir, prompts, max_new=max_new, seed=s)),
            ("exact-osave", lambda s: overlap_save_generate_batch(exact, prompts, max_new=max_new, seed=s)),
        ):
            fn(0)  # compile/warm
            # different seed for the timed call: identical (executable,
            # inputs) dispatches can be value-cached on the tunneled chip
            t0 = time.perf_counter()
            outs = fn(1)
            dt = time.perf_counter() - t0
            bps = B * max_new / dt
            rows.append((B, name, bps, dt * 1e3 / max_new))
            print(f"{B:>4} {name:<14} {bps:>10.1f} {dt*1e3/max_new:>9.2f}", flush=True)
            if name == "exact-osave" and sample_text is None:
                sample_text = outs[0]

    if sample_text is not None:
        print("\n--- exact decoder sample (stream 0) ---", flush=True)
        print(safe_console(sample_text[:600]), flush=True)

    # machine-readable summary for BENCHMARKS.md
    import json

    print("\n" + json.dumps({
        "rows": [{"B": b, "path": n, "bytes_per_sec": round(v, 1),
                  "ms_per_token": round(m, 3)} for b, n, v, m in rows],
        "max_new": max_new,
    }), flush=True)


if __name__ == "__main__":
    main()
