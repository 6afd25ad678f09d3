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
    exact16 = OverlapSaveBatch(params, cfg, buf_dtype="bfloat16")

    def prompts_for(B):
        return [f"{PROMPTS[i % len(PROMPTS)]} # stream {i}\n" for i in range(B)]

    # Two generation lengths per path: the short run carries the same
    # prefill + dispatch overhead, so (dt_long - dt_short)/(long - short)
    # is the steady-state decode cost and the remainder is attributed
    # prefill+RTT (profile_decode showed end-to-end bytes/s at short
    # generations is dominated by it).
    short = max(16, max_new // 8)
    print(f"\n{'B':>4} {'path':<14} {'bytes/s':>9} {'steady':>9} "
          f"{'ms/tok':>7} {'prefill_ms':>10}", flush=True)
    rows = []
    sample_text = None
    for B in args.batches:
        prompts = prompts_for(B)
        for name, fn in (
            ("fir", lambda s, m: fir_generate_batch(fir, prompts, max_new=m, seed=s)),
            ("exact-osave", lambda s, m: overlap_save_generate_batch(exact, prompts, max_new=m, seed=s)),
            ("exact-bf16", lambda s, m: overlap_save_generate_batch(exact16, prompts, max_new=m, seed=s)),
        ):
            fn(0, short), fn(0, max_new)  # compile/warm both lengths
            # min of 3 with a DISTINCT seed per timed call: identical
            # (executable, inputs) dispatches can be value-cached on the
            # tunneled chip, and single dispatches carry >10 ms RTT jitter
            outs, dts, dt = None, float("inf"), float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                fn(1 + 2 * rep, short)
                dts = min(dts, time.perf_counter() - t0)
                t0 = time.perf_counter()
                o = fn(2 + 2 * rep, max_new)
                d = time.perf_counter() - t0
                if d < dt:
                    dt, outs = d, o
            marg = (dt - dts) / (max_new - short)
            bps = B * max_new / dt
            # the marginal is only meaningful when the decode delta clears
            # the jitter floor; otherwise report end-to-end only
            ok = dt - dts > 0.02
            steady = B / marg if ok else float("nan")
            fixed = max(dts - short * marg, 0.0) if ok else float("nan")
            rows.append((B, name, bps, steady, marg * 1e3 if ok else float("nan"),
                         fixed * 1e3))
            print(f"{B:>4} {name:<14} {bps:>9.0f} {steady:>9.0f} "
                  f"{marg*1e3:>7.3f} {fixed*1e3:>10.1f}", flush=True)
            if name == "exact-osave" and sample_text is None:
                sample_text = outs[0]

    if sample_text is not None:
        print("\n--- exact decoder sample (stream 0) ---", flush=True)
        print(safe_console(sample_text[:600]), flush=True)

    # machine-readable summary for BENCHMARKS.md
    import json

    def _r(x, nd):
        return None if x != x else round(x, nd)  # NaN -> null

    print("\n" + json.dumps({
        "rows": [{"B": b, "path": n, "bytes_per_sec": round(v, 1),
                  "steady_bytes_per_sec": _r(sv, 1),
                  "ms_per_token_marginal": _r(m, 3),
                  "prefill_fixed_ms": _r(f, 1)}
                 for b, n, v, sv, m, f in rows],
        "max_new": max_new, "short": short,
    }), flush=True)


if __name__ == "__main__":
    main()
