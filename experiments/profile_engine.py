"""Chip profile of the continuous-batching ServingEngine on a heterogeneous
request mix — the workload the engine exists for.

The static fleet (overlap_save_generate_batch) serves N streams that start
and stop together: with requests of mixed lengths it must pad every stream
to the longest, and with more requests than lanes it drains sequential
cohorts.  The engine retires a finished lane and admits the next request
between decode chunks, so short requests stop paying for long co-tenants.
The reference has no counterpart (its recommended decoder is single-stream,
/root/reference/scripts/generate_chunked_overlap_save.py:78-206).

Workload: 32 requests over 8 lanes, lengths 256/128/64/32 bytes (8 each),
submitted LONGEST-FIRST — the convoy-adversarial order for FIFO.  All
lengths are multiples of decode_chunk=32 so the engine stays in its single
length-32 decode program (no extra compile variants on the tunneled chip).

Measured (wall-clock, min of --reps with distinct seeds):
  * static pad-to-max cohorts (the only pre-engine way to serve this);
  * engine fifo / sjf: useful bytes/s, device scans issued, and the
    turnaround (submit->done, token work clock) distribution per policy.

Run (chip, ONE job at a time, background):
    python experiments/profile_engine.py [--reps 2] [--quick]
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--quick", action="store_true",
                    help="halve every request length (compile-check shape)")
    args = ap.parse_args()

    import jax

    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.streaming.engine import Request, ServingEngine
    from spectral_tpu.streaming.overlap_save_batch import (
        OverlapSaveBatch,
        overlap_save_generate_batch,
    )
    from spectral_tpu.train.ckpt import load_checkpoint

    ckpt = load_checkpoint(args.ckpt)
    cfg = TrainConfig(**{**ckpt["cfg"], "dropout": 0.0})
    params = ckpt["params"]
    print(f"device: {jax.devices()[0]}", flush=True)

    scale = 2 if args.quick else 1
    # longest-first: the FIFO convoy order
    lengths = ([256 // scale] * 8 + [128 // scale] * 8
               + [64 // scale] * 8 + [32 // scale] * 8)
    reqs = [Request(prompt=f"{PROMPTS[i % len(PROMPTS)]} # req {i}\n",
                    max_new=n, seed=i) for i, n in enumerate(lengths)]
    useful = sum(lengths)
    print(f"workload: {len(reqs)} requests, lengths "
          f"{sorted(set(lengths), reverse=True)} x8 each, "
          f"{useful} useful bytes, slots={args.slots}", flush=True)

    results = {}

    # -- static pad-to-max cohorts (pre-engine baseline) ---------------------
    dec = OverlapSaveBatch(params, cfg)
    pad_to = max(lengths)

    def run_static(seed):
        outs = []
        for c in range(0, len(reqs), args.slots):
            cohort = reqs[c:c + args.slots]
            outs += overlap_save_generate_batch(
                dec, [r.prompt for r in cohort], max_new=pad_to, seed=seed + c)
        return outs

    run_static(0)  # compile/warm
    dt = min(_timed(run_static, 1 + i)[1] for i in range(args.reps))
    padded = len(reqs) * pad_to
    results["static-cohorts"] = {
        "wall_s": round(dt, 3),
        "useful_bytes_per_s": round(useful / dt, 1),
        "decoded_bytes": padded,
        "decode_efficiency": round(useful / padded, 3),
    }
    print(f"static pad-to-{pad_to} cohorts: {dt:.2f}s = "
          f"{useful/dt:.0f} useful bytes/s "
          f"({padded} decoded, {useful/padded:.0%} useful)", flush=True)

    # -- engine, per policy ---------------------------------------------------
    for policy in ("fifo", "sjf"):
        eng = ServingEngine(params, cfg, slots=args.slots, decode_chunk=32,
                            policy=policy)
        eng.run(list(reqs))  # compile/warm (covers all bucket/prefill shapes)
        best = None
        for i in range(args.reps):
            seeded = [Request(prompt=r.prompt, max_new=r.max_new,
                              seed=r.seed + 1000 * (i + 1)) for r in reqs]
            _, d = _timed(eng.run, seeded)
            if best is None or d < best[0]:
                best = (d, dict(eng.stats), eng.turnaround())
        dt, stats, turn = best
        results[f"engine-{policy}"] = {
            "wall_s": round(dt, 3),
            "useful_bytes_per_s": round(useful / dt, 1),
            "decoded_bytes": stats["decoded_tokens"],
            "decode_efficiency": round(useful / stats["decoded_tokens"], 3),
            "chunks": stats["chunks"],
            "prefill_calls": stats.get("prefill_calls", 0),
            "turnaround_mean_tokens": round(turn["mean"], 2),
            "turnaround_max_tokens": turn["max"],
        }
        print(f"engine {policy:>4}: {dt:.2f}s = {useful/dt:.0f} useful bytes/s  "
              f"({stats['chunks']} scans, {stats['decoded_tokens']} decoded, "
              f"{useful/stats['decoded_tokens']:.0%} useful; turnaround "
              f"mean {turn['mean']:.0f} / max {turn['max']} work-tokens)", flush=True)

    print("\n" + json.dumps(results), flush=True)


def _timed(fn, *a):
    t0 = time.perf_counter()
    out = fn(*a)
    return out, time.perf_counter() - t0


if __name__ == "__main__":
    main()
