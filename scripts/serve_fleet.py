"""Fleet serving CLI: N concurrent generation streams in one device program.

Two paths (spectral_tpu/streaming):
  --mode exact  (default) — batched overlap-save, FULL gate stack: the
                reference's README-recommended decoder math
                (generate_chunked_overlap_save.py:78-206), batched —
                quality matches eval_ckpt's sampler.
  --mode fir    — batched FIR: O(K)/token approximation (drops the per-bin
                frequency gate; reference stream_generate_fast.py:93-96).
  --mode engine — continuous batching over the exact decoder: --slots device
                lanes drain the prompt queue, retiring/admitting between
                --decode-chunk-token scans (streaming/engine.py).  Use when
                requests outnumber lanes or lengths vary.

Usage:
    python -m scripts.serve_fleet --ckpt checkpoints/code_d512x6.msgpack \
        --prompt "def main():" --streams 8 --max-new 256 [--mode fir]
    python -m scripts.serve_fleet --prompts-file prompts.txt   # one per line
    # prompts-file lines may carry a per-request length: "64<TAB>prompt..."
    # (heterogeneous lengths; --mode engine schedules around them, the
    # fixed-fleet modes pad everything to the longest)
"""

from __future__ import annotations

import argparse
import time

from scripts._common import apply_platform_env


def main(argv=None) -> None:
    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="fixed_spectral_ckpt.msgpack",
                    help="checkpoint to serve.  NOTE: when a .q8.msgpack "
                         "sibling of this path exists, serving substitutes "
                         "it by default (q8 is the serving default at "
                         "measured fp32 parity); pass --fp32 to serve the "
                         "named file verbatim")
    ap.add_argument("--fp32", action="store_true",
                    help="force the fp32 artifact: serving DEFAULTS to a "
                         ".q8.msgpack sibling of --ckpt when one exists "
                         "(log8 quantization is eval-neutral and 11.9x "
                         "smaller — BENCHMARKS.md; reference quantizer: "
                         "fft_tensor/zero_materialize.py:455-568)")
    ap.add_argument("--prompt", default="Once upon a time")
    ap.add_argument("--prompts-file", default=None,
                    help="file with one prompt per line (overrides --prompt/--streams)")
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--mode", choices=["exact", "fir", "engine"], default="exact")
    ap.add_argument("--slots", type=int, default=8, help="engine mode: device lanes")
    ap.add_argument("--decode-chunk", type=int, default=32,
                    help="engine mode: tokens per device scan between host syncs")
    ap.add_argument("--policy", choices=["fifo", "priority", "sjf", "edf"],
                    default="fifo",
                    help="engine mode: admission order (sjf = shortest "
                         "max_new first; outputs are policy-invariant)")
    ap.add_argument("--buf-dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="exact mode: bf16 window buffers — measured 1.45x "
                         "decode at B=32 post per-lane fix (BENCHMARKS.md "
                         "round-4 amendment); float32 default is the "
                         "configuration the bit-exact admission-invariance "
                         "guarantee is gated under")
    ap.add_argument("--prefill-exact", action="store_true",
                    help="engine mode: per-request M=1 admission prefills — "
                         "BIT-exact busy==solo end-to-end (the batched "
                         "default is exact-in-real-arithmetic at admission "
                         "and bit-exact in decode; a ~1e-6 admission-logit "
                         "reorder can flip a knife-edge sampled byte on "
                         "very long decodes)")
    ap.add_argument("--temperature", type=float, default=0.9)
    ap.add_argument("--top-p", type=float, default=0.92)
    ap.add_argument("--rep", type=float, default=1.25)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.train.ckpt import load_checkpoint
    from spectral_tpu.train.sampling import safe_console

    import os

    ckpt_path = args.ckpt
    if not args.fp32 and not ckpt_path.endswith(".q8.msgpack"):
        q8 = os.path.splitext(ckpt_path)[0] + ".q8.msgpack"
        if os.path.exists(q8):
            print(f"[serve] q8 artifact found — serving {q8} "
                  f"(pass --fp32 for the fp32 original)", flush=True)
            ckpt_path = q8

    ck = load_checkpoint(ckpt_path)
    cfg = TrainConfig.from_dict(ck.get("cfg", {}))
    cfg = cfg.replace(temperature=args.temperature, top_p=args.top_p,
                      repetition_penalty=args.rep, dropout=0.0)
    params = ck["params"]
    if "backbone" in params:  # ChunkLM-style checkpoint
        params = params["backbone"]

    if args.prompts_file:
        # one request per line; an optional "N<TAB>" prefix overrides
        # --max-new for that request (heterogeneous lengths are what
        # --mode engine schedules around; the fixed-fleet modes pad to
        # the longest)
        prompts, max_news = [], []
        with open(args.prompts_file) as f:
            for ln in f:
                if not ln.strip():
                    continue
                head, tab, rest = ln.rstrip("\n").partition("\t")
                if tab and head.isdigit():
                    prompts.append(rest)
                    max_news.append(int(head))
                else:
                    prompts.append(ln.rstrip("\n"))
                    max_news.append(args.max_new)
    else:
        prompts = [f"{args.prompt}" for _ in range(args.streams)]
        max_news = [args.max_new] * args.streams

    pad_to = max(max_news)
    t0 = time.perf_counter()
    eng = None
    if args.mode == "exact":
        from spectral_tpu.streaming.overlap_save_batch import (
            OverlapSaveBatch,
            overlap_save_generate_batch,
        )

        dec = OverlapSaveBatch(params, cfg, buf_dtype=args.buf_dtype)
        outs = overlap_save_generate_batch(dec, prompts, max_new=pad_to,
                                           seed=args.seed)
    elif args.mode == "engine":
        from spectral_tpu.streaming.engine import Request, ServingEngine

        eng = ServingEngine(params, cfg, slots=args.slots,
                            decode_chunk=args.decode_chunk,
                            buf_dtype=args.buf_dtype, policy=args.policy,
                            prefill_exact=args.prefill_exact)
        outs = eng.run([Request(prompt=p, max_new=m, seed=args.seed + i)
                        for i, (p, m) in enumerate(zip(prompts, max_news))])
    else:
        from spectral_tpu.streaming.fir import FIRStream, fir_generate_batch

        stream = FIRStream(params, cfg)
        outs = fir_generate_batch(stream, prompts, max_new=pad_to,
                                  seed=args.seed)
    dt = time.perf_counter() - t0

    for i, o in enumerate(outs):
        print(f"\n=== stream {i} ===\n{safe_console(o)}")
    n = sum(max_news) if args.mode == "engine" else len(prompts) * pad_to
    print(f"\n[{args.mode}] {len(prompts)} streams, {n} bytes in "
          f"{dt:.2f}s (incl. compile) = {n/dt:.0f} bytes/s", flush=True)
    if eng is not None:
        turn = eng.turnaround()
        print(f"[engine] policy={args.policy} scans={eng.stats['chunks']} "
              f"decoded={eng.stats['decoded_tokens']} "
              f"prefills={eng.stats.get('prefill_calls', 0)} | turnaround "
              f"mean {turn['mean']:.0f} / max {turn['max']} work-tokens",
              flush=True)


if __name__ == "__main__":
    main()
