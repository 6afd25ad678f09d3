"""Exact overlap-save chunked generation (the recommended streaming path).

Mirror of reference scripts/generate_chunked_overlap_save.py: chunk-head
"piston engine" decode with exact per-chunk FFT state updates and the
bytes-as-state quantization barrier.
"""

from __future__ import annotations

import argparse

from scripts._common import apply_platform_env


def main(argv=None) -> None:
    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="chunklm_ckpt.msgpack")
    ap.add_argument("--prompt", nargs="+", default=["Once", "upon", "a", "time"])
    ap.add_argument("--chunks", type=int, default=30)
    ap.add_argument("--temperature", type=float, default=0.9)
    ap.add_argument("--top-p", type=float, default=0.9)
    ap.add_argument("--rep", type=float, default=1.15)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.streaming.overlap_save import OverlapSaveStream
    from spectral_tpu.train.ckpt import load_checkpoint
    from spectral_tpu.train.sampling import safe_console

    ck = load_checkpoint(args.ckpt)
    cfg = TrainConfig.from_dict(ck.get("cfg", {}))
    chunk = int(ck.get("chunk", 16))
    params = ck["params"]
    backbone = params.get("backbone", params)
    head = params.get("head")
    if head is None:
        raise SystemExit("checkpoint has no chunk head — train with scripts.train_chunk_head")

    stream = OverlapSaveStream(backbone, cfg, head_params=head, chunk=chunk)
    out = stream.generate_chunks(
        " ".join(args.prompt),
        n_chunks=args.chunks,
        temperature=args.temperature,
        top_p=args.top_p,
        repetition_penalty=args.rep,
        seed=args.seed,
        on_chunk=lambda b: print(safe_console(b.decode("utf-8", errors="replace")), end="", flush=True),
    )
    print()


if __name__ == "__main__":
    main()
