"""O(K)-per-token FIR streaming generation from a backbone checkpoint.

Mirror of reference scripts/stream_generate_fast.py (the freq gate is
intentionally dropped in FIR form — see spectral_tpu/streaming/fir.py).
"""

from __future__ import annotations

import argparse

from scripts._common import apply_platform_env


def main(argv=None) -> None:
    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="fixed_spectral_ckpt.msgpack")
    ap.add_argument("--prompt", nargs="+", default=["Once", "upon", "a", "time"])
    ap.add_argument("--max-new", type=int, default=400)
    ap.add_argument("--temperature", type=float, default=0.9)
    ap.add_argument("--top-p", type=float, default=0.92)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--rep", type=float, default=1.25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--on-device", action="store_true",
                    help="run the whole sampling loop in one jitted lax.scan")
    args = ap.parse_args(argv)

    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.streaming.fir import FIRStream
    from spectral_tpu.train.ckpt import load_checkpoint
    from spectral_tpu.train.sampling import safe_console

    ck = load_checkpoint(args.ckpt)
    cfg = TrainConfig.from_dict(ck.get("cfg", {}))
    params = ck["params"]
    if "backbone" in params:  # ChunkLM-style checkpoint
        params = params["backbone"]

    stream = FIRStream(params, cfg)
    prompt = " ".join(args.prompt)
    if args.on_device:
        from spectral_tpu.streaming.fir import fir_generate_on_device

        gen_cfg = cfg.replace(
            temperature=args.temperature, top_p=args.top_p, top_k=args.top_k,
            repetition_penalty=args.rep,
        )
        stream.cfg = gen_cfg
        out = fir_generate_on_device(stream, prompt, max_new=args.max_new, seed=args.seed)
    else:
        out = stream.generate(
            prompt,
            max_new=args.max_new,
            temperature=args.temperature,
            top_p=args.top_p,
            top_k=args.top_k,
            repetition_penalty=args.rep,
            seed=args.seed,
        )
    print(safe_console(out))


if __name__ == "__main__":
    main()
