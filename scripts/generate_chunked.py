"""Naive chunked generation: full backbone forward per chunk.

Mirror of reference scripts/generate_chunked.py — the simple "piston engine":
every chunk recomputes the backbone over the current window, samples `chunk`
bytes from the chunk head, appends them (explicit quantization barrier:
integers in 0..255), repeats.
"""

from __future__ import annotations

import argparse

import numpy as np

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

    import jax
    import jax.numpy as jnp

    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.train.chunk_trainer import build_chunk_model
    from spectral_tpu.train.ckpt import detect_architecture, load_checkpoint
    from spectral_tpu.train.sampling import apply_top_p, safe_console

    ck = load_checkpoint(args.ckpt)
    cfg = TrainConfig.from_dict(ck.get("cfg", {}))
    chunk = int(ck.get("chunk", 16))
    head = ck.get("head", "chunk")
    arch = detect_architecture(ck["params"])
    model = build_chunk_model(cfg, head, chunk, use_ema=arch.get("use_ema", False))
    params = ck["params"]

    @jax.jit
    def chunk_logits(p, x):
        out = model.apply({"params": p}, x, deterministic=True)
        return out[0] if isinstance(out, tuple) else out

    ctx = list(" ".join(args.prompt).encode("utf-8", errors="ignore")) or [32]
    if len(ctx) < cfg.seq_len:
        window = [32] * (cfg.seq_len - len(ctx)) + ctx
    else:
        window = ctx[-cfg.seq_len :]
    generated = window[:]
    rng = np.random.default_rng(args.seed)

    for _ in range(args.chunks):
        x = jnp.asarray(np.asarray([generated[-cfg.seq_len :]], np.int32))
        logits = np.asarray(chunk_logits(params, x), np.float64)[0]  # [chunk, 256]
        new_bytes = []
        for i in range(chunk):
            l = logits[i].copy()
            for tok in set(generated[-256:]):
                l[tok] = l[tok] / args.rep
            l = l / args.temperature
            l = apply_top_p(l, args.top_p)
            z = l - l.max()
            p = np.exp(z)
            p /= p.sum()
            b = int(rng.choice(256, p=p))
            new_bytes.append(max(0, min(255, b)))  # quantization barrier
        print(safe_console(bytes(new_bytes).decode("utf-8", errors="replace")), end="", flush=True)
        generated.extend(new_bytes)
    print()


if __name__ == "__main__":
    main()
