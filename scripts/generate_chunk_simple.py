"""Chunk generation with architecture auto-detection from checkpoint keys.

Mirror of reference scripts/generate_chunk_simple.py: sniffs the param tree
(ema / alpha_freq / phase_weights / phase_head / token_head) to rebuild the
right model class, then runs the naive chunked loop.
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
    arch = detect_architecture(ck["params"])
    print("[auto-detect]", ", ".join(k for k, v in arch.items() if v) or "standard")

    cfg = TrainConfig.from_dict(ck.get("cfg", {}))
    cfg = cfg.replace(bicameral=arch["bicameral"], frequency_native=arch["frequency_native"])
    chunk = int(ck.get("chunk", 16))
    if arch["phase_clock"]:
        head = "phase_clock"
    elif arch["dual_head"]:
        head = "dual"
    elif arch["segmentation"]:
        head = "segmentation"
    else:
        head = "chunk"
    model = build_chunk_model(cfg, head, chunk, use_ema=arch["use_ema"])
    params = ck["params"]

    kwargs = {}
    if head in ("phase_clock", "dual", "segmentation"):
        key = {"phase_clock": "return_phase_vectors", "dual": "return_token_logits",
               "segmentation": "return_seg_logits"}[head]
        kwargs[key] = False

    @jax.jit
    def chunk_logits(p, x):
        return model.apply({"params": p}, x, deterministic=True, **kwargs)

    ctx = list(" ".join(args.prompt).encode("utf-8", errors="ignore")) or [32]
    window = ([32] * max(0, cfg.seq_len - len(ctx)) + ctx)[-cfg.seq_len :]
    generated = window[:]
    rng = np.random.default_rng(args.seed)

    for _ in range(args.chunks):
        x = jnp.asarray(np.asarray([generated[-cfg.seq_len :]], np.int32))
        logits = np.asarray(chunk_logits(params, x), np.float64)[0]
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
            new_bytes.append(int(rng.choice(256, p=p)))
        print(safe_console(bytes(new_bytes).decode("utf-8", errors="replace")), end="", flush=True)
        generated.extend(new_bytes)
    print()


if __name__ == "__main__":
    main()
