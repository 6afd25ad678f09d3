"""Held-out evaluation for chunk-family checkpoints (any head).

The AR backbone has `scripts.eval_ckpt`; this is its counterpart for the
chunk heads (ChunkLM / phase-clock / dual / segmentation, reference
fft_lm/{chunk_head,phase_clock,dual_head,segmentation_head}.py).  Sniffs
the architecture from the param tree, then reports per-split:

* chunk char CE (nats/byte — the head's main objective),
* the head's auxiliary metric (phase-vector MSE, boundary BCE +
  accuracy, token CE) when one exists,
* per-position CE across the chunk (the non-autoregressive information
  profile).

Windows are sampled deterministically (seeded) so runs are reproducible.
"""

from __future__ import annotations

import argparse

import numpy as np

from scripts._common import apply_platform_env


def main(argv=None) -> None:
    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", nargs="+", required=True, help="held-out split file(s)")
    ap.add_argument("--windows", type=int, default=200, help="windows per split")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.models.dual_head import HashWordTokenizer, compute_dual_loss, get_token_ids_fast
    from spectral_tpu.models.phase_clock import compute_phase_clock_loss, generate_phase_targets
    from spectral_tpu.models.segmentation_head import compute_segmented_loss, get_word_boundaries
    from spectral_tpu.train.chunk_trainer import build_chunk_model
    from spectral_tpu.train.ckpt import detect_architecture, load_checkpoint
    from spectral_tpu.train.data import load_corpus_as_u8, sample_chunk_batch
    from spectral_tpu.train.evaluate import cross_entropy

    ck = load_checkpoint(args.ckpt)
    arch = detect_architecture(ck["params"])
    head = (
        "phase_clock" if arch["phase_clock"]
        else "dual" if arch["dual_head"]
        else "segmentation" if arch["segmentation"]
        else "chunk"
    )
    print("[auto-detect]", head, "+", ", ".join(k for k, v in arch.items() if v) or "standard")

    cfg = TrainConfig.from_dict(ck.get("cfg", {}))
    cfg = cfg.replace(bicameral=arch["bicameral"], frequency_native=arch["frequency_native"])
    chunk = int(ck.get("chunk", 16))
    model = build_chunk_model(cfg, head, chunk, use_ema=arch["use_ema"])
    params = ck["params"]
    tokenizer = HashWordTokenizer(50257) if head == "dual" else None

    @jax.jit
    def eval_batch(p, bx, by, aux):
        if head == "chunk":
            logits = model.apply({"params": p}, bx, deterministic=True)
            per_pos = -jax.nn.log_softmax(logits)[
                jnp.arange(by.shape[0])[:, None], jnp.arange(by.shape[1])[None, :], by
            ]
            return cross_entropy(logits, by), jnp.float32(0.0), per_pos.mean(axis=0)
        if head == "phase_clock":
            logits, phase = model.apply({"params": p}, bx, deterministic=True)
            _, cl, al = compute_phase_clock_loss(logits, phase, by, aux)
        elif head == "segmentation":
            logits, seg = model.apply({"params": p}, bx, deterministic=True)
            _, cl, al = compute_segmented_loss(logits, seg, by, aux)
        else:  # dual
            logits, tok = model.apply({"params": p}, bx, deterministic=True)
            _, cl, al = compute_dual_loss(logits, tok, by, aux)
        per_pos = -jax.nn.log_softmax(logits)[
            jnp.arange(by.shape[0])[:, None], jnp.arange(by.shape[1])[None, :], by
        ]
        return cl, al, per_pos.mean(axis=0)

    for path in args.data:
        corpus = load_corpus_as_u8(path, sanitize=cfg.ascii_only)
        rng = np.random.default_rng(args.seed)
        n_batches = max(1, args.windows // args.batch_size)
        cls, als, pps = [], [], []
        for _ in range(n_batches):
            bx, by = sample_chunk_batch(corpus, args.batch_size, cfg.seq_len, chunk, rng)
            if head == "phase_clock":
                aux = generate_phase_targets(bx)
            elif head == "segmentation":
                aux = get_word_boundaries(bx)
            elif head == "dual":
                aux = get_token_ids_fast(bx, tokenizer)
            else:
                aux = np.zeros((1,), np.float32)
            cl, al, pp = eval_batch(params, jnp.asarray(bx), jnp.asarray(by), jnp.asarray(aux))
            cls.append(float(cl))
            als.append(float(al))
            pps.append(np.asarray(pp))
        pp = np.mean(pps, axis=0)
        aux_s = "" if head == "chunk" else f"  aux({head})={np.mean(als):.4f}"
        print(f"{path}: chunk CE {np.mean(cls):.4f} nats/byte over "
              f"{n_batches * args.batch_size} windows{aux_s}")
        print("  per-position CE:", " ".join(f"{v:.2f}" for v in pp))

    if head == "segmentation":
        # boundary-prediction quality: accuracy + F1 at threshold 0.
        corpus = load_corpus_as_u8(args.data[0], sanitize=cfg.ascii_only)
        rng = np.random.default_rng(args.seed)
        bx, by = sample_chunk_batch(corpus, args.batch_size, cfg.seq_len, chunk, rng)
        tgt = get_word_boundaries(bx)
        _, seg = model.apply({"params": params}, jnp.asarray(bx), deterministic=True)
        pred = (np.asarray(seg) > 0.0).astype(np.float32)
        acc = float((pred == tgt).mean())
        tp = float((pred * tgt).sum())
        prec = tp / max(pred.sum(), 1.0)
        rec = tp / max(tgt.sum(), 1.0)
        f1 = 2 * prec * rec / max(prec + rec, 1e-9)
        print(f"boundary head ({args.data[0]}): acc={acc:.4f} precision={prec:.4f} "
              f"recall={rec:.4f} F1={f1:.4f}")


if __name__ == "__main__":
    main()
