"""Evaluate a checkpoint: val loss at full horizon AND schedule cutoff,
generation sample, parroting score.

Mirror of reference scripts/eval_ckpt.py.
"""

from __future__ import annotations

import argparse

from scripts._common import apply_platform_env


def main(argv=None) -> None:
    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="fixed_spectral_ckpt.msgpack")
    ap.add_argument("--data", default=None)
    ap.add_argument("--cutoff", type=int, default=None)
    ap.add_argument("--max-new", type=int, default=200)
    args = ap.parse_args(argv)

    import jax

    from spectral_tpu.models.backbone import FixedSpectralLM
    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.train.ckpt import load_checkpoint
    from spectral_tpu.train.data import load_corpus_as_u8, make_val_starts
    from spectral_tpu.train.evaluate import eval_loss, parroting_score
    from spectral_tpu.train.sampling import generate, safe_console

    ck = load_checkpoint(args.ckpt)
    cfg = TrainConfig.from_dict(ck.get("cfg", {}))
    if args.data:
        cfg = cfg.replace(data_path=args.data)
    model = FixedSpectralLM(cfg)
    params = ck["params"]

    corpus = load_corpus_as_u8(cfg.data_path, sanitize=cfg.ascii_only)
    starts = make_val_starts(corpus.shape[0], cfg.seq_len, cfg.val_windows, cfg.seed + 1)

    apply_eval = jax.jit(lambda p, x, c: model.apply({"params": p}, x, cutoff=c, deterministic=True))
    vloss_full = eval_loss(apply_eval, params, corpus, starts, cfg, cutoff=None)
    print(f"val loss (full horizon): {vloss_full:.4f}")

    cutoff = args.cutoff if args.cutoff is not None else ck.get("train_state", {}).get("cutoff")
    if cutoff:
        vloss_cut = eval_loss(apply_eval, params, corpus, starts, cfg, cutoff=int(cutoff))
        print(f"val loss (cutoff={cutoff}): {vloss_cut:.4f}")

    if args.max_new <= 0:  # losses only: skip the generation compile
        return

    apply_gen = lambda p, x, c, length: model.apply(
        {"params": p}, x, cutoff=c, deterministic=True, length=length
    )
    sample = generate(apply_gen, params, "Once upon a time", cfg, cutoff=cutoff, max_new=args.max_new)
    print("-" * 70)
    print(safe_console(sample))
    print("-" * 70)
    score = parroting_score(corpus.tobytes(), sample.encode("utf-8", errors="ignore"), cfg)
    print(f"[parroting_score] {score:.2f} (0=novel, 1=copied)")


if __name__ == "__main__":
    main()
