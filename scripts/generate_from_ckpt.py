"""Full-recompute AR generation from a checkpoint (optional cutoff override).

Mirror of reference scripts/generate_from_ckpt.py.
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
    ap.add_argument("--cutoff", type=int, default=None)
    ap.add_argument("--temperature", type=float, default=None)
    ap.add_argument("--top-p", type=float, default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from spectral_tpu.models.backbone import FixedSpectralLM
    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.train.ckpt import load_checkpoint
    from spectral_tpu.train.sampling import generate, safe_console

    ck = load_checkpoint(args.ckpt)
    overrides = {}
    if args.temperature is not None:
        overrides["temperature"] = args.temperature
    if args.top_p is not None:
        overrides["top_p"] = args.top_p
    cfg = TrainConfig.from_dict(ck.get("cfg", {}), **overrides)
    model = FixedSpectralLM(cfg)

    # default to the checkpoint's curriculum cutoff: sampling at full
    # bandwidth from a model trained at a lower cutoff degenerates
    # (reference: "Use stage cutoff for stable samples",
    # train_fixed_full.py:981-983)
    cutoff = args.cutoff
    if cutoff is None:
        cutoff = ck.get("train_state", {}).get("cutoff")

    apply_gen = lambda p, x, c, length: model.apply(
        {"params": p}, x, cutoff=c, deterministic=True, length=length
    )
    out = generate(
        apply_gen,
        ck["params"],
        " ".join(args.prompt),
        cfg,
        cutoff=cutoff,
        max_new=args.max_new,
        seed=args.seed,
    )
    print(safe_console(out))


if __name__ == "__main__":
    main()
