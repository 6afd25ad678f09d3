"""Train the bicameral backbone with dual-head (char + GPT-2 token) supervision.

Mirror of reference scripts/train_dual_head.py: token head is a training-only
teacher (token_weight 0.5); plateau unlock with LR halving.  Degrades
gracefully to char-only loss when transformers/gpt2 is unavailable.
"""

from __future__ import annotations

import argparse

from scripts._common import add_common_args, apply_platform_env, cfg_from_common
from spectral_tpu.train.chunk_trainer import train_chunk


def main(argv=None) -> None:
    apply_platform_env()
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    args = p.parse_args(argv)
    cfg = cfg_from_common(args, bicameral=True, ckpt_path=args.ckpt_path or "dual_head_ckpt.msgpack")
    train_chunk(
        cfg,
        head="dual",
        chunk=args.chunk,
        cutoff_mode="plateau",
        lr_halving_on_unlock=True,
        resume=args.resume,
    )


if __name__ == "__main__":
    main()
