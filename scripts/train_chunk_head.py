"""Train ChunkLM (backbone + chunk head, optional spectral-EMA memory).

Mirror of reference scripts/train_chunk_head.py: epoch-level adaptive_cutoff
plateau detection, resume-without-regressing, sawtooth LR with cutoff-raise
restarts, Ctrl+C-safe checkpointing.
"""

from __future__ import annotations

import argparse

from scripts._common import add_common_args, apply_platform_env, cfg_from_common
from spectral_tpu.train.chunk_trainer import train_chunk


def main(argv=None) -> None:
    apply_platform_env()
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    p.add_argument("--use-ema", action="store_true", help="spectral-EMA infinite-memory path")
    p.add_argument("--ema-mode", type=str, default="aligned", choices=["aligned", "polar"])
    args = p.parse_args(argv)
    cfg = cfg_from_common(args, ckpt_path=args.ckpt_path or "chunklm_ckpt.msgpack")
    train_chunk(
        cfg,
        head="chunk",
        chunk=args.chunk,
        use_ema=args.use_ema,
        cutoff_mode="adaptive",
        resume=args.resume,
    )


if __name__ == "__main__":
    main()
