"""Single-file chunk-LM trainer (alias of train_chunk_head without EMA).

Mirror of reference scripts/train_chunk_lm.py, which duplicated the ChunkLM
class inline; here it simply drives the shared loop.
"""

from __future__ import annotations

import argparse

from scripts._common import add_common_args, apply_platform_env, cfg_from_common
from spectral_tpu.train.chunk_trainer import train_chunk


def main(argv=None) -> None:
    apply_platform_env()
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    args = p.parse_args(argv)
    cfg = cfg_from_common(args, ckpt_path=args.ckpt_path or "chunklm_ckpt.msgpack")
    train_chunk(cfg, head="chunk", chunk=args.chunk, cutoff_mode="adaptive", resume=args.resume)


if __name__ == "__main__":
    main()
