"""Train SegmentedChunkLM (backbone + chunk head + 1-neuron boundary head).

The reference defines the segmentation head and its combined loss
(segmentation_head.py:32,102,160) but ships no trainer CLI for it — only
an inline self-test.  Here the shared chunk-training loop
(`spectral_tpu.train.chunk_trainer`) already generalizes over heads, so a
corpus-scale segmentation run is just a head selection: word-boundary
targets come from `models/segmentation_head.get_word_boundaries` (the reference's
`get_word_boundaries`, segmentation_head.py:58) and the loss is
char CE + BCE boundary loss (compute_segmented_loss, segmentation_head.py:158).
"""

from __future__ import annotations

import argparse

from scripts._common import add_common_args, apply_platform_env, cfg_from_common
from spectral_tpu.train.chunk_trainer import train_chunk


def main(argv=None) -> None:
    apply_platform_env()
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    args = p.parse_args(argv)
    cfg = cfg_from_common(args, ckpt_path=args.ckpt_path or "segmented_ckpt.msgpack")
    train_chunk(cfg, head="segmentation", chunk=args.chunk, cutoff_mode="adaptive", resume=args.resume)


if __name__ == "__main__":
    main()
