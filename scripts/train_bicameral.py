"""Train the bicameral backbone with the phase-clock chunk head.

Mirror of reference scripts/train_bicameral.py: PhaseClockChunkLM always on,
step-level plateau_cutoff achievement mode with LR halving on unlock, full
curriculum-state resume, autosave every 100 steps, hemisphere-balance logs.
"""

from __future__ import annotations

import argparse

from scripts._common import add_common_args, apply_platform_env, cfg_from_common
from spectral_tpu.train.chunk_trainer import train_chunk


def main(argv=None) -> None:
    apply_platform_env()
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    p.add_argument("--autosave-steps", type=int, default=100)
    args = p.parse_args(argv)
    cfg = cfg_from_common(args, bicameral=True, ckpt_path=args.ckpt_path or "bicameral_ckpt.msgpack")
    train_chunk(
        cfg,
        head="phase_clock",
        chunk=args.chunk,
        cutoff_mode="plateau",
        lr_halving_on_unlock=True,
        autosave_steps=args.autosave_steps,
        resume=args.resume,
    )


if __name__ == "__main__":
    main()
