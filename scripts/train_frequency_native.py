"""Train the frequency-native backbone (phase activations, complex FFN).

Mirror of reference scripts/train_frequency_native.py: frequency_native=True
with fp32 complex math (the reference disables AMP for this mode —
complex+fp16 don't mix; on TPU the complex path is fp32 by design).
"""

from __future__ import annotations

import argparse

from scripts._common import add_common_args, apply_platform_env, cfg_from_common
from spectral_tpu.train.chunk_trainer import train_chunk


def main(argv=None) -> None:
    apply_platform_env()
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    args = p.parse_args(argv)
    cfg = cfg_from_common(
        args,
        frequency_native=True,
        use_fp32=True,
        ckpt_path=args.ckpt_path or "chunklm_freq_native_ckpt.msgpack",
    )
    train_chunk(cfg, head="chunk", chunk=args.chunk, cutoff_mode="adaptive", resume=args.resume)


if __name__ == "__main__":
    main()
