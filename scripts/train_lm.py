"""Train the fixed spectral LM backbone on a byte corpus.

CLI mirror of ``python -m fft_lm.train_fixed_full`` (reference
train_fixed_full.py:713-777): dataclass defaults, argparse overrides,
spectral curriculum + sawtooth LR, eval + parroting samples, sha256 ckpts.

Run:
  python -m scripts.train_lm --data tinystories_train.txt --epochs 200
"""

from __future__ import annotations

import argparse

from scripts._common import apply_platform_env
from spectral_tpu.models.config import TrainConfig
from spectral_tpu.train.trainer import train


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", type=str, default=None, help="byte corpus path")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--accum-steps", type=int, default=None)
    p.add_argument("--seq-len", type=int, default=None)
    p.add_argument("--kernel-len", type=int, default=None)
    p.add_argument("--d-model", type=int, default=None)
    p.add_argument("--n-layers", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--top-p", type=float, default=None)
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--repetition-penalty", type=float, default=None)
    p.add_argument("--presence-penalty", type=float, default=None)
    p.add_argument("--frequency-penalty", type=float, default=None)
    p.add_argument("--log-every-steps", type=int, default=None)
    p.add_argument("--no-sawtooth", action="store_true")
    p.add_argument("--stage3-lr-mult", type=float, default=None)
    p.add_argument("--stage3-min-mult", type=float, default=None)
    p.add_argument("--ckpt-path", type=str, default=None)
    p.add_argument("--val-batches", type=int, default=None)
    p.add_argument("--eval-every-epochs", type=int, default=None)
    p.add_argument("--no-val", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--frequency-native", action="store_true")
    p.add_argument("--bicameral", action="store_true")
    p.add_argument("--compute-dtype", type=str, default=None, choices=["float32", "bfloat16"])
    p.add_argument("--fft-backend", type=str, default=None, choices=["xla", "matmul", "direct"])
    p.add_argument("--no-fused-block", action="store_true",
                   help="disable the fused whole-block Pallas training path "
                        "(the TPU default at tile-aligned shapes)")
    p.add_argument("--fft-precision", type=str, default=None, choices=["highest", "default"])
    p.add_argument("--full-band-epoch", type=int, default=None,
                   help="epoch at which the fixed curriculum unlocks the FULL "
                        "band (long-seq third stage; default: reference 2-stage "
                        "parity, capped at 512 bins)")
    p.add_argument("--mesh-dp", type=int, default=None, help="data-parallel mesh axis size")
    p.add_argument("--mesh-sp", type=int, default=None, help="sequence-parallel mesh axis size")
    p.add_argument("--mesh-tp", type=int, default=None, help="tensor-parallel mesh axis size")
    return p


_ARG_TO_FIELD = {
    "data": "data_path",
    "epochs": "epochs",
    "steps_per_epoch": "steps_per_epoch",
    "batch_size": "batch_size",
    "accum_steps": "accum_steps",
    "seq_len": "seq_len",
    "kernel_len": "kernel_len",
    "d_model": "d_model",
    "n_layers": "n_layers",
    "lr": "lr",
    "top_p": "top_p",
    "top_k": "top_k",
    "temperature": "temperature",
    "repetition_penalty": "repetition_penalty",
    "presence_penalty": "presence_penalty",
    "frequency_penalty": "frequency_penalty",
    "log_every_steps": "log_every_steps",
    "stage3_lr_mult": "stage3_lr_mult",
    "stage3_min_mult": "stage3_min_mult",
    "fft_backend": "fft_backend",
    "fft_precision": "fft_precision",
    "ckpt_path": "ckpt_path",
    "val_batches": "val_batches",
    "eval_every_epochs": "eval_every_epochs",
    "compute_dtype": "compute_dtype",
    "full_band_epoch": "full_band_epoch",
    "mesh_dp": "mesh_dp",
    "mesh_sp": "mesh_sp",
    "mesh_tp": "mesh_tp",
}


def cfg_from_args(args: argparse.Namespace) -> TrainConfig:
    overrides = {}
    for arg, fieldname in _ARG_TO_FIELD.items():
        v = getattr(args, arg, None)
        if v is not None:
            overrides[fieldname] = v
    if args.frequency_native:
        overrides["frequency_native"] = True
        overrides["use_fp32"] = True
    if args.bicameral:
        overrides["bicameral"] = True

    # TPU defaults (only when the flags weren't given), fastest first — all
    # descent-parity gated vs matmul-fp32 on the real corpus
    # (experiments/backend_descent_check.py; the reference itself trains
    # under AMP, train_fixed_full.py:822,929).  Flagship accum-recipe
    # timings (BENCHMARKS.md "flagship accum-config profile"):
    #   fused whole-block Pallas + bf16   27.7 ms/step  (1.18M tok/s)
    #   direct Toeplitz conv + bf16       42.1 ms/step
    #   matmul FFT fp32 (round-1 default) 90.0 ms/step
    # The fused kernel needs MXU/VPU-tile-aligned shapes (d_model and
    # 2*d_model multiples of 128, seq a multiple of 8); both Toeplitz paths
    # are O(T^2), so beyond seq 2048 the FFT's O(T log T) wins back.
    import jax

    if jax.default_backend() == "tpu":
        from spectral_tpu.models.fused_apply import fused_path_for

        seq = overrides.get("seq_len", TrainConfig.seq_len)
        d = overrides.get("d_model", TrainConfig.d_model)
        hidden = overrides.get("ffn_mult", TrainConfig.ffn_mult) * d
        std_block = not (args.bicameral or args.frequency_native)
        # an EXPLICIT --fft-backend/--fft-precision is a request for that
        # conv path — the fused kernel (which ignores both) must not
        # silently override it
        explicit_conv = args.fft_backend is not None or args.fft_precision is not None
        # mesh coverage of the fused kernels (parallel/sharded_train.py
        # _fused_mesh_mode): dp shards the per-batch-element grid kernels
        # via shard_map; sp>1 and/or tp>1 run the mesh tail route
        # (Ulysses conv per time shard + hidden-sharded FFN with the
        # residual_alpha partial-sum psum over tp).
        mesh_sp = overrides.get("mesh_sp", 1)
        mesh_tp = overrides.get("mesh_tp", 1)
        mesh_ok = hidden % mesh_tp == 0
        if mesh_sp > 1 or mesh_tp > 1:
            # mesh tail route: shapes must divide over sp/tp and the LOCAL
            # shard must still chunk under the tail kernel's VMEM budget
            from spectral_tpu.ops.pallas_tail import pick_chunk

            mesh_ok = (mesh_ok and seq % mesh_sp == 0 and d % mesh_sp == 0
                       and pick_chunk(seq // mesh_sp, d, hidden // mesh_tp)
                       is not None)
        # fused_path_for: seq<=2048 -> whole-block kernel; longer -> XLA
        # conv + positionwise tail kernel (ops/pallas_tail.py) — the fused
        # default no longer stops at 2048
        if (std_block and not args.no_fused_block and not explicit_conv
                and mesh_ok and seq % 8 == 0
                and d % 128 == 0 and hidden % 128 == 0
                and fused_path_for(seq, d, hidden) is not None):
            overrides.setdefault("use_fused_block", True)
        overrides.setdefault("fft_backend", "direct" if seq <= 2048 else "matmul")
        overrides.setdefault("fft_precision", "default")
        overrides.setdefault("compute_dtype", "bfloat16")
    return TrainConfig(**overrides)


def main(argv=None) -> None:
    apply_platform_env()
    args = build_parser().parse_args(argv)
    cfg = cfg_from_args(args)

    print("=" * 70)
    print("TRAIN FIXED SPECTRAL MIXER (TPU-native)")
    print("=" * 70)
    print(f"Data:   {cfg.data_path}")
    print(f"SeqLen: {cfg.seq_len}  kernel={cfg.kernel_len}  d_model={cfg.d_model}  layers={cfg.n_layers}")
    eff = cfg.batch_size * cfg.accum_steps
    print(f"Batch:  {cfg.batch_size} (micro) x accum {cfg.accum_steps} => effective {eff}")
    print(f"Epochs: {cfg.epochs} (optimizer steps/epoch={cfg.steps_per_epoch})")
    print(f"LR:     {cfg.lr} (wd={cfg.weight_decay})  sawtooth={'off' if args.no_sawtooth else 'on'}")
    print(f"Mode:   bicameral={cfg.bicameral} frequency_native={cfg.frequency_native}")
    print(f"CKPT:   {cfg.ckpt_path}")
    print("=" * 70, flush=True)

    train(cfg, resume=args.resume, no_sawtooth=args.no_sawtooth, no_val=args.no_val)

    print("=" * 70)
    print("DONE")
    print("=" * 70)


if __name__ == "__main__":
    main()
