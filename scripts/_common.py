"""Shared argparse plumbing for the trainer CLIs."""

from __future__ import annotations

import argparse

from spectral_tpu.models.config import TrainConfig


from spectral_tpu.utils.platform import apply_platform_env  # noqa: F401


def add_common_args(p: argparse.ArgumentParser) -> argparse.ArgumentParser:
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seq-len", type=int, default=None)
    p.add_argument("--kernel-len", type=int, default=None)
    p.add_argument("--d-model", type=int, default=None)
    p.add_argument("--n-layers", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--ckpt-path", type=str, default=None)
    p.add_argument("--log-every-steps", type=int, default=None)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--resume", action="store_true")
    return p


_MAP = {
    "data": "data_path",
    "epochs": "epochs",
    "steps_per_epoch": "steps_per_epoch",
    "batch_size": "batch_size",
    "seq_len": "seq_len",
    "kernel_len": "kernel_len",
    "d_model": "d_model",
    "n_layers": "n_layers",
    "lr": "lr",
    "ckpt_path": "ckpt_path",
    "log_every_steps": "log_every_steps",
}


def cfg_from_common(args: argparse.Namespace, **extra) -> TrainConfig:
    overrides = dict(extra)
    for arg, f in _MAP.items():
        v = getattr(args, arg, None)
        if v is not None:
            overrides[f] = v
    return TrainConfig(**overrides)
