"""Device memory cleanup + introspection.

Reference: fft_tensor/cleanup.py (+ root cleanup_gpu.py): ``cleanup_cuda``,
``cleanup_models``, ``GPUContext``.  On TPU the allocator is managed by the
runtime; the equivalents are dropping live buffers, clearing jit caches, and
reading ``memory_stats`` from the device.
"""

from __future__ import annotations

import gc
from typing import Optional

import jax


def device_memory_stats(device_index: int = 0) -> dict:
    """bytes_in_use / peak / limit from the local device (or {} off-TPU)."""
    try:
        stats = jax.local_devices()[device_index].memory_stats()
        return dict(stats) if stats else {}
    except Exception:
        return {}


def cleanup_device(verbose: bool = False) -> dict:
    """Drop dead references, clear compilation caches, report stats."""
    gc.collect()
    jax.clear_caches()
    stats = device_memory_stats()
    if verbose and stats:
        used = stats.get("bytes_in_use", 0) / 1e6
        limit = stats.get("bytes_limit", 0) / 1e6
        print(f"[cleanup] device memory: {used:.1f} / {limit:.1f} MB")
    return stats


def cleanup_models(*models) -> None:
    """Delete model references and collect (reference cleanup.py:31-44)."""
    for m in models:
        del m
    gc.collect()
    jax.clear_caches()


class DeviceContext:
    """Context manager reporting memory deltas (reference GPUContext).

    with DeviceContext("training"):
        ... work ...
    """

    def __init__(self, label: str = "", verbose: bool = True):
        self.label = label
        self.verbose = verbose
        self._before: Optional[int] = None

    def __enter__(self):
        self._before = device_memory_stats().get("bytes_in_use")
        return self

    def __exit__(self, *exc):
        stats = cleanup_device()
        after = stats.get("bytes_in_use")
        if self.verbose and self._before is not None and after is not None:
            delta = (after - self._before) / 1e6
            print(f"[{self.label or 'device'}] memory delta: {delta:+.1f} MB")
        return False
