"""Profiling + roofline utilities.

Reference: SURVEY.md §5.1 — the reference used manual wall-clock timing with
``torch.cuda.synchronize`` bracketing everywhere; the TPU plan replaces that
with ``jax.profiler`` traces plus roofline accounting (achieved GB/s vs HBM
peak — the BASELINE.json metric for the fused kernels).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable

import jax

# Peak HBM bandwidth by chip (GB/s); used for roofline fractions.
HBM_PEAK_GBPS = {
    "v5e": 819.0,  # TPU v5 lite
    "v5p": 2765.0,
    "v4": 1228.0,
    "cpu": 50.0,  # ballpark DDR — keeps the math meaningful off-TPU
}


def detect_chip() -> str:
    d = str(jax.devices()[0]).lower()
    if "v5 lite" in d or "v5e" in d:
        return "v5e"
    if "v5p" in d or "v5" in d:
        return "v5p"
    if "v4" in d:
        return "v4"
    return "cpu"


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class RooflineResult:
    seconds: float
    bytes_moved: int
    achieved_gbps: float
    peak_gbps: float

    @property
    def fraction_of_peak(self) -> float:
        return self.achieved_gbps / self.peak_gbps


def measure_bandwidth(
    fn: Callable,
    *args,
    bytes_moved: int,
    iters: int = 30,
    warmup: int = 3,
) -> RooflineResult:
    """Achieved effective bandwidth of a jitted fn vs the chip's HBM peak.

    ``bytes_moved`` is the IDEAL traffic (inputs read once + outputs written
    once); fraction_of_peak > 1 therefore never happens, and values near 1
    mean the op is at the HBM roofline.

    Each iteration is synced individually: repeated identical dispatches can
    be deduplicated by some runtimes (observed on the tunneled TPU backend),
    which silently inflates throughput.  The per-iteration sync adds host
    round-trip latency, so the result is a LOWER bound on the op's true
    bandwidth.
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    peak = HBM_PEAK_GBPS[detect_chip()]
    return RooflineResult(
        seconds=dt, bytes_moved=bytes_moved, achieved_gbps=bytes_moved / dt / 1e9, peak_gbps=peak
    )


def assert_roofline(result: RooflineResult, min_fraction: float) -> None:
    """Hard perf gate: the op must achieve >= min_fraction of HBM peak."""
    if result.fraction_of_peak < min_fraction:
        raise AssertionError(
            f"roofline violation: {result.achieved_gbps:.0f} GB/s = "
            f"{result.fraction_of_peak:.1%} of {result.peak_gbps:.0f} GB/s peak "
            f"(required {min_fraction:.0%})"
        )
