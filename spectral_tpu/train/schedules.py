"""Spectral-curriculum and LR schedules.

Host-side control flow (pure Python over floats/ints): curriculum decisions
mutate LR/cutoff between jitted steps and stay out of the traced graph
(SURVEY.md §7 "curriculum control flow").

Semantics match the reference policies (fft_lm/train_fixed_full.py:208-424,
PLATEAU_RULE.md); the implementation here is a from-scratch design:

* the **band ladder** (128 -> 512 -> Nyquist) is one shared helper instead of
  inline branch chains;
* the **sawtooth LR** is driven by a declarative stage table built from the
  config (each stage = a step interval + its cosine peak/floor), so the
  three-stage structure is data, not control flow;
* the two plateau rules are expressed through a trend statistic
  (:func:`_relative_trend`) and a :class:`PlateauState`-style tuple update.

Public API (used by trainer/chunk_trainer/scripts, pinned by
tests/unit/test_schedules.py):
``jpeg_cutoff``, ``curriculum_cutoff``, ``adaptive_cutoff``,
``plateau_cutoff``, ``sawtooth_lr``, ``lr_stage_params``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Sequence, Tuple

from spectral_tpu.models.config import TrainConfig

# ---------------------------------------------------------------------------
# Shared curriculum helpers
# ---------------------------------------------------------------------------

#: The curriculum's frequency-band ladder.  Training masters the low band
#: first; each unlock jumps to the next rung (512 is deliberately the only
#: intermediate stop — the reference found 256 not worth a stage).
_BAND_LADDER = (128, 512)


def _next_band(cutoff: int, nyquist: int) -> int:
    """The rung above ``cutoff`` on the band ladder, capped at Nyquist."""
    for rung in _BAND_LADDER:
        if cutoff < rung:
            return min(rung, nyquist)
    return nyquist


def _relative_trend(losses: Sequence[float]) -> float:
    """Relative improvement between the older and newer half of a window.

    Positive = still improving; ~0 = plateaued.  Guarded for empty /
    non-positive means (losses are CE values, normally > 0).
    """
    mid = len(losses) // 2
    older, newer = losses[:mid], losses[mid:]
    if not older or not newer:
        return 0.0
    mean_old = math.fsum(older) / len(older)
    mean_new = math.fsum(newer) / len(newer)
    if mean_old <= 0.0:
        return 0.0
    return (mean_old - mean_new) / mean_old


# ---------------------------------------------------------------------------
# Fixed (epoch-indexed) cutoff schedules
# ---------------------------------------------------------------------------


def jpeg_cutoff(epoch: int, cfg: TrainConfig, freq_bins: int) -> int:
    """JPEG/progressive schedule: horizon expands at fixed epochs.

    Epoch thresholds 20/50/100 step the target through the configured
    low/mid/high bands and finally the full spectrum.
    """
    schedule = (
        (20, cfg.jpeg_low),
        (50, cfg.jpeg_mid),
        (100, cfg.jpeg_high),
    )
    target = freq_bins
    for until_epoch, band in schedule:
        if epoch < until_epoch:
            target = band
            break
    return min(int(target), freq_bins)


def curriculum_cutoff(epoch: int, cfg: TrainConfig, freq_bins: int) -> int:
    """Simple 2-stage spectral curriculum: 128 bins for epochs 0-4, then 512.

    Skips 256 — "jump straight to full resolution" (reference :279-292).
    """
    target = _BAND_LADDER[0] if epoch < 5 else _BAND_LADDER[1]
    # long-seq third stage: unlock the full band once configured to
    # (cfg.full_band_epoch; None = the reference's 2-stage parity)
    full_band_epoch = getattr(cfg, "full_band_epoch", None)
    if full_band_epoch is not None and epoch >= int(full_band_epoch):
        target = freq_bins
    return min(target, freq_bins)


# ---------------------------------------------------------------------------
# Plateau-driven cutoff schedules
# ---------------------------------------------------------------------------


def adaptive_cutoff(
    epoch: int,
    current_cutoff: int,
    loss_history: List[float],
    freq_bins: int,
    *,
    min_epoch_before_raise: int = 1,
    plateau_window: int = 50,
    plateau_threshold: float = 0.005,
) -> Tuple[int, bool]:
    """Epoch-level plateau rule: unlock the next band when loss flattens.

    The trend over the last ``plateau_window`` losses (older half vs newer
    half) must fall below ``plateau_threshold`` for an unlock.  Returns
    ``(new_cutoff, cutoff_raised)``.
    """
    ready = (
        epoch >= min_epoch_before_raise
        and current_cutoff < freq_bins
        and len(loss_history) >= plateau_window
    )
    if not ready:
        return current_cutoff, False

    trend = _relative_trend(loss_history[-plateau_window:])
    if trend >= plateau_threshold:
        return current_cutoff, False  # still learning at this band

    unlocked = _next_band(current_cutoff, freq_bins)
    return unlocked, unlocked > current_cutoff


def plateau_cutoff(
    current_cutoff: int,
    recent_loss: float,
    freq_bins: int,
    best_loss_at_cutoff: float,
    steps_without_improvement: int,
    *,
    patience: int = 50,
    improvement_threshold: float = 0.01,
) -> Tuple[int, bool, float, int]:
    """Step-level achievement rule: unlock when STUCK, not when winning.

    State machine over ``(best_loss_at_cutoff, steps_without_improvement)``:

    * beating the best by ``improvement_threshold`` records a new best and
      zeroes the stall counter;
    * otherwise the counter ticks; at ``patience`` stalled steps the next
      band unlocks and the bar resets to +inf (a loss spike is expected
      right after new frequencies open).

    Returns ``(new_cutoff, cutoff_raised, new_best_loss, new_counter)``.
    """
    at_nyquist = current_cutoff >= freq_bins
    if at_nyquist:
        return current_cutoff, False, best_loss_at_cutoff, steps_without_improvement

    beat_the_bar = recent_loss < best_loss_at_cutoff - improvement_threshold
    if beat_the_bar:
        return current_cutoff, False, recent_loss, 0

    stalled = steps_without_improvement + 1
    if stalled < patience:
        return current_cutoff, False, best_loss_at_cutoff, stalled

    unlocked = _next_band(current_cutoff, freq_bins)
    if unlocked == current_cutoff:  # ladder exhausted below Nyquist cap
        return current_cutoff, False, best_loss_at_cutoff, stalled
    return unlocked, True, float("inf"), 0


# ---------------------------------------------------------------------------
# Sawtooth LR: cosine annealing with stage-aligned restarts
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _LRStage:
    """One tooth of the sawtooth: a step interval plus its cosine envelope."""

    name: str
    first_epoch: int
    n_epochs: int
    peak_mult: float
    floor_mult: float

    def cosine_mult(self, global_step: int, steps_per_epoch: int) -> float:
        """LR multiplier at ``global_step`` (cosine from peak to floor)."""
        span = max(1, self.n_epochs * steps_per_epoch)
        into = min(span, max(0, global_step - self.first_epoch * steps_per_epoch))
        # standard cosine half-period: 1 at stage start -> 0 at stage end
        envelope = 0.5 + 0.5 * math.cos(math.pi * into / span)
        return self.floor_mult + (self.peak_mult - self.floor_mult) * envelope


def _stage_table(cfg: TrainConfig) -> Tuple[_LRStage, ...]:
    """The three-stage sawtooth as data (peaks shrink stage over stage)."""
    s1, s2 = int(cfg.stage1_epochs), int(cfg.stage2_epochs)
    s3 = max(1, int(cfg.epochs) - s1 - s2)
    return (
        _LRStage("stage1", 0, max(1, s1), cfg.stage1_lr_mult, cfg.stage1_min_mult),
        _LRStage("stage2", s1, max(1, s2), cfg.stage2_lr_mult, cfg.stage2_min_mult),
        _LRStage("stage3", s1 + s2, s3, cfg.stage3_lr_mult, cfg.stage3_min_mult),
    )


def _stage_for_epoch(cfg: TrainConfig, epoch: int) -> _LRStage:
    table = _stage_table(cfg)
    for stage in reversed(table):
        if epoch >= stage.first_epoch:
            return stage
    return table[0]


def sawtooth_lr(
    global_step: int,
    epoch: int,
    cfg: TrainConfig,
    *,
    cutoff_raised: bool = False,
) -> float:
    """Cosine annealing with restarts aligned to the curriculum stages.

    ``cutoff_raised=True`` forces an immediate restart to the stage peak
    ("Shock & Awe": full LR right when new frequencies unlock).
    """
    stage = _stage_for_epoch(cfg, epoch)
    if cutoff_raised:
        return float(cfg.lr * stage.peak_mult)
    return float(cfg.lr * stage.cosine_mult(int(global_step), int(cfg.steps_per_epoch)))


def lr_stage_params(epoch: int, cfg: TrainConfig) -> Tuple[str, float, float]:
    """(stage_name, lr_mult, min_mult) for logging."""
    stage = _stage_for_epoch(cfg, epoch)
    return (stage.name, float(stage.peak_mult), float(stage.floor_mult))
