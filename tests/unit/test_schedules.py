"""Curriculum + LR schedule unit coverage.

These are host-side pure functions (reference train_fixed_full.py:208-424);
the tests pin the decision logic the e2e run exercises implicitly.
"""

import math

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.train.schedules import (
    adaptive_cutoff,
    curriculum_cutoff,
    jpeg_cutoff,
    lr_stage_params,
    plateau_cutoff,
    sawtooth_lr,
)


def _cfg(**kw):
    return TrainConfig.from_dict(kw)


class TestCutoffSchedules:
    def test_jpeg_progression(self):
        cfg = _cfg()
        bins = cfg.freq_bins
        vals = [jpeg_cutoff(e, cfg, bins) for e in (0, 19, 20, 49, 50, 99, 100)]
        assert vals == sorted(vals), vals  # monotone horizon expansion
        assert vals[-1] == bins  # full resolution at the end
        assert vals[0] == min(cfg.jpeg_low, bins)

    def test_jpeg_clamped_to_nyquist(self):
        cfg = _cfg(seq_len=64)  # tiny model: few freq bins
        assert jpeg_cutoff(100, cfg, cfg.freq_bins) == cfg.freq_bins
        assert jpeg_cutoff(0, cfg, cfg.freq_bins) <= cfg.freq_bins

    def test_curriculum_two_stage(self):
        cfg = _cfg()
        bins = 1025
        assert curriculum_cutoff(0, cfg, bins) == 128
        assert curriculum_cutoff(4, cfg, bins) == 128
        assert curriculum_cutoff(5, cfg, bins) == 512  # skips 256 by design

    def test_curriculum_full_band_third_stage(self):
        # long-seq extension: cfg.full_band_epoch unlocks Nyquist at a
        # fixed epoch; None (default) keeps the reference's 512 cap
        bins = 4097
        cfg = _cfg()
        assert curriculum_cutoff(100, cfg, bins) == 512  # parity default
        cfg3 = cfg.replace(full_band_epoch=42)
        assert curriculum_cutoff(41, cfg3, bins) == 512
        assert curriculum_cutoff(42, cfg3, bins) == bins
        # earlier stages unaffected
        assert curriculum_cutoff(0, cfg3, bins) == 128
        # full_band_epoch=0 trains full-band from scratch
        assert curriculum_cutoff(0, cfg.replace(full_band_epoch=0), bins) == bins

    def test_adaptive_raises_only_on_plateau(self):
        bins = 1025
        improving = [3.0 - 0.01 * i for i in range(50)]
        flat = [3.0] * 50
        c, raised = adaptive_cutoff(10, 128, improving, bins)
        assert (c, raised) == (128, False)
        c, raised = adaptive_cutoff(10, 128, flat, bins)
        assert (c, raised) == (512, True)
        # at Nyquist there is nothing to unlock
        c, raised = adaptive_cutoff(10, bins, flat, bins)
        assert (c, raised) == (bins, False)

    def test_adaptive_needs_full_window(self):
        c, raised = adaptive_cutoff(10, 128, [3.0] * 10, 1025)
        assert (c, raised) == (128, False)

    def test_plateau_achievement_cycle(self):
        bins = 1025
        cutoff, best, counter = 128, 3.2, 0
        # improving: best updates, counter resets
        cutoff, raised, best, counter = plateau_cutoff(cutoff, 3.0, bins, best, counter, patience=3)
        assert (cutoff, raised, best, counter) == (128, False, 3.0, 0)
        # stuck for `patience` steps: unlock, bar resets to +inf
        for _ in range(2):
            cutoff, raised, best, counter = plateau_cutoff(cutoff, 3.0, bins, best, counter, patience=3)
            assert not raised
        cutoff, raised, best, counter = plateau_cutoff(cutoff, 3.0, bins, best, counter, patience=3)
        assert raised and cutoff == 512 and math.isinf(best) and counter == 0


class TestSawtoothLR:
    def test_stage_peaks_shrink(self):
        cfg = _cfg()
        m = [lr_stage_params(e, cfg)[1] for e in (0, cfg.stage1_epochs, cfg.stage1_epochs + cfg.stage2_epochs)]
        assert m[0] >= m[1] >= m[2], m

    def test_cosine_decay_within_stage(self):
        cfg = _cfg()
        spe = int(cfg.steps_per_epoch)
        lrs = [sawtooth_lr(s, 0, cfg) for s in range(0, cfg.stage1_epochs * spe, max(1, spe))]
        assert lrs == sorted(lrs, reverse=True), lrs  # monotone decay
        assert lrs[0] <= cfg.lr * cfg.stage1_lr_mult + 1e-12

    def test_shock_and_awe_restart(self):
        cfg = _cfg()
        late = cfg.stage1_epochs * int(cfg.steps_per_epoch) - 1
        decayed = sawtooth_lr(late, 0, cfg)
        restarted = sawtooth_lr(late, 0, cfg, cutoff_raised=True)
        assert restarted == cfg.lr * cfg.stage1_lr_mult
        assert restarted > decayed

    def test_restart_at_stage_boundary(self):
        cfg = _cfg()
        spe = int(cfg.steps_per_epoch)
        end_s1 = sawtooth_lr(cfg.stage1_epochs * spe - 1, cfg.stage1_epochs - 1, cfg)
        start_s2 = sawtooth_lr(cfg.stage1_epochs * spe, cfg.stage1_epochs, cfg)
        # new stage restarts to its own (smaller) peak, above stage-1's floor
        assert start_s2 > end_s1
