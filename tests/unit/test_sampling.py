"""Sampler parity: penalty stack + nucleus filter vs fresh torch reference."""

import numpy as np
import torch

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.train.sampling import apply_top_p, penalize_logits, sample_from_logits


def torch_apply_top_p(logits_1d, p):
    """Fresh impl of the reference nucleus filter (train_fixed_full.py:637-649)."""
    t = torch.tensor(logits_1d)
    sorted_logits, sorted_idx = torch.sort(t, descending=True)
    probs = torch.softmax(sorted_logits, dim=-1)
    cdf = torch.cumsum(probs, dim=-1)
    keep = cdf <= p
    keep[0] = True
    cutoff_pos = int(keep.sum().item())
    masked = torch.full_like(t, -float("inf"))
    masked[sorted_idx[:cutoff_pos]] = t[sorted_idx[:cutoff_pos]]
    return masked.numpy()


class TestTopP:
    def test_matches_torch_reference(self):
        rng = np.random.default_rng(0)
        for p in (0.5, 0.9, 0.99):
            for _ in range(5):
                logits = rng.standard_normal(256).astype(np.float64) * 3
                ours = apply_top_p(logits, p)
                want = torch_apply_top_p(logits, p)
                # same kept set (values equal where kept, -inf where dropped)
                np.testing.assert_array_equal(np.isinf(ours), np.isinf(want))
                np.testing.assert_allclose(ours[~np.isinf(ours)], want[~np.isinf(want)])

    def test_always_keeps_at_least_one(self):
        logits = np.array([10.0, 0.0, 0.0, 0.0])
        out = apply_top_p(logits, 0.0001)
        assert np.isfinite(out).sum() == 1 and np.isfinite(out[0])


class TestPenalties:
    def cfg(self, **kw):
        base = dict(repetition_penalty=1.25, repetition_window=256, ascii_only=True,
                    ban_cr=True, max_run_length=6, presence_penalty=0.0, frequency_penalty=0.0)
        base.update(kw)
        return TrainConfig(**base)

    def test_repetition_penalty_divides(self):
        logits = np.ones(256) * 2.0
        ctx = [65, 65, 66]
        out = penalize_logits(logits, ctx, self.cfg())
        assert np.isclose(out[65], 2.0 / 1.25) and np.isclose(out[66], 2.0 / 1.25)
        assert np.isclose(out[67], 2.0)

    def test_ascii_ban(self):
        out = penalize_logits(np.zeros(256), [65], self.cfg())
        assert np.isinf(out[0]) and np.isinf(out[13]) and np.isinf(out[200])
        assert np.isfinite(out[10]) and np.isfinite(out[65])

    def test_anti_stutter(self):
        ctx = [65] * 6
        out = penalize_logits(np.zeros(256), ctx, self.cfg())
        assert np.isinf(out[65])  # banned after max_run_length repeats
        out2 = penalize_logits(np.zeros(256), [65] * 5 + [66], self.cfg())
        assert np.isfinite(out2[66])

    def test_presence_frequency_penalties(self):
        cfg = self.cfg(presence_penalty=0.5, frequency_penalty=0.1)
        ctx = [65, 65, 65, 66]
        out = penalize_logits(np.full(256, 5.0), ctx, cfg)
        # 65: rep /1.25 then -0.5 -0.1*3 ; 66: rep /1.25 then -0.5 -0.1
        assert np.isclose(out[65], 5.0 / 1.25 - 0.5 - 0.3)
        assert np.isclose(out[66], 5.0 / 1.25 - 0.5 - 0.1)

    def test_sampler_respects_top_k_backstop(self):
        cfg = self.cfg(top_k=2, top_p=1.0, temperature=1.0)
        logits = np.array([5.0, 4.0, -10.0, -10.0] + [-20.0] * 252)
        rng = np.random.default_rng(0)
        picks = {sample_from_logits(logits, cfg, rng) for _ in range(50)}
        assert picks <= {0, 1}
