"""Coverage for train/evaluate.py (val loss + anti-parroting score) and
utils/profiling.py (roofline accounting).

Reference: fft_lm/train_fixed_full.py:150-205 (eval + parroting).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.train.evaluate import cross_entropy, eval_loss, parroting_score


class TestCrossEntropy:
    def test_uniform_logits_give_log_v(self):
        logits = jnp.zeros((2, 8, 256))
        targets = jnp.zeros((2, 8), jnp.int32)
        assert float(cross_entropy(logits, targets)) == pytest.approx(np.log(256.0), rel=1e-5)

    def test_perfect_prediction_near_zero(self):
        targets = jnp.arange(8, dtype=jnp.int32)[None, :]
        logits = 100.0 * jax.nn.one_hot(targets, 16)
        assert float(cross_entropy(logits, targets)) < 1e-3


class TestEvalLoss:
    def test_uniform_model_matches_log_v(self):
        cfg = TrainConfig.from_dict(dict(seq_len=32, batch_size=2, val_batches=2, val_windows=16))
        corpus = np.random.default_rng(0).integers(0, 256, size=4096).astype(np.uint8)
        starts = np.arange(0, 16 * 64, 64)

        def apply_fn(params, x, c):
            return jnp.zeros((x.shape[0], x.shape[1], 256), jnp.float32)

        loss = eval_loss(apply_fn, None, corpus, starts, cfg, cutoff=None)
        assert loss == pytest.approx(float(np.log(256.0)), rel=1e-5)

    def test_deterministic_given_rng(self):
        cfg = TrainConfig.from_dict(dict(seq_len=32, batch_size=2, val_batches=2, val_windows=16))
        corpus = np.random.default_rng(0).integers(0, 256, size=4096).astype(np.uint8)
        starts = np.arange(0, 16 * 64, 64)

        def apply_fn(params, x, c):
            # depends on the data so ordering matters
            return jax.nn.one_hot(x, 256) * 3.0

        l1 = eval_loss(apply_fn, None, corpus, starts, cfg, cutoff=None, rng=np.random.default_rng(7))
        l2 = eval_loss(apply_fn, None, corpus, starts, cfg, cutoff=None, rng=np.random.default_rng(7))
        assert l1 == l2


class TestParrotingScore:
    def _cfg(self):
        return TrainConfig.from_dict(dict(parroting_snip_len=8, parroting_stride=4, parroting_snips=16))

    def test_verbatim_copy_scores_high(self):
        cfg = self._cfg()
        corpus = (b"the quick brown fox jumps over the lazy dog. " * 40)
        gen = corpus[100:400]  # pure copy
        assert parroting_score(corpus, gen, cfg) == 1.0

    def test_novel_text_scores_low(self):
        cfg = self._cfg()
        corpus = (b"the quick brown fox jumps over the lazy dog. " * 40)
        gen = bytes(np.random.default_rng(0).integers(0, 256, size=300).astype(np.uint8))
        assert parroting_score(corpus, gen, cfg) <= 0.1

    def test_short_generation_returns_zero(self):
        cfg = self._cfg()
        assert parroting_score(b"abc" * 100, b"ab", cfg) == 0.0


class TestRoofline:
    def test_measure_bandwidth_sane(self):
        from spectral_tpu.utils.profiling import measure_bandwidth

        x = jnp.ones((256, 256), jnp.float32)
        f = jax.jit(lambda a: a * 2.0)
        nbytes = 2 * x.size * 4  # read once + write once
        r = measure_bandwidth(f, x, bytes_moved=nbytes, iters=5, warmup=2)
        assert r.seconds > 0
        assert r.achieved_gbps > 0
        assert r.peak_gbps > 0
        assert 0 < r.fraction_of_peak  # ideal-traffic accounting keeps this finite

    def test_assert_roofline_raises_below_floor(self):
        from spectral_tpu.utils.profiling import RooflineResult, assert_roofline

        bad = RooflineResult(seconds=1.0, bytes_moved=1, achieved_gbps=1e-6, peak_gbps=819.0)
        with pytest.raises(AssertionError):
            assert_roofline(bad, min_fraction=0.5)
