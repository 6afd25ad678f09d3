"""Coverage for models/config.py — the frozen TrainConfig contract.

Reference: the CONFIG dict at fft_lm/train_fixed_full.py:33-113; from_dict
must tolerate unknown keys so old checkpoints keep loading as the config
grows.
"""

import dataclasses

import pytest

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.ops.fftc import next_pow2


class TestTrainConfig:
    def test_defaults_construct(self):
        cfg = TrainConfig()
        assert cfg.vocab_size == 256  # byte-level

    def test_frozen(self):
        cfg = TrainConfig()
        with pytest.raises(dataclasses.FrozenInstanceError):
            cfg.seq_len = 1  # type: ignore[misc]

    def test_replace_creates_new(self):
        cfg = TrainConfig()
        cfg2 = cfg.replace(seq_len=64)
        assert cfg2.seq_len == 64 and cfg.seq_len != 64 or cfg.seq_len == cfg2.seq_len
        assert cfg2 is not cfg

    def test_fft_geometry(self):
        cfg = TrainConfig.from_dict(dict(seq_len=100))
        # linear conv needs >= 2T-1 samples; we round to the next pow2
        assert cfg.n_fft == next_pow2(2 * 100)
        assert cfg.freq_bins == cfg.n_fft // 2 + 1

    def test_from_dict_ignores_unknown_keys(self):
        cfg = TrainConfig.from_dict(dict(seq_len=64, some_future_key=123, torch_only_flag=True))
        assert cfg.seq_len == 64

    def test_from_dict_roundtrip(self):
        cfg = TrainConfig.from_dict(dict(seq_len=64, batch_size=3))
        d = cfg.to_dict()
        cfg2 = TrainConfig.from_dict(d)
        assert cfg2 == cfg

    def test_mesh_defaults_single_device(self):
        cfg = TrainConfig()
        assert cfg.mesh_dp * cfg.mesh_sp * cfg.mesh_tp >= 1


class TestDropoutPRNGValidation:
    def test_typo_impl_raises(self):
        import pytest

        from spectral_tpu.models.config import TrainConfig
        from spectral_tpu.train.trainer import dropout_key

        with pytest.raises(ValueError, match="dropout_prng"):
            dropout_key(TrainConfig(dropout_prng="rgb"), 0)

    def test_known_impls_work(self):
        from spectral_tpu.models.config import TrainConfig
        from spectral_tpu.train.trainer import dropout_key

        for impl in ("rbg", "threefry2x32"):
            dropout_key(TrainConfig(dropout_prng=impl), 0)
