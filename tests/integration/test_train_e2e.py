"""End-to-end training slice: loss decreases, ckpt integrity, resume, sampling."""

import os

import numpy as np
import pytest

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.train import schedules
from spectral_tpu.train.trainer import train


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "corpus.txt"
    text = ("the cat sat on the mat. " * 400 + "once upon a time there was a dog. " * 300)
    path.write_text(text)
    return str(path)


def tiny_cfg(tiny_corpus, tmp, **kw):
    base = dict(
        data_path=tiny_corpus,
        d_model=32,
        n_layers=2,
        seq_len=64,
        kernel_len=16,
        jpeg_transition=8,
        batch_size=4,
        accum_steps=1,
        epochs=2,
        steps_per_epoch=30,
        lr=3e-3,
        dropout=0.0,
        val_windows=64,
        val_batches=2,
        log_every_steps=0,
        ckpt_path=os.path.join(tmp, "ckpt.msgpack"),
        max_new=32,
        save_every_epochs=1,
    )
    base.update(kw)
    return TrainConfig(**base)


class TestEndToEnd:
    def test_loss_decreases_and_ckpt(self, tiny_corpus, tmp_path):
        cfg = tiny_cfg(tiny_corpus, str(tmp_path))
        logs = []
        result = train(cfg, log=logs.append)
        state = result["state"]
        # first vs last quarter of optimizer-step losses
        h = state.loss_history
        first = np.mean(h[: len(h) // 4])
        last = np.mean(h[-len(h) // 4 :])
        assert last < first * 0.8, f"loss did not decrease: {first:.3f} -> {last:.3f}"
        # checkpoint + sidecar written and verifiable
        assert os.path.exists(cfg.ckpt_path)
        assert os.path.exists(cfg.ckpt_path + ".sha256")
        from spectral_tpu.train.ckpt import load_checkpoint

        ckpt = load_checkpoint(cfg.ckpt_path)
        assert "params" in ckpt and "cfg" in ckpt
        assert ckpt["train_state"]["epoch"] == 2

    def test_resume(self, tiny_corpus, tmp_path):
        cfg = tiny_cfg(tiny_corpus, str(tmp_path), epochs=1, steps_per_epoch=10)
        train(cfg, log=lambda s: None)
        cfg2 = cfg.replace(epochs=2)
        logs = []
        result = train(cfg2, resume=True, log=logs.append)
        assert any("Resumed" in l for l in logs)
        assert result["state"].epoch == 2

    def test_ckpt_tamper_detection(self, tiny_corpus, tmp_path):
        cfg = tiny_cfg(tiny_corpus, str(tmp_path), epochs=1, steps_per_epoch=5, val_batches=1)
        train(cfg, log=lambda s: None)
        with open(cfg.ckpt_path, "r+b") as f:
            f.seek(100)
            f.write(b"\x00\x01\x02")
        from spectral_tpu.train.ckpt import load_checkpoint

        with pytest.raises(ValueError, match="integrity"):
            load_checkpoint(cfg.ckpt_path)

    def test_generation_ascii_only(self, tiny_corpus, tmp_path):
        from spectral_tpu.train.sampling import generate
        from spectral_tpu.train.trainer import init_model

        cfg = tiny_cfg(tiny_corpus, str(tmp_path))
        model, params = init_model(cfg)
        apply_gen = lambda p, x, c, length: model.apply(
            {"params": p}, x, cutoff=c, deterministic=True, length=length
        )
        out = generate(apply_gen, params, "the cat", cfg, cutoff=16, max_new=24)
        body = out.encode("utf-8")
        assert len(body) >= 24
        for b in body:
            assert b == 10 or (32 <= b <= 126), f"non-ascii byte {b} generated with ascii_only"

    def test_generation_bucketed_matches_exact_window(self, tiny_corpus, tmp_path):
        """The fixed-buffer + traced-length forward must equal the exact-length
        forward (the parity property the mask design guarantees)."""
        import jax
        import jax.numpy as jnp

        from spectral_tpu.train.trainer import init_model

        cfg = tiny_cfg(tiny_corpus, str(tmp_path))
        model, params = init_model(cfg)
        rng = np.random.default_rng(0)
        L = 37
        window = rng.integers(0, 256, (1, L)).astype(np.int32)

        exact = model.apply({"params": params}, jnp.asarray(window), cutoff=jnp.int32(20))
        exact_last = np.asarray(exact[0, -1])

        from spectral_tpu.ops.fftc import next_pow2

        t_b = next_pow2(L + cfg.kernel_len - 1) - cfg.kernel_len + 1
        buf = np.zeros((1, t_b), np.int32)
        buf[0, :L] = window[0]
        buffered = model.apply(
            {"params": params}, jnp.asarray(buf), cutoff=jnp.int32(20), length=jnp.int32(L)
        )
        buffered_last = np.asarray(buffered[0, L - 1])
        np.testing.assert_allclose(buffered_last, exact_last, rtol=1e-4, atol=1e-5)


class TestSchedules:
    def test_curriculum_cutoff(self):
        cfg = TrainConfig()
        fb = cfg.freq_bins
        assert schedules.curriculum_cutoff(0, cfg, fb) == 128
        assert schedules.curriculum_cutoff(4, cfg, fb) == 128
        assert schedules.curriculum_cutoff(5, cfg, fb) == 512

    def test_jpeg_cutoff(self):
        cfg = TrainConfig()
        assert schedules.jpeg_cutoff(0, cfg, 1025) == 128
        assert schedules.jpeg_cutoff(20, cfg, 1025) == 512
        assert schedules.jpeg_cutoff(50, cfg, 1025) == 1024
        assert schedules.jpeg_cutoff(100, cfg, 1025) == 1025

    def test_sawtooth_restarts(self):
        cfg = TrainConfig(steps_per_epoch=100)
        # peak at stage starts, decay within stage
        lr_start = schedules.sawtooth_lr(0, 0, cfg)
        lr_mid = schedules.sawtooth_lr(50, 0, cfg)
        assert lr_start == cfg.lr * cfg.stage1_lr_mult
        assert lr_mid < lr_start
        # stage 2 restart
        lr_s2 = schedules.sawtooth_lr(100, 1, cfg)
        assert lr_s2 == pytest.approx(cfg.lr * cfg.stage2_lr_mult, rel=1e-6)
        # shock & awe: forced restart on cutoff raise
        assert schedules.sawtooth_lr(150, 1, cfg, cutoff_raised=True) == cfg.lr * cfg.stage2_lr_mult

    def test_plateau_cutoff_unlocks_when_stuck(self):
        cutoff, best, counter = 128, 1.0, 0
        for _ in range(49):
            cutoff, raised, best, counter = schedules.plateau_cutoff(
                cutoff, 1.0, 1025, best, counter, patience=50
            )
            assert not raised
        cutoff, raised, best, counter = schedules.plateau_cutoff(cutoff, 1.0, 1025, best, counter, patience=50)
        assert raised and cutoff == 512 and best == float("inf") and counter == 0

    def test_plateau_cutoff_improvement_resets(self):
        cutoff, raised, best, counter = schedules.plateau_cutoff(128, 0.5, 1025, 1.0, 30)
        assert not raised and best == 0.5 and counter == 0

    def test_adaptive_cutoff(self):
        flat = [1.0] * 60
        c, raised = schedules.adaptive_cutoff(2, 128, flat, 1025)
        assert raised and c == 512
        improving = list(np.linspace(2.0, 1.0, 60))
        c, raised = schedules.adaptive_cutoff(2, 128, improving, 1025)
        assert not raised


class TestMeshTrainer:
    def test_trainer_with_mesh_config(self, tiny_corpus, tmp_path):
        """The trainer routes through the sharded pjit step when mesh axes
        are configured (runs on the virtual 8-device CPU mesh)."""
        import jax

        if len(jax.devices()) < 8:
            import pytest

            pytest.skip("needs 8 virtual devices")
        cfg = tiny_cfg(
            tiny_corpus, str(tmp_path),
            mesh_dp=2, mesh_sp=2, mesh_tp=2,
            epochs=1, steps_per_epoch=8, batch_size=4, accum_steps=2,
        )
        logs = []
        out = train(cfg, no_val=True, log=logs.append)
        assert any("Mesh: dp=2 sp=2 tp=2" in l for l in logs)
        h = out["state"].loss_history
        assert len(h) == 8 and all(np.isfinite(v) for v in h)
