"""Coverage for train/ckpt.py — integrity sidecars, flexible restore,
architecture sniffing.

Reference: train_fixed_full.py:824-876 (flexible restore),
generate_chunk_simple.py:55-61 (key sniffing), *.sha256 manifests at the
reference repo root.
"""

import numpy as np
import pytest

from spectral_tpu.train.ckpt import (
    detect_architecture,
    load_checkpoint,
    load_params_flexible,
    save_checkpoint,
    verify_checkpoint,
)


def _payload():
    return {
        "params": {"dense": {"kernel": np.ones((4, 4), np.float32), "bias": np.zeros(4, np.float32)}},
        "train_state": {"cutoff": 128, "step": 10},
    }


class TestIntegrity:
    def test_roundtrip_with_sidecar(self, tmp_path):
        p = str(tmp_path / "ck.msgpack")
        digest = save_checkpoint(p, _payload())
        assert len(digest) == 64
        got = load_checkpoint(p)
        np.testing.assert_array_equal(got["params"]["dense"]["kernel"], np.ones((4, 4)))
        assert got["train_state"]["cutoff"] == 128

    def test_tampering_detected(self, tmp_path):
        p = str(tmp_path / "ck.msgpack")
        save_checkpoint(p, _payload())
        with open(p, "r+b") as f:
            f.seek(5)
            f.write(b"\xff")
        with pytest.raises(ValueError, match="integrity"):
            load_checkpoint(p)

    def test_missing_sidecar_raises(self, tmp_path):
        p = str(tmp_path / "ck.msgpack")
        save_checkpoint(p, _payload())
        import os

        os.remove(p + ".sha256")
        with pytest.raises(FileNotFoundError):
            verify_checkpoint(p)


class TestFlexibleRestore:
    def test_exact_match_loads_all(self):
        cur = {"a": {"kernel": np.zeros((2, 2), np.float32)}}
        saved = {"a": {"kernel": np.ones((2, 2), np.float32)}}
        out, resized, skipped = load_params_flexible(cur, saved)
        np.testing.assert_array_equal(np.asarray(out["a"]["kernel"]), np.ones((2, 2)))
        assert not resized and not skipped

    def test_gate_logits_resize_prefix(self):
        cur = {"blk": {"gate_freq_logits": np.full(8, -1.0, np.float32)}}
        saved = {"blk": {"gate_freq_logits": np.arange(4, dtype=np.float32)}}
        out, resized, skipped = load_params_flexible(cur, saved)
        got = np.asarray(out["blk"]["gate_freq_logits"])
        np.testing.assert_array_equal(got[:4], np.arange(4, dtype=np.float32))
        np.testing.assert_array_equal(got[4:], np.full(4, -1.0))  # current init kept
        assert len(resized) == 1 and not skipped

    def test_mismatched_other_tensor_skipped(self):
        cur = {"a": {"kernel": np.zeros((3, 3), np.float32)}}
        saved = {"a": {"kernel": np.ones((2, 2), np.float32)}}
        out, resized, skipped = load_params_flexible(cur, saved)
        np.testing.assert_array_equal(np.asarray(out["a"]["kernel"]), np.zeros((3, 3)))
        assert len(skipped) == 1 and not resized

    def test_missing_key_keeps_current(self):
        cur = {"a": {"kernel": np.full((2,), 7.0, np.float32)}, "b": {"bias": np.ones(2, np.float32)}}
        saved = {"a": {"kernel": np.zeros((2,), np.float32)}}
        out, _, _ = load_params_flexible(cur, saved)
        np.testing.assert_array_equal(np.asarray(out["b"]["bias"]), np.ones(2))


class TestArchitectureSniff:
    def test_flags(self):
        params = {
            "hemis": {"alpha_freq": np.zeros(2)},
            "head": {"token_head": {"kernel": np.zeros((2, 2))}},
        }
        arch = detect_architecture(params)
        assert arch["bicameral"] and arch["dual_head"]
        assert not arch["frequency_native"] and not arch["phase_clock"]

    def test_frequency_native_excludes_bicameral(self):
        arch = detect_architecture({"l0": {"phase_weights": np.zeros(2)}})
        assert arch["frequency_native"] and not arch["bicameral"]
