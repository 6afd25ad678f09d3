"""Checkpoint quantization: round-trip bounds, payload format, CLI.

Reference counterpart: zero_materialize.py:455-568 defines log8 but the
reference never applies it to a trained state dict; here quantized serving
artifacts are a first-class deployment path (spectral_tpu/train/quantize.py)
and load transparently through train.ckpt.load_checkpoint.
"""

from __future__ import annotations

import numpy as np
import pytest

from spectral_tpu.train import ckpt as ckpt_io
from spectral_tpu.train.quantize import (
    dequantize_params,
    dequantize_payload,
    dequantize_tensor,
    is_quantized_payload,
    quantize_params,
    quantize_payload,
    quantize_tensor,
)


def test_log8_roundtrip_relative_error_bound():
    rng = np.random.default_rng(0)
    # log-normal magnitudes spanning ~6 octaves, random signs
    x = (rng.lognormal(0.0, 1.5, size=4096) * rng.choice([-1.0, 1.0], 4096)).astype(np.float32)
    d = quantize_tensor(x, kind="log8", octaves=12)
    y = dequantize_tensor(d)
    scale = np.max(np.abs(x))
    in_range = np.abs(x) >= scale * 2.0 ** (-11)  # away from the zero bucket
    rel = np.abs(y[in_range] - x[in_range]) / np.abs(x[in_range])
    # half-step of 12 octaves / 127 codes: 2^(6/127)-1 ~= 3.3%
    assert np.max(rel) < 0.04
    assert np.all(np.sign(y[in_range]) == np.sign(x[in_range]))


def test_log8_zero_bucket():
    x = np.array([0.0, 1.0, -1.0, 1e-12], np.float32)
    y = dequantize_tensor(quantize_tensor(x, kind="log8", octaves=12))
    assert y[0] == 0.0
    assert y[3] == 0.0  # >= 12 octaves below max -> zero bucket
    np.testing.assert_allclose(y[1:3], x[1:3], rtol=0.04)


def test_log8_all_zero_tensor():
    x = np.zeros(64, np.float32)
    y = dequantize_tensor(quantize_tensor(x, kind="log8"))
    assert np.all(y == 0.0)


def test_int8_roundtrip_absolute_error_bound():
    rng = np.random.default_rng(1)
    x = rng.normal(size=4096).astype(np.float32)
    y = dequantize_tensor(quantize_tensor(x, kind="int8"))
    scale = np.max(np.abs(x))
    assert np.max(np.abs(y - x)) <= scale / 127.0 * 0.5 + 1e-6
    # exact zero stays exact (offset-128 code)
    assert dequantize_tensor(quantize_tensor(np.zeros(8, np.float32), kind="int8"))[0] == 0.0


def test_quantize_params_size_threshold():
    tree = {
        "dense": {"kernel": np.ones((64, 64), np.float32), "bias": np.ones(64, np.float32)},
        "step": np.int32(7),
    }
    q, stats = quantize_params(tree, min_size=1024)
    # bias kept fp32; the int scalar (numpy, has .shape) is also a kept leaf
    assert stats["quantized"] == 1 and stats["kept"] == 2
    # small tensor exact, int leaf untouched
    np.testing.assert_array_equal(q["dense"]["bias"], tree["dense"]["bias"])
    assert q["step"] == 7
    out = dequantize_params(q)
    np.testing.assert_allclose(out["dense"]["kernel"], tree["dense"]["kernel"], rtol=0.04)


def test_payload_roundtrip_through_ckpt_io(tmp_path):
    rng = np.random.default_rng(2)
    payload = {
        "params": {"w": rng.normal(size=(128, 32)).astype(np.float32) * 0.02},
        "opt_state": {"mu": np.zeros((128, 32), np.float32)},
        "cfg": {"d_model": 32, "seq_len": 128},
        "train_state": {"epoch": 3, "cutoff": 65},
    }
    qp, stats = quantize_payload(payload, min_size=64)
    assert "opt_state" not in qp  # serving artifacts drop optimizer state
    assert is_quantized_payload(qp)
    path = str(tmp_path / "tiny.q8.msgpack")
    ckpt_io.save_checkpoint(path, qp)
    loaded = ckpt_io.load_checkpoint(path)  # transparent dequantize
    assert not is_quantized_payload(loaded)
    assert loaded["cfg"]["d_model"] == 32
    assert loaded["train_state"]["cutoff"] == 65
    w = np.asarray(loaded["params"]["w"])
    assert w.dtype == np.float32
    scale = np.max(np.abs(payload["params"]["w"]))
    assert np.max(np.abs(w - payload["params"]["w"])) < scale * 0.04


def test_dequantize_payload_is_identity_on_plain_payload_keys():
    payload = {"params": {"w": np.ones(4, np.float32)}, "cfg": {"x": 1}}
    qp, _ = quantize_payload(payload, min_size=1 << 30)  # nothing quantized
    out = dequantize_payload(qp)
    np.testing.assert_array_equal(out["params"]["w"], payload["params"]["w"])
    assert "quantized" not in out


def test_cli_smoke(tmp_path, capsys):
    from scripts.quantize_ckpt import main

    rng = np.random.default_rng(3)
    src = str(tmp_path / "model.msgpack")
    ckpt_io.save_checkpoint(src, {
        "params": {"k": rng.normal(size=(256, 16)).astype(np.float32)},
        "opt_state": {"m": np.zeros((256, 16), np.float32)},
        "cfg": {"d_model": 16},
        "train_state": {"epoch": 1},
    })
    main(["--ckpt", src])
    out = capsys.readouterr().out
    assert "quantized 1 tensors" in out
    qpath = str(tmp_path / "model.q8.msgpack")
    loaded = ckpt_io.load_checkpoint(qpath)
    assert "opt_state" not in loaded and "params" in loaded
    # already-quantized input is refused
    with pytest.raises(SystemExit):
        main(["--ckpt", qpath])
