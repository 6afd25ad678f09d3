"""HF-model converter: flax + torch paths, save/load roundtrip, reconstruction."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from spectral_tpu.core.llamaizer import FFTConverter, convert_dense_weight


class TestConvertDenseWeight:
    def test_sparsity_and_reconstruction(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((16, 64)).astype(np.float32) * 0.02
        entry = convert_dense_weight(w, sparsity=0.25)
        ri = entry["weight_freq_ri"]
        nz = np.count_nonzero(np.abs(ri[0] + 1j * ri[1]) > 1e-12)
        assert nz <= 16 * 17  # ~k=16 per row (+ticks for magnitude ties)
        # reconstruction error bounded (top-25% of spectrum)
        w_rec = np.fft.ifft(ri[0] + 1j * ri[1], axis=-1).real
        rel = np.linalg.norm(w_rec - w) / np.linalg.norm(w)
        assert rel < 0.95  # lossy, but correlated

    def test_full_sparsity_exact(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((8, 32)).astype(np.float32)
        entry = convert_dense_weight(w, sparsity=1.0)
        ri = entry["weight_freq_ri"]
        w_rec = np.fft.ifft(ri[0] + 1j * ri[1], axis=-1).real
        np.testing.assert_allclose(w_rec, w, atol=1e-4)


class TestConvertModels:
    def test_flax_params_conversion_skips_embed(self):
        from flax import linen as nn

        class Toy(nn.Module):
            @nn.compact
            def __call__(self, x):
                e = nn.Embed(10, 8, name="embed")(x)
                h = nn.Dense(16, name="mlp_in")(e)
                h = nn.Dense(8, name="mlp_out")(h)
                return nn.Dense(10, name="lm_head")(h)

        model = Toy()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))["params"]
        freq_layers, report = FFTConverter.convert_params(params, sparsity=0.5)
        assert set(freq_layers) == {"mlp_in/kernel", "mlp_out/kernel"}  # embed + lm_head skipped
        assert report["num_layers"] == 2
        assert report["compression"] > 1.5

    def test_torch_model_conversion(self):
        torch.manual_seed(0)
        model = torch.nn.Sequential(
            torch.nn.Linear(32, 64),
            torch.nn.ReLU(),
            torch.nn.Linear(64, 32),
        )
        freq_layers, report = FFTConverter.convert_torch_model(model, sparsity=0.25)
        assert report["num_layers"] == 2
        for entry in freq_layers.values():
            assert "bias" in entry
            assert entry["weight_freq_ri"].shape[0] == 2

    def test_save_load_roundtrip(self, tmp_path):
        torch.manual_seed(1)
        model = torch.nn.Sequential(torch.nn.Linear(16, 8))
        freq_layers, report = FFTConverter.convert_torch_model(model, sparsity=0.5)
        FFTConverter.save_fft_model(freq_layers, report, str(tmp_path / "fft_model"))
        assert os.path.exists(tmp_path / "fft_model" / "weights.fft")
        with open(tmp_path / "fft_model" / "config.json") as f:
            cfg = json.load(f)
        assert cfg["num_layers"] == 1
        loaded, rep2 = FFTConverter.load_fft_model(str(tmp_path / "fft_model"))
        key = next(iter(freq_layers))
        np.testing.assert_allclose(loaded[key]["weight_freq_ri"], freq_layers[key]["weight_freq_ri"], atol=1e-6)
