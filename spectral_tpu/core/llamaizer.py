"""Llamaizer: convert pretrained models to sparse-frequency format.

Reference: fft_tensor/llamaizer.py — replace every linear layer's dense
weight (skipping embeddings and lm_head) with top-k sparse frequency
coefficients at a given sparsity; save format = ``weights.fft`` +
``config.json`` with the average compression.

TPU-native surface: the converter walks either

* a **flax params pytree** (2-D ``kernel`` leaves = Dense layers), or
* a **torch nn.Module** (``nn.Linear`` weights) — covering HuggingFace
  transformers models (CPU torch is available; the actual download requires
  network access, so ``FFTLlama.from_pretrained`` raises a clear error
  offline and everything else works on local models).

CLI:  python -m spectral_tpu.core.llamaizer --model <hf-name-or-path> --out <dir>
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def convert_dense_weight(w: np.ndarray, sparsity: float = 0.01) -> dict:
    """Dense (out, in) weight -> per-row top-k sparse frequency rep.

    Matches the reference conversion (llamaizer.py:64-92): FFT along the
    input dim, keep top-k magnitudes per row.
    """
    w = jnp.asarray(w, jnp.float32)
    out_features, in_features = w.shape
    freq = jnp.fft.fft(w, axis=-1)
    k = max(1, int(in_features * sparsity))
    mag = jnp.abs(freq)
    kth = jnp.sort(mag, axis=-1)[:, -k][:, None]
    mask = (mag >= kth).astype(jnp.float32)
    sparse_freq = freq * mask
    return {
        "weight_freq_ri": np.stack([np.asarray(jnp.real(sparse_freq)), np.asarray(jnp.imag(sparse_freq))]),
        "in_features": in_features,
        "out_features": out_features,
        "sparsity": float(sparsity),
    }


def _compression_of(entry: dict) -> float:
    w = entry["weight_freq_ri"]
    nz = int(np.count_nonzero(np.abs(w[0] + 1j * w[1]) > 1e-12))
    return entry["in_features"] * entry["out_features"] / max(nz, 1)


DEFAULT_SKIP = ("embed", "lm_head", "head")


class FFTConverter:
    """Convert models to sparse-frequency weight storage."""

    @staticmethod
    def convert_params(params: dict, sparsity: float = 0.01, skip_layers=DEFAULT_SKIP, verbose: bool = False):
        """Convert a flax params pytree: every 2-D ``kernel`` leaf on a
        non-skipped path becomes a sparse-frequency entry.

        Returns (freq_layers dict keyed by path, report dict).
        """
        freq_layers = {}
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            names = [str(getattr(k, "key", k)) for k in path]
            name = "/".join(names)
            if names[-1] != "kernel" or np.ndim(leaf) != 2:
                continue
            if any(pat in name for pat in skip_layers):
                continue
            # flax kernels are (in, out); the converter stores (out, in)
            entry = convert_dense_weight(np.asarray(leaf).T, sparsity)
            freq_layers[name] = entry
            if verbose:
                print(
                    f"Converted {name}: {entry['in_features']}x{entry['out_features']} "
                    f"-> {_compression_of(entry):.1f}x compression"
                )
        report = {
            "num_layers": len(freq_layers),
            "compression": float(np.mean([_compression_of(e) for e in freq_layers.values()]))
            if freq_layers
            else 0.0,
        }
        return freq_layers, report

    @staticmethod
    def convert_torch_model(model, sparsity: float = 0.01, skip_layers=DEFAULT_SKIP, verbose: bool = False):
        """Convert a torch nn.Module (e.g. a HuggingFace model): every
        ``nn.Linear`` weight on a non-skipped path."""
        import torch
        import torch.nn as nn

        freq_layers = {}
        for name, module in model.named_modules():
            if not isinstance(module, nn.Linear):
                continue
            if any(pat in name for pat in skip_layers):
                continue
            with torch.no_grad():
                entry = convert_dense_weight(module.weight.detach().cpu().numpy(), sparsity)
                if module.bias is not None:
                    entry["bias"] = module.bias.detach().cpu().numpy()
            freq_layers[name] = entry
            if verbose:
                print(
                    f"Converted {name}: {entry['in_features']}x{entry['out_features']} "
                    f"-> {_compression_of(entry):.1f}x compression"
                )
        report = {
            "num_layers": len(freq_layers),
            "compression": float(np.mean([_compression_of(e) for e in freq_layers.values()]))
            if freq_layers
            else 0.0,
        }
        return freq_layers, report

    @staticmethod
    def save_fft_model(freq_layers: dict, report: dict, path: str) -> None:
        """Save format (reference llamaizer.py:142-182): ``weights.fft``
        (msgpack of the sparse coefficients) + ``config.json``."""
        from flax import serialization

        p = Path(path)
        p.mkdir(parents=True, exist_ok=True)
        with open(p / "weights.fft", "wb") as f:
            f.write(serialization.msgpack_serialize(jax.tree.map(np.asarray, freq_layers)))
        with open(p / "config.json", "w") as f:
            json.dump(report, f, indent=2)

    @staticmethod
    def load_fft_model(path: str) -> tuple[dict, dict]:
        from flax import serialization

        p = Path(path)
        with open(p / "weights.fft", "rb") as f:
            freq_layers = serialization.msgpack_restore(f.read())
        with open(p / "config.json") as f:
            report = json.load(f)
        return freq_layers, report


def _from_pretrained(model_name: str, auto_cls: str, sparsity: float, learn_phase: bool):
    try:
        import transformers

        cls = getattr(transformers, auto_cls)
        model = cls.from_pretrained(model_name)
    except Exception as e:  # offline / missing weights
        raise RuntimeError(
            f"Could not load {model_name!r} via transformers ({e}). "
            "In offline environments pass a local path or use "
            "FFTConverter.convert_torch_model / convert_params directly."
        ) from e
    freq_layers, report = FFTConverter.convert_torch_model(model, sparsity=sparsity, verbose=True)
    return model, freq_layers, report


class FFTLlama:
    """Llama converter entry point (reference llamaizer.py:185-260)."""

    @staticmethod
    def from_pretrained(model_name: str, load_in_fft: bool = True, sparsity: float = 0.01, learn_phase: bool = True):
        return _from_pretrained(model_name, "AutoModelForCausalLM", sparsity, learn_phase)


class FFTGPT:
    @staticmethod
    def from_pretrained(model_name: str, load_in_fft: bool = True, sparsity: float = 0.01, learn_phase: bool = True):
        return _from_pretrained(model_name, "AutoModelForCausalLM", sparsity, learn_phase)


class FFTBERT:
    @staticmethod
    def from_pretrained(model_name: str, load_in_fft: bool = True, sparsity: float = 0.01, learn_phase: bool = True):
        return _from_pretrained(model_name, "AutoModel", sparsity, learn_phase)


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True, help="HF model name or local path")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--sparsity", type=float, default=0.01)
    args = ap.parse_args(argv)

    model, freq_layers, report = FFTLlama.from_pretrained(args.model, sparsity=args.sparsity)
    FFTConverter.save_fft_model(freq_layers, report, args.out)
    print(f"Saved FFT model to {args.out}")
    print(f"Average compression: {report['compression']:.1f}x")


if __name__ == "__main__":
    main()
