"""Checkpoint IO with SHA-256 integrity sidecars.

Reference: fft_lm/ckpt_io.py:40-66 — every checkpoint gets a ``.sha256``
sidecar, verified before load (the reference's explicit pickle-security
mitigation; kept here even though msgpack is not executable).

Format: a flax-serialized msgpack dict
  {"params": pytree, "opt_state": pytree, "cfg": dict, "train_state": dict}
``train_state`` carries the curriculum state the reference persists so resume
"doesn't regress": epoch/step/cutoff/best_loss_at_cutoff/
steps_without_improvement (train_bicameral.py:119-137).
Architecture auto-detection sniffs param-tree keys like the reference sniffs
state-dict keys (generate_chunk_simple.py:55-61).
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def save_checkpoint(path: str, payload: dict) -> str:
    """Serialize a pytree dict to msgpack and write a ``.sha256`` sidecar."""
    payload = jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, payload)
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    digest = _sha256_file(path)
    with open(path + ".sha256", "w") as f:
        f.write(f"{digest}  {os.path.basename(path)}\n")
    return digest


def verify_checkpoint(path: str) -> None:
    """Raise if the sidecar digest doesn't match the file."""
    sidecar = path + ".sha256"
    if not os.path.exists(sidecar):
        raise FileNotFoundError(f"Missing integrity sidecar: {sidecar}")
    with open(sidecar) as f:
        expected = f.read().split()[0]
    actual = _sha256_file(path)
    if actual != expected:
        raise ValueError(f"Checkpoint integrity failure: {path}\n  expected {expected}\n  actual   {actual}")


def load_checkpoint(path: str, *, verify: bool = True) -> dict:
    """Verify-then-load (refuses to read a tampered/corrupt file).

    Quantized serving artifacts (train/quantize.py) are transparently
    dequantized, so every eval/generate/serve CLI accepts a ``.q8``
    checkpoint unchanged.
    """
    if verify:
        verify_checkpoint(path)
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    from spectral_tpu.train.quantize import dequantize_payload, is_quantized_payload

    if is_quantized_payload(payload):
        payload = dequantize_payload(payload)
    return payload


# ---------------------------------------------------------------------------
# Flexible / partial restore (reference: train_fixed_full.py:824-876)
# ---------------------------------------------------------------------------


def load_params_flexible(current_params, saved_params) -> Tuple[Any, list, list]:
    """Load even if a few tensors changed shape (e.g. seq_len change).

    Only known-safe tensors are auto-resized: 1-D ``gate_freq_logits`` (copy
    the overlapping prefix, keep the current init for new bins).  Everything
    else with a shape mismatch is skipped (current value kept).

    Returns (params, resized_paths, skipped_paths).
    """
    resized, skipped = [], []

    flat_cur = jax.tree_util.tree_flatten_with_path(current_params)[0]
    flat_saved = {
        tuple(str(getattr(k, "key", k)) for k in path): v
        for path, v in jax.tree_util.tree_flatten_with_path(saved_params)[0]
    }

    out = {}
    for path, cur in flat_cur:
        key = tuple(str(getattr(k, "key", k)) for k in path)
        name = "/".join(key)
        if key not in flat_saved:
            out[key] = cur
            continue
        v = np.asarray(flat_saved[key])
        cur_np = np.asarray(cur)
        if cur_np.shape == v.shape:
            out[key] = v
        elif key[-1] == "gate_freq_logits" and v.ndim == 1 and cur_np.ndim == 1:
            tgt = cur_np.copy()
            n = min(tgt.shape[0], v.shape[0])
            tgt[:n] = v[:n]
            out[key] = tgt
            resized.append((name, v.shape, tgt.shape))
        else:
            out[key] = cur_np
            skipped.append((name, v.shape, cur_np.shape))

    # rebuild the tree with original structure
    treedef = jax.tree_util.tree_structure(current_params)
    ordered = [jnp.asarray(out[tuple(str(getattr(k, "key", k)) for k in path)]) for path, _ in flat_cur]
    return jax.tree_util.tree_unflatten(treedef, ordered), resized, skipped


def detect_architecture(params: dict) -> dict:
    """Sniff architecture flags from param-tree keys (ckpt auto-detect).

    Mirrors generate_chunk_simple.py:55-61 which sniffs torch state-dict keys
    (ema/alpha_freq/phase_weights/phase_head).
    """
    names = {
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    blob = " ".join(names)
    return {
        "bicameral": "alpha_freq" in blob,
        "frequency_native": ("phase_weights" in blob) and ("alpha_freq" not in blob),
        "use_ema": "ema" in blob,
        "phase_clock": "phase_head" in blob,
        "dual_head": "token_head" in blob,
        "segmentation": "seg_head" in blob,
    }
