"""Post-training checkpoint quantization: 4x-smaller serving artifacts.

The reference ships two quantizer designs but never applies either to its
own trained checkpoints (zero_materialize.py:455-568 defines log8 and
sweeps it on synthetic spectra; no script quantizes a state dict).  Here
quantization is a deployment feature: ``quantize_payload`` turns a trained
checkpoint into a ~4x smaller serving artifact (uint8 planes + one fp32
scale per tensor), and ``train.ckpt.load_checkpoint`` transparently
dequantizes, so every eval / generate / serve CLI accepts a ``.q8``
checkpoint unchanged.

Two schemes, both per-tensor scaled (the reference's fixed [-8, 8] log2
window clamps real weight tensors, whose per-tensor max spans decades):

- ``log8`` (default): 1 sign bit + 7 bits of log2 magnitude spanning
  ``octaves`` octaves below the per-tensor max — constant RELATIVE error
  (~2.3% half-step at the default 12 octaves).  Frequency-domain
  parameters follow a 1/f power law (the reference's own rationale for
  log8, zero_materialize.py:455-468), so constant relative error fits
  them better than int8's constant absolute error.
- ``int8``: symmetric linear (q = round(127 x / max|x|)), the standard
  baseline, kept for comparison studies.

Quantization is host-side numpy (no device work): serving startup cost is
one dequantize pass at load.
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np

_MARKER = "__q8__"
# payload subtrees that are metadata, never parameters
_META_KEYS = ("cfg", "train_state", "quantized")


def quantize_tensor(x: np.ndarray, kind: str = "log8", octaves: int = 12) -> dict:
    """Quantize one fp tensor to a uint8 plane + fp32 scale (host-side)."""
    x = np.asarray(x, np.float32)
    scale = float(np.max(np.abs(x))) if x.size else 0.0
    if kind == "log8":
        if scale == 0.0:
            q = np.zeros(x.shape, np.uint8)
        else:
            sign = (x >= 0).astype(np.uint8)
            # log2(|x|/scale) in [-octaves, 0] -> 7-bit code [0, 127]
            with np.errstate(divide="ignore"):
                logm = np.log2(np.abs(x) / scale, where=np.abs(x) > 0,
                               out=np.full(x.shape, -np.inf, np.float32))
            code = np.clip((logm + octaves) / octaves * 127.0, 0.0, 127.0)
            # zeros (and anything >= octaves below max) round to code 0,
            # which decodes to scale * 2^-octaves -- effectively zero
            code = np.where(np.isfinite(logm), np.rint(code), 0.0)
            q = ((sign << 7) | code.astype(np.uint8)).astype(np.uint8)
    elif kind == "int8":
        q = np.rint(np.clip(x / scale if scale else x, -1.0, 1.0) * 127.0)
        # store offset by 128 so both schemes ride one uint8 plane
        q = (q + 128.0).astype(np.uint8)
    else:
        raise ValueError(f"unknown quantization kind {kind!r}")
    return {_MARKER: kind, "q": q, "scale": np.float32(scale), "octaves": np.int32(octaves)}


def dequantize_tensor(d: dict) -> np.ndarray:
    kind = d[_MARKER]
    # msgpack may round-trip the marker as bytes
    kind = kind.decode() if isinstance(kind, bytes) else str(kind)
    q = np.asarray(d["q"], np.uint8)
    scale = float(np.asarray(d["scale"]))
    if kind == "log8":
        octaves = float(np.asarray(d["octaves"]))
        sign = ((q >> 7) & 1).astype(np.float32) * 2.0 - 1.0
        code = (q & 0x7F).astype(np.float32)
        mag = scale * np.exp2(code / 127.0 * octaves - octaves)
        # code 0 is the zero bucket (anything >= `octaves` below max)
        return np.where(code == 0, 0.0, sign * mag).astype(np.float32)
    if kind == "int8":
        return ((q.astype(np.float32) - 128.0) / 127.0 * scale).astype(np.float32)
    raise ValueError(f"unknown quantization kind {kind!r}")


def is_quantized_leaf(node: Any) -> bool:
    return isinstance(node, dict) and _MARKER in node


def _walk(tree: Any, fn) -> Any:
    """Map fn over array leaves of a nested dict/list tree (host-side)."""
    if is_quantized_leaf(tree):
        return fn(tree)
    if isinstance(tree, dict):
        return {k: _walk(v, fn) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_walk(v, fn) for v in tree)
    return fn(tree)


def quantize_params(tree: Any, *, kind: str = "log8", octaves: int = 12,
                    min_size: int = 1024) -> Tuple[Any, dict]:
    """Quantize every float tensor with >= min_size elements.

    Small tensors (biases, norms, scalar gates) stay fp32: they are a
    rounding error of the artifact size and carry outsized sensitivity.
    Returns (quantized tree, stats dict).
    """
    stats = {"quantized": 0, "kept": 0, "bytes_in": 0, "bytes_out": 0}

    def leaf(x):
        if not hasattr(x, "shape"):
            return x
        a = np.asarray(x)
        stats["bytes_in"] += a.nbytes
        if a.dtype.kind == "f" and a.size >= min_size:
            d = quantize_tensor(a, kind=kind, octaves=octaves)
            stats["quantized"] += 1
            stats["bytes_out"] += d["q"].nbytes + 8
            return d
        stats["kept"] += 1
        stats["bytes_out"] += a.nbytes
        return a

    return _walk(tree, leaf), stats


def dequantize_params(tree: Any) -> Any:
    return _walk(tree, lambda x: dequantize_tensor(x) if is_quantized_leaf(x) else x)


def quantize_payload(payload: dict, *, kind: str = "log8", octaves: int = 12,
                     min_size: int = 1024, keep_opt_state: bool = False) -> Tuple[dict, dict]:
    """Quantize a checkpoint payload into a serving artifact.

    Every param subtree is quantized; ``cfg``/``train_state`` metadata pass
    through; ``opt_state`` is dropped (serving artifacts don't resume
    training) unless keep_opt_state.
    """
    out: dict = {}
    stats_all = {"quantized": 0, "kept": 0, "bytes_in": 0, "bytes_out": 0}
    for k, v in payload.items():
        if k == "opt_state" and not keep_opt_state:
            continue
        if k in _META_KEYS or not isinstance(v, (dict, list, tuple)):
            out[k] = v
            continue
        q, stats = quantize_params(v, kind=kind, octaves=octaves, min_size=min_size)
        out[k] = q
        for s in stats_all:
            stats_all[s] += stats[s]
    out["quantized"] = {"kind": kind, "octaves": np.int32(octaves), "min_size": np.int32(min_size)}
    return out, stats_all


def is_quantized_payload(payload: dict) -> bool:
    return isinstance(payload, dict) and "quantized" in payload


def dequantize_payload(payload: dict) -> dict:
    out = {}
    for k, v in payload.items():
        if k == "quantized":
            continue
        out[k] = dequantize_params(v) if isinstance(v, (dict, list, tuple)) else v
    return out
