"""Quantize a trained checkpoint into a ~4x smaller serving artifact.

The reference defines log8 quantization (zero_materialize.py:455-568)
but never applies it to its own trained checkpoints; here it is a real
deployment step.  The output is a normal msgpack checkpoint with uint8
parameter planes + per-tensor fp32 scales; ``load_checkpoint``
transparently dequantizes it, so eval_ckpt / eval_chunk_ckpt /
generate_* / serve_fleet accept the artifact unchanged:

    python -m scripts.quantize_ckpt --ckpt checkpoints/code_d512x6.msgpack
    python -m scripts.eval_ckpt --ckpt checkpoints/code_d512x6.q8.msgpack ...

Pure host-side work (numpy); runs fine while the chip is busy.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")  # host-only work
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default=None,
                    help="output path (default: <ckpt>.q8.msgpack next to the input)")
    ap.add_argument("--kind", choices=["log8", "int8"], default="log8")
    ap.add_argument("--octaves", type=int, default=12,
                    help="log8 dynamic range below per-tensor max (default 12)")
    ap.add_argument("--min-size", type=int, default=1024,
                    help="tensors smaller than this stay fp32")
    ap.add_argument("--keep-opt-state", action="store_true",
                    help="keep optimizer state (serving artifacts drop it)")
    args = ap.parse_args(argv)

    from spectral_tpu.train.ckpt import load_checkpoint, save_checkpoint
    from spectral_tpu.train.quantize import dequantize_params, quantize_payload

    with open(args.ckpt, "rb") as f:
        in_bytes = len(f.read())
    from flax import serialization

    with open(args.ckpt, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if "quantized" in payload:
        raise SystemExit(f"{args.ckpt} is already quantized")

    qpayload, stats = quantize_payload(
        payload, kind=args.kind, octaves=args.octaves,
        min_size=args.min_size, keep_opt_state=args.keep_opt_state,
    )

    # report worst-case round-trip error over the quantized param tree
    worst_rel = 0.0
    for key in qpayload:
        if key in ("cfg", "train_state", "quantized") or not isinstance(payload.get(key), dict):
            continue
        orig = payload[key]
        deq = dequantize_params(qpayload[key])
        flat_o = _flat(orig)
        flat_d = _flat(deq)
        for name, o in flat_o.items():
            o = np.asarray(o)
            if o.dtype.kind != "f" or o.size < args.min_size:
                continue
            d = np.asarray(flat_d[name])
            denom = max(float(np.max(np.abs(o))), 1e-12)
            worst_rel = max(worst_rel, float(np.max(np.abs(d - o))) / denom)

    out = args.out or (os.path.splitext(args.ckpt)[0] + ".q8.msgpack")
    save_checkpoint(out, qpayload)
    out_bytes = os.path.getsize(out)
    print(f"quantized {stats['quantized']} tensors ({args.kind}), kept {stats['kept']} fp32")
    print(f"param bytes {stats['bytes_in']:,} -> {stats['bytes_out']:,} "
          f"({stats['bytes_in'] / max(stats['bytes_out'], 1):.2f}x)")
    print(f"file  bytes {in_bytes:,} -> {out_bytes:,} ({in_bytes / out_bytes:.2f}x)")
    print(f"worst per-tensor max-normalized round-trip error: {worst_rel:.4f}")
    print(f"wrote {out} (+ .sha256 sidecar)")


def _flat(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flat(v, f"{prefix}/{k}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flat(v, f"{prefix}/{i}"))
    elif hasattr(tree, "shape"):
        out[prefix] = tree
    return out


if __name__ == "__main__":
    main()
