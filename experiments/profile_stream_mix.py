"""Chip A/B: streamed bandlimited kernel vs the XLA einsum path (round 4).

VERDICT r3 next #1: drive the north-star spectral mix toward the HBM
roofline with an explicitly pipelined kernel.  This experiment measures,
on the real chip, under BOTH harnesses of bench.py:

* marginal VMEM-resident loop (the old methodology — XLA keeps the carry
  in VMEM, so this is an upper bound);
* TRUE-HBM streamed >VMEM pools (the driver's roofline fraction — every
  iteration demonstrably moves the 2-pass x+y traffic).

Backends: "bandlimited" (XLA einsums — the r3 default), and
"bandlimited_stream" (ops/pallas_bandlimited.bandlimited_mix_stream, the
round-4 double-buffered panel pipeline), each at fp32-accurate (HIGHEST /
fp32 in-kernel dots) and bf16 fast mode.  Also verifies on-chip value
parity between the two backends first (Mosaic can reject what interpret
mode accepts).

Run (chip, background):
    python -m experiments.profile_stream_mix [--quick]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--seq", type=int, default=4096)
    args = ap.parse_args(argv)

    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import bench_spectral_mix, bench_spectral_mix_hbm
    from spectral_tpu.layers.spectral_layers import SpectralMixingLayer
    from spectral_tpu.ops import matfft
    from spectral_tpu.utils.profiling import HBM_PEAK_GBPS, detect_chip

    peak = HBM_PEAK_GBPS[detect_chip()]
    print(f"backend={jax.default_backend()} peak={peak} GB/s", flush=True)

    # --- on-chip parity first (both precisions)
    B, T, D = 2, args.seq, 256
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, D), jnp.float32)
    layer_e = SpectralMixingLayer(embed_dim=D, fft_backend="bandlimited")
    layer_s = SpectralMixingLayer(embed_dim=D, fft_backend="bandlimited_stream")
    params = layer_e.init(jax.random.PRNGKey(1), x)
    for prec, name in ((jax.lax.Precision.HIGHEST, "fp32"),
                       (jax.lax.Precision.DEFAULT, "bf16")):
        matfft.set_precision(prec)
        ye = np.asarray(jax.jit(layer_e.apply)(params, x))
        ys = np.asarray(jax.jit(layer_s.apply)(params, x))
        scale = np.abs(ye).max()
        err = np.abs(ys - ye).max() / scale
        # fp32: the stream kernel's split-mantissa scheme is ~6e-6 relative
        # to the einsum HIGHEST oracle (itself a 3-pass bf16 scheme)
        tol = 2e-5 if name == "fp32" else 2e-2
        print(f"parity[{name}]: max rel err {err:.2e} (scale {scale:.2f})",
              flush=True)
        assert err < tol, f"{name} parity {err} > {tol}"

    # --- "mid" mode error probe (round 5): 2-dot scheme — split TABLES
    # against bf16-rounded values.  Direct kernel vs the HIGHEST einsum
    # oracle (same operands), expected between fast (~1e-4) and accurate
    # (~6e-6).
    from spectral_tpu.ops.pallas_bandlimited import (
        bandlimited_mix_reference,
        bandlimited_mix_stream,
    )

    k = min(256 // 2, args.seq // 2)
    wr = jax.random.normal(jax.random.PRNGKey(3), (k, D)) / args.seq
    wi = jax.random.normal(jax.random.PRNGKey(4), (k, D)) / args.seq
    bias = jnp.zeros((D,), jnp.float32)
    y_ref = np.asarray(jax.jit(bandlimited_mix_reference)(x, wr, wi, bias))
    scale = np.abs(y_ref).max()
    for cdt in ("float32", "mid", "bfloat16"):
        y_m = np.asarray(jax.jit(
            lambda x, wr, wi, bias, c=cdt: bandlimited_mix_stream(
                x, wr, wi, bias, c))(x, wr, wi, bias))
        print(f"mode[{cdt}]: max rel err vs HIGHEST oracle "
              f"{np.abs(y_m - y_ref).max() / scale:.2e}", flush=True)

    iters = 10 if args.quick else 50
    out = {}
    for backend in ("bandlimited", "bandlimited_stream"):
        for prec, pname in ((jax.lax.Precision.HIGHEST, "fp32"),
                            (jax.lax.Precision.DEFAULT, "bf16")):
            matfft.set_precision(prec)
            tok_h, dt_h, gbps = bench_spectral_mix_hbm(
                seq=args.seq, iters=iters, backend=backend)
            tok_v, dt_v = bench_spectral_mix(
                seq=args.seq, iters=iters, backend=backend)
            key = f"{backend}/{pname}"
            out[key] = {
                "hbm_tokens_per_sec": round(tok_h, 1),
                "hbm_us_per_iter": round(dt_h * 1e6, 1),
                "roofline_fraction": round(gbps / peak, 3),
                "vmem_resident_us": round(dt_v * 1e6, 1),
            }
            print(f"{key}: HBM {dt_h*1e6:.1f} us/iter "
                  f"({gbps/peak:.3f} of roofline), vmem {dt_v*1e6:.1f} us",
                  flush=True)
    # mid mode rides the pooled harness directly (no layer plumbing)
    tok_h, dt_h, gbps = bench_spectral_mix_hbm(
        seq=args.seq, iters=iters, backend="bandlimited_stream",
        compute_dtype="mid")
    out["bandlimited_stream/mid"] = {
        "hbm_tokens_per_sec": round(tok_h, 1),
        "hbm_us_per_iter": round(dt_h * 1e6, 1),
        "roofline_fraction": round(gbps / peak, 3),
    }
    print(f"bandlimited_stream/mid: HBM {dt_h*1e6:.1f} us/iter "
          f"({gbps/peak:.3f} of roofline)", flush=True)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
