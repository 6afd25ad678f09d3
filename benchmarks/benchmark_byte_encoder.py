"""Byte->spectral encoder benchmark: Pallas MXU kernel vs fft+gather vs naive.

Mirror of the reference's benchmark_triton_vs_pytorch
(triton_byte_encoder.py:196-239): the reference's byte encoding was 50 ms of
a 56 ms batch (the bottleneck); its Triton target was 3-5 ms.  Here the
fft+gather reference is already O(T log T + T D) and the Pallas kernel fuses
normalize+DFT onto the MXU.

Run: python benchmarks/benchmark_byte_encoder.py [--quick]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=30):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def naive_features(byte_ids, embed_dim):
    """The reference's O(T^2 D) loop formulation (for scale only)."""
    B, T = byte_ids.shape
    signal = byte_ids.astype(jnp.float32) / 127.5 - 1.0
    t = jnp.arange(T, dtype=jnp.float32)
    feats = []
    for p in range(T):
        row = []
        for d in range(embed_dim):
            f = (p * d) % T
            ang = 2 * jnp.pi * f * t / T
            re = jnp.sum(signal * jnp.cos(ang), axis=1)
            im = jnp.sum(signal * jnp.sin(ang), axis=1)
            row.append(jnp.sqrt(re**2 + im**2))
        feats.append(jnp.stack(row, axis=-1))
    return jnp.stack(feats, axis=1)


def main():
    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from spectral_tpu.layers.byte_spectral import byte_dft_features
    from spectral_tpu.ops.pallas_byte import byte_encode_pallas

    B, T, D = (4, 128, 64) if args.quick else (16, 512, 256)
    x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (B, T)).astype(np.int32))
    print(f"device: {jax.devices()[0]}  shape: B{B} T{T} D{D}")

    t_ref = timeit(jax.jit(lambda x: byte_dft_features(x, D)), x)
    print(f"fft+gather reference : {t_ref*1e3:8.3f} ms/batch")

    try:
        t_pal = timeit(jax.jit(lambda x: byte_encode_pallas(x, D)), x)
        print(f"pallas MXU kernel    : {t_pal*1e3:8.3f} ms/batch  ({t_ref/t_pal:.2f}x vs reference)")
    except Exception as e:
        print(f"pallas kernel unavailable here: {str(e)[:80]}")

    if args.quick:
        t_naive = timeit(jax.jit(lambda x: naive_features(x, D)), x, iters=3)
        print(f"naive O(T^2 D) loop  : {t_naive*1e3:8.3f} ms/batch  ({t_naive/t_ref:.0f}x slower)")


if __name__ == "__main__":
    main()
