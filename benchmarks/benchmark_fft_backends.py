"""FFT backend shootout: XLA (VPU) vs matmul four-step (MXU).

Times the spectral-conv hot path (rfft -> filter -> irfft) at the flagship
shape with both backends, using the tunnel-safe methodology from bench.py:
the whole timing loop inside one jit program (lax.fori_loop), marginal cost
t(N) - t(1), sync by value fetch.

Run: python benchmarks/benchmark_fft_backends.py [--seq 4096] [--iters 100]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from spectral_tpu.utils.platform import apply_platform_env


def main() -> None:
    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectral_tpu.ops import matfft
    from spectral_tpu.ops.fftc import next_pow2

    B, T, C = args.batch, args.seq, args.dim
    NF = next_pow2(2 * T)
    rng = np.random.default_rng(1)
    # build the complex filter ON DEVICE from two real transfers — complex
    # host<->device transfers are UNIMPLEMENTED on the tunneled TPU backend
    h = jax.lax.complex(
        jnp.asarray(rng.standard_normal(NF // 2 + 1).astype(np.float32)),
        jnp.asarray(rng.standard_normal(NF // 2 + 1).astype(np.float32)),
    )

    def xla_conv(x, hh):  # (B, C, T), T minor
        y = jnp.fft.irfft(jnp.fft.rfft(x, n=NF, axis=-1) * hh, n=NF, axis=-1)[..., :T]
        return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-12)

    def mat_conv(x, hh):
        y = matfft.spectral_conv_matmul(x, hh, NF)
        return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-12)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, C, T), jnp.float32)
    xs = [jax.random.normal(k, x0.shape, x0.dtype) for k in jax.random.split(jax.random.PRNGKey(9), 4)]

    def marginal_ms(f, n):
        # h rides as an ARGUMENT: a device-resident complex closure constant
        # would be value-fetched at trace time (broken transfer, see above)
        def loop(x, hh, k):
            return jnp.sum(jax.lax.fori_loop(0, k, lambda i, c: f(c, hh), x))

        g = jax.jit(loop, static_argnums=(2,))
        float(g(x0, h, 1))
        float(g(x0, h, n))

        def timed(k, reps=2):
            best = float("inf")
            for r in range(reps):
                t0 = time.perf_counter()
                float(g(xs[(k + r) % len(xs)], h, k))
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(n) - timed(1)) / (n - 1) * 1e3

    rows = [("xla (jnp.fft, VPU)", xla_conv)]
    if not NF & (NF - 1):
        rows.append(("matmul HIGHEST (MXU, fp32-accurate)", mat_conv))
    print(f"spectral conv (B={B}, C={C}, T={T}, n_fft={NF}), marginal ms/iter:")
    results = {}
    for name, f in rows:
        ms = marginal_ms(f, args.iters)
        results[name] = ms
        toks = B * T / (ms / 1e3)
        print(f"  {name:40s} {ms:8.3f} ms  ({toks/1e6:.1f}M tokens/s)", flush=True)

    matfft.set_precision(jax.lax.Precision.DEFAULT)
    ms = marginal_ms(mat_conv, args.iters)
    toks = B * T / (ms / 1e3)
    print(f"  {'matmul DEFAULT (MXU, bf16 inputs)':40s} {ms:8.3f} ms  ({toks/1e6:.1f}M tokens/s)", flush=True)


if __name__ == "__main__":
    main()
