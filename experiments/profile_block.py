"""Micro-profile of ONE FixedSpectralBlock at the flagship micro-batch shape.

Attributes the per-layer train-step cost (experiments/profile_train_step.py
measured ~18 ms/layer/optimizer-step = ~2.3 ms/layer/micro-batch fwd+bwd)
between the spectral conv branch, the FFN branch, LayerNorms/gates, and
dropout — each timed as fwd+bwd through value_and_grad with the bench.py
fori_loop methodology.

Usage:  python -m experiments.profile_block [--iters 50]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def marginal_ms(fn, args, iters):
    """Time fn(*args) inside one fori_loop jit program; marginal ms/iter."""

    def loop(x, n):
        def body(i, c):
            y = fn(c, *args[1:])
            # renormalize so the carry never reaches a fixed point
            return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-12)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x))

    run = jax.jit(loop, static_argnums=1)
    x = args[0]
    float(run(x, 1))
    float(run(x, iters))

    def timed(n, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return max(timed(iters) - timed(1), 1e-9) / (iters - 1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--kernel", type=int, default=128)
    args = ap.parse_args()

    from spectral_tpu.models.backbone import FixedSpectralBlock, SpectralFFNTime
    from spectral_tpu.ops import matfft

    matfft.set_precision(jax.lax.Precision.DEFAULT)

    B, T, C = args.batch, args.seq, args.dim
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, C), jnp.float32)
    cutoff = jnp.int32(512)

    def grad_through(apply_fn, params):
        """fwd+bwd closure: scalar loss -> grads wrt params AND x."""

        def loss(x):
            y = apply_fn(params, x)
            return y, None

        def f(x):
            y = apply_fn(params, x)
            return jnp.sum(y * y)

        def fwdbwd(x):
            l, gx = jax.value_and_grad(f)(x)
            return gx + l  # fold the scalar in so nothing is DCE'd

        return fwdbwd

    results = {}

    # --- full block, matmul backend, with/without dropout -------------------
    for name, drop, det in [
        ("block fwd+bwd (dropout 0.1)", 0.1, False),
        ("block fwd+bwd (no dropout)", 0.0, True),
    ]:
        blk = FixedSpectralBlock(
            d_model=C, seq_len=T, kernel_len=args.kernel, transition_bins=16,
            dropout=drop, fft_backend="matmul", fft_precision="default",
        )
        params = blk.init(
            {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
            x, cutoff, det,
        )

        def apply_fn(p, xx, blk=blk, det=det):
            return blk.apply(
                p, xx, cutoff, det,
                rngs=None if det else {"dropout": jax.random.PRNGKey(3)},
            )

        results[name] = marginal_ms(grad_through(apply_fn, params), (x,), args.iters)
        print(f"{name:48s} {results[name]:7.3f} ms", flush=True)

    # --- block forward only --------------------------------------------------
    blk = FixedSpectralBlock(
        d_model=C, seq_len=T, kernel_len=args.kernel, transition_bins=16,
        dropout=0.0, fft_backend="matmul", fft_precision="default",
    )
    params = blk.init(jax.random.PRNGKey(1), x, cutoff, True)
    fwd = lambda xx: blk.apply(params, xx, cutoff, True)
    results["block fwd only"] = marginal_ms(fwd, (x,), args.iters)
    print(f"{'block fwd only':48s} {results['block fwd only']:7.3f} ms", flush=True)

    # --- FFN branch alone -----------------------------------------------------
    ffn = SpectralFFNTime(C, 2, 0.0)
    fparams = ffn.init(jax.random.PRNGKey(1), x, True)
    fapply = lambda p, xx: ffn.apply(p, xx, True)
    results["ffn fwd+bwd"] = marginal_ms(grad_through(fapply, fparams), (x,), args.iters)
    print(f"{'ffn fwd+bwd':48s} {results['ffn fwd+bwd']:7.3f} ms", flush=True)

    # --- conv via spectral_conv_matmul alone ---------------------------------
    from spectral_tpu.ops.fftc import conv_n_fft, kernel_rfft
    from spectral_tpu.ops.matfft import spectral_conv_matmul

    n_fft = conv_n_fft(T, args.kernel)
    kern = jax.random.normal(jax.random.PRNGKey(4), (args.kernel,)) * 0.01
    h = kernel_rfft(kern, n_fft)

    def conv_fb(xx):
        def f(xx):
            y = spectral_conv_matmul(
                jnp.swapaxes(xx, 1, 2), h, n_fft, precision=jax.lax.Precision.DEFAULT
            )
            return jnp.sum(y * y)

        l, g = jax.value_and_grad(f)(xx)
        return g + l

    results["conv (matmul fft) fwd+bwd"] = marginal_ms(conv_fb, (x,), args.iters)
    print(f"{'conv (matmul fft) fwd+bwd':48s} {results['conv (matmul fft) fwd+bwd']:7.3f} ms", flush=True)

    def conv_fwd(xx):
        y = spectral_conv_matmul(
            jnp.swapaxes(xx, 1, 2), h, n_fft, precision=jax.lax.Precision.DEFAULT
        )
        return jnp.swapaxes(y, 1, 2)

    results["conv (matmul fft) fwd only"] = marginal_ms(conv_fwd, (x,), args.iters)
    print(f"{'conv (matmul fft) fwd only':48s} {results['conv (matmul fft) fwd only']:7.3f} ms", flush=True)

    # --- xla fft conv for contrast -------------------------------------------
    from spectral_tpu.ops.fftc import irfft_time, rfft_time

    def conv_xla_fb(xx):
        def f(xx):
            xf = rfft_time(xx, n_fft)
            yf = xf * h[None, :, None]
            y = irfft_time(yf, n_fft, T)
            return jnp.sum(y * y)

        l, g = jax.value_and_grad(f)(xx)
        return g + l

    results["conv (xla fft) fwd+bwd"] = marginal_ms(conv_xla_fb, (x,), args.iters)
    print(f"{'conv (xla fft) fwd+bwd':48s} {results['conv (xla fft) fwd+bwd']:7.3f} ms", flush=True)

    blk_total = results["block fwd+bwd (no dropout)"]
    known = results["ffn fwd+bwd"] + results["conv (matmul fft) fwd+bwd"]
    print(f"\nblock(no dropout) {blk_total:.3f} = conv {results['conv (matmul fft) fwd+bwd']:.3f}"
          f" + ffn {results['ffn fwd+bwd']:.3f} + other {blk_total - known:.3f} ms")


if __name__ == "__main__":
    main()
