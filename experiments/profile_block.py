"""Micro-profile of ONE FixedSpectralBlock at the flagship micro-batch shape.

Attributes the per-layer train-step cost (experiments/profile_train_step.py
measured ~18 ms/layer/optimizer-step = ~2.3 ms/layer/micro-batch fwd+bwd)
between the spectral conv branch, the FFN branch, param-grad paths, and
dropout — each timed as fwd+bwd through value_and_grad over (params, x)
with the bench.py fori_loop methodology.

Round-2 session findings (v5e, DEFAULT matfft precision, B4/T1024/C512):
  * grads wrt x only:   block 0.92 ms (no dropout) / 1.38 ms (dropout 0.1)
  * dropout alone is ~0.46 ms/block/micro — threefry bits are VPU-expensive.

Usage:  python -m experiments.profile_block [--iters 50]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def marginal_ms(fn, x, iters, extra_args=()):
    """Time fn(x, *extra_args) inside one fori_loop jit; marginal ms/iter.

    ``extra_args`` ride as jit ARGUMENTS (complex operands must be passed
    this way — a complex closure constant is value-fetched at trace time and
    dies on this backend)."""

    def loop(x, extra, n):
        def body(i, c):
            y = fn(c, *extra)
            return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-12)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x))

    run = jax.jit(loop, static_argnums=2)
    float(run(x, extra_args, 1))
    float(run(x, extra_args, iters))

    def timed(n, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x, extra_args, n))
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
    results = {}

    def report(name, ms):
        results[name] = ms
        print(f"{name:52s} {ms:7.3f} ms", flush=True)

    def block_case(name, drop, det, wrt_params, rng_impl=None):
        blk = FixedSpectralBlock(
            d_model=C, seq_len=T, kernel_len=args.kernel, transition_bins=16,
            dropout=drop, fft_backend="matmul", fft_precision="default",
        )
        if rng_impl is not None:
            dkey = jax.random.key(3, impl=rng_impl)
        else:
            dkey = jax.random.PRNGKey(3)
        params = blk.init(
            {"params": jax.random.PRNGKey(1), "dropout": dkey}, x, cutoff, det
        )

        def apply_fn(p, xx):
            return blk.apply(
                p, xx, cutoff, det, rngs=None if det else {"dropout": dkey}
            )

        if wrt_params:

            def f(p, xx):
                y = apply_fn(p, xx)
                return jnp.sum(y * y)

            def fwdbwd(xx):
                l, (gp, gx) = jax.value_and_grad(f, argnums=(0, 1))(params, xx)
                # fold every grad magnitude in so nothing is DCE'd
                acc = sum(jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(gp))
                return gx + l + acc
        else:

            def f(xx):
                y = apply_fn(params, xx)
                return jnp.sum(y * y)

            def fwdbwd(xx):
                l, gx = jax.value_and_grad(f)(xx)
                return gx + l

        report(name, marginal_ms(fwdbwd, x, args.iters))

    block_case("block d(x) only, no dropout", 0.0, True, False)
    block_case("block d(params,x), no dropout", 0.0, True, True)
    block_case("block d(params,x), dropout 0.1 (threefry)", 0.1, False, True)
    try:
        block_case("block d(params,x), dropout 0.1 (rbg prng)", 0.1, False, True, rng_impl="rbg")
    except Exception as e:
        print(f"rbg prng case failed: {e}")

    # --- block with the direct toeplitz backend ------------------------------
    def block_direct_case(name, drop, det):
        blk = FixedSpectralBlock(
            d_model=C, seq_len=T, kernel_len=args.kernel, transition_bins=16,
            dropout=drop, fft_backend="direct", fft_precision="default",
        )
        dkey = jax.random.key(3, impl="rbg")
        params = blk.init({"params": jax.random.PRNGKey(1), "dropout": dkey}, x, cutoff, det)

        def f(p, xx):
            y = blk.apply(p, xx, cutoff, det, rngs=None if det else {"dropout": dkey})
            return jnp.sum(y * y)

        def fwdbwd(xx):
            l, (gp, gx) = jax.value_and_grad(f, argnums=(0, 1))(params, xx)
            acc = sum(jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(gp))
            return gx + l + acc

        report(name, marginal_ms(fwdbwd, x, args.iters))

    block_direct_case("block DIRECT d(params,x), no dropout", 0.0, True)
    block_direct_case("block DIRECT d(params,x), rbg dropout", 0.1, False)

    # --- FFN branch with param grads ----------------------------------------
    ffn = SpectralFFNTime(C, 2, 0.0)
    fparams = ffn.init(jax.random.PRNGKey(1), x, True)

    def ffn_f(p, xx):
        y = ffn.apply(p, xx, True)
        return jnp.sum(y * y)

    def ffn_fb(xx):
        l, (gp, gx) = jax.value_and_grad(ffn_f, argnums=(0, 1))(fparams, xx)
        acc = sum(jnp.sum(jnp.abs(t)) for t in jax.tree.leaves(gp))
        return gx + l + acc

    report("ffn d(params,x)", marginal_ms(ffn_fb, x, args.iters))

    # --- conv via spectral_conv_matmul, d(kernel, x) -------------------------
    from spectral_tpu.ops.fftc import conv_n_fft, kernel_rfft
    from spectral_tpu.ops.matfft import spectral_conv_matmul

    n_fft = conv_n_fft(T, args.kernel)
    kern = jax.random.normal(jax.random.PRNGKey(4), (args.kernel,)) * 0.01

    def conv_f(kern, xx):
        h = kernel_rfft(kern, n_fft)  # complex built IN-graph from a real arg
        y = spectral_conv_matmul(
            jnp.swapaxes(xx, 1, 2), h, n_fft, precision=jax.lax.Precision.DEFAULT
        )
        return jnp.sum(y * y)

    def conv_fb(xx, kern):
        l, (gk, gx) = jax.value_and_grad(conv_f, argnums=(0, 1))(kern, xx)
        return gx + l + jnp.sum(jnp.abs(gk))

    report("conv(matmul) d(kernel,x)", marginal_ms(conv_fb, x, args.iters, (kern,)))

    def conv_fb_x(xx, kern):
        l, gx = jax.value_and_grad(conv_f, argnums=1)(kern, xx)
        return gx + l

    report("conv(matmul) d(x) only", marginal_ms(conv_fb_x, x, args.iters, (kern,)))

    blk_total = results.get("block d(params,x), no dropout", float("nan"))
    known = results.get("ffn d(params,x)", 0) + results.get("conv(matmul) d(kernel,x)", 0)
    print(
        f"\nblock(no dropout, full grads) {blk_total:.3f} = "
        f"conv {results.get('conv(matmul) d(kernel,x)', 0):.3f}"
        f" + ffn {results.get('ffn d(params,x)', 0):.3f}"
        f" + other {blk_total - known:.3f} ms"
    )


if __name__ == "__main__":
    main()
