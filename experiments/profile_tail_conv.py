"""Isolated fwd+bwd timing of the tail route's conv backends at the
long-sequence training shapes — attributes the step-time swing between
`--tail-conv {direct,matmul,pallas}` to the conv itself (the tail kernel
and LN/gate XLA ops are identical across backends).

CLAUDE.md timing rules: one jit, fori-loop with renormalized carry,
marginal cost t(N)-t(1), value-fetch sync.

Run (chip, background):
    python -m experiments.profile_tail_conv [--cases seq4096] [--backends pallas,matmul]
"""

from __future__ import annotations

import argparse
import time

CASES = {
    # name: (B, T, C, n_fft)  — microbatch shapes of the profile_longseq recipes
    "seq2048": (4, 2048, 512, 4096),
    "seq4096": (4, 4096, 512, 8192),
    "seq8192": (2, 8192, 512, 16384),
    # VERDICT r3 weak #6: the n_fft-32768 in-kernel backward was
    # dispatch-excluded on an assumption — measure it once (expect a
    # very long Mosaic compile; run solo in a generous background window)
    "seq16384": (1, 16384, 512, 32768),
}


def bench(name, B, T, C, n_fft, backend, iters=200, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectral_tpu.models.fused_apply import _tail_conv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    fbins = n_fft // 2 + 1
    hr = jnp.asarray(rng.standard_normal(fbins).astype(np.float32) * 0.1)
    hi = jnp.asarray(rng.standard_normal(fbins).astype(np.float32) * 0.1)

    def fwd_bwd(x, hr, hi):
        def loss(x, hr, hi):
            h = jax.lax.complex(hr, hi)
            y = _tail_conv(x, h, n_fft, backend, dtype, False)
            return jnp.sum(y * y)

        _, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, hr, hi)
        return grads

    def loop(x, hr, hi, n):
        def body(i, carry):
            xc, hrc, hic = carry
            gx, ghr, ghi = fwd_bwd(xc, hrc, hic)
            # renormalized carry — never hits a fixed point, stays finite
            xc = xc + gx * jax.lax.rsqrt(jnp.mean(gx * gx) + 1e-9) * 1e-3
            return (xc, hrc, hic)

        xc, _, _ = jax.lax.fori_loop(0, n, body, (x, hr, hi))
        return jnp.sum(xc)

    run = jax.jit(loop, static_argnums=3)
    float(run(x, hr, hi, 1))
    float(run(x, hr, hi, iters))

    xs = [x + 0.1 * i for i in range(3)]

    def timed(n, reps=2):
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            float(run(xs[(n + r) % 3], hr, hi, n))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = max(timed(iters) - timed(1), 1e-9) / (iters - 1)
    # two-pass HBM bound for read-x + write-y per direction (fwd + dx + dh-ish)
    print(f"{name:<8} {backend:<7} {dtype:<9} B{B} T{T} C{C} n_fft{n_fft}: "
          f"{dt*1e3:7.3f} ms/convgrad", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="seq4096")
    ap.add_argument("--backends", default="pallas,matmul")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    for name in args.cases.split(","):
        B, T, C, n_fft = CASES[name.strip()]
        for be in args.backends.split(","):
            try:
                bench(name.strip(), B, T, C, n_fft, be.strip(),
                      iters=args.iters, dtype=args.dtype)
            except Exception as e:
                # a Mosaic-rejected shape is a RESULT (e.g. n_fft 32768:
                # "infer-vector-layout: unsupported shape cast"), not a
                # reason to lose the other backends' numbers
                print(f"{name:<8} {be.strip():<7} REJECTED: {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
