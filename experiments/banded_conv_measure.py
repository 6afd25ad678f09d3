"""Measure the exact causal-low-rank conv (tril(UV^T) prefix scan) vs the
dense Toeplitz matmul at the flagship cutoff-128 phase.

Companion to experiments/banded_conv_analysis.py (the derivation).  The
scan evaluates the SAME operator as tril-Toeplitz(h_w) exactly:

    chunk c:  y_c = U_c @ P_c  +  tril(Toeplitz_S(h_w)) @ x_c
              P_{c+1} = P_c + V_c^T @ x_c

with U/V built from the band's cos/sin tables (static) scaled by the
filter's per-bin coefficients (traced — cutoff changes don't recompile;
bins >= k_max are representable by widening k_max, the static panel cap).

Timing methodology: CLAUDE.md rules (one jit, fori_loop, renormalized
carry, marginal cost, value-fetch sync).

Run (chip, background):  python -m experiments.banded_conv_measure
"""

from __future__ import annotations

import argparse
import time


def build_panels(a, b, T: int, n_fft: int):
    """U, V (T, 2k) from rfft-bin coefficients a+ib (k = a.shape[0])."""
    import jax.numpy as jnp
    import numpy as np

    k = a.shape[0]
    t = np.arange(T)
    f = np.arange(k)
    ang = 2 * np.pi * np.outer(t, f) / n_fft  # (T, k) static
    C = jnp.asarray(np.cos(ang), jnp.float32)
    S = jnp.asarray(np.sin(ang), jnp.float32)
    w = np.full(k, 2.0)
    w[0] = 1.0
    if n_fft // 2 < k:
        w[n_fft // 2] = 1.0
    w = jnp.asarray(w / n_fft, jnp.float32)
    U = jnp.concatenate([C * (w * a) - S * (w * b), S * (w * a) + C * (w * b)], axis=1)
    V = jnp.concatenate([C, S], axis=1)
    return U, V  # (T, 2k)


def banded_conv_scan(x, a, b, h_time, T: int, n_fft: int, S: int, precision=None):
    """Exact tril-Toeplitz(h_w) @ x via chunked prefix scan.

    x: [B, T, C]; a/b: [k] filter bin coefficients; h_time: [n_fft] taps
    (irfft of the band filter — used only for the local (S, S) block).
    """
    import jax
    import jax.numpy as jnp

    from spectral_tpu.ops.toeplitz import toeplitz_matrix

    B, T_, C = x.shape
    assert T_ == T and T % S == 0
    NC = T // S
    U, V = build_panels(a, b, T, n_fft)
    twok = U.shape[1]
    M_loc = jnp.tril(toeplitz_matrix(h_time, S, n_fft))  # (S, S), taps [0, S)

    xc = jnp.transpose(x.reshape(B, NC, S, C), (1, 2, 0, 3)).reshape(NC, S, B * C)
    Uc = U.reshape(NC, S, twok)
    Vc = V.reshape(NC, S, twok)
    prec = jax.lax.Precision.HIGHEST if precision is None else precision

    def body(P, inp):
        u, v, xl = inp
        y = (
            jnp.dot(u, P, precision=prec, preferred_element_type=jnp.float32)
            + jnp.dot(M_loc, xl, precision=prec, preferred_element_type=jnp.float32)
        )
        P = P + jnp.dot(v.T, xl, precision=prec, preferred_element_type=jnp.float32)
        return P, y

    P0 = jnp.zeros((twok, B * C), jnp.float32)
    _, ys = jax.lax.scan(body, P0, (Uc, Vc, xc))  # (NC, S, B*C)
    return jnp.transpose(ys.reshape(NC, S, B, C), (2, 0, 1, 3)).reshape(B, T, C)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=1024)
    ap.add_argument("--C", type=int, default=512)
    ap.add_argument("--B", type=int, default=4)
    ap.add_argument("--cutoff", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--iters", type=int, default=400)
    args = ap.parse_args()

    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectral_tpu.ops.toeplitz import toeplitz_matrix

    T, C, B = args.T, args.C, args.B
    n_fft = 2 * T
    fbins = n_fft // 2 + 1
    k = args.cutoff
    rng = np.random.default_rng(0)

    h_hat = np.zeros(fbins, np.complex64)
    h_hat[:k] = (rng.normal(size=k) + 1j * rng.normal(size=k)).astype(np.complex64)
    h_hat[0] = h_hat[0].real
    h_time = jnp.asarray(np.fft.irfft(h_hat, n=n_fft).astype(np.float32))
    a = jnp.asarray(h_hat.real[:k])
    b = jnp.asarray(h_hat.imag[:k])
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))

    # dense reference: tril of the full Toeplitz (the causal-taps operator)
    M_dense = jnp.tril(toeplitz_matrix(h_time, T, n_fft))

    def dense(x):
        return jnp.einsum("ij,bjc->bic", M_dense, x,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

    def banded(x):
        return banded_conv_scan(x, a, b, h_time, T, n_fft, args.chunk)

    got = jax.jit(banded)(x)
    ref = jax.jit(dense)(x)
    jax.block_until_ready((got, ref))
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    print(f"exactness: banded vs dense rel err {err:.2e}", flush=True)
    assert err < 1e-4, "prefix-scan conv is not exact!"

    def timed(fn, tag, with_grad=False):
        if with_grad:
            f = jax.grad(lambda xx: jnp.sum(jnp.sin(fn(xx))))
        else:
            f = fn

        def loop(xx, n):
            def body(i, c):
                y = f(c)
                return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-12)

            return jnp.sum(jax.lax.fori_loop(0, n, body, xx))

        run = jax.jit(loop, static_argnums=1)
        n = args.iters
        float(run(x, 1)); float(run(x, n))
        keys = jax.random.split(jax.random.PRNGKey(1), 2)
        xs = [jax.random.normal(kk, x.shape, x.dtype) for kk in keys]

        def t(nn, r):
            t0 = time.perf_counter()
            float(run(xs[r % 2], nn))
            return time.perf_counter() - t0

        dt = max(min(t(n, 0), t(n, 1)) - min(t(1, 0), t(1, 1)), 1e-9) / (n - 1)
        print(f"{tag:<24} {dt*1e6:9.1f} us/call", flush=True)
        return dt

    print(f"\nT={T} C={C} B={B} cutoff={k} chunk={args.chunk} "
          f"(theory: banded = {(2*((2*k-1+127)//128*128)+args.chunk)/T:.2f}x dense FLOPs)",
          flush=True)
    d_f = timed(dense, "dense fwd")
    b_f = timed(banded, "banded fwd")
    d_g = timed(dense, "dense fwd+bwd", with_grad=True)
    b_g = timed(banded, "banded fwd+bwd", with_grad=True)
    print(f"\nratios: fwd {b_f/d_f:.2f}x   fwd+bwd {b_g/d_g:.2f}x  (<1 = banded wins)",
          flush=True)


if __name__ == "__main__":
    main()
