"""Spectral mixing vs multi-head attention — the headline benchmark tables.

Mirror of reference benchmark_spectral.py (the source of README/BENCHMARKS
numbers): forward speed, fwd+bwd speed, end-to-end block comparison, scaling
table, parameter counts.

Run: python benchmarks/benchmark_spectral.py [--quick]
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
from flax import linen as nn

from spectral_tpu.layers.spectral_layers import SpectralMixingLayer, SpectralMLPBlock


class MHA(nn.Module):
    """Hand-rolled full multi-head attention (the reference's comparator)."""

    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        qkv = nn.Dense(3 * D, name="qkv")(x).reshape(B, T, 3, self.heads, D // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(D // self.heads)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, D)
        return nn.Dense(D, name="proj")(out)


class TransformerBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        x = x + MHA(self.dim, name="attn")(nn.LayerNorm(name="ln1")(x))
        h = nn.Dense(4 * self.dim, name="fc1")(nn.LayerNorm(name="ln2")(x))
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.dim, name="fc2")(h)


def timeit(f, *args, iters=30):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def count_params(params) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))


def main():
    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    D, B = args.dim, args.batch
    seqs = [128, 256, 512] if args.quick else [128, 256, 512, 1024, 2048]
    iters = 10 if args.quick else 30

    print(f"device: {jax.devices()[0]}")
    print("\n== Forward speed: spectral mixing vs full attention ==")
    print(f"{'seq':>6} {'spectral(ms)':>13} {'attention(ms)':>14} {'speedup':>8}")
    rows = []
    for T in seqs:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
        spec = SpectralMixingLayer(D)
        sp = spec.init(jax.random.PRNGKey(1), x)
        attn = MHA(D)
        ap_ = attn.init(jax.random.PRNGKey(2), x)
        t_s = timeit(jax.jit(lambda p, x: spec.apply(p, x)), sp, x, iters=iters)
        t_a = timeit(jax.jit(lambda p, x: attn.apply(p, x)), ap_, x, iters=iters)
        rows.append((T, t_s, t_a))
        print(f"{T:>6} {t_s*1e3:>13.3f} {t_a*1e3:>14.3f} {t_a/t_s:>7.1f}x")

    print("\n== Scaling per seq-length doubling ==")
    for (T0, s0, a0), (T1, s1, a1) in zip(rows, rows[1:]):
        print(f"{T0:>5}->{T1:<5} spectral x{s1/s0:.2f}   attention x{a1/a0:.2f}")

    print("\n== Forward+backward, seq 512 ==")
    T = 512
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    spec = SpectralMixingLayer(D)
    sp = spec.init(jax.random.PRNGKey(1), x)
    attn = MHA(D)
    ap_ = attn.init(jax.random.PRNGKey(2), x)
    g_s = jax.jit(jax.grad(lambda p, x: jnp.sum(spec.apply(p, x) ** 2)))
    g_a = jax.jit(jax.grad(lambda p, x: jnp.sum(attn.apply(p, x) ** 2)))
    t_s = timeit(g_s, sp, x, iters=iters)
    t_a = timeit(g_a, ap_, x, iters=iters)
    print(f"spectral {t_s*1e3:.3f} ms   attention {t_a*1e3:.3f} ms   speedup {t_a/t_s:.1f}x")

    print("\n== End-to-end block (spectral+MLP vs transformer), seq 512 ==")
    sb = SpectralMLPBlock(D, dropout=0.0)
    sbp = sb.init(jax.random.PRNGKey(3), x, deterministic=True)
    tb = TransformerBlock(D)
    tbp = tb.init(jax.random.PRNGKey(4), x)
    t_sb = timeit(jax.jit(lambda p, x: sb.apply(p, x, deterministic=True)), sbp, x, iters=iters)
    t_tb = timeit(jax.jit(lambda p, x: tb.apply(p, x)), tbp, x, iters=iters)
    print(f"spectral block {t_sb*1e3:.3f} ms   transformer block {t_tb*1e3:.3f} ms   "
          f"speedup {t_tb/t_sb:.1f}x")

    print("\n== Activation memory (XLA memory analysis), seq 512 ==")
    try:
        def peak_temp(module, p, x, **kw):
            lowered = jax.jit(lambda p, x: module.apply(p, x, **kw)).lower(p, x)
            ma = lowered.compile().memory_analysis()
            return None if ma is None else ma.temp_size_in_bytes
        m_s = peak_temp(sb, sbp, x, deterministic=True)
        m_t = peak_temp(tb, tbp, x)
        if m_s and m_t:
            print(f"spectral block temp {m_s/1e6:.1f} MB   transformer block temp {m_t/1e6:.1f} MB   "
                  f"({m_t/m_s:.1f}x less)")
        else:
            print("memory analysis unavailable on this backend")
    except Exception as e:
        print(f"memory analysis unavailable: {str(e)[:60]}")

    print("\n== Parameter counts (mixing layer vs attention) ==")
    n_s = count_params(sp)
    n_a = count_params(ap_)
    print(f"spectral {n_s:,}   attention {n_a:,}   ({n_a/n_s:.1f}x fewer)")


if __name__ == "__main__":
    main()
