"""Enhanced spectral LM vs a standard transformer encoder on synthetic text.

Mirror of reference benchmark_enhanced.py: compares training loss AND
per-batch wall time of the byte-level spectral model (EnhancedSpectralBlock
stack) against an equivalently-sized transformer on a synthetic
repeated-pattern corpus.

Run: python benchmarks/benchmark_enhanced.py [--quick]
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
import optax
from flax import linen as nn

from spectral_tpu.layers.byte_spectral import ByteSpectralEmbedding
from spectral_tpu.layers.spectral_enhancements import EnhancedSpectralBlock


class EnhancedSpectralLanguageModel(nn.Module):
    embed_dim: int = 128
    num_layers: int = 2

    @nn.compact
    def __call__(self, byte_ids, deterministic: bool = True):
        h = ByteSpectralEmbedding(self.embed_dim, name="encoder")(byte_ids)
        for i in range(self.num_layers):
            h = EnhancedSpectralBlock(self.embed_dim, dropout=0.0, name=f"block_{i}")(
                h, deterministic=deterministic
            )
        h = nn.LayerNorm(name="norm")(h)
        return nn.Dense(256, name="head")(h)


class TransformerLM(nn.Module):
    embed_dim: int = 128
    num_layers: int = 2
    heads: int = 4

    @nn.compact
    def __call__(self, byte_ids, deterministic: bool = True):
        h = nn.Embed(256, self.embed_dim, name="embed")(byte_ids)
        for i in range(self.num_layers):
            a = nn.SelfAttention(num_heads=self.heads, name=f"attn_{i}")(nn.LayerNorm()(h))
            h = h + a
            f = nn.Dense(4 * self.embed_dim)(nn.LayerNorm()(h))
            h = h + nn.Dense(self.embed_dim)(nn.gelu(f, approximate=False))
        return nn.Dense(256, name="head")(nn.LayerNorm(name="norm")(h))


def synthetic_corpus(n=20000, seed=0):
    rng = np.random.default_rng(seed)
    words = ["the ", "cat ", "sat ", "on ", "mat. ", "dog ", "ran ", "far. "]
    text = "".join(rng.choice(words) for _ in range(n // 5))
    return np.frombuffer(text.encode(), dtype=np.uint8)


def train_model(model, corpus, *, steps, batch, seq, lr=3e-3, seed=0):
    rng = np.random.default_rng(seed)
    x0 = jnp.zeros((batch, seq), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), x0)
    tx = optax.adam(lr)
    state = tx.init(params)

    @jax.jit
    def step(p, s, bx, by):
        def loss_fn(p):
            logits = model.apply(p, bx)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, by[..., None], axis=-1))

        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = tx.update(g, s)
        return optax.apply_updates(p, u), s, l

    def batch_fn():
        starts = rng.integers(0, corpus.shape[0] - seq - 2, batch)
        idx = starts[:, None] + np.arange(seq + 1)
        w = corpus[idx]
        return jnp.asarray(w[:, :-1].astype(np.int32)), jnp.asarray(w[:, 1:].astype(np.int32))

    bx, by = batch_fn()
    params, state, _ = step(params, state, bx, by)  # compile
    t0 = time.perf_counter()
    losses = []
    for _ in range(steps):
        bx, by = batch_fn()
        params, state, l = step(params, state, bx, by)
        losses.append(float(l))
    dt = (time.perf_counter() - t0) / steps
    return losses, dt


def main():
    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    steps = 30 if args.quick else 200
    batch, seq = 8, 128

    corpus = synthetic_corpus()
    print(f"device: {jax.devices()[0]}  corpus: {corpus.shape[0]:,} bytes")

    spec_losses, spec_dt = train_model(EnhancedSpectralLanguageModel(), corpus, steps=steps, batch=batch, seq=seq)
    print(f"spectral    : final loss {np.mean(spec_losses[-10:]):.4f}  {spec_dt*1e3:.2f} ms/batch")

    tr_losses, tr_dt = train_model(TransformerLM(), corpus, steps=steps, batch=batch, seq=seq)
    print(f"transformer : final loss {np.mean(tr_losses[-10:]):.4f}  {tr_dt*1e3:.2f} ms/batch")

    print(f"\nloss ratio (lower better): {np.mean(spec_losses[-10:])/np.mean(tr_losses[-10:]):.2f}")
    print(f"speed ratio (spectral/transformer): {spec_dt/tr_dt:.2f}x time per batch")


if __name__ == "__main__":
    main()
