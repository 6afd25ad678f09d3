"""Retrain with the FIXED frequency-domain mixing on a small corpus and
sample from it — "now that we mix in the freq domain, how smart does it get?"

(reference experiments/retrain_fixed.py)
Run: python experiments/retrain_fixed.py [--steps 800]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from _lab import LabModel
from spectral_tpu.train.evaluate import cross_entropy


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    args = ap.parse_args()

    corpus = (b"once upon a time there was a little dog. the dog liked to play. " * 64)
    ids = np.frombuffer(corpus, np.uint8).astype(np.int32)
    T, B = 64, 8
    rng = np.random.default_rng(0)

    model = LabModel(variant="freq_mix")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((B, T), jnp.int32))["params"]
    tx = optax.adam(2e-3)
    state = tx.init(params)

    @jax.jit
    def step(p, s, x, y):
        l, g = jax.value_and_grad(lambda p: cross_entropy(model.apply({"params": p}, x), y))(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    for i in range(args.steps):
        starts = rng.integers(0, len(ids) - T - 1, B)
        x = jnp.asarray(np.stack([ids[s : s + T] for s in starts]))
        y = jnp.asarray(np.stack([ids[s + 1 : s + T + 1] for s in starts]))
        params, state, l = step(params, state, x, y)
        if i % 200 == 0:
            print(f"step {i:4d}: loss {float(l):.4f}")
    print(f"final loss: {float(l):.4f}")

    # greedy sample (this lab model is non-causal — sampling is a smoke test,
    # not a quality claim; the production sampler lives in train/sampling.py).
    # The lab filter is bound to the trained T: left-pad the context window.
    ctx = list(b"once upon a time ")
    for _ in range(64):
        window = ([32] * max(0, T - len(ctx)) + ctx)[-T:]
        x = jnp.asarray(np.asarray(window, np.int32)[None])
        logits = model.apply({"params": params}, x)
        ctx.append(int(jnp.argmax(logits[0, min(len(ctx), T) - 1])))
    print("sample:", bytes(c for c in ctx if 32 <= c <= 126 or c == 10).decode(errors="replace"))


if __name__ == "__main__":
    main()
