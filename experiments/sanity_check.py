"""Sanity check: can the spectral LM overfit ONE sentence?

(reference experiments/sanity_check.py — rung 3 of the debugging ladder: if
the full model cannot memorize a single sentence, the architecture is broken
regardless of data/scale.)

Run: python experiments/sanity_check.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spectral_tpu.models.backbone import FixedSpectralLM
from spectral_tpu.models.config import TrainConfig
from spectral_tpu.train.evaluate import cross_entropy


def main():
    sentence = b"the quick brown fox jumps over the lazy dog. " * 2
    ids = np.frombuffer(sentence, dtype=np.uint8).astype(np.int32)
    T = 64
    x = jnp.asarray(ids[:T][None])
    y = jnp.asarray(ids[1 : T + 1][None])

    cfg = TrainConfig(d_model=64, n_layers=2, seq_len=T, kernel_len=16, jpeg_transition=8, dropout=0.0)
    model = FixedSpectralLM(cfg)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tx = optax.adamw(3e-3)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(
            lambda p: cross_entropy(model.apply({"params": p}, x, deterministic=True), y)
        )(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    for i in range(400):
        params, state, l = step(params, state)
        if i % 100 == 0:
            print(f"  step {i:4d}: loss {float(l):.4f}")
    print(f"final loss: {float(l):.4f}")
    assert float(l) < 0.3, "SANITY CHECK FAILED — model cannot memorize one sentence"
    print("sanity check PASSED: the spectral LM can overfit a single sentence")


if __name__ == "__main__":
    main()
