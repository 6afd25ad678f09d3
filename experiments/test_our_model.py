"""Run OUR actual production model (FixedSpectralLM) on the golden test
data — the final rung: the real architecture must pass what the lab
variants pass.

(reference experiments/test_our_model.py)
Run: python experiments/test_our_model.py
"""

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from _lab import sentence_batch
from spectral_tpu.models.backbone import FixedSpectralLM
from spectral_tpu.models.config import TrainConfig
from spectral_tpu.train.evaluate import cross_entropy


def main():
    x, y = sentence_batch(b"the quick brown fox jumps over the lazy dog. " * 2)
    cfg = TrainConfig(d_model=64, n_layers=2, seq_len=64, kernel_len=16, jpeg_transition=8, dropout=0.0)
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
    assert float(l) < 0.3, "the production model fails the golden data"
    print("production-model golden test PASSED")


if __name__ == "__main__":
    main()
