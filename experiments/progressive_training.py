"""PROGRESSIVE FREQUENCY TRAINING — the "JPEG method" origin experiment.

Train the low bins first (structure/grammar), then mid (words), then the
full spectrum (polish).  This is where the production curriculum
(train/schedules.jpeg_cutoff) came from.

(reference experiments/progressive_training.py)
Run: python experiments/progressive_training.py [--steps-per-stage 200]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from spectral_tpu.models.backbone import FixedSpectralLM
from spectral_tpu.models.config import TrainConfig
from spectral_tpu.ops.fftc import conv_freq_bins
from spectral_tpu.train.evaluate import cross_entropy


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-per-stage", type=int, default=200)
    args = ap.parse_args()

    corpus = (b"the cat sat on the mat. the dog ran in the park. " * 128)
    ids = np.frombuffer(corpus, np.uint8).astype(np.int32)
    T, B = 128, 8
    cfg = TrainConfig(d_model=64, n_layers=2, seq_len=T, kernel_len=16, jpeg_transition=8, dropout=0.0)
    bins = conv_freq_bins(T, cfg.kernel_len)
    model = FixedSpectralLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((B, T), jnp.int32))["params"]
    tx = optax.adamw(2e-3)
    state = tx.init(params)
    rng = np.random.default_rng(0)

    @jax.jit
    def step(p, s, x, y, cutoff):
        l, g = jax.value_and_grad(
            lambda p: cross_entropy(model.apply({"params": p}, x, cutoff=cutoff, deterministic=True), y)
        )(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    stages = [("low (structure)", bins // 8), ("mid (words)", bins // 2), ("full (polish)", bins)]
    for name, cutoff in stages:
        losses = []
        for _ in range(args.steps_per_stage):
            starts = rng.integers(0, len(ids) - T - 1, B)
            x = jnp.asarray(np.stack([ids[s : s + T] for s in starts]))
            y = jnp.asarray(np.stack([ids[s + 1 : s + T + 1] for s in starts]))
            params, state, l = step(params, state, x, y, jnp.int32(cutoff))
            losses.append(float(l))
        print(f"stage {name:16s} cutoff={cutoff:4d}/{bins}: "
              f"loss {losses[0]:.4f} -> {losses[-1]:.4f}")
    assert losses[-1] < 1.5, "progressive training failed to converge"
    print("JPEG-method experiment PASSED: each stage keeps improving on the last")


if __name__ == "__main__":
    main()
