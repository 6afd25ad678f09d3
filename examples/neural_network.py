"""Training demo with spectral layers (mirror of reference examples/neural_network.py).

Run: python examples/neural_network.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spectral_tpu.core.zero_materialize import FrequencyLinearLayer
from spectral_tpu.layers.spectral_layers import SpectralMLPBlock


def train_spectral_mlp():
    print("\n=== Training a spectral MLP block ===")
    rng = np.random.default_rng(0)
    B, T, D = 8, 64, 32
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    # target: low-pass of the input (a task spectral mixing should nail)
    xf = jnp.fft.fft(x, axis=1)
    mask = (jnp.arange(T) < 8).astype(jnp.float32)
    target = jnp.fft.ifft(xf * mask[None, :, None], axis=1).real

    block = SpectralMLPBlock(D, dropout=0.0)
    params = block.init(jax.random.PRNGKey(0), x, deterministic=True)

    def loss_fn(p):
        return jnp.mean((block.apply(p, x, deterministic=True) - target) ** 2)

    tx = optax.adam(1e-2)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = tx.update(g, s)
        return optax.apply_updates(p, u), s, l

    for i in range(100):
        params, state, l = step(params, state)
        if i % 25 == 0:
            print(f"  step {i:3d}: loss {float(l):.5f}")
    print(f"  final: {float(l):.5f}")


def train_frequency_linear():
    print("\n=== Zero-materialization FrequencyLinearLayer ===")
    rng = np.random.default_rng(1)
    layer = FrequencyLinearLayer(in_features=64, out_features=32, sparsity=0.1)
    x = jnp.asarray(rng.standard_normal((4, 8, 64)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(variables, x)
    ratio = FrequencyLinearLayer.compress_ratio_of(variables["params"], 64, 32)
    print(f"  out {y.shape}; weight compression {ratio:.1f}x (dense matrix never materialized)")


if __name__ == "__main__":
    train_spectral_mlp()
    train_frequency_linear()
    print("\nDone.")
