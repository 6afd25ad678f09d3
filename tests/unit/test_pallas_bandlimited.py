"""Parity gates for the fused band-limited mix kernel (ops/pallas_bandlimited.py).

Oracle: the pure-jnp einsum algebra (the layer's XLA path, itself
backend-equivalence-gated against jnp.fft in test_spectral_layers /
integration tests).  Values AND custom-vjp gradients at fp32, interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.ops.pallas_bandlimited import (
    bandlimited_mix,
    bandlimited_mix_reference,
)

B, T, D, K = 2, 128, 64, 16


def _setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    wr = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32)) / T
    wi = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32)) / T
    bias = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    return x, wr, wi, bias


def test_forward_parity():
    x, wr, wi, bias = _setup()
    ref = bandlimited_mix_reference(x, wr, wi, bias)
    out = bandlimited_mix(x, wr, wi, bias, "highest", True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gradient_parity():
    x, wr, wi, bias = _setup()

    def loss_k(x, wr, wi, bias):
        return jnp.sum(jnp.sin(bandlimited_mix(x, wr, wi, bias, "highest", True)))

    def loss_r(x, wr, wi, bias):
        return jnp.sum(jnp.sin(bandlimited_mix_reference(x, wr, wi, bias)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(x, wr, wi, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, wr, wi, bias)
    for name, a, b in zip(("dx", "dwr", "dwi", "db"), gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-4, err_msg=name
        )


def test_layer_dispatch_unchanged_off_tpu():
    """Off-TPU the layer keeps the einsum path and stays numerically put."""
    from spectral_tpu.layers.spectral_layers import SpectralMixingLayer

    layer = SpectralMixingLayer(embed_dim=D, num_filters=K, fft_backend="bandlimited")
    x = jnp.asarray(np.random.default_rng(1).normal(size=(B, T, D)).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    # oracle: the xla backend (full-spectrum) — identical by the layer contract
    layer_x = SpectralMixingLayer(embed_dim=D, num_filters=K, fft_backend="xla")
    yx = layer_x.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yx), rtol=2e-4, atol=2e-4)
