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


def test_stream_forward_parity():
    """Round-4 streamed kernel (double-buffered panel pipeline): values
    match the einsum oracle at fp32, including a chunk that divides T
    unevenly against the 512 default (auto-shrunk)."""
    from spectral_tpu.ops.pallas_bandlimited import bandlimited_mix_stream

    x, wr, wi, bias = _setup()
    ref = bandlimited_mix_reference(x, wr, wi, bias)
    out = bandlimited_mix_stream(x, wr, wi, bias, "float32", 512, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    out32 = bandlimited_mix_stream(x, wr, wi, bias, "float32", 32, True)
    np.testing.assert_allclose(np.asarray(out32), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_stream_mid_mode_parity():
    """Round-5 "mid" mode: 2-dot scheme (split tables x bf16-rounded
    values).  Error class sits BETWEEN fast (~1e-3 interpret-mode class
    with small-K averaging) and accurate (~1e-6): gate at 1e-3 relative —
    the chip probe (experiments/profile_stream_mix) records the measured
    class at the headline shape."""
    from spectral_tpu.ops.pallas_bandlimited import bandlimited_mix_stream

    x, wr, wi, bias = _setup()
    ref = np.asarray(bandlimited_mix_reference(x, wr, wi, bias))
    out = np.asarray(bandlimited_mix_stream(x, wr, wi, bias, "mid", 512, True))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 1e-3
    # mid must be strictly more accurate than fast on the same operands
    fast = np.asarray(
        bandlimited_mix_stream(x, wr, wi, bias, "bfloat16", 512, True))
    assert (np.abs(out - ref).max() <= np.abs(fast - ref).max())


def test_stream_gradient_parity():
    """Backward parity under an IDENTICAL cotangent: the stream forward is
    split-mantissa (~1e-5 relative), so grad-of-loss comparisons would
    measure forward rounding amplified through the loss; the vjp itself
    (the whole-panel HIGHEST bwd kernel) must match the reference vjp
    tightly."""
    from spectral_tpu.ops.pallas_bandlimited import bandlimited_mix_stream

    x, wr, wi, bias = _setup()
    g = jnp.asarray(
        np.random.default_rng(7).normal(size=(B, T, D)).astype(np.float32))

    _, vjp_k = jax.vjp(
        lambda *a: bandlimited_mix_stream(*a, "float32", 32, True),
        x, wr, wi, bias)
    _, vjp_r = jax.vjp(bandlimited_mix_reference, x, wr, wi, bias)
    for name, a, b in zip(("dx", "dwr", "dwi", "db"), vjp_k(g), vjp_r(g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-4, err_msg=name
        )


def test_stream_pooled_entry_selects_slot():
    """The TRUE-HBM harness entry: pool slot s must equal the plain entry
    on pool[s], both precisions (the pooled path is what bench.py times)."""
    from spectral_tpu.ops.pallas_bandlimited import (
        bandlimited_mix_stream,
        bandlimited_mix_stream_pooled,
    )

    x, wr, wi, bias = _setup()
    pool = jnp.stack([x, x * 0.5 + 1.0, -x])
    for cdt, tol in (("float32", 1e-5), ("bfloat16", 5e-2)):
        for s in (0, 2):
            got = bandlimited_mix_stream_pooled(
                pool, jnp.asarray([s], jnp.int32), wr, wi, bias, cdt, 32, True)
            want = bandlimited_mix_stream(pool[s], wr, wi, bias, cdt, 32, True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=tol, atol=tol,
                err_msg=f"{cdt} slot {s}")


def test_stream_layer_backend_matches_bandlimited():
    """The layer's bandlimited_stream backend == the einsum bandlimited
    backend (same params, same algebra)."""
    from spectral_tpu.layers.spectral_layers import SpectralMixingLayer

    layer_s = SpectralMixingLayer(embed_dim=D, num_filters=K,
                                  fft_backend="bandlimited_stream")
    layer_e = SpectralMixingLayer(embed_dim=D, num_filters=K,
                                  fft_backend="bandlimited")
    x = jnp.asarray(np.random.default_rng(2).normal(size=(B, T, D)).astype(np.float32))
    params = layer_e.init(jax.random.PRNGKey(0), x)
    ys = layer_s.apply(params, x)
    ye = layer_e.apply(params, x)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ye), rtol=2e-5, atol=2e-5)


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
