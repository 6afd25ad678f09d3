"""SpectralMixingLayer family: ported reference self-tests + torch golden parity.

Ports fft_tensor/spectral_layers.py:259-319 (round-trip, Parseval, gradient
flow, identity, domain typing) as pytest gates, and adds a fwd+bwd golden test
against a fresh torch implementation of the reference layer equations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from spectral_tpu.layers.spectral_layers import (
    HybridSpectralAttention,
    SpectralMixingLayer,
    SpectralMLPBlock,
)


def _init(layer, x, key=0):
    return layer.init(jax.random.PRNGKey(key), jnp.asarray(x))


class TestSpectralMixingLayer:
    def test_gradient_flow(self):
        rng = np.random.default_rng(0)
        B, T, D = 2, 128, 64
        x = rng.standard_normal((B, T, D)).astype(np.float32)
        layer = SpectralMixingLayer(D, learnable=True)
        params = _init(layer, x)

        def loss(p, x):
            return jnp.sum(layer.apply(p, x))

        gp, gx = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(x))
        gxn = float(jnp.linalg.norm(gx))
        assert gxn > 0 and np.isfinite(gxn)
        leaves = jax.tree.leaves(gp)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    def test_identity_nonlearnable(self):
        """learnable=False is pure fft->ifft: exact identity."""
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 64, 32)).astype(np.float32)
        layer = SpectralMixingLayer(32, learnable=False)
        params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = np.asarray(layer.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(y, x, atol=1e-5)

    def test_identity_ones_init_on_kept_band(self):
        """With ones-init weights, kept low bins pass through unchanged and
        high bins are zeroed (the reference layer's contract)."""
        rng = np.random.default_rng(2)
        B, T, D = 2, 64, 32
        x = rng.standard_normal((B, T, D)).astype(np.float32)
        layer = SpectralMixingLayer(D, num_filters=D // 2, learnable=True)
        params = _init(layer, x)
        y = np.asarray(layer.apply(params, jnp.asarray(x)))
        k = min(D // 2, T // 2)
        xf = np.fft.fft(x, axis=1)
        xf_kept = np.zeros_like(xf)
        xf_kept[:, :k, :] = xf[:, :k, :]
        expected = np.fft.ifft(xf_kept, axis=1).real
        np.testing.assert_allclose(y, expected, atol=1e-4)

    def test_golden_parity_vs_torch(self):
        """Fwd+bwd parity vs a fresh torch implementation of the reference
        SpectralMixingLayer equations (spectral_layers.py:73-120)."""
        rng = np.random.default_rng(3)
        B, T, D, nf = 2, 32, 8, 4
        x_np = rng.standard_normal((B, T, D)).astype(np.float32)
        wr_np = rng.standard_normal((D, nf)).astype(np.float32)
        wi_np = rng.standard_normal((D, nf)).astype(np.float32)
        b_np = rng.standard_normal(D).astype(np.float32)
        p_np = rng.standard_normal((B, T, D)).astype(np.float32)
        k = min(nf, T // 2)

        # torch golden
        xt = torch.tensor(x_np, requires_grad=True)
        wrt = torch.tensor(wr_np, requires_grad=True)
        wit = torch.tensor(wi_np, requires_grad=True)
        bt = torch.tensor(b_np, requires_grad=True)
        xf = torch.fft.fft(xt, dim=1)
        w = torch.complex(wrt, wit)
        filtered = torch.zeros_like(xf)
        filtered[:, :k, :] = xf[:, :k, :] * w[:, :k].T.unsqueeze(0)
        yt = torch.fft.ifft(filtered, dim=1).real + bt
        (yt * torch.tensor(p_np)).sum().backward()

        layer = SpectralMixingLayer(D, num_filters=nf, learnable=True)
        params = {
            "params": {
                "weight_real": jnp.asarray(wr_np),
                "weight_imag": jnp.asarray(wi_np),
                "bias": jnp.asarray(b_np),
            }
        }

        def loss(p, x):
            return jnp.sum(layer.apply(p, x) * p_np)

        y = np.asarray(layer.apply(params, jnp.asarray(x_np)))
        np.testing.assert_allclose(y, yt.detach().numpy(), atol=1e-5)

        gp, gx = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(x_np))
        np.testing.assert_allclose(np.asarray(gp["params"]["weight_real"]), wrt.grad.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gp["params"]["weight_imag"]), wit.grad.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gp["params"]["bias"]), bt.grad.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(), rtol=1e-4, atol=1e-4)


class TestBackendEquivalence:
    """All FFT backends of the mixing layer compute the same function.

    'bandlimited' is the seq-4k headline path (bench.py): the layer zeroes
    bins >= num_filters by contract, so the rank-k projection is exact."""

    def _pair(self, backend, T=256, D=64, seed=0):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((2, T, D)).astype(np.float32))
        ref = SpectralMixingLayer(D, fft_backend="xla")
        params = ref.init(jax.random.PRNGKey(1), x)
        params = jax.tree.map(
            lambda l: l + 0.1 * jax.random.normal(jax.random.PRNGKey(2), l.shape), params
        )
        alt = SpectralMixingLayer(D, fft_backend=backend)
        return ref, alt, params, x

    def test_bandlimited_forward_and_grads_match_xla(self):
        ref, alt, params, x = self._pair("bandlimited")
        np.testing.assert_allclose(
            np.asarray(alt.apply(params, x)), np.asarray(ref.apply(params, x)), atol=2e-5
        )
        g_ref = jax.grad(lambda p: jnp.sum(ref.apply(p, x) ** 2))(params)
        g_alt = jax.grad(lambda p: jnp.sum(alt.apply(p, x) ** 2))(params)
        for a, b in zip(jax.tree.leaves(g_alt), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    def test_matmul_forward_matches_xla(self):
        ref, alt, params, x = self._pair("matmul")
        np.testing.assert_allclose(
            np.asarray(alt.apply(params, x)), np.asarray(ref.apply(params, x)), atol=2e-5
        )

    def test_bandlimited_nonlearnable_identity(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 128, 32)).astype(np.float32))
        layer = SpectralMixingLayer(32, learnable=False, fft_backend="bandlimited")
        y = layer.apply(layer.init(jax.random.PRNGKey(0), x), x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


class TestBlocks:
    def test_spectral_mlp_block_shapes_and_grads(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal((2, 64, 32)).astype(np.float32)
        block = SpectralMLPBlock(32)
        params = block.init(jax.random.PRNGKey(0), jnp.asarray(x), deterministic=True)
        y = block.apply(params, jnp.asarray(x), deterministic=True)
        assert y.shape == x.shape

        def loss(p):
            return jnp.sum(block.apply(p, jnp.asarray(x), deterministic=True) ** 2)

        g = jax.grad(loss)(params)
        norms = [float(jnp.linalg.norm(l)) for l in jax.tree.leaves(g)]
        assert all(np.isfinite(n) for n in norms)
        assert sum(norms) > 0

    def test_hybrid_attention_shapes(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((2, 32, 32)).astype(np.float32)
        block = HybridSpectralAttention(32, num_heads=4)
        params = block.init(jax.random.PRNGKey(0), jnp.asarray(x), deterministic=True)
        y = block.apply(params, jnp.asarray(x), deterministic=True)
        assert y.shape == x.shape

    def test_dropout_rng_path(self):
        rng = np.random.default_rng(6)
        x = rng.standard_normal((2, 64, 32)).astype(np.float32)
        block = SpectralMLPBlock(32, dropout=0.5)
        params = block.init(jax.random.PRNGKey(0), jnp.asarray(x), deterministic=True)
        y1 = block.apply(params, jnp.asarray(x), deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
        y2 = block.apply(params, jnp.asarray(x), deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(y1), np.asarray(y2))
