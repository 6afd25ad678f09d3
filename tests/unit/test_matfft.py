"""Parity gates for the MXU matmul FFT (ops/matfft.py) vs jnp.fft."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.ops.matfft import (
    irfft_matmul,
    plan_factors,
    rfft_matmul,
    spectral_conv_matmul,
)


def _x(seed=0, shape=(3, 1000)):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape).astype(np.float32))


class TestPlan:
    def test_factors_multiply_back(self):
        for n in (256, 512, 1024, 2048, 4096, 8192, 16384):
            fs = plan_factors(n)
            assert int(np.prod(fs)) == n
            assert all(f <= 256 for f in fs)

    def test_non_pow2_rejected(self):
        with pytest.raises(ValueError):
            plan_factors(768)


class TestRfftParity:
    @pytest.mark.parametrize("n", [256, 1024, 2048, 8192])
    def test_rfft_matches_jnp(self, n):
        x = _x(1, (2, min(n, 1500)))
        ref = jnp.fft.rfft(x, n=n, axis=-1)
        got = rfft_matmul(x, n)
        assert got.shape == ref.shape
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        assert err < 2e-5, (n, err)

    @pytest.mark.parametrize("n", [256, 2048])
    def test_irfft_roundtrip(self, n):
        x = _x(2, (2, n))
        y = irfft_matmul(rfft_matmul(x, n), n)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-4, atol=1e-4)

    def test_irfft_matches_jnp_on_asymmetric_input(self):
        n = 512
        rng = np.random.default_rng(3)
        xf = jnp.asarray(
            (rng.standard_normal((2, n // 2 + 1)) + 1j * rng.standard_normal((2, n // 2 + 1))).astype(
                np.complex64
            )
        )
        ref = jnp.fft.irfft(xf, n=n, axis=-1)
        got = irfft_matmul(xf, n)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


class TestSpectralConv:
    def test_matches_xla_path(self):
        n, t = 2048, 1024
        x = _x(4, (2, 8, t))  # (B, C, T) layout — T minor
        rng = np.random.default_rng(5)
        h = jnp.asarray(
            (rng.standard_normal(n // 2 + 1) + 1j * rng.standard_normal(n // 2 + 1)).astype(np.complex64)
        )
        ref = jnp.fft.irfft(jnp.fft.rfft(x, n=n, axis=-1) * h, n=n, axis=-1)[..., :t]
        got = spectral_conv_matmul(x, h, n)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

    def test_gradients_flow(self):
        n, t = 256, 100
        x = _x(6, (2, t))
        h = jnp.ones(n // 2 + 1, jnp.complex64)

        def loss(x):
            return jnp.sum(spectral_conv_matmul(x, h, n) ** 2)

        g = jax.grad(loss)(x)
        assert not np.any(np.isnan(np.asarray(g)))
        # identity filter => conv is identity => grad = 2x
        np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x), rtol=1e-3, atol=1e-3)

    def test_jit_and_vmap_compose(self):
        n, t = 512, 300
        x = _x(7, (4, t))
        h = jnp.ones(n // 2 + 1, jnp.complex64)
        f = jax.jit(lambda x: spectral_conv_matmul(x, h, n))
        y = f(x)
        y2 = jax.vmap(lambda r: spectral_conv_matmul(r, h, n))(x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-5, atol=1e-5)


class TestBackboneBackend:
    def test_block_forward_matches_xla_backend(self):
        import jax
        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig

        cfg_x = TrainConfig.from_dict(dict(d_model=32, n_layers=2, seq_len=64, kernel_len=16, batch_size=2))
        cfg_m = cfg_x.replace(fft_backend="matmul")
        mx, mm = FixedSpectralLM(cfg_x), FixedSpectralLM(cfg_m)
        x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 64)).astype(np.int32))
        params = mx.init(jax.random.PRNGKey(0), x)["params"]
        lx = mx.apply({"params": params}, x, cutoff=20, deterministic=True)
        lm = mm.apply({"params": params}, x, cutoff=20, deterministic=True)
        np.testing.assert_allclose(np.asarray(lm), np.asarray(lx), rtol=2e-3, atol=2e-3)

    def test_train_step_runs_with_matmul_backend(self):
        import jax
        from spectral_tpu.models.config import TrainConfig
        from spectral_tpu.train.trainer import init_model, make_optimizer, make_train_step

        cfg = TrainConfig.from_dict(
            dict(d_model=32, n_layers=1, seq_len=64, kernel_len=16, batch_size=2, fft_backend="matmul")
        )
        model, params = init_model(cfg)
        tx = make_optimizer(cfg)
        opt = tx.init(params)
        step = make_train_step(model, cfg, tx)
        rng = np.random.default_rng(0)
        bx = jnp.asarray(rng.integers(0, 256, (1, 2, 64)).astype(np.int32))
        by = jnp.asarray(rng.integers(0, 256, (1, 2, 64)).astype(np.int32))
        params, opt, loss = step(params, opt, bx, by, jnp.int32(16), jnp.float32(1e-3), jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))


class TestMixingLayerBackend:
    def test_mixing_layer_backends_match(self):
        import jax
        from spectral_tpu.layers.spectral_layers import SpectralMixingLayer

        T, D = 256, 32
        lx = SpectralMixingLayer(embed_dim=D)
        lm = SpectralMixingLayer(embed_dim=D, fft_backend="matmul")
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, T, D)).astype(np.float32))
        params = lx.init(jax.random.PRNGKey(0), x)
        # perturb the filter so the test isn't identity-weighted
        params = jax.tree.map(lambda a: a + 0.01 * np.random.default_rng(1).standard_normal(a.shape).astype(a.dtype), params)
        yx = lx.apply(params, x)
        ym = lm.apply(params, x)
        np.testing.assert_allclose(np.asarray(ym), np.asarray(yx), rtol=2e-4, atol=2e-4)

    def test_mixing_layer_backend_grads_match(self):
        import jax
        from spectral_tpu.layers.spectral_layers import SpectralMixingLayer

        T, D = 128, 16
        lx = SpectralMixingLayer(embed_dim=D)
        lm = SpectralMixingLayer(embed_dim=D, fft_backend="matmul")
        x = jnp.asarray(np.random.default_rng(2).standard_normal((2, T, D)).astype(np.float32))
        params = lx.init(jax.random.PRNGKey(0), x)

        gx = jax.grad(lambda p: jnp.sum(lx.apply(p, x) ** 2))(params)
        gm = jax.grad(lambda p: jnp.sum(lm.apply(p, x) ** 2))(params)
        for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(gx)[0], key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_flatten_with_path(gm)[0], key=lambda t: str(t[0])),
        ):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3, err_msg=str(ka))


class TestMixingLayerPallasBackend:
    def test_pallas_backend_matches_xla(self):
        import jax
        from spectral_tpu.layers.spectral_layers import SpectralMixingLayer

        T, D = 256, 128  # pow2 T; D >= one channel block
        lx = SpectralMixingLayer(embed_dim=D)
        lp = SpectralMixingLayer(embed_dim=D, fft_backend="pallas")
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, T, D)).astype(np.float32))
        params = lx.init(jax.random.PRNGKey(0), x)
        params = jax.tree.map(
            lambda a: a + 0.01 * np.random.default_rng(1).standard_normal(a.shape).astype(a.dtype), params
        )
        yx = lx.apply(params, x)
        yp = lp.apply(params, x)
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yx), rtol=2e-4, atol=2e-4)

    def test_pallas_backend_grads_match(self):
        import jax
        from spectral_tpu.layers.spectral_layers import SpectralMixingLayer

        T, D = 128, 128
        lx = SpectralMixingLayer(embed_dim=D)
        lp = SpectralMixingLayer(embed_dim=D, fft_backend="pallas")
        x = jnp.asarray(np.random.default_rng(2).standard_normal((2, T, D)).astype(np.float32))
        params = lx.init(jax.random.PRNGKey(0), x)
        gx = jax.grad(lambda p: jnp.sum(lx.apply(p, x) ** 2))(params)
        gp = jax.grad(lambda p: jnp.sum(lp.apply(p, x) ** 2))(params)
        for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(gx)[0], key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_flatten_with_path(gp)[0], key=lambda t: str(t[0])),
        ):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3, err_msg=str(ka))
