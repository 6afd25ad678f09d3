"""Parity gates for the direct Toeplitz-matmul conv (ops/toeplitz.py).

Oracle: the pure-jnp FFT conv (rfft -> filter -> irfft), whose own parity
with a fresh torch implementation of the reference equations is pinned in
tests/unit/test_fftc.py.  Both the values AND the custom-vjp gradients must
match XLA autodiff of the oracle at fp32 accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.ops.fftc import (
    causal_filter_taps,
    conv_n_fft,
    cutoff_mask,
    irfft_time,
    kernel_rfft,
    rfft_time,
)
from spectral_tpu.ops.toeplitz import spectral_conv_direct, toeplitz_conv, toeplitz_matrix


def _fft_oracle(x, h_fused, n_fft):
    T = x.shape[1]
    return irfft_time(rfft_time(x, n_fft) * h_fused[None, :, None], n_fft, T)


def _rand_filter(rng, n_fft):
    F = n_fft // 2 + 1
    h = rng.normal(size=F) + 1j * rng.normal(size=F)
    # real spectrum constraints of an rfft of a real signal are NOT required
    # by the conv (the reference trains free gates) — keep it general
    return jnp.asarray(h.astype(np.complex64))


class TestToeplitzConv:
    def setup_method(self):
        self.rng = np.random.default_rng(42)

    @pytest.mark.parametrize("shape,k", [((2, 64, 8), 16), ((1, 96, 4), 32), ((3, 33, 5), 7)])
    def test_forward_parity_vs_fft(self, shape, k):
        B, T, C = shape
        n_fft = conv_n_fft(T, k)
        x = jnp.asarray(self.rng.normal(size=shape).astype(np.float32))
        h = _rand_filter(self.rng, n_fft)
        ref = _fft_oracle(x, h, n_fft)
        got = spectral_conv_direct(x, h, n_fft)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

    def test_exact_with_causal_taps_filter(self):
        """With the causal-taps projection the wrap diagonals vanish and the
        conv is a genuine lower-triangular (causal) operator."""
        B, T, C, k = 2, 64, 4, 16
        n_fft = conv_n_fft(T, k)
        kern = jnp.asarray(self.rng.normal(size=k).astype(np.float32) * 0.1)
        h = kernel_rfft(kern, n_fft) * jax.nn.sigmoid(
            jnp.asarray(self.rng.normal(size=n_fft // 2 + 1).astype(np.float32))
        )
        h = h * cutoff_mask(n_fft // 2 + 1, jnp.int32(20), 8)
        h = causal_filter_taps(h, n_fft, n_fft - T)
        h_time = jnp.fft.irfft(h, n=n_fft)
        M = toeplitz_matrix(h_time.astype(jnp.float32), T, n_fft)
        # strictly causal: upper triangle of M must be ~0
        upper = np.triu(np.asarray(M), k=1)
        assert np.abs(upper).max() < 1e-5
        x = jnp.asarray(self.rng.normal(size=(B, T, C)).astype(np.float32))
        ref = _fft_oracle(x, h, n_fft)
        got = spectral_conv_direct(x, h, n_fft)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

    def test_grads_match_fft_autodiff(self):
        """custom-vjp dx and dh_time vs XLA autodiff through the oracle."""
        B, T, C, k = 2, 48, 6, 16
        n_fft = conv_n_fft(T, k)
        x = jnp.asarray(self.rng.normal(size=(B, T, C)).astype(np.float32))
        h_time = jnp.asarray(self.rng.normal(size=n_fft).astype(np.float32))

        def loss_direct(x, h_time):
            y = toeplitz_conv(x, h_time, n_fft)
            return jnp.sum(jnp.sin(y))  # nonlinear head: nontrivial cotangent

        def loss_fft(x, h_time):
            h = jnp.fft.rfft(h_time)
            y = _fft_oracle(x, h, n_fft)
            return jnp.sum(jnp.sin(y))

        gx_d, gh_d = jax.grad(loss_direct, argnums=(0, 1))(x, h_time)
        gx_f, gh_f = jax.grad(loss_fft, argnums=(0, 1))(x, h_time)
        np.testing.assert_allclose(np.asarray(gx_d), np.asarray(gx_f), atol=3e-4)
        np.testing.assert_allclose(np.asarray(gh_d), np.asarray(gh_f), atol=3e-3, rtol=2e-4)

    def test_grad_through_frequency_filter(self):
        """spectral_conv_direct chains d/dh_fused through its irfft — parity
        vs the oracle's complex filter gradient (Wirtinger convention)."""
        B, T, C, k = 1, 32, 3, 8
        n_fft = conv_n_fft(T, k)
        x = jnp.asarray(self.rng.normal(size=(B, T, C)).astype(np.float32))
        F = n_fft // 2 + 1
        hr = jnp.asarray(self.rng.normal(size=F).astype(np.float32))
        hi = jnp.asarray(self.rng.normal(size=F).astype(np.float32))

        def loss_direct(hr, hi):
            h = jax.lax.complex(hr, hi)
            return jnp.sum(spectral_conv_direct(x, h, n_fft) ** 2)

        def loss_fft(hr, hi):
            h = jax.lax.complex(hr, hi)
            return jnp.sum(_fft_oracle(x, h, n_fft) ** 2)

        gd = jax.grad(loss_direct, argnums=(0, 1))(hr, hi)
        gf = jax.grad(loss_fft, argnums=(0, 1))(hr, hi)
        for a, b in zip(gd, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3, rtol=3e-4)

    def test_jit_and_scan_hoisting(self):
        """The conv matrix depends only on h_time — under a scan over
        micro-batches the build must not blow up compile or results."""
        B, T, C, k = 2, 32, 4, 8
        n_fft = conv_n_fft(T, k)
        xs = jnp.asarray(self.rng.normal(size=(4, B, T, C)).astype(np.float32))
        h_time = jnp.asarray(self.rng.normal(size=n_fft).astype(np.float32))

        @jax.jit
        def scanned(h_time, xs):
            def body(acc, x):
                return acc + jnp.sum(toeplitz_conv(x, h_time, n_fft)), None

            acc, _ = jax.lax.scan(body, 0.0, xs)
            return acc

        total = scanned(h_time, xs)
        direct = sum(float(jnp.sum(toeplitz_conv(xs[i], h_time, n_fft))) for i in range(4))
        assert np.isclose(float(total), direct, rtol=1e-5)


class TestBackboneDirectBackend:
    """fft_backend="direct" through the full model: forward + grads + step."""

    def test_model_forward_matches_xla_backend(self):
        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig

        cfg_x = TrainConfig.from_dict(
            dict(d_model=32, n_layers=2, seq_len=64, kernel_len=16, batch_size=2)
        )
        cfg_d = cfg_x.replace(fft_backend="direct")
        mx, md = FixedSpectralLM(cfg_x), FixedSpectralLM(cfg_d)
        x = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 64)).astype(np.int32))
        params = mx.init(jax.random.PRNGKey(0), x)["params"]
        lx = mx.apply({"params": params}, x, cutoff=20, deterministic=True)
        ld = md.apply({"params": params}, x, cutoff=20, deterministic=True)
        np.testing.assert_allclose(np.asarray(ld), np.asarray(lx), rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("causal_taps", [True, False])
    def test_model_grads_match_xla_backend(self, causal_taps):
        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig
        from spectral_tpu.train.evaluate import cross_entropy

        base = dict(
            d_model=24, n_layers=1, seq_len=48, kernel_len=8, batch_size=2,
            causal_taps=causal_taps,
        )
        cfg_x = TrainConfig.from_dict(base)
        cfg_d = cfg_x.replace(fft_backend="direct")
        mx, md = FixedSpectralLM(cfg_x), FixedSpectralLM(cfg_d)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.integers(0, 256, (2, 48)).astype(np.int32))
        y = jnp.asarray(rng.integers(0, 256, (2, 48)).astype(np.int32))
        params = mx.init(jax.random.PRNGKey(0), x)["params"]

        def loss(m):
            def f(p):
                return cross_entropy(m.apply({"params": p}, x, cutoff=12, deterministic=True), y)
            return jax.value_and_grad(f)(params)

        lx, gx = loss(mx)
        ld, gd = loss(md)
        assert np.isclose(float(lx), float(ld), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gd)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)

    def test_generation_length_path(self):
        """Traced-length decode buffers work under the direct backend."""
        from spectral_tpu.models.backbone import FixedSpectralLM
        from spectral_tpu.models.config import TrainConfig

        cfg = TrainConfig.from_dict(
            dict(d_model=24, n_layers=1, seq_len=64, kernel_len=8, batch_size=1,
                 fft_backend="direct")
        )
        from spectral_tpu.ops.fftc import next_pow2

        m = FixedSpectralLM(cfg)
        rng = np.random.default_rng(2)
        L = 40
        # pow2-bucketed buffer: size so the buffer's n_fft equals the exact
        # window's (the scheme train/sampling.py uses)
        t_b = next_pow2(L + cfg.kernel_len - 1) - cfg.kernel_len + 1
        ids = rng.integers(0, 256, (1, L)).astype(np.int32)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(np.zeros((1, t_b), np.int32)))["params"]
        buf = np.zeros((1, t_b), np.int32)
        buf[0, :L] = ids[0]
        lb = m.apply({"params": params}, jnp.asarray(buf), cutoff=16,
                     deterministic=True, length=jnp.int32(L))
        lw = m.apply({"params": params}, jnp.asarray(ids), cutoff=16,
                     deterministic=True)
        np.testing.assert_allclose(
            np.asarray(lb[:, :L]), np.asarray(lw), rtol=2e-3, atol=2e-3
        )
