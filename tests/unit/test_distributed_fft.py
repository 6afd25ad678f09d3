"""Sequence-sharded spectral conv == unsharded conv (8 virtual devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spectral_tpu.ops.fftc import causal_fft_conv, conv_n_fft, kernel_rfft
from spectral_tpu.parallel.distributed_fft import (
    sequence_sharded_causal_conv,
    sequence_sharded_spectral_conv,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def sp_mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("sp",))


class TestSequenceShardedConv:
    def test_matches_unsharded(self):
        rng = np.random.default_rng(0)
        B, T, C, K = 2, 64, 16, 8
        x = rng.standard_normal((B, T, C)).astype(np.float32)
        k = rng.standard_normal(K).astype(np.float32)

        want = np.asarray(causal_fft_conv(jnp.asarray(x), jnp.asarray(k)))

        mesh = sp_mesh(8)
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "sp", None)))
        got = sequence_sharded_causal_conv(xs, jnp.asarray(k), mesh)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_output_stays_time_sharded(self):
        rng = np.random.default_rng(1)
        B, T, C, K = 1, 32, 8, 4
        mesh = sp_mesh(8)
        x = jax.device_put(
            jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32)),
            NamedSharding(mesh, P(None, "sp", None)),
        )
        y = sequence_sharded_causal_conv(x, jnp.asarray(rng.standard_normal(K).astype(np.float32)), mesh)
        spec = y.sharding.spec
        assert spec == P(None, "sp", None)

    def test_filter_variant_matches_reference(self):
        rng = np.random.default_rng(2)
        B, T, C, K = 2, 64, 16, 8
        n_fft = conv_n_fft(T, K)
        x = rng.standard_normal((B, T, C)).astype(np.float32)
        h = np.asarray(kernel_rfft(jnp.asarray(rng.standard_normal(K).astype(np.float32)), n_fft))
        # arbitrary complex filter (gates folded)
        h = h * (0.5 + rng.random(h.shape[0]))

        x_pad = np.pad(x, ((0, 0), (0, n_fft - T), (0, 0)))
        want = np.fft.irfft(np.fft.rfft(x_pad, axis=1) * h[None, :, None], n=n_fft, axis=1)[:, :T, :]

        mesh = sp_mesh(8)
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "sp", None)))
        got = sequence_sharded_spectral_conv(xs, jnp.asarray(h.astype(np.complex64)), mesh, n_fft=n_fft)
        np.testing.assert_allclose(np.asarray(got), want.astype(np.float32), atol=1e-4)


class TestVariantSPPrimitives:
    """Round-4 primitives behind the block VARIANTS' sp routes (VERDICT r3
    #5): per-channel filters through the Ulysses conv (bicameral right
    hemisphere), the 2-element-halo depthwise conv (left hemisphere), and
    the differentiable sharded rfft/irfft pair (frequency-native)."""

    def test_per_channel_filter_matches_unsharded(self):
        rng = np.random.default_rng(7)
        B, T, C, K = 2, 64, 16, 8
        n_fft = conv_n_fft(T, K)
        F = n_fft // 2 + 1
        x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
        h = jnp.asarray((rng.standard_normal((F, C))
                         + 1j * rng.standard_normal((F, C))).astype(np.complex64))

        def ref(x_, h_):
            x_pad = jnp.pad(x_, ((0, 0), (0, n_fft - T), (0, 0)))
            return jnp.fft.irfft(jnp.fft.rfft(x_pad, axis=1) * h_[None],
                                 n=n_fft, axis=1)[:, :T, :]

        mesh = sp_mesh(8)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "sp", None)))
        got = sequence_sharded_spectral_conv(xs, h, mesh, n_fft=n_fft)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x, h)), atol=1e-4)

        # gradients (x AND the complex per-channel filter) vs jax autodiff
        # of the unsharded reference — the custom_vjp's per_channel leg
        def loss_sh(x_, h_):
            return jnp.sum(sequence_sharded_spectral_conv(x_, h_, mesh, n_fft=n_fft) ** 2)

        def loss_ref(x_, h_):
            return jnp.sum(ref(x_, h_) ** 2)

        gx_s, gh_s = jax.grad(loss_sh, (0, 1))(x, h)
        gx_r, gh_r = jax.grad(loss_ref, (0, 1))(x, h)
        np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r), atol=1e-3)
        np.testing.assert_allclose(np.asarray(gh_s), np.asarray(gh_r), atol=1e-3)

    def test_depthwise_halo_conv_matches_lax_conv(self):
        from spectral_tpu.parallel.distributed_fft import (
            sequence_sharded_depthwise_conv3,
        )

        rng = np.random.default_rng(8)
        B, T, C = 2, 64, 16
        x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((3, 1, C)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(C).astype(np.float32))

        def ref(x_, w_, b_):
            x_shift = jnp.pad(x_[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
            return jax.lax.conv_general_dilated(
                x_shift, w_, (1,), [(1, 1)],
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=C) + b_[None, None, :]

        mesh = sp_mesh(8)
        got = sequence_sharded_depthwise_conv3(x, w, b, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x, w, b)),
                                   atol=1e-5)

        g_s = jax.grad(lambda *a: jnp.sum(
            sequence_sharded_depthwise_conv3(*a, mesh) ** 2), (0, 1, 2))(x, w, b)
        g_r = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), (0, 1, 2))(x, w, b)
        for a_, b_ in zip(g_s, g_r):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=1e-5, atol=1e-4)

    def test_sharded_transform_roundtrip_and_grads(self):
        from spectral_tpu.parallel.distributed_fft import (
            sharded_irfft_time,
            sharded_rfft_channel,
        )

        rng = np.random.default_rng(9)
        B, T, C, n_fft = 2, 64, 16, 128
        x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
        mesh = sp_mesh(8)
        zr, zi = sharded_rfft_channel(x, mesh, n_fft=n_fft)
        ref = np.asarray(jnp.fft.rfft(
            jnp.pad(x, ((0, 0), (0, n_fft - T), (0, 0))), axis=1))
        np.testing.assert_allclose(np.asarray(zr), np.real(ref), atol=1e-4)
        np.testing.assert_allclose(np.asarray(zi), np.imag(ref), atol=1e-4)
        y = sharded_irfft_time(zr, zi, mesh, n_fft=n_fft, T=T)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)

        # differentiable END-TO-END — the matmul-FFT locals are plain
        # einsums, so shard_map transposes them without a custom_vjp (what
        # the frequency-native sp path relies on)
        def loss(x_):
            zr_, zi_ = sharded_rfft_channel(x_, mesh, n_fft=n_fft)
            return jnp.sum(sharded_irfft_time(zr_ * 2.0, zi_ * 2.0, mesh,
                                              n_fft=n_fft, T=T) ** 2)

        g = jax.grad(loss)(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(8.0 * x), atol=1e-3)


class TestLongContext:
    def test_seq_64k_sharded_conv(self):
        """The long-context stretch config (BASELINE.json config 5): a 64k-
        token causal spectral conv sharded over the sp axis, exact vs the
        unsharded computation."""
        rng = np.random.default_rng(5)
        B, T, C, K = 1, 65536, 8, 64
        x = (rng.standard_normal((B, T, C)) * 0.1).astype(np.float32)
        k = rng.standard_normal(K).astype(np.float32) * 0.1

        want = np.asarray(causal_fft_conv(jnp.asarray(x), jnp.asarray(k)))

        mesh = sp_mesh(8)
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "sp", None)))
        got = sequence_sharded_causal_conv(xs, jnp.asarray(k), mesh)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)

    def test_spectral_ssm_64k_with_polar_quantized_filter(self):
        """Spectral SSM over a 64k byte stream in 16-byte chunks, with the
        EMA state round-tripped through the polar quantizer each macro-step
        (the BASELINE.json 'polar-quantized filters' stretch)."""
        from spectral_tpu.core.polar_quantization import PolarQuantizer
        from spectral_tpu.models.spectral_ssm import SpectralEMA

        rng = np.random.default_rng(6)
        T, L = 65536, 16
        n_freqs = L // 2 + 1
        bytes_ = rng.integers(0, 256, (1, T)).astype(np.int32)
        xx = (bytes_.reshape(1, T // L, L).astype(np.float32) / 127.5) - 1.0
        chunks = jnp.fft.rfft(jnp.asarray(xx), axis=-1)  # [1, 4096, 9]

        ema = SpectralEMA(n_freqs=n_freqs, rho_init=0.99)
        params = ema.init(jax.random.PRNGKey(0), chunks[:, :2])
        q = PolarQuantizer(mag_bits=4, phase_bits=8)

        state = SpectralEMA.init_state(1, n_freqs)
        S = chunks.shape[1]
        for start in range(0, S, 512):  # macro-steps of 512 chunks
            state = ema.apply(params, chunks[:, start : start + 512], state)
            # quantization barrier on the carried state
            q.mag_range = None  # re-adapt per macro-step
            state = q.dequantize(*q.quantize(state))
        final = np.asarray(state)
        assert np.isfinite(final).all()
        assert 0 < np.abs(final).max() < 1e3
