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
