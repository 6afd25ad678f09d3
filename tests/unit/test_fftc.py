"""Causal FFT-conv primitives: correctness vs direct FIR + mask semantics.

Ports the reference's invariant self-tests (spectral_layers.py:259-319 FFT
round-trip / Parseval) and pins the cutoff-mask semantics of
train_fixed_full.py:539-551 (including the torch.linspace ramp endpoints).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.ops import fftc


class TestFFTRoundTrip:
    def test_roundtrip_error(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 128, 64)).astype(np.float32)
        xf = jnp.fft.fft(jnp.asarray(x), axis=1)
        xr = jnp.fft.ifft(xf, axis=1).real
        err = np.linalg.norm(np.asarray(xr) - x) / np.linalg.norm(x)
        assert err < 1e-5

    def test_parseval(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 128, 64)).astype(np.float32)
        xf = np.asarray(jnp.fft.fft(jnp.asarray(x), axis=1))
        e_time = np.sum(x**2)
        e_freq = np.sum(np.abs(xf) ** 2) / x.shape[1]
        assert abs(e_freq / e_time - 1.0) < 0.01

    def test_rfft_irfft_time_roundtrip(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 100, 32)).astype(np.float32)
        n_fft = fftc.conv_n_fft(100, 29)
        y = fftc.irfft_time(fftc.rfft_time(jnp.asarray(x), n_fft), n_fft, 100)
        np.testing.assert_allclose(np.asarray(y), x, atol=1e-5)


class TestStaticHelpers:
    def test_next_pow2(self):
        assert fftc.next_pow2(1) == 1
        assert fftc.next_pow2(2) == 2
        assert fftc.next_pow2(3) == 4
        assert fftc.next_pow2(1024) == 1024
        assert fftc.next_pow2(1025) == 2048

    def test_conv_freq_bins_matches_reference_formula(self):
        # reference: train_fixed_full.py:129-139 (seq 512, K 128 -> n_fft 1024 -> 513)
        assert fftc.conv_freq_bins(512, 128) == 513
        assert fftc.conv_freq_bins(1024, 128) == 1025
        assert fftc.conv_n_fft(1024, 128) == 2048


class TestCausalConv:
    @pytest.mark.parametrize("T,K", [(64, 16), (100, 29), (128, 128)])
    def test_matches_direct_fir(self, T, K):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, T, 8)).astype(np.float32)
        k = rng.standard_normal(K).astype(np.float32) * 0.1
        y = np.asarray(fftc.causal_fft_conv(jnp.asarray(x), jnp.asarray(k)))
        y_ref = fftc.causal_fft_conv_reference(x, k)
        np.testing.assert_allclose(y, y_ref, atol=2e-4)

    def test_causality(self):
        """Output at position t must not depend on inputs > t."""
        rng = np.random.default_rng(4)
        x = rng.standard_normal((1, 64, 4)).astype(np.float32)
        k = rng.standard_normal(16).astype(np.float32)
        y1 = np.asarray(fftc.causal_fft_conv(jnp.asarray(x), jnp.asarray(k)))
        x2 = x.copy()
        x2[:, 40:, :] = 99.0  # perturb the future
        y2 = np.asarray(fftc.causal_fft_conv(jnp.asarray(x2), jnp.asarray(k)))
        np.testing.assert_allclose(y1[:, :40], y2[:, :40], atol=1e-4)

    def test_gain(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((2, 32, 4)).astype(np.float32)
        k = rng.standard_normal(8).astype(np.float32)
        g = np.asarray([1.0, 2.0, 0.5, -1.0], dtype=np.float32)
        y = np.asarray(fftc.causal_fft_conv(jnp.asarray(x), jnp.asarray(k), jnp.asarray(g)))
        y0 = np.asarray(fftc.causal_fft_conv(jnp.asarray(x), jnp.asarray(k)))
        np.testing.assert_allclose(y, y0 * g[None, None, :], atol=1e-4)


def _torch_mask(n_bins: int, cutoff: int, transition_bins: int) -> np.ndarray:
    """Fresh torch implementation of the reference mask (train_fixed_full.py:539-551)."""
    import torch

    cutoff_idx = min(int(cutoff), n_bins)
    mask = torch.ones(n_bins)
    if cutoff_idx < n_bins:
        trans = min(transition_bins, cutoff_idx)
        start = cutoff_idx - trans
        if trans > 0:
            t = torch.linspace(0, 1, steps=trans)
            mask[start:cutoff_idx] = 0.5 * (1.0 + torch.cos(torch.pi * t))
        mask[cutoff_idx:] = 0.0
    return mask.numpy()


class TestCutoffMask:
    @pytest.mark.parametrize(
        "n_bins,cutoff,trans",
        [
            (513, 128, 32),
            (513, 512, 32),
            (513, 513, 32),  # == n_bins: no roll-off at all
            (513, 600, 32),  # > n_bins: clipped, no roll-off
            (513, 16, 32),  # trans > cutoff: trans clipped to cutoff
            (513, 1, 32),  # trans clipped to 1 -> single linspace(0,1,1)=[0] bin
            (65, 64, 1),
        ],
    )
    def test_matches_torch_reference(self, n_bins, cutoff, trans):
        ours = np.asarray(fftc.cutoff_mask(n_bins, cutoff, trans))
        ref = _torch_mask(n_bins, cutoff, trans)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_none_cutoff_is_identity(self):
        np.testing.assert_array_equal(np.asarray(fftc.cutoff_mask(64, None, 8)), np.ones(64))

    def test_traced_cutoff_no_recompile(self):
        """The mask must accept a traced cutoff (one compile for all cutoffs)."""
        calls = []

        @jax.jit
        def f(c):
            calls.append(1)
            return fftc.cutoff_mask(513, c, 32)

        m1 = f(jnp.int32(128))
        m2 = f(jnp.int32(512))
        assert len(calls) == 1  # traced once
        np.testing.assert_allclose(np.asarray(m1), _torch_mask(513, 128, 32), atol=1e-6)
        np.testing.assert_allclose(np.asarray(m2), _torch_mask(513, 512, 32), atol=1e-6)
