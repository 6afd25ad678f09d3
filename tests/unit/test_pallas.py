"""Pallas kernels vs their pure-jnp references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.layers.byte_spectral import byte_dft_features
from spectral_tpu.ops.pallas_byte import byte_dft_magnitudes_pallas, byte_encode_pallas
from spectral_tpu.ops.pallas_spectral import (
    _stockham_fft,
    full_filter_from_rfft,
    fused_spectral_conv,
    fused_spectral_conv_reference,
)


class TestStockhamFFT:
    @pytest.mark.parametrize("n", [2, 8, 64, 256])
    def test_forward_matches_numpy(self, n):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((n, 4)).astype(np.float32)
        re, im = _stockham_fft(jnp.asarray(x), jnp.zeros((n, 4), jnp.float32), inverse=False)
        want = np.fft.fft(x, axis=0)
        np.testing.assert_allclose(np.asarray(re) + 1j * np.asarray(im), want, atol=1e-3)

    def test_inverse_roundtrip(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((128, 8)).astype(np.float32)
        re, im = _stockham_fft(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)), inverse=False)
        re2, im2 = _stockham_fft(re, im, inverse=True)
        np.testing.assert_allclose(np.asarray(re2), x, atol=1e-5)
        np.testing.assert_allclose(np.asarray(im2), 0, atol=1e-5)

    def test_full_filter_conjugate_symmetry(self):
        rng = np.random.default_rng(2)
        h = (rng.standard_normal(33) + 1j * rng.standard_normal(33)).astype(np.complex64)
        full = np.asarray(full_filter_from_rfft(jnp.asarray(h), 64))
        assert full.shape == (64,)
        np.testing.assert_allclose(full[1:32], np.conj(full[33:][::-1]), atol=1e-6)


class TestFusedSpectralConv:
    def test_matches_reference(self):
        rng = np.random.default_rng(3)
        B, T, C, n_fft = 2, 48, 16, 64
        x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
        h = jnp.asarray((rng.standard_normal(33) + 1j * rng.standard_normal(33)).astype(np.complex64))
        s = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32))
        y_ref = fused_spectral_conv_reference(x, h, s, n_fft)
        y_pal = fused_spectral_conv(x, h, s, n_fft, 8, True)  # interpret mode
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=1e-4)

    def test_grads_match_reference_autodiff(self):
        rng = np.random.default_rng(4)
        B, T, C, n_fft = 2, 24, 8, 32
        x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
        h = jnp.asarray((rng.standard_normal(17) + 1j * rng.standard_normal(17)).astype(np.complex64))
        s = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32))
        p = rng.standard_normal((B, T, C)).astype(np.float32)

        g_pal = jax.grad(lambda *a: jnp.sum(fused_spectral_conv(*a, n_fft, 8, True) * p), argnums=(0, 1, 2))(x, h, s)
        g_ref = jax.grad(
            lambda *a: jnp.sum(fused_spectral_conv_reference(*a, n_fft) * p), argnums=(0, 1, 2)
        )(x, h, s)
        for a, b in zip(g_pal, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestPallasByteEncoder:
    def test_magnitudes_match_fft(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.integers(0, 256, (4, 64)).astype(np.int32))
        mag = byte_dft_magnitudes_pallas(x, interpret=True)
        signal = np.asarray(x, np.float32) / 127.5 - 1.0
        want = np.abs(np.fft.fft(signal, axis=1))
        np.testing.assert_allclose(np.asarray(mag), want, atol=1e-3)

    def test_features_match_reference(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.integers(0, 256, (2, 32)).astype(np.int32))
        got = byte_encode_pallas(x, 16, interpret=True)
        want = byte_dft_features(x, 16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


class TestMXUKernel:
    """Transpose-free in-kernel MXU four-step conv (algo='matmul')."""

    def _case(self, B, T, C, NF, per_channel, seed=0):
        import numpy as np

        from spectral_tpu.ops.pallas_spectral import (
            fused_spectral_conv,
            fused_spectral_conv_reference,
        )

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
        shape = (NF // 2 + 1, C) if per_channel else (NF // 2 + 1,)
        h = jnp.asarray(
            (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
        )
        s = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32))
        ref = fused_spectral_conv_reference(x, h, s, NF)
        got = fused_spectral_conv(x, h, s, NF, 128, True, "matmul")
        err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert err < 5e-5, (NF, per_channel, err)

    def test_single_stage(self):
        self._case(2, 48, 8, 64, per_channel=False)
        self._case(2, 48, 8, 64, per_channel=True)

    def test_two_stage(self):
        self._case(2, 100, 16, 256, per_channel=False)
        self._case(2, 100, 16, 256, per_channel=True)

    def test_production_shape(self):
        self._case(1, 1000, 128, 2048, per_channel=False)

    def test_forced_slab_pipeline_matches(self, monkeypatch):
        """Force the k1-slabbed pipeline at small shapes (cheap in interpret
        mode) and require exact agreement with the reference."""
        from spectral_tpu.ops import pallas_spectral as ps

        monkeypatch.setattr(ps, "_pick_slab", lambda n_fft, cb, t, pc: 32)
        self._case(2, 100, 16, 256, per_channel=False)
        self._case(2, 100, 16, 256, per_channel=True)
        self._case(2, 200, 8, 512, per_channel=True)

    def test_flagship_seq4k_shape(self):
        """The VERDICT round-1 cliff: n_fft=4096 per-channel (the seq-4k
        mixing-layer bench shape) must be accepted — unslabbed under the
        raised scoped-VMEM limit, slabbed if the planner says otherwise."""
        self._case(1, 4096, 128, 4096, per_channel=True, seed=7)

    def test_seq4k_backbone_shape(self):
        """Backbone conv at seq 4096: n_fft=8192, shared filter."""
        self._case(1, 4096, 128, 8192, per_channel=False, seed=8)

    def test_slab_planner_kicks_in_at_extreme_sizes(self):
        from spectral_tpu.ops.pallas_spectral import _pick_slab

        assert _pick_slab(2048, 128, 1024, False) == 0  # production shape: unslabbed
        assert _pick_slab(4096, 128, 4096, True) == 0  # bench shape fits the raised limit
        assert _pick_slab(16384, 128, 16384, True) > 0  # extreme: slabbed

    def test_slab_grads_match_reference(self, monkeypatch):
        from spectral_tpu.ops import pallas_spectral as ps

        monkeypatch.setattr(ps, "_pick_slab", lambda n_fft, cb, t, pc: 32)
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((2, 100, 8)).astype(np.float32))
        h = jnp.asarray(
            (rng.standard_normal((129, 8)) + 1j * rng.standard_normal((129, 8))).astype(np.complex64)
        )
        s = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
        p = rng.standard_normal((2, 100, 8)).astype(np.float32)
        g_pal = jax.grad(
            lambda *a: jnp.sum(fused_spectral_conv(*a, 256, 128, True, "matmul") * p), argnums=(0, 1, 2)
        )(x, h, s)
        g_ref = jax.grad(
            lambda *a: jnp.sum(fused_spectral_conv_reference(*a, 256) * p), argnums=(0, 1, 2)
        )(x, h, s)
        for a, b in zip(g_pal, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)

    def test_bwd_slab_planner(self):
        from spectral_tpu.ops.pallas_spectral import _pick_bwd_slab

        # seq-4096 backbone shape: the unslabbed fused bwd fits (round 3)
        assert _pick_bwd_slab(8192, 128, 4096, False) == 0
        # seq-8192 backbone shape: unslabbed overflows, the slab pipeline
        # takes over (this was the round-3 reason seq-8192 training fell
        # back to the XLA matmul-FFT conv)
        s = _pick_bwd_slab(16384, 128, 8192, False)
        assert s is not None and s > 0

    @pytest.mark.parametrize("per_channel", [False, True])
    @pytest.mark.parametrize("T", [100, 99])  # 99: partial stage-1 row pad
    def test_slabbed_fused_bwd_matches_reference(self, monkeypatch, per_channel, T):
        """Force the k2-slabbed BACKWARD kernel at small shapes and require
        grad agreement (x, H, scale) with jax.grad of the jnp reference.
        NF=512 -> (n1, n2) = (128, 4); slab=2 runs two k2-slabs."""
        from spectral_tpu.ops import pallas_spectral as ps

        monkeypatch.setattr(ps, "_pick_bwd_slab", lambda n_fft, cb, t, pc: 2)
        rng = np.random.default_rng(11)
        B, C, NF = 2, 8, 512
        x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
        shape = (NF // 2 + 1, C) if per_channel else (NF // 2 + 1,)
        h = jnp.asarray(
            (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
        )
        s = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32))
        p = rng.standard_normal((B, T, C)).astype(np.float32)
        g_pal = jax.grad(
            lambda *a: jnp.sum(fused_spectral_conv(*a, NF, 128, True, "matmul") * p),
            argnums=(0, 1, 2),
        )(x, h, s)
        g_ref = jax.grad(
            lambda *a: jnp.sum(fused_spectral_conv_reference(*a, NF) * p),
            argnums=(0, 1, 2),
        )(x, h, s)
        for a, b in zip(g_pal, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)

    def test_bf16_compute_mode_close_to_fp32(self):
        """compute_dtype='bfloat16' (single-pass MXU dots, fp32 accum) stays
        within the XLA DEFAULT-precision class (~2e-3 relative on the
        transform) of the fp32 kernel, values AND grads."""
        rng = np.random.default_rng(13)
        B, T, C, NF = 2, 100, 8, 256
        x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
        h = jnp.asarray(
            (rng.standard_normal(129) + 1j * rng.standard_normal(129)).astype(np.complex64)
        )
        s = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32))
        p = rng.standard_normal((B, T, C)).astype(np.float32)

        y32 = fused_spectral_conv(x, h, s, NF, 128, True, "matmul")
        y16 = fused_spectral_conv(x, h, s, NF, 128, True, "matmul", "bfloat16")
        rel = float(jnp.max(jnp.abs(y16 - y32)) / (jnp.max(jnp.abs(y32)) + 1e-9))
        assert rel < 2e-2, rel

        g32 = jax.grad(
            lambda *a: jnp.sum(fused_spectral_conv(*a, NF, 128, True, "matmul") * p),
            argnums=(0, 1, 2),
        )(x, h, s)
        g16 = jax.grad(
            lambda *a: jnp.sum(
                fused_spectral_conv(*a, NF, 128, True, "matmul", "bfloat16") * p
            ),
            argnums=(0, 1, 2),
        )(x, h, s)
        for a, b in zip(g16, g32):
            rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
            assert rel < 2e-2, rel

    def test_grads_flow_through_mxu_algo(self):
        import numpy as np

        from spectral_tpu.ops.pallas_spectral import (
            fused_spectral_conv,
            fused_spectral_conv_reference,
        )

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 50, 8)).astype(np.float32))
        h = jnp.asarray(
            (rng.standard_normal(129) + 1j * rng.standard_normal(129)).astype(np.complex64)
        )
        s = jnp.ones((2, 8), jnp.float32)

        g1 = jax.grad(lambda x: jnp.sum(fused_spectral_conv(x, h, s, 256, 128, True, "matmul") ** 2))(x)
        g2 = jax.grad(lambda x: jnp.sum(fused_spectral_conv_reference(x, h, s, 256) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=2e-4)
