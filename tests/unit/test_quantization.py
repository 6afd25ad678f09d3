"""Polar quantization + production dispatch coverage.

Mirrors the reference's polar_quantization.py self-checks: roundtrip error
bounds per bit allocation, phase precision, and the adaptive magnitude
range behaviour.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.core.polar_quantization import PolarQuantizer, sweep


def _random_spectrum(seed=0, shape=(64, 33)):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    )


class TestPolarQuantizer:
    def test_roundtrip_error_balanced(self):
        z = _random_spectrum()
        q = PolarQuantizer(mag_bits=4, phase_bits=8)
        z2 = q.dequantize(*q.quantize(z))
        err = float(jnp.linalg.norm(z2 - z) / jnp.linalg.norm(z))
        # reference's headline: ~14% at 4+8 bits
        assert err < 0.25, err

    def test_more_bits_less_error(self):
        z = _random_spectrum(1)
        errs = []
        for mb, pb in [(3, 5), (4, 8), (6, 10)]:
            q = PolarQuantizer(mag_bits=mb, phase_bits=pb)
            z2 = q.dequantize(*q.quantize(z))
            errs.append(float(jnp.linalg.norm(z2 - z) / jnp.linalg.norm(z)))
        assert errs[0] > errs[1] > errs[2], errs

    def test_codes_are_uint8_in_range(self):
        z = _random_spectrum(2)
        q = PolarQuantizer(mag_bits=4, phase_bits=8)
        mq, pq = q.quantize(z)
        assert mq.dtype == jnp.uint8 and pq.dtype == jnp.uint8
        assert int(mq.max()) <= 15
        assert int(pq.max()) <= 255

    def test_adaptive_range_is_sticky(self):
        q = PolarQuantizer()
        q.quantize(_random_spectrum(3))
        r1 = q.mag_range
        q.quantize(10.0 * _random_spectrum(4))  # different scale, range must not move
        assert q.mag_range == r1

    def test_dequantize_requires_fit(self):
        q = PolarQuantizer()
        with pytest.raises(AssertionError):
            q.dequantize(jnp.zeros((2, 2), jnp.uint8), jnp.zeros((2, 2), jnp.uint8))

    def test_compression_and_phase_precision(self):
        q = PolarQuantizer(mag_bits=4, phase_bits=8)
        assert q.compression_ratio() == pytest.approx(64.0 / 12.0)
        assert q.phase_precision_degrees() == pytest.approx(360.0 / 256.0)

    def test_sweep_matches_reference_table_shape(self):
        rows = sweep()
        assert [r["label"] for r in rows] == ["Extreme", "Balanced", "High-quality"]
        assert all(r["error"] < 0.6 for r in rows)

    def test_pure_phase_signal_survives(self):
        # constant magnitude -> all error comes from phase bits; 8 bits keeps it tiny
        t = jnp.linspace(0.0, 2 * np.pi, 128, endpoint=False)
        z = jnp.exp(1j * 7 * t).astype(jnp.complex64)
        q = PolarQuantizer(mag_bits=4, phase_bits=8)
        z2 = q.dequantize(*q.quantize(z))
        err = float(jnp.linalg.norm(z2 - z) / jnp.linalg.norm(z))
        assert err < 0.02, err


class TestProductionDispatch:
    def test_conv1d_matches_direct(self):
        from spectral_tpu.core.production_ready import ProductionFrequencyOps

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 1, 96)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((1, 1, 5)).astype(np.float32))
        y = ProductionFrequencyOps.conv1d(x, k, stride=1, padding=2)
        import torch
        import torch.nn.functional as F

        ref = F.conv1d(torch.from_numpy(np.asarray(x)), torch.from_numpy(np.asarray(k)), padding=2)
        np.testing.assert_allclose(np.asarray(y), ref.numpy(), rtol=1e-4, atol=1e-4)

    def test_compress_roundtrip(self):
        from spectral_tpu.core.production_ready import ProductionFrequencyOps

        x = jnp.asarray(np.sin(np.linspace(0, 6.0, 256)).astype(np.float32))
        sst = ProductionFrequencyOps.compress(x, sparsity=0.1)
        rec = sst.to_spatial()
        err = float(jnp.linalg.norm(rec - x) / jnp.linalg.norm(x))
        assert err < 0.05, err  # smooth signal compresses well — the "honest" win
