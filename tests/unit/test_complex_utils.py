"""Coverage for ops/complex_utils.py — gradient-safe magnitude/phase.

jnp.abs/jnp.angle have NaN gradients at exactly 0+0j (torch returns a zero
subgradient there); curriculum masks create exact spectral zeros, so every
magnitude/phase decomposition in the models routes through
safe_magnitude_phase. These tests pin the contract.
"""

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.ops.complex_utils import polar, safe_magnitude_phase


def _z(seed=0, shape=(16,)):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    )


class TestSafeMagnitudePhase:
    def test_matches_abs_angle_away_from_zero(self):
        z = _z()
        m, p = safe_magnitude_phase(z)
        np.testing.assert_allclose(np.asarray(m), np.abs(np.asarray(z)), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p), np.angle(np.asarray(z)), rtol=1e-5, atol=1e-6)

    def test_value_at_zero(self):
        m, p = safe_magnitude_phase(jnp.zeros((4,), jnp.complex64))
        assert not np.any(np.isnan(np.asarray(m)))
        assert not np.any(np.isnan(np.asarray(p)))
        np.testing.assert_allclose(np.asarray(m), 0.0)

    def test_gradient_finite_at_zero(self):
        # the whole point: grad through a masked-to-zero bin must not be NaN
        def f(ri):
            z = jax.lax.complex(ri[0], ri[1])
            m, p = safe_magnitude_phase(z)
            return jnp.sum(m + 0.1 * p)

        g = jax.grad(f)(jnp.zeros((2, 8), jnp.float32))
        assert not np.any(np.isnan(np.asarray(g)))

    def test_gradient_finite_at_zero_complex_input(self):
        # grad w.r.t. a complex array containing exact zeros (the curriculum
        # mask case) — jnp.angle alone NaNs here
        z = jnp.zeros((8,), jnp.complex64)

        def f(z):
            m, p = safe_magnitude_phase(z)
            return jnp.sum(m + 0.1 * p)

        g = jax.grad(f)(z)
        assert not np.any(np.isnan(np.asarray(g)))

    def test_polar_roundtrip(self):
        z = _z(3)
        m, p = safe_magnitude_phase(z)
        z2 = polar(m, p)
        np.testing.assert_allclose(np.asarray(z2), np.asarray(z), rtol=1e-5, atol=1e-6)
