"""Wirtinger-calculus complex gradients as ``jax.custom_vjp`` rules.

TPU-native re-expression of the reference's hand-rolled complex autograd
(reference: fft_tensor/wirtinger_ops.py:20-82 ``WirtingerGradient`` and
fft_lm/frequency_native.py:80-121 ``FrequencyConvFunc``).

Why custom rules instead of plain jnp autodiff: the reference defines its
backward formulas explicitly (conjugate-multiply rules, batch-summed weight
grads) and the parity contract (BASELINE.md "north star") requires matching
those formulas bit-for-bit in fp32.  These ``custom_vjp`` rules reproduce the
exact reference arithmetic; the pytest golden gates compare them against a
freshly-written torch implementation of the same equations.

Parameters are stored as separate real/imag float32 arrays (like the
reference's ``ComplexParameter``, wirtinger_ops.py:85-142) — this also keeps
optimizer states real, which optax handles without complex-dtype special
cases.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# wirtinger_multiply: y = x * w with conjugate-multiply backward
# ---------------------------------------------------------------------------


@jax.custom_vjp
def wirtinger_multiply(x: jax.Array, w: jax.Array) -> jax.Array:
    """Elementwise complex filter ``y = x * w`` with Wirtinger backward.

    ``x`` is [B, ...] complex, ``w`` broadcasts against it with leading dim 1
    (the reference always passes ``weight_broadcast`` of shape (1, k, D),
    wirtinger_ops.py:192-194).

    Backward (reference: wirtinger_ops.py:53-82):
        grad_x = g * conj(w)
        grad_w = sum_batch(g * conj(x))   (dim 0, keepdim)
    """
    return x * w


def _wm_fwd(x, w):
    return x * w, (x, w)


def _wm_bwd(res, g):
    # JAX's complex cotangents are the CONJUGATE of torch's (verified
    # numerically in tests/unit/test_wirtinger.py): at every complex edge,
    # g_jax = conj(g_torch).  Expressing the reference's rules
    #   grad_x_torch = g_torch * conj(w),  grad_w_torch = sum_0(g_torch*conj(x))
    # in JAX's convention (conjugate both sides) gives the forms below.
    x, w = res
    grad_x = g * w
    grad_w = jnp.sum(g * x, axis=0, keepdims=True)
    return grad_x, grad_w


wirtinger_multiply.defvjp(_wm_fwd, _wm_bwd)


@jax.custom_vjp
def wirtinger_multiply_ri(x: jax.Array, w_real: jax.Array, w_imag: jax.Array) -> jax.Array:
    """Like :func:`wirtinger_multiply` but with the weight as real/imag parts.

    Matches the full reference chain ``torch.complex(w_real, w_imag)`` →
    ``WirtingerGradient.apply`` (wirtinger_ops.py:132-134, 192-194): the
    complex weight grad ``sum_batch(g * conj(x))`` lands componentwise on the
    real/imag leaves (torch's ``torch.complex`` backward).
    """
    return x * jax.lax.complex(w_real, w_imag)


def _wmri_fwd(x, w_real, w_imag):
    w = jax.lax.complex(w_real, w_imag)
    return x * w, (x, w)


def _wmri_bwd(res, g):
    # Same convention translation as _wm_bwd (g_jax = conj(g_torch)).  The
    # torch chain torch.complex(wr, wi) -> WirtingerGradient gives
    #   wr.grad = Re(sum_0(g_torch*conj(x))) =  Re(sum_0(g_jax*x))
    #   wi.grad = Im(sum_0(g_torch*conj(x))) = -Im(sum_0(g_jax*x))
    x, w = res
    grad_x = g * w
    gw = jnp.sum(g * x, axis=0, keepdims=True)
    gw = jnp.reshape(gw, np.shape(w))  # w may broadcast; shapes match in practice
    return grad_x, jnp.real(gw), -jnp.imag(gw)


wirtinger_multiply_ri.defvjp(_wmri_fwd, _wmri_bwd)


# ---------------------------------------------------------------------------
# frequency_conv: the freq-native causal-conv with explicit backward
# ---------------------------------------------------------------------------


@jax.custom_vjp
def frequency_conv(x_freq: jax.Array, k_freq: jax.Array, gain: jax.Array) -> jax.Array:
    """Frequency-domain convolution ``y = x * k̂ * gain`` with explicit grads.

    Shapes: x_freq [B, F, C] complex, k_freq [F] complex, gain [C] real.

    Backward reproduces ``FrequencyConvFunc.backward`` exactly
    (reference: fft_lm/frequency_native.py:107-121):
        grad_x    = g * conj(k̂) * gain
        grad_k    = sum_{B,C}(g * conj(x) * gain)
        grad_gain = Re(sum_{B,F}(g * x * k̂))
    """
    return x_freq * k_freq[None, :, None] * gain[None, None, :].astype(x_freq.real.dtype)


def _fc_fwd(x_freq, k_freq, gain):
    y = x_freq * k_freq[None, :, None] * gain[None, None, :].astype(x_freq.real.dtype)
    return y, (x_freq, k_freq, gain)


def _fc_bwd(res, g):
    # Reference formulas translated into JAX's conjugate cotangent convention
    # (g_jax = conj(g_torch), see _wm_bwd):
    #   grad_x_torch = g_t*conj(k̂)*gain          -> g_j*k̂*gain
    #   grad_k_torch = sum_{B,C}(g_t*conj(x)*g)   -> sum_{B,C}(g_j*x*gain)
    #   grad_gain    = Re(sum_{B,F}(g_t*x*k̂))    == Re(sum_{B,F}(g_j*conj(x)*conj(k̂)))
    x_freq, k_freq, gain = res
    gr = gain[None, None, :].astype(x_freq.real.dtype)
    grad_x = g * k_freq[None, :, None] * gr
    grad_k = jnp.sum(g * x_freq * gr, axis=(0, 2))
    grad_gain = jnp.real(jnp.sum(g * jnp.conj(x_freq) * jnp.conj(k_freq)[None, :, None], axis=(0, 1)))
    return grad_x, grad_k, grad_gain.astype(gain.dtype)


frequency_conv.defvjp(_fc_fwd, _fc_bwd)


# ---------------------------------------------------------------------------
# Complex parameter initialisation (reference: wirtinger_ops.py:93-130)
# ---------------------------------------------------------------------------


def complex_init(init_mode: str, shape: Sequence[int]):
    """Return (real_init, imag_init) flax initializers for a complex param.

    Modes mirror the reference's ``ComplexParameter.__init__``:
      * ``xavier``  — U(-b, b) on both parts, b = sqrt(3/(fan_in+fan_out))
      * ``kaiming`` — N(0, 2/shape[0]) on both parts
      * ``uniform`` — uniform direction on the unit circle (|w| = 1)
      * ``ones``    — magnitude 1, phase 0 (identity pass-through)
    """
    shape = tuple(int(s) for s in shape)

    if init_mode == "xavier":
        bound = float(np.sqrt(3.0 / (shape[0] + shape[1]))) if len(shape) == 2 else float(np.sqrt(3.0 / shape[0]))

        def init_r(key, s, dtype=jnp.float32):
            return jax.random.uniform(key, s, dtype, -bound, bound)

        return init_r, init_r
    if init_mode == "kaiming":
        std = float(np.sqrt(2.0 / shape[0]))

        def init_n(key, s, dtype=jnp.float32):
            return jax.random.normal(key, s, dtype) * std

        return init_n, init_n
    if init_mode == "uniform":
        # Unit-circle init: uniform angle. (The reference samples two uniforms
        # and normalizes — same manifold, bin-angle distribution differs only
        # in measure; both give |w| = 1 exactly.)
        def init_r(key, s, dtype=jnp.float32):
            ang = jax.random.uniform(key, s, dtype, -np.pi, np.pi)
            return jnp.cos(ang)

        def init_i(key, s, dtype=jnp.float32):
            ang = jax.random.uniform(key, s, dtype, -np.pi, np.pi)
            return jnp.sin(ang)

        return init_r, init_i
    if init_mode == "ones":
        return (lambda key, s, dtype=jnp.float32: jnp.ones(s, dtype)), (
            lambda key, s, dtype=jnp.float32: jnp.zeros(s, dtype)
        )
    raise ValueError(f"Unknown init_mode: {init_mode}")


class ComplexParameter(nn.Module):
    """Learnable complex parameter stored as real+imag float32 leaves.

    Reference: fft_tensor/wirtinger_ops.py:85-142.  ``__call__`` returns the
    complex64 value; ``magnitude``/``phase`` are monitoring helpers.
    """

    shape: tuple
    init_mode: str = "xavier"

    def setup(self):
        init_r, init_i = complex_init(self.init_mode, self.shape)
        self.real = self.param("real", init_r, self.shape)
        self.imag = self.param("imag", init_i, self.shape)

    def __call__(self) -> jax.Array:
        return jax.lax.complex(self.real, self.imag)

    def magnitude(self) -> jax.Array:
        return jnp.sqrt(self.real**2 + self.imag**2)

    def phase(self) -> jax.Array:
        return jnp.arctan2(self.imag, self.real)


def _self_test():  # pragma: no cover - CLI self-test (reference :206-393)
    """python -m spectral_tpu.ops.wirtinger — the 4-part Wirtinger suite."""
    import numpy as np
    import optax

    rng = np.random.default_rng(0)
    print("=== 1. Gradient flow through the complex multiply ===")
    x = jnp.asarray((rng.standard_normal((2, 8, 16)) + 1j * rng.standard_normal((2, 8, 16))).astype(np.complex64))
    wr = jnp.asarray(rng.standard_normal((1, 8, 16)).astype(np.float32))
    wi = jnp.asarray(rng.standard_normal((1, 8, 16)).astype(np.float32))
    gr, gi = jax.grad(lambda wr, wi: jnp.sum(jnp.abs(wirtinger_multiply_ri(x, wr, wi))), argnums=(0, 1))(wr, wi)
    print(f"  real grad norm {float(jnp.linalg.norm(gr)):.4f}  imag grad norm {float(jnp.linalg.norm(gi)):.4f}")
    assert float(jnp.linalg.norm(gr)) > 0 and float(jnp.linalg.norm(gi)) > 0

    print("=== 2. Phase learning (50 Adam steps) ===")
    D, k = 16, 4
    target_phase = rng.standard_normal((D, k)).astype(np.float32)
    target = np.cos(target_phase) + 1j * np.sin(target_phase)
    init_r, init_i = complex_init("uniform", (D, k))
    params = {"r": init_r(jax.random.PRNGKey(0), (D, k)), "i": init_i(jax.random.PRNGKey(1), (D, k))}
    tx = optax.adam(0.1)
    st = tx.init(params)
    p0 = np.arctan2(np.asarray(params["i"]), np.asarray(params["r"]))
    for _ in range(50):
        g = jax.grad(lambda p: jnp.mean(jnp.abs(jax.lax.complex(p["r"], p["i"]) - target) ** 2))(params)
        u, st = tx.update(g, st)
        params = optax.apply_updates(params, u)
    p1 = np.arctan2(np.asarray(params["i"]), np.asarray(params["r"]))
    change = float(np.linalg.norm(p1 - p0))
    print(f"  phase change: {change:.4f} (must exceed 0.1)")
    assert change > 0.1

    print("=== 3/4. Magnitude+phase training (frequency_conv grads) ===")
    kf = jnp.asarray((rng.standard_normal(9) + 1j * rng.standard_normal(9)).astype(np.complex64))
    gain = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    xf = jnp.asarray((rng.standard_normal((2, 9, 16)) + 1j * rng.standard_normal((2, 9, 16))).astype(np.complex64))
    gk, gg = jax.grad(lambda kf, g: jnp.sum(jnp.abs(frequency_conv(xf, kf, g))), argnums=(0, 1))(kf, gain)
    print(f"  kernel grad {float(jnp.linalg.norm(gk)):.4f}  gain grad {float(jnp.linalg.norm(gg)):.4f}")
    assert float(jnp.linalg.norm(gk)) > 0 and float(jnp.linalg.norm(gg)) > 0
    print("ALL WIRTINGER TESTS PASSED")


if __name__ == "__main__":
    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    _self_test()
