"""Wirtinger-gradient parity gates vs a torch implementation of the same math.

The torch code here is written fresh from the reference's documented equations
(wirtinger_ops.py:53-82, frequency_native.py:107-121) and acts as the golden
oracle: the jax custom_vjp rules must reproduce its gradients in fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from spectral_tpu.ops.wirtinger import (
    frequency_conv,
    wirtinger_multiply,
    wirtinger_multiply_ri,
    complex_init,
)


class _TorchWirtinger(torch.autograd.Function):
    """Golden oracle: y = x*w; grad_x = g*conj(w); grad_w = sum_0(g*conj(x))."""

    @staticmethod
    def forward(ctx, x, w):
        ctx.save_for_backward(x, w)
        return x * w

    @staticmethod
    def backward(ctx, g):
        x, w = ctx.saved_tensors
        return g * torch.conj(w), (g * torch.conj(x)).sum(dim=0, keepdim=True)


def _rand_complex(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)


class TestWirtingerMultiply:
    def test_forward(self):
        rng = np.random.default_rng(0)
        x = _rand_complex(rng, (4, 8, 16))
        w = _rand_complex(rng, (1, 8, 16))
        y = np.asarray(wirtinger_multiply(jnp.asarray(x), jnp.asarray(w)))
        np.testing.assert_allclose(y, x * w, atol=1e-6)

    def test_end_to_end_grads_match_torch(self):
        """Full chain: real x -> fft -> wirtinger filter on low bins -> ifft.real
        -> real loss.  Grads on (x, w_real, w_imag) must match torch exactly.

        This is the BASELINE.md fp32 bit-parity contract for the spectral-mix
        fwd+bwd (SURVEY.md §3.6)."""
        rng = np.random.default_rng(1)
        B, T, D, k = 2, 32, 8, 8
        x_np = rng.standard_normal((B, T, D)).astype(np.float32)
        wr_np = rng.standard_normal((D, k)).astype(np.float32)
        wi_np = rng.standard_normal((D, k)).astype(np.float32)
        # fixed random projection so the loss is a generic real functional
        p_np = rng.standard_normal((B, T, D)).astype(np.float32)

        # ---- torch golden
        xt = torch.tensor(x_np, requires_grad=True)
        wrt = torch.tensor(wr_np, requires_grad=True)
        wit = torch.tensor(wi_np, requires_grad=True)
        xf = torch.fft.fft(xt, dim=1)
        w = torch.complex(wrt, wit)  # (D, k)
        wb = w[:, :k].T.unsqueeze(0)  # (1, k, D)
        filt = _TorchWirtinger.apply(xf[:, :k, :], wb)
        full = torch.zeros_like(xf)
        full[:, :k, :] = filt
        yt = torch.fft.ifft(full, dim=1).real
        loss_t = (yt * torch.tensor(p_np)).sum()
        loss_t.backward()

        # ---- jax
        def loss_fn(x, wr, wi):
            xf = jnp.fft.fft(x, axis=1)
            wb_r = wr[:, :k].T[None]
            wb_i = wi[:, :k].T[None]
            filt = wirtinger_multiply_ri(xf[:, :k, :], wb_r, wb_i)
            full = jnp.zeros_like(xf).at[:, :k, :].set(filt)
            y = jnp.fft.ifft(full, axis=1).real
            return jnp.sum(y * p_np)

        loss_j, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
            jnp.asarray(x_np), jnp.asarray(wr_np), jnp.asarray(wi_np)
        )

        np.testing.assert_allclose(float(loss_j), float(loss_t.item()), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(grads[1]), wrt.grad.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(grads[2]), wit.grad.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(grads[0]), xt.grad.numpy(), rtol=1e-4, atol=1e-4)

    def test_phase_learning(self):
        """Port of the reference self-test (wirtinger_ops.py:252-294): a
        unit-circle-init filter trained toward a random-phase target must move
        its phase by > 0.1 over 50 Adam steps."""
        import optax

        rng = np.random.default_rng(2)
        D, k = 16, 4
        target_phase = rng.standard_normal((D, k)).astype(np.float32)
        target = np.cos(target_phase) + 1j * np.sin(target_phase)

        init_r, init_i = complex_init("uniform", (D, k))
        key = jax.random.PRNGKey(0)
        params = {"real": init_r(key, (D, k)), "imag": init_i(jax.random.fold_in(key, 1), (D, k))}

        def loss_fn(p):
            w = jax.lax.complex(p["real"], p["imag"])
            return jnp.mean(jnp.abs(w - target) ** 2)

        tx = optax.adam(0.1)
        state = tx.init(params)
        phase0 = np.arctan2(np.asarray(params["imag"]), np.asarray(params["real"]))
        for _ in range(50):
            g = jax.grad(loss_fn)(params)
            updates, state = tx.update(g, state)
            params = jax.tree.map(lambda a, b: a + b, params, updates)
        phase1 = np.arctan2(np.asarray(params["imag"]), np.asarray(params["real"]))
        assert np.linalg.norm(phase1 - phase0) > 0.1


class _TorchFreqConv(torch.autograd.Function):
    """Golden oracle for FrequencyConvFunc (frequency_native.py:92-121)."""

    @staticmethod
    def forward(ctx, x, k, g):
        ctx.save_for_backward(x, k, g)
        return x * k.unsqueeze(0).unsqueeze(-1) * g.unsqueeze(0).unsqueeze(0)

    @staticmethod
    def backward(ctx, go):
        x, k, g = ctx.saved_tensors
        grad_x = go * k.conj().unsqueeze(0).unsqueeze(-1) * g.unsqueeze(0).unsqueeze(0)
        grad_k = (go * x.conj() * g.unsqueeze(0).unsqueeze(0)).sum(dim=(0, 2))
        grad_g = (go * x * k.unsqueeze(0).unsqueeze(-1)).real.sum(dim=(0, 1))
        return grad_x, grad_k, grad_g


class TestFrequencyConv:
    def test_end_to_end_grads_match_torch(self):
        rng = np.random.default_rng(3)
        B, T, C, K = 2, 32, 8, 8
        x_np = rng.standard_normal((B, T, C)).astype(np.float32)
        k_np = rng.standard_normal(K).astype(np.float32) * 0.1
        g_np = rng.standard_normal(C).astype(np.float32)
        p_np = rng.standard_normal((B, T, C)).astype(np.float32)
        n_fft = 64

        # torch golden: pad -> rfft -> freq conv -> irfft[:T] -> loss
        xt = torch.tensor(x_np, requires_grad=True)
        kt = torch.tensor(k_np, requires_grad=True)
        gt = torch.tensor(g_np, requires_grad=True)
        x_pad = torch.nn.functional.pad(xt, (0, 0, 0, n_fft - T))
        xf = torch.fft.rfft(x_pad, dim=1)
        kpad = torch.zeros(n_fft)
        kfull = kpad.clone()
        kfull[:K] = kt
        kf = torch.fft.rfft(kfull)
        yf = _TorchFreqConv.apply(xf, kf, gt)
        y = torch.fft.irfft(yf, n=n_fft, dim=1)[:, :T, :]
        (y * torch.tensor(p_np)).sum().backward()

        def loss_fn(x, kern, gain):
            from spectral_tpu.ops import fftc

            xf = fftc.rfft_time(x, n_fft)
            kf = fftc.kernel_rfft(kern, n_fft)
            yf = frequency_conv(xf, kf, gain)
            y = fftc.irfft_time(yf, n_fft, T)
            return jnp.sum(y * p_np)

        grads = jax.grad(loss_fn, argnums=(0, 1, 2))(
            jnp.asarray(x_np), jnp.asarray(k_np), jnp.asarray(g_np)
        )
        np.testing.assert_allclose(np.asarray(grads[0]), xt.grad.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(grads[1]), kt.grad.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(grads[2]), gt.grad.numpy(), rtol=1e-4, atol=1e-4)
