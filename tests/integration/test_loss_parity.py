"""Loss-curve parity: our jitted trainer vs a fresh torch reference model.

The BASELINE.md contract is "LM loss curves match the reference".  This gate
builds the torch model fresh from the reference equations
(train_fixed_full.py:427-618), copies OUR initialization into it, feeds both
sides identical batches, steps both with AdamW at identical hyperparameters,
and requires the loss trajectories to track each other in fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from spectral_tpu.models.backbone import FixedSpectralLM
from spectral_tpu.models.config import TrainConfig
from spectral_tpu.train.evaluate import cross_entropy


class TorchFixedSpectralBlock(torch.nn.Module):
    """Fresh torch implementation of the reference block equations."""

    def __init__(self, d_model, seq_len, kernel_len, transition_bins):
        super().__init__()
        self.kernel_len = kernel_len
        self.transition_bins = transition_bins
        self.ln = torch.nn.LayerNorm(d_model, eps=1e-6)  # match flax eps
        self.kernel = torch.nn.Parameter(torch.zeros(kernel_len))
        self.gain = torch.nn.Parameter(torch.ones(d_model))
        n_fft = 1
        while n_fft < seq_len + kernel_len - 1:
            n_fft *= 2
        self.max_bins = n_fft // 2 + 1
        self.gate_freq_logits = torch.nn.Parameter(torch.ones(self.max_bins) * 2.0)
        self.gate_ctx = torch.nn.Linear(d_model, d_model)
        self.ffn_ln = torch.nn.LayerNorm(d_model, eps=1e-6)
        self.ffn_in = torch.nn.Linear(d_model, 2 * d_model)
        self.ffn_out = torch.nn.Linear(2 * d_model, d_model)

    def forward(self, x, cutoff=None):
        residual = x
        x = self.ln(x)
        B, T, C = x.shape
        n_fft = 1
        while n_fft < T + self.kernel_len - 1:
            n_fft *= 2
        k = torch.zeros(n_fft)
        k[: self.kernel_len] = self.kernel
        k_freq = torch.fft.rfft(k)
        x_pad = torch.nn.functional.pad(x, (0, 0, 0, n_fft - T))
        x_freq = torch.fft.rfft(x_pad, dim=1)
        y_freq = x_freq * k_freq[None, :, None] * self.gain[None, None, :]
        fbins = y_freq.size(1)
        g_freq = torch.sigmoid(self.gate_freq_logits[:fbins])
        pooled = x.mean(dim=1)
        g_ctx = torch.sigmoid(self.gate_ctx(pooled))
        y_freq = y_freq * g_freq[None, :, None] * g_ctx[:, None, :]
        if cutoff is not None and cutoff < fbins:
            trans = min(self.transition_bins, cutoff)
            mask = torch.ones(fbins)
            start = cutoff - trans
            if trans > 0:
                t = torch.linspace(0, 1, steps=trans)
                mask[start:cutoff] = 0.5 * (1.0 + torch.cos(torch.pi * t))
            mask[cutoff:] = 0.0
            y_freq = y_freq * mask[None, :, None]
        y = torch.fft.irfft(y_freq, n=n_fft, dim=1)[:, :T, :]
        x = residual + y
        h = self.ffn_ln(x)
        h = self.ffn_in(h)
        h = torch.nn.functional.gelu(h)
        h = self.ffn_out(h)
        return x + h


class TorchLM(torch.nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.embed = torch.nn.Embedding(cfg.vocab_size, cfg.d_model)
        self.blocks = torch.nn.ModuleList(
            [
                TorchFixedSpectralBlock(cfg.d_model, cfg.seq_len, cfg.kernel_len, cfg.jpeg_transition)
                for _ in range(cfg.n_layers)
            ]
        )
        self.ln_f = torch.nn.LayerNorm(cfg.d_model, eps=1e-6)

    def forward(self, x, cutoff=None):
        h = self.embed(x)
        for blk in self.blocks:
            h = blk(h, cutoff=cutoff)
        h = self.ln_f(h)
        return h @ self.embed.weight.t()


def copy_params_to_torch(flax_params, tmodel, n_layers):
    with torch.no_grad():
        tmodel.embed.weight.copy_(torch.tensor(np.asarray(flax_params["embed"]["embedding"])))
        for i in range(n_layers):
            bp = flax_params[f"block_{i}"]
            tb = tmodel.blocks[i]
            tb.ln.weight.copy_(torch.tensor(np.asarray(bp["ln"]["scale"])))
            tb.ln.bias.copy_(torch.tensor(np.asarray(bp["ln"]["bias"])))
            tb.kernel.copy_(torch.tensor(np.asarray(bp["kernel"])))
            tb.gain.copy_(torch.tensor(np.asarray(bp["gain"])))
            tb.gate_freq_logits.copy_(torch.tensor(np.asarray(bp["gate_freq_logits"])))
            tb.gate_ctx.weight.copy_(torch.tensor(np.asarray(bp["gate_ctx"]["kernel"]).T))
            tb.gate_ctx.bias.copy_(torch.tensor(np.asarray(bp["gate_ctx"]["bias"])))
            tb.ffn_ln.weight.copy_(torch.tensor(np.asarray(bp["ffn"]["ffn_ln"]["scale"])))
            tb.ffn_ln.bias.copy_(torch.tensor(np.asarray(bp["ffn"]["ffn_ln"]["bias"])))
            tb.ffn_in.weight.copy_(torch.tensor(np.asarray(bp["ffn"]["ffn_in"]["kernel"]).T))
            tb.ffn_in.bias.copy_(torch.tensor(np.asarray(bp["ffn"]["ffn_in"]["bias"])))
            tb.ffn_out.weight.copy_(torch.tensor(np.asarray(bp["ffn"]["ffn_out"]["kernel"]).T))
            tb.ffn_out.bias.copy_(torch.tensor(np.asarray(bp["ffn"]["ffn_out"]["bias"])))
        tmodel.ln_f.weight.copy_(torch.tensor(np.asarray(flax_params["ln_f"]["scale"])))
        tmodel.ln_f.bias.copy_(torch.tensor(np.asarray(flax_params["ln_f"]["bias"])))


class TestLossCurveParity:
    def test_training_losses_track_torch(self):
        # causal_taps=False: the torch oracle implements the reference
        # equations verbatim (the production default diverges deliberately —
        # see ops/fftc.causal_filter_taps)
        cfg = TrainConfig(
            causal_taps=False,
            d_model=32, n_layers=2, seq_len=64, kernel_len=16, jpeg_transition=8,
            batch_size=4, dropout=0.0, lr=1e-3, weight_decay=0.0,
        )
        model = FixedSpectralLM(cfg)
        rng = np.random.default_rng(0)
        x0 = jnp.zeros((cfg.batch_size, cfg.seq_len), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x0)["params"]

        tmodel = TorchLM(cfg)
        copy_params_to_torch(params, tmodel, cfg.n_layers)

        # identical fixed batches for both sides
        batches = [
            (
                rng.integers(0, 256, (cfg.batch_size, cfg.seq_len)).astype(np.int32),
                rng.integers(0, 256, (cfg.batch_size, cfg.seq_len)).astype(np.int32),
            )
            for _ in range(10)
        ]
        cutoff = 24

        # ---- jax side: plain adam (torch.optim.Adam equivalent)
        tx = optax.adam(cfg.lr, b1=0.9, b2=0.999, eps=1e-8)
        state = tx.init(params)

        @jax.jit
        def step(p, s, bx, by):
            l, g = jax.value_and_grad(
                lambda p: cross_entropy(
                    model.apply({"params": p}, bx, cutoff=jnp.int32(cutoff), deterministic=True), by
                )
            )(p)
            u, s = tx.update(g, s)
            return optax.apply_updates(p, u), s, l

        jax_losses = []
        p = params
        for bx, by in batches:
            p, state, l = step(p, state, jnp.asarray(bx), jnp.asarray(by))
            jax_losses.append(float(l))

        # ---- torch side
        opt = torch.optim.Adam(tmodel.parameters(), lr=cfg.lr, betas=(0.9, 0.999), eps=1e-8)
        loss_fn = torch.nn.CrossEntropyLoss()
        torch_losses = []
        for bx, by in batches:
            opt.zero_grad()
            logits = tmodel(torch.tensor(bx.astype(np.int64)), cutoff=cutoff)
            loss = loss_fn(logits.reshape(-1, 256), torch.tensor(by.reshape(-1).astype(np.int64)))
            loss.backward()
            opt.step()
            torch_losses.append(float(loss.item()))

        # trajectories must track: same start, same descent
        np.testing.assert_allclose(jax_losses[0], torch_losses[0], rtol=1e-4)
        np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3)
