"""Shared lab kit for the debugging-ladder experiments.

The reference's ``experiments/`` directory is archaeology: a family of tiny
model variants used to bisect WHY the original spectral LM wouldn't learn
(FFT on the wrong axis, time-domain mixing after the IFFT, too-conservative
init).  Each reference file re-declares its own variant; here the variants
are one parameterized Flax module and each experiment script asks one
question.  (reference: experiments/*.py — behaviors, not code.)
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

# the ladder runs tiny host-loop models: pin CPU (the session may pre-pin a
# tunneled TPU chip, which serializes jobs and pays multi-ms RTT per step)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from spectral_tpu.train.evaluate import cross_entropy


class LabModel(nn.Module):
    """Tiny byte LM with selectable mixing variant.

    variants (each mirrors one reference experiment's model):
      linear          — NO FFT, pure Linear (sanity_check_linear.py)
      minimal         — embed -> Linear -> head, no residual/norm
                        (sanity_check_minimal.py)
      time_mix        — THE ORIGINAL BUG: rfft -> irfft round-trip, then the
                        learnable mixing applied in the TIME domain (the
                        round-trip is an identity; no context mixing happens)
      freq_mix        — THE FIX: learnable per-bin complex filter applied IN
                        the frequency domain (fix_frequency_mixing.py)
      identity_init   — freq_mix with the filter initialized to identity:
                        starts as a pass-through, learns to mix
                        (test_identity_init.py)
      normal_residual — freq_mix with normal-init filter but a strong
                        residual connection (test_normal_init.py)
    """

    variant: str = "freq_mix"
    d: int = 128
    vocab: int = 256

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T = x.shape
        h = nn.Embed(self.vocab, self.d, name="embed")(x)

        if self.variant == "minimal":
            h = nn.Dense(self.d, name="mix")(h)
            return nn.Dense(self.vocab, name="head")(h)

        if self.variant == "linear":
            h = h + nn.Dense(self.d, name="mix")(nn.LayerNorm(name="ln")(h))
            return nn.Dense(self.vocab, name="head")(nn.LayerNorm(name="ln_f")(h))

        # spectral variants: rfft over the SEQUENCE axis (axis=1 — the whole
        # point of debug_fft_axis.py)
        residual = h
        hf = jnp.fft.rfft(h.astype(jnp.float32), axis=1)  # [B, F, D]
        F = hf.shape[1]

        if self.variant == "time_mix":
            # the bug: round-trip (identity) then mix in time — each position
            # only ever sees itself, so no context flows
            y = jnp.fft.irfft(hf, n=T, axis=1)
            y = nn.Dense(self.d, name="mix")(y)
        else:
            if self.variant == "identity_init":
                wr = self.param("w_real", nn.initializers.ones, (F, self.d))
                wi = self.param("w_imag", nn.initializers.zeros, (F, self.d))
            else:  # freq_mix / normal_residual
                wr = self.param("w_real", nn.initializers.normal(0.02), (F, self.d))
                wi = self.param("w_imag", nn.initializers.normal(0.02), (F, self.d))
            yf = hf * jax.lax.complex(wr, wi)[None]
            y = jnp.fft.irfft(yf, n=T, axis=1)

        if self.variant == "normal_residual":
            h = residual + 0.1 * y  # strong residual, small mixing step
        else:
            h = residual + y
        h = nn.LayerNorm(name="ln_f")(h)
        return nn.Dense(self.vocab, name="head")(h)


def sentence_batch(text: bytes, T: int = 64):
    ids = np.frombuffer(text, dtype=np.uint8).astype(np.int32)
    assert len(ids) > T
    return jnp.asarray(ids[:T][None]), jnp.asarray(ids[1 : T + 1][None])


def overfit(model, x, y, steps: int = 400, lr: float = 3e-3, seed: int = 0, log_every: int = 100):
    """Adam overfit loop; returns the loss trace (the ladder's yardstick)."""
    params = model.init(jax.random.PRNGKey(seed), x)["params"]
    tx = optax.adam(lr)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(lambda p: cross_entropy(model.apply({"params": p}, x), y))(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    trace = []
    for i in range(steps):
        params, state, l = step(params, state)
        trace.append(float(l))
        if log_every and i % log_every == 0:
            print(f"  step {i:4d}: loss {trace[-1]:.4f}")
    print(f"  final loss: {trace[-1]:.4f}")
    return params, trace
