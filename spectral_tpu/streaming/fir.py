"""O(K)-per-token FIR streaming decode.

Reference: scripts/stream_generate_fast.py:31-143.

The causal FFT-conv has a finite K-tap time-domain kernel, so inference can
stream with a ring buffer of the last K pre-norm activations per block:

    y_t = sum_i kernel[i] * xn_{t-i}        (FIR dot, O(K*C))

Approximations inherited from the reference (documented there at :88-96):
* the per-frequency gate is dropped (not representable in finite FIR form);
  it IS exact when the gate is fully open (sigmoid(logits) ~ 1) — the parity
  test pins that case bit-for-bit against the full forward;
* the context gate uses the current token's representation instead of the
  window mean.

TPU-native: warmup is one ``lax.scan`` over the prefix (the reference loops
tokens in Python); the per-token step is a single jitted function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.models.config import TrainConfig

_LN_EPS = 1e-6  # flax nn.LayerNorm default (our training stack)


def _layernorm(x, scale, bias, eps=_LN_EPS):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * scale + bias


def _ffn(p, x):
    h = _layernorm(x, p["ffn_ln"]["scale"], p["ffn_ln"]["bias"])
    h = h @ p["ffn_in"]["kernel"] + p["ffn_in"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["ffn_out"]["kernel"] + p["ffn_out"]["bias"]
    return x + h


class FIRStream:
    """Streaming decoder over a trained FixedSpectralLM param tree.

    Usage:
        stream = FIRStream(params, cfg)
        state = stream.init_state(batch=1)
        state = stream.warmup(state, prefix_ids)          # [B, T0]
        state, logits = stream.next_logits(state, last_id)  # [B] -> [B, 256]
    """

    def __init__(self, params: dict, cfg: TrainConfig):
        # checkpoints restore as numpy leaves; commit to device arrays so the
        # pure functions can close over them under jit
        self.params = jax.tree.map(jnp.asarray, params)
        self.cfg = cfg
        self.n_layers = cfg.n_layers
        self.kernel_len = cfg.kernel_len
        self.d_model = cfg.d_model
        # jit once per instance
        self._step = jax.jit(self._step_impl)
        self._warmup = jax.jit(self._warmup_impl)

    # -- pure functions -----------------------------------------------------

    def _block_step(self, bp: dict, x_t: jax.Array, buf: jax.Array):
        """One token through one block.  x_t: [B, C], buf: [B, K, C]."""
        xn = _layernorm(x_t, bp["ln"]["scale"], bp["ln"]["bias"])
        buf = jnp.roll(buf, shift=-1, axis=1).at[:, -1, :].set(xn)
        k_rev = bp["kernel"][::-1]  # newest weight aligns with last buffer slot
        y = jnp.sum(buf * k_rev[None, :, None], axis=1)
        y = y * bp["gain"][None, :]
        # context gate approximated with the current token's representation
        g_ctx = jax.nn.sigmoid(xn @ bp["gate_ctx"]["kernel"] + bp["gate_ctx"]["bias"])
        y = y * g_ctx
        x = x_t + y
        return _ffn(bp["ffn"], x), buf

    def _token_step(self, params, x_id: jax.Array, bufs):
        """x_id: [B] int32 -> (hidden [B, C], new bufs)."""
        h = params["embed"]["embedding"][x_id]
        new_bufs = []
        for i in range(self.n_layers):
            h, b = self._block_step(params[f"block_{i}"], h, bufs[i])
            new_bufs.append(b)
        return h, new_bufs

    def _step_impl(self, params, bufs, x_id):
        h, bufs = self._token_step(params, x_id, bufs)
        h = _layernorm(h, params["ln_f"]["scale"], params["ln_f"]["bias"])
        logits = h @ params["embed"]["embedding"].T
        return bufs, logits

    def _warmup_impl(self, params, bufs, prefix_ids):
        """prefix_ids: [B, T0] — scan the FIR state over the prefix."""

        def body(bufs, ids_t):
            _, bufs = self._token_step(params, ids_t, bufs)
            return bufs, None

        bufs, _ = jax.lax.scan(body, bufs, jnp.swapaxes(prefix_ids, 0, 1))
        return bufs

    # -- public API ---------------------------------------------------------

    def init_state(self, batch: int = 1):
        return [
            jnp.zeros((batch, self.kernel_len, self.d_model), jnp.float32)
            for _ in range(self.n_layers)
        ]

    def warmup(self, state, prefix_ids: jax.Array):
        return self._warmup(self.params, state, jnp.asarray(prefix_ids, jnp.int32))

    def next_logits(self, state, last_id: jax.Array):
        return self._step(self.params, state, jnp.asarray(last_id, jnp.int32))

    def generate(
        self,
        prompt: str,
        *,
        max_new: int = 400,
        temperature: float = 0.9,
        top_p: float = 0.92,
        top_k: int = 0,
        repetition_penalty: float = 1.25,
        seed: int = 0,
    ) -> str:
        """Full streaming generation loop (host-side sampling, O(K)/token)."""
        from spectral_tpu.train.sampling import apply_top_p

        prefix = list(prompt.encode("utf-8", errors="ignore")) or [32]
        state = self.init_state(batch=1)
        if len(prefix) > 1:
            state = self.warmup(state, np.asarray([prefix[:-1]], np.int32))
        out = prefix[:]
        last = np.asarray([out[-1]], np.int32)
        rng = np.random.default_rng(seed)

        for _ in range(max_new):
            state, logits = self.next_logits(state, last)
            l = np.asarray(logits[0], np.float64)
            for tok in set(out[-256:]):
                l[tok] = l[tok] / repetition_penalty
            l = l / temperature
            if top_p < 1.0:
                l = apply_top_p(l, top_p)
            if top_k and top_k > 0:
                kth = np.sort(l)[-min(top_k, l.shape[0])]
                l = np.where(l < kth, -np.inf, l)
            z = l - l.max()
            p = np.exp(z)
            p /= p.sum()
            nxt = int(rng.choice(256, p=p))
            out.append(nxt)
            last = np.asarray([nxt], np.int32)
        return bytes(out).decode("utf-8", errors="replace")
