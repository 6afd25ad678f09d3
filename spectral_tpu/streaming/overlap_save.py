"""Exact overlap-save chunked state updates ("piston engine" decoding).

Reference: scripts/generate_chunked_overlap_save.py:52-206 — the
README-recommended streaming path.  Per chunk of B new bytes, each block is
advanced with ONE fixed-size FFT over the full slid pre-norm window, keeping
the full gate stack (per-frequency gate, sliding-window context gate,
per-channel gain) — decode cost is O(layers * FFT(n_fft)) per chunk,
independent of history length.  (The reference transforms only
[last K-1 samples | chunk]; that variant is exact only with a SATURATED
frequency gate — see _block_chunk_update.)

State per layer: ``ctx_ln`` [1, T, C] — a sliding window of pre-norm
activations used for (a) the K-1 overlap samples and (b) the context-gate
window mean.  Bytes are the state boundary between chunks (the reference's
"quantization barrier": sampling integer bytes kills float drift).

The update is a single jitted function of (params, state, chunk_ids).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.ops.fftc import causal_filter_taps, conv_n_fft
from spectral_tpu.streaming.fir import _ffn, _layernorm


class OverlapSaveStream:
    """Exact chunked decoder over a trained FixedSpectralLM param tree.

    Works standalone (weight-tied logits) or with a ChunkLM head
    (pass ``head_params`` = the ChunkLM 'head' Dense params and ``chunk``).
    """

    def __init__(
        self,
        params: dict,
        cfg: TrainConfig,
        *,
        head_params: Optional[dict] = None,
        chunk: Optional[int] = None,
    ):
        self.params = jax.tree.map(jnp.asarray, params)
        self.cfg = cfg
        self.n_layers = cfg.n_layers
        self.kernel_len = cfg.kernel_len
        self.causal_taps = getattr(cfg, "causal_taps", True)
        self.n_fft = conv_n_fft(cfg.seq_len, cfg.kernel_len)
        self.head_params = None if head_params is None else jax.tree.map(jnp.asarray, head_params)
        self.chunk = chunk
        self._init_fn = jax.jit(self._init_impl)
        self._update = jax.jit(self._update_impl)

    # ------------------------------------------------------------------
    def _block_full(self, bp: dict, h: jax.Array):
        """Full-window block forward (used once at init); returns (h_out, ln_in).

        Mirrors FixedSpectralBlock.forward with cutoff=None
        (models/backbone.py); duplicated here in raw jnp so the streaming
        module is a pure function of the param tree.
        """
        B, T, C = h.shape
        ln_in = _layernorm(h, bp["ln"]["scale"], bp["ln"]["bias"])
        n_fft = conv_n_fft(T, self.kernel_len)
        fbins = n_fft // 2 + 1

        x_pad = jnp.pad(ln_in, ((0, 0), (0, n_fft - T), (0, 0)))
        x_freq = jnp.fft.rfft(x_pad, axis=1)
        k = jnp.pad(bp["kernel"], (0, n_fft - self.kernel_len))
        k_freq = jnp.fft.rfft(k)
        g_freq = jax.nn.sigmoid(bp["gate_freq_logits"][:fbins])
        hfil = k_freq * g_freq
        if self.causal_taps:  # must mirror training (models/backbone.py)
            hfil = causal_filter_taps(hfil, n_fft, n_fft - T)

        pooled = jnp.mean(ln_in, axis=1)
        g_ctx = jax.nn.sigmoid(pooled @ bp["gate_ctx"]["kernel"] + bp["gate_ctx"]["bias"])
        y_freq = x_freq * hfil[None, :, None] * (bp["gain"][None, :] * g_ctx)[:, None, :]

        y = jnp.fft.irfft(y_freq, n=n_fft, axis=1)[:, :T, :]
        return _ffn(bp["ffn"], h + y), ln_in

    def _init_impl(self, params, x_ids):
        """Full forward over the initial context window; capture per-layer
        ctx_ln buffers (reference init_layer_states, :52-74)."""
        h = params["embed"]["embedding"][x_ids]  # [1, T, C]
        layers = []
        for i in range(self.n_layers):
            h, ln_in = self._block_full(params[f"block_{i}"], h)
            layers.append(ln_in)
        h = _layernorm(h, params["ln_f"]["scale"], params["ln_f"]["bias"])
        return {"h_last": h[:, -1, :], "layers": layers}

    def _block_chunk_update(self, bp: dict, ctx_ln: jax.Array, h_chunk: jax.Array):
        """Overlap-save update of one block for one chunk.

        h_chunk: [1, B, C]; ctx_ln: [1, T, C] sliding pre-norm window.
        Returns (h_out [1, B, C], new ctx_ln).
        """
        B = h_chunk.shape[1]
        T = ctx_ln.shape[1]
        K = self.kernel_len
        n_fft = self.n_fft
        fbins = n_fft // 2 + 1

        ln_chunk = _layernorm(h_chunk, bp["ln"]["scale"], bp["ln"]["bias"])

        # slide the context window: drop oldest B, append the chunk
        if B >= T:
            ctx_new = ln_chunk[:, -T:, :]
        else:
            ctx_new = jnp.concatenate([ctx_ln[:, B:, :], ln_chunk], axis=1)

        # context gate over the window mean
        pooled = jnp.mean(ctx_new, axis=1)
        g_ctx = jax.nn.sigmoid(pooled @ bp["gate_ctx"]["kernel"] + bp["gate_ctx"]["bias"])
        g_freq = jax.nn.sigmoid(bp["gate_freq_logits"][:fbins])

        # full-window segment: the ENTIRE slid pre-norm window rides through
        # one fixed-size FFT.  The classic K-1-sample overlap (reference
        # :128-144) is exact only while the per-frequency gate is saturated —
        # an ACTIVE gate turns the K-tap kernel into a full-length effective
        # kernel irfft(k̂·g_freq), whose memory exceeds K-1 samples.  Feeding
        # the full window reproduces the training forward bit-for-bit with
        # the whole trained gate stack, at the SAME cost (the update already
        # pays one length-n_fft transform per chunk either way).
        x_pad = jnp.pad(ctx_new, ((0, 0), (0, n_fft - T), (0, 0)))

        x_freq = jnp.fft.rfft(x_pad, axis=1)
        k = jnp.pad(bp["kernel"], (0, n_fft - K))
        k_freq = jnp.fft.rfft(k)
        h = k_freq * g_freq
        if self.causal_taps:  # must mirror training (models/backbone.py)
            h = causal_filter_taps(h, n_fft, n_fft - T)
        y_freq = x_freq * h[None, :, None] * (bp["gain"][None, :] * g_ctx)[:, None, :]
        y_pad = jnp.fft.irfft(y_freq, n=n_fft, axis=1)
        y_chunk = y_pad[:, T - B : T, :]  # outputs at the new (last B) positions

        h_out = _ffn(bp["ffn"], h_chunk + y_chunk)
        return h_out, ctx_new

    def _update_impl(self, params, state, chunk_ids):
        """Advance all blocks by one chunk of byte ids ([1, B] int32)."""
        h = params["embed"]["embedding"][chunk_ids]  # [1, B, C]
        new_layers = []
        for i in range(self.n_layers):
            h, ctx = self._block_chunk_update(params[f"block_{i}"], state["layers"][i], h)
            new_layers.append(ctx)
        h = _layernorm(h, params["ln_f"]["scale"], params["ln_f"]["bias"])
        return {"h_last": h[:, -1, :], "layers": new_layers}

    # ------------------------------------------------------------------
    def init_state(self, context_ids: np.ndarray) -> dict:
        """context_ids: [1, T] int32 (pad on the left to seq_len upstream)."""
        return self._init_fn(self.params, jnp.asarray(context_ids, jnp.int32))

    def update_chunk(self, state: dict, new_ids) -> dict:
        ids = jnp.asarray(np.asarray(new_ids, np.int32)).reshape(1, -1)
        return self._update(self.params, state, ids)

    def head_logits(self, state: dict) -> jax.Array:
        """Chunk-head logits from the current hidden state (no backbone pass)."""
        assert self.head_params is not None and self.chunk is not None
        flat = state["h_last"] @ self.head_params["kernel"] + self.head_params["bias"]
        return flat.reshape(1, self.chunk, 256)[0]

    def tied_last_logits(self, state: dict) -> jax.Array:
        """Weight-tied next-byte logits from h_last (no chunk head)."""
        return state["h_last"] @ self.params["embed"]["embedding"].T

    def generate_chunks(
        self,
        prompt: str,
        *,
        n_chunks: int = 30,
        temperature: float = 0.9,
        top_p: float = 0.9,
        repetition_penalty: float = 1.15,
        seed: int = 0,
        on_chunk=None,
    ) -> str:
        """Chunk-head "piston engine" generation (reference main loop :277-299)."""
        from spectral_tpu.train.sampling import apply_top_p

        assert self.head_params is not None, "generate_chunks needs a ChunkLM head"
        cfg = self.cfg
        ctx = list(prompt.encode("utf-8", errors="ignore")) or [32]
        if len(ctx) < cfg.seq_len:
            init_ids = [32] * (cfg.seq_len - len(ctx)) + ctx
        else:
            init_ids = ctx[-cfg.seq_len :]
        state = self.init_state(np.asarray([init_ids], np.int32))

        rng = np.random.default_rng(seed)
        generated = init_ids[:]
        for _ in range(n_chunks):
            logits = np.asarray(self.head_logits(state), np.float64)  # [chunk, 256]
            new_bytes = []
            for i in range(self.chunk):
                l = logits[i].copy()
                for tok in set(generated[-256:]):
                    l[tok] = l[tok] / repetition_penalty
                l = l / temperature
                l = apply_top_p(l, top_p)
                z = l - l.max()
                p = np.exp(z)
                p /= p.sum()
                b = int(rng.choice(256, p=p))
                new_bytes.append(max(0, min(255, b)))
            if on_chunk is not None:
                on_chunk(bytes(new_bytes))
            generated.extend(new_bytes)
            state = self.update_chunk(state, new_bytes)  # quantization barrier: ints in
        return bytes(generated[len(init_ids) :]).decode("utf-8", errors="replace")
