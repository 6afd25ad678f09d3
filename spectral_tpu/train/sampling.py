"""Byte-level autoregressive sampler with the full anti-degeneration stack.

Reference: fft_lm/train_fixed_full.py:621-704 ``generate``.

The model forward is jitted once (full-recompute path: one O(T) forward per
byte); the 256-way penalty arithmetic runs on the host in numpy — it is
sequential and trivially cheap next to the forward.  The streaming decoders
(spectral_tpu.streaming) replace this loop with O(K)/token or overlap-save
state updates.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.models.config import TrainConfig


def apply_top_p(logits_1d: np.ndarray, p: float) -> np.ndarray:
    """Nucleus filter: keep the smallest prefix of sorted tokens with cdf<=p
    (always at least one)."""
    order = np.argsort(-logits_1d)
    sorted_logits = logits_1d[order]
    probs = np.exp(sorted_logits - sorted_logits.max())
    probs = probs / probs.sum()
    cdf = np.cumsum(probs)
    keep = cdf <= p
    keep[0] = True
    n_keep = int(keep.sum())
    masked = np.full_like(logits_1d, -np.inf)
    masked[order[:n_keep]] = logits_1d[order[:n_keep]]
    return masked


def penalize_logits(next_logits: np.ndarray, ctx: list[int], cfg: TrainConfig) -> np.ndarray:
    """Repetition / presence / frequency penalties + ascii & anti-stutter bans."""
    out = next_logits.astype(np.float64).copy()

    # repetition penalty over the recent window (divide, torch-style)
    recent = ctx[-cfg.repetition_window :]
    for tok in set(recent):
        out[tok] = out[tok] / cfg.repetition_penalty

    # OpenAI-style presence/frequency penalties (off by default)
    if cfg.presence_penalty or cfg.frequency_penalty:
        counts: dict[int, int] = {}
        for t in recent:
            counts[t] = counts.get(t, 0) + 1
        for tok, c in counts.items():
            out[tok] = out[tok] - cfg.presence_penalty - cfg.frequency_penalty * float(c)

    # ascii-only: allow \n + printable
    if cfg.ascii_only:
        banned = np.ones(out.shape[0], dtype=bool)
        banned[10] = False
        banned[32:127] = False
        out[banned] = -np.inf
    if cfg.ban_cr:
        out[13] = -np.inf

    # hard anti-stutter: ban a byte after max_run_length identical repeats
    if len(ctx) >= cfg.max_run_length:
        run_byte = ctx[-1]
        if all(b == run_byte for b in ctx[-cfg.max_run_length :]):
            out[run_byte] = -np.inf
    return out


def sample_from_logits(next_logits: np.ndarray, cfg: TrainConfig, rng: np.random.Generator) -> int:
    """temperature -> top-p -> top-k backstop -> multinomial."""
    logits = next_logits / cfg.temperature
    if cfg.top_p is not None and cfg.top_p < 1.0:
        logits = apply_top_p(logits, cfg.top_p)
    if cfg.top_k and cfg.top_k > 0:
        k = min(cfg.top_k, logits.shape[0])
        kth = np.sort(logits)[-k]
        logits = np.where(logits < kth, -np.inf, logits)
    z = logits - logits.max()
    probs = np.exp(z)
    probs = probs / probs.sum()
    return int(rng.choice(probs.shape[0], p=probs))


def generate(
    apply_fn,
    params,
    prompt: str,
    cfg: TrainConfig,
    *,
    cutoff: Optional[int] = None,
    max_new: Optional[int] = None,
    seed: int = 0,
) -> str:
    """Full-recompute AR generation (O(T) forward per byte).

    ``apply_fn(params, x, cutoff, length)`` -> logits [B, T, 256].

    TPU-native buffering: the window is right-padded into a power-of-two
    bucketed buffer and the true window length rides as a TRACED scalar, so
    the whole generation loop compiles only once per FFT-size bucket instead
    of once per window length.  The blocks mask padded positions after their
    pre-LN, which makes the bucketed forward bit-identical to running the
    reference on the exact-length window.
    """
    from spectral_tpu.ops.fftc import next_pow2

    ctx = [b for b in prompt.encode("utf-8", errors="ignore")] or [32]
    rng = np.random.default_rng(seed)
    c = None if cutoff is None else jnp.int32(cutoff)
    K = cfg.kernel_len

    @jax.jit
    def logits_at(params, x, c, length):
        logits = apply_fn(params, x, c, length)  # [1, T_b, 256]
        return jax.lax.dynamic_slice_in_dim(logits[0], length - 1, 1, axis=0)[0].astype(jnp.float32)

    for _ in range(max_new if max_new is not None else cfg.max_new):
        window = ctx[-cfg.seq_len :]
        L = len(window)
        # bucket: smallest T_b with the same causal-conv FFT size as length L
        t_b = next_pow2(L + K - 1) - K + 1
        buf = np.zeros((1, t_b), dtype=np.int32)
        buf[0, :L] = window
        nl = np.asarray(logits_at(params, jnp.asarray(buf), c, jnp.int32(L)))
        nl = penalize_logits(nl, ctx, cfg)
        ctx.append(sample_from_logits(nl, cfg, rng))

    return bytes(ctx).decode("utf-8", errors="replace")


def safe_console(s: str) -> str:
    """Escape unprintables so samples are safe on any console."""
    return s.encode("unicode_escape", errors="backslashreplace").decode("ascii", errors="ignore")
