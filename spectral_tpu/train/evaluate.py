"""Evaluation: fixed-window validation loss and the anti-parroting score.

Reference: fft_lm/train_fixed_full.py:150-205.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.models.config import TrainConfig
from spectral_tpu.train.data import gather_windows


def cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean token-level CE (log-softmax gather), fp32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return -jnp.mean(ll)


def eval_loss(
    apply_fn: Callable,
    params,
    corpus_u8: np.ndarray,
    starts: np.ndarray,
    cfg: TrainConfig,
    cutoff: Optional[int],
    *,
    rng: Optional[np.random.Generator] = None,
) -> float:
    """Approximate validation loss on a random subset of the fixed windows.

    ``apply_fn(params, x, cutoff)`` -> logits [B, T, V].
    """
    rng = rng or np.random.default_rng(0)
    take = cfg.val_batches * cfg.batch_size
    idx = rng.permutation(starts.shape[0])[:take]
    sel = starts[idx]
    c = None if cutoff is None else jnp.int32(cutoff)
    losses = []
    for i in range(0, sel.shape[0], cfg.batch_size):
        s = sel[i : i + cfg.batch_size]
        if s.shape[0] < cfg.batch_size:
            break
        w = gather_windows(corpus_u8, s, cfg.seq_len + 1)
        bx = jnp.asarray(w[:, :-1].astype(np.int32))
        by = jnp.asarray(w[:, 1:].astype(np.int32))
        logits = apply_fn(params, bx, c)
        losses.append(float(cross_entropy(logits, by)))
    return float(sum(losses) / max(1, len(losses)))


def parroting_score(corpus_bytes: bytes, gen_bytes: bytes, cfg: TrainConfig) -> float:
    """Fraction of random fixed-length generation snippets found verbatim in
    the corpus.  High => memorizing/copying; low => novelty.
    """
    if len(gen_bytes) < cfg.parroting_snip_len + 1:
        return 0.0
    start0 = min(32, len(gen_bytes) - cfg.parroting_snip_len)  # skip the prompt
    candidates = list(range(start0, len(gen_bytes) - cfg.parroting_snip_len, cfg.parroting_stride))
    if not candidates:
        return 0.0
    rng = np.random.default_rng(123)
    picks = rng.choice(candidates, size=min(cfg.parroting_snips, len(candidates)), replace=False)
    hits = 0
    for p in picks:
        snip = gen_bytes[int(p) : int(p) + cfg.parroting_snip_len]
        if corpus_bytes.find(snip) != -1:
            hits += 1
    return hits / float(len(picks))
