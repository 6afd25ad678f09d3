"""Dual-head multi-scale supervision: character head + BPE-token teacher head.

Reference: fft_lm/dual_head.py.  The token head (GPT-2 BPE, 50257-way)
provides concept-level supervision during training and is dropped at
inference; the character head is the actual generator.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from spectral_tpu.train.evaluate import cross_entropy

_head_init = nn.initializers.normal(stddev=0.02)


class DualHead(nn.Module):
    """char_head (the mouth, 256) + token_head (the brain, 50257)."""

    d_model: int
    vocab_size: int = 256
    token_vocab_size: int = 50257

    @nn.compact
    def __call__(self, hidden: jax.Array, return_token_logits: bool = True):
        char_logits = nn.Dense(self.vocab_size, kernel_init=_head_init, name="char_head")(hidden)
        if return_token_logits:
            token_logits = nn.Dense(self.token_vocab_size, kernel_init=_head_init, name="token_head")(hidden)
            return char_logits, token_logits
        return char_logits


class TokenAwareChunkLM(nn.Module):
    """Backbone + dual heads; chunk-style character prediction.

    Training returns (char_logits [B, chunk, 256], token_logits [B, T, 50257]);
    inference returns only char logits.
    """

    backbone: nn.Module
    chunk: int
    token_vocab_size: int = 50257

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        cutoff: Optional[jax.Array] = None,
        deterministic: bool = True,
        return_token_logits: bool = True,
    ):
        h = self.backbone.forward_hidden(x, cutoff=cutoff, deterministic=deterministic)
        d_model = h.shape[-1]
        head = DualHead(d_model, token_vocab_size=self.token_vocab_size, name="head")
        if return_token_logits:
            char_logits, token_logits = head(h, return_token_logits=True)
            return char_logits[:, -self.chunk :, :], token_logits
        char_logits = head(h, return_token_logits=False)
        return char_logits[:, -self.chunk :, :]


def compute_dual_loss(
    char_logits: jax.Array,
    token_logits: jax.Array,
    char_targets: jax.Array,
    token_targets: jax.Array,
    char_weight: float = 1.0,
    token_weight: float = 0.5,
):
    """total = char_weight*CE(char) + token_weight*CE(token, ignore_index=0)."""
    char_loss = cross_entropy(char_logits, char_targets)

    logp = jax.nn.log_softmax(token_logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, token_targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = (token_targets != 0).astype(jnp.float32)  # ignore_index=0 (padding)
    token_loss = -jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    total = char_weight * char_loss + token_weight * token_loss
    return total, char_loss, token_loss


# ---------------------------------------------------------------------------
# Approximate byte->token alignment (host-side, optional transformers dep)
# ---------------------------------------------------------------------------

_tokenizer_cache = None


def get_gpt2_tokenizer():
    """Cached GPT-2 BPE tokenizer; None when transformers is unavailable."""
    global _tokenizer_cache
    if _tokenizer_cache is None:
        try:
            # fail fast when the hub is unreachable (zero-egress hosts):
            # without this, from_pretrained stalls through 5 retry rounds
            # before the offline fallback kicks in
            os.environ.setdefault("HF_HUB_OFFLINE", "1")
            from transformers import GPT2TokenizerFast

            _tokenizer_cache = GPT2TokenizerFast.from_pretrained("gpt2")
        except Exception:
            return None
    return _tokenizer_cache


class HashWordTokenizer:
    """Offline teacher fallback: word -> stable hash id in [1, vocab).

    When GPT-2 BPE is unavailable (offline environments), concept-level
    supervision still works: every whitespace-delimited word maps to a
    deterministic id, giving the token head the same "these bytes belong to
    one concept" signal.  Alignment is EXACT (per word span) rather than the
    reference's equal-chunks approximation.
    """

    def __init__(self, vocab_size: int = 50257):
        self.vocab_size = int(vocab_size)

    def encode(self, text: str, add_special_tokens: bool = False) -> list[int]:
        import hashlib

        out = []
        for w in text.split():
            h = int.from_bytes(hashlib.blake2s(w.encode(), digest_size=4).digest(), "little")
            out.append(1 + h % (self.vocab_size - 1))
        return out


def get_word_token_ids(text_bytes: np.ndarray, vocab_size: int = 50257) -> np.ndarray:
    """Exact byte->word-token alignment with :class:`HashWordTokenizer`.

    Every byte of a word (and its trailing separator run) carries that
    word's hash id; padding positions (no word yet) stay 0 (masked in the
    loss).
    """
    import hashlib

    B, T = text_bytes.shape
    out = np.zeros((B, T), dtype=np.int32)
    for b in range(B):
        raw = bytes(int(v) for v in text_bytes[b])
        text = raw.decode("utf-8", errors="ignore")
        # walk words with their spans over the decoded text's byte offsets
        pos = 0
        for w in text.split():
            start = raw.find(w.encode("utf-8", errors="ignore"), pos)
            if start < 0:
                continue
            end = start + len(w.encode("utf-8", errors="ignore"))
            h = int.from_bytes(hashlib.blake2s(w.encode(), digest_size=4).digest(), "little")
            out[b, start:end] = 1 + h % (vocab_size - 1)
            pos = end
    return out


def get_token_ids_fast(text_bytes: np.ndarray, tokenizer) -> np.ndarray:
    """Approximate byte-to-token alignment: tokenize the window, assign each
    token to T/num_tokens byte positions (equal chunks, remainder to the
    last).  ~100x faster than exact alignment, good enough as supervision.

    Args:
        text_bytes: [B, T] uint8/int array.
    Returns:
        [B, T] int32 token ids.
    """
    B, T = text_bytes.shape
    token_ids = np.zeros((B, T), dtype=np.int32)
    for b in range(B):
        byte_list = [int(v) for v in text_bytes[b]]
        text = bytes(byte_list).decode("utf-8", errors="ignore")
        if not text.strip():
            continue
        try:
            tokens = tokenizer.encode(text, add_special_tokens=False)
            if len(tokens) == 0:
                continue
            chunk_size = T // len(tokens)
            for i, token_id in enumerate(tokens):
                start = i * chunk_size
                end = T if i == len(tokens) - 1 else min((i + 1) * chunk_size, T)
                token_ids[b, start:end] = token_id
        except Exception:
            token_ids[b, :] = 220  # GPT-2 space token fallback
    return token_ids
