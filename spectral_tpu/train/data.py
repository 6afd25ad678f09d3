"""Byte-corpus loading and window sampling.

Reference: fft_lm/train_fixed_full.py:115-147 (corpus as uint8 bytes with
optional ASCII sanitize; deterministic validation windows; random training
windows gathered on the host then shipped to device).

TPU-native notes: the corpus stays in host memory as one numpy uint8 array;
window gathers are vectorized (np fancy-indexing — the reference's per-sample
Python loop at train_fixed_full.py:924-925 was a real host bottleneck).  When
the optional C++ sampler (spectral_tpu.native) is built, gathers route through
it; numpy is the always-available fallback (same contract as the reference's
CUDA-vs-PyTorch fallback design).
"""

from __future__ import annotations

import numpy as np

try:  # optional native fast path (ctypes-loaded C++, see spectral_tpu/native)
    from spectral_tpu.native import corpus as _native_corpus
except Exception:  # pragma: no cover - native lib not built
    _native_corpus = None


def sanitize_ascii(arr: np.ndarray) -> np.ndarray:
    """Keep \\n and printable ASCII; everything else -> space."""
    keep = (arr == 10) | ((arr >= 32) & (arr <= 126))
    return np.where(keep, arr, np.uint8(32)).astype(np.uint8)


def load_corpus_as_u8(path: str, *, sanitize: bool = True) -> np.ndarray:
    """Read a file as raw bytes (byte-level modeling: bytes ARE the tokens)."""
    with open(path, "rb") as f:
        data = f.read()
    arr = np.frombuffer(data, dtype=np.uint8)
    if sanitize:
        if _native_corpus is not None:
            return _native_corpus.sanitize_ascii(arr)
        return sanitize_ascii(arr)
    return arr.copy()


def make_val_starts(n_bytes: int, seq_len: int, count: int, seed: int) -> np.ndarray:
    """Deterministic validation window start indices."""
    rng = np.random.default_rng(seed)
    hi = max(1, n_bytes - (seq_len + 1) - 1)
    return rng.integers(0, hi, size=(count,), dtype=np.int64)


def gather_windows(corpus_u8: np.ndarray, starts: np.ndarray, width: int) -> np.ndarray:
    """Vectorized gather: [B] starts -> [B, width] uint8."""
    if _native_corpus is not None:
        return _native_corpus.gather_windows(corpus_u8, starts, width)
    idx = starts[:, None] + np.arange(width, dtype=np.int64)[None, :]
    return corpus_u8[idx]


def sample_lm_batch(
    corpus_u8: np.ndarray,
    batch_size: int,
    seq_len: int,
    rng: np.random.Generator,
) -> tuple[np.ndarray, np.ndarray]:
    """Random next-byte LM windows: x [B, T] int32, y [B, T] int32 (shift 1)."""
    n = corpus_u8.shape[0]
    starts = rng.integers(0, n - (seq_len + 1) - 1, size=(batch_size,), dtype=np.int64)
    w = gather_windows(corpus_u8, starts, seq_len + 1)
    return w[:, :-1].astype(np.int32), w[:, 1:].astype(np.int32)


def vectorized_windows(
    corpus_u8: np.ndarray,
    starts: np.ndarray,
    seq_len: int,
    chunk: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Chunk-head windows: x [B, seq_len], y [B, chunk] (the NEXT chunk bytes).

    Reference: fft_lm/chunk_head.py:72-79.
    """
    w = gather_windows(corpus_u8, np.asarray(starts, dtype=np.int64), seq_len + chunk)
    return w[:, :seq_len].astype(np.int32), w[:, seq_len:].astype(np.int32)


def sample_chunk_batch(
    corpus_u8: np.ndarray,
    batch_size: int,
    seq_len: int,
    chunk: int,
    rng: np.random.Generator,
) -> tuple[np.ndarray, np.ndarray]:
    n = corpus_u8.shape[0]
    starts = rng.integers(0, n - (seq_len + chunk) - 1, size=(batch_size,), dtype=np.int64)
    return vectorized_windows(corpus_u8, starts, seq_len, chunk)


class WindowedChunkDataset:
    """Hann-windowed overlapping chunk sampling (anti spectral leakage).

    Reference: fft_lm/bicameral.py:275-323 (defined there for audio-style
    smooth chunk edges; unused by the reference trainers but part of the
    public surface).  Hard chunk cuts create "cliffs" => high-frequency
    noise; overlapping Hann windows taper the edges.
    """

    def __init__(self, corpus_u8: np.ndarray, seq_len: int, chunk_size: int, overlap: int = 256):
        self.corpus_u8 = corpus_u8
        self.seq_len = int(seq_len)
        self.chunk_size = int(chunk_size)
        self.overlap = int(overlap)
        self.stride = self.chunk_size - self.overlap
        n = corpus_u8.shape[0]
        self.num_chunks = max(1, (n - seq_len - chunk_size) // max(1, self.stride))

    def get_window(self, idx: int):
        """Returns (x [seq_len], y [chunk_size], hann [chunk_size])."""
        start = idx * self.stride
        x = self.corpus_u8[start : start + self.seq_len].astype(np.int32)
        y = self.corpus_u8[start + self.seq_len : start + self.seq_len + self.chunk_size].astype(np.int32)
        window = np.hanning(self.chunk_size).astype(np.float32)
        return x, y, window

    def sample_batch(self, batch_size: int, rng: "np.random.Generator | None" = None):
        rng = rng or np.random.default_rng(0)
        idxs = rng.integers(0, self.num_chunks, batch_size)
        xs, ys, ws = zip(*(self.get_window(int(i)) for i in idxs))
        return np.stack(xs), np.stack(ys), np.stack(ws)
