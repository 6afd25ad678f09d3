"""numpy-facing wrappers over the native host library.

Imported (guarded) by spectral_tpu.train.data; same contracts as its numpy
fallbacks.
"""

from __future__ import annotations

import numpy as np

from spectral_tpu.native import NATIVE_AVAILABLE, _lib

if not NATIVE_AVAILABLE:  # pragma: no cover - guarded import in train.data
    raise ImportError("native host library unavailable")


def sanitize_ascii(arr: np.ndarray) -> np.ndarray:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    out = np.empty_like(arr)
    _lib.sanitize_ascii(arr, out, arr.shape[0])
    return out


def gather_windows(corpus_u8: np.ndarray, starts: np.ndarray, width: int) -> np.ndarray:
    corpus_u8 = np.ascontiguousarray(corpus_u8, dtype=np.uint8)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    out = np.empty((starts.shape[0], width), dtype=np.int32)
    _lib.gather_windows_i32(corpus_u8, corpus_u8.shape[0], starts, starts.shape[0], width, out)
    return out


def lm_batch(corpus_u8: np.ndarray, starts: np.ndarray, seq_len: int):
    corpus_u8 = np.ascontiguousarray(corpus_u8, dtype=np.uint8)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    B = starts.shape[0]
    x = np.empty((B, seq_len), dtype=np.int32)
    y = np.empty((B, seq_len), dtype=np.int32)
    _lib.lm_batch_i32(corpus_u8, corpus_u8.shape[0], starts, B, seq_len, x, y)
    return x, y


def word_boundaries(bytes_i32: np.ndarray) -> np.ndarray:
    bytes_i32 = np.ascontiguousarray(bytes_i32, dtype=np.int32)
    B, T = bytes_i32.shape
    out = np.empty((B, T), dtype=np.float32)
    _lib.word_boundaries(bytes_i32, B, T, out)
    return out
