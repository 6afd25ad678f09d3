"""spectral_tpu.streaming — O(1)-in-history decoders.

The reference's "infinite context" machinery (SURVEY.md §2.10 row 4):

* ``fir``          — O(K)/token FIR ring-buffer streaming
  (reference: scripts/stream_generate_fast.py).
* ``overlap_save`` — exact per-chunk overlap-save FFT state updates
  (reference: scripts/generate_chunked_overlap_save.py, the README-recommended
  path).
* ``overlap_save_batch`` — the exact decoder BATCHED: N streams, full gate
  stack, one ``lax.scan`` (no reference counterpart — its torch version is
  single-stream with a Python chunk loop).
* ``engine`` — continuous batching over the exact decoder: fixed device
  lanes drain a request queue, admitting/retiring between chunked scans
  (no reference counterpart).

Both are expressed as pure (params, state) -> (state, out) functions that jit
and ``lax.scan`` cleanly.
"""

from spectral_tpu.streaming.engine import Request, ServingEngine
from spectral_tpu.streaming.fir import DeviceSampler, FIRStream, fir_generate_on_device
from spectral_tpu.streaming.overlap_save import OverlapSaveStream
from spectral_tpu.streaming.overlap_save_batch import (
    OverlapSaveBatch,
    overlap_save_generate_batch,
)

__all__ = [
    "FIRStream",
    "OverlapSaveStream",
    "OverlapSaveBatch",
    "DeviceSampler",
    "fir_generate_on_device",
    "overlap_save_generate_batch",
    "Request",
    "ServingEngine",
]
