"""Sequence-sharded spectral convolution over ICI (Ulysses-style all-to-all).

The reference scales sequence length algorithmically (streaming state,
SURVEY.md §5.7) and has no distributed machinery; this module is the
TPU-native answer for contexts that don't fit one chip's HBM — the analogue
of ring-attention/Ulysses for the FFT-conv architecture:

* activations live TIME-SHARDED (sp axis) through the pointwise segments
  (embed / LN / FFN are elementwise over time — no comm);
* for the FFT segment, an **all-to-all** re-shards time-sharded
  [T/n, C] panels into channel-sharded [T, C/n] panels (the time-axis FFT is
  embarrassingly parallel over channels), each device runs its local
  full-length rfft -> filter -> irfft, and a second all-to-all restores
  time sharding.

Cost: 2 all-to-alls of the activation per conv — exactly the Ulysses
communication volume — riding ICI via jax.lax.all_to_all under shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from spectral_tpu.ops.fftc import conv_n_fft, kernel_rfft


def sequence_sharded_spectral_conv(
    x: jax.Array,
    h_rfft: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "sp",
    n_fft: Optional[int] = None,
) -> jax.Array:
    """Causal spectral conv y = irfft(rfft(pad(x)) * H)[:T] with x sharded
    over the TIME axis of ``mesh[axis]``.

    Args:
        x: [B, T, C] real, T sharded over ``axis`` (C divisible by axis size).
        h_rfft: [F] complex fused filter (k̂ or k̂·gate·mask).
        mesh: device mesh containing ``axis``.
        n_fft: static FFT length (>= T + K - 1); default next_pow2(2T).
    Returns:
        [B, T, C] real, time-sharded like the input.
    """
    B, T, C = x.shape
    n = mesh.shape[axis]
    assert C % n == 0, f"C={C} must divide over {axis}={n}"
    if n_fft is None:
        n_fft = conv_n_fft(T, T)  # caller should pass the real K; safe default

    def local_fn(x_local, h):
        t = x_local.shape[1]  # = T/n, this device's time slice
        # 1) all-to-all: time-sharded -> channel-sharded.
        #    Split channels into n groups (n-major flatten of C); send group g
        #    to device g; the received source-device axis (at concat position)
        #    indexes the global time chunk.
        xs = jnp.reshape(x_local, (B, t, n, C // n))
        xg = jax.lax.all_to_all(xs, axis, split_axis=2, concat_axis=1)  # [B, n, t, C/n]
        xg = jnp.reshape(xg, (B, T, C // n))  # time chunks are n-major: global order

        # 2) local full-length causal FFT conv on this device's C/n channels
        x_pad = jnp.pad(xg.astype(jnp.float32), ((0, 0), (0, n_fft - T), (0, 0)))
        xf = jnp.fft.rfft(x_pad, axis=1)
        yf = xf * h[None, :, None]
        y = jnp.fft.irfft(yf, n=n_fft, axis=1)[:, :T, :]

        # 3) all-to-all back: send time chunk i to device i; the received
        #    source-device axis indexes the channel GROUP and must sit n-major
        #    before the within-group channels (concat at position 2).
        ys = jnp.reshape(y, (B, n, t, C // n))
        yl = jax.lax.all_to_all(ys, axis, split_axis=1, concat_axis=2)  # [B, t, n, C/n]
        return jnp.reshape(yl, (B, t, C)).astype(x_local.dtype)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), P()),
        out_specs=P(None, axis, None),
    )
    return fn(x, h_rfft)


def sequence_sharded_causal_conv(
    x: jax.Array,
    kernel: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "sp",
) -> jax.Array:
    """Convenience wrapper: time-sharded causal conv with a K-tap kernel."""
    B, T, C = x.shape
    (K,) = kernel.shape
    n_fft = conv_n_fft(T, K)
    h = kernel_rfft(kernel, n_fft)
    return sequence_sharded_spectral_conv(x, h, mesh, axis=axis, n_fft=n_fft)
