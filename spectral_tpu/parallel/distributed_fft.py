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

This is the TRAINING path under ``sp`` (FixedSpectralBlock routes its conv
here when constructed with a mesh whose sp axis > 1 — see
models/backbone.py), not just a standalone demo; the all-to-all shows up in
the jitted train step's jaxpr (tests/unit/test_parallel.py).

Gradients ride a ``jax.custom_vjp`` (jax 0.9 cannot transpose ``lax.fft``
inside ``shard_map`` — its cotangent aval loses the varying-axes annotation):
* grad_x is the SAME sharded conv with the conjugate filter (the adjoint of
  a real causal conv — identical comm volume to the forward);
* grad_h is a forward-only shard_map: both operands re-shard to
  channel-sharded panels, each device reduces conj(Ĝ)·X̂ over its local
  batch/channels, and a psum over (dp, sp) replicates the [F] cotangent.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from spectral_tpu.ops.fftc import conv_n_fft, kernel_rfft


def _resolve_batch_axis(mesh: Mesh, batch_axis) -> Optional[str]:
    if batch_axis == "auto":
        return "dp" if "dp" in mesh.axis_names else None
    return batch_axis


def _local_spectral_conv(xg: jax.Array, h: jax.Array, n_fft: int, T: int, backend: str):
    """Full-length causal spectral conv on one device's channel slice.

    xg: [b, T, C/n] real with the FULL time axis; h: [F] complex, or
    [F, C/n] per-channel (this device's channel slice of a [F, C] filter —
    the bicameral/frequency-native variants fold PhaseShift into the
    filter, making it per-channel).
    """
    if h.ndim == 2:
        # per-channel filters run the jnp.fft local transform (the matmul/
        # pallas local backends take time-minor [b, C, T] panels with a
        # broadcast filter; not worth a second layout for the variants)
        x_pad = jnp.pad(xg.astype(jnp.float32), ((0, 0), (0, n_fft - T), (0, 0)))
        xf = jnp.fft.rfft(x_pad, axis=1)
        return jnp.fft.irfft(xf * h[None, :, :], n=n_fft, axis=1)[:, :T, :]
    if backend == "matmul":
        from spectral_tpu.ops.matfft import spectral_conv_matmul

        y = spectral_conv_matmul(jnp.swapaxes(xg.astype(jnp.float32), 1, 2), h, n_fft)
        return jnp.swapaxes(y, 1, 2)
    if backend == "pallas":
        from spectral_tpu.ops.pallas_spectral import fused_spectral_conv

        ones = jnp.ones((xg.shape[0], xg.shape[2]), jnp.float32)
        return fused_spectral_conv(xg.astype(jnp.float32), h, ones, n_fft)
    x_pad = jnp.pad(xg.astype(jnp.float32), ((0, 0), (0, n_fft - T), (0, 0)))
    xf = jnp.fft.rfft(x_pad, axis=1)
    return jnp.fft.irfft(xf * h[None, :, None], n=n_fft, axis=1)[:, :T, :]


def _time_to_channel(x_local, n: int, axis: str, T: int):
    """All-to-all: time-sharded [b, T/n, C] -> channel-sharded [b, T, C/n]."""
    b, t, cfull = x_local.shape
    cg = cfull // n
    xs = jnp.reshape(x_local, (b, t, n, cg))
    xg = jax.lax.all_to_all(xs, axis, split_axis=2, concat_axis=1)  # [b, n, t, cg]
    return jnp.reshape(xg, (b, T, cg))  # time chunks n-major: global order


def _channel_to_time(y, n: int, axis: str, t: int):
    """All-to-all back: channel-sharded [b, T, C/n] -> time-sharded [b, T/n, C]."""
    b, T, cg = y.shape
    ys = jnp.reshape(y, (b, n, t, cg))
    yl = jax.lax.all_to_all(ys, axis, split_axis=1, concat_axis=2)  # [b, t, n, cg]
    return jnp.reshape(yl, (b, t, n * cg))


def _conv_impl(x, h_rfft, mesh, axis, n_fft, backend, batch_axis):
    B, T, C = x.shape
    n = mesh.shape[axis]

    def local_fn(x_local, h):
        t = x_local.shape[1]
        xg = _time_to_channel(x_local, n, axis, T)
        y = _local_spectral_conv(xg, h, n_fft, T, backend)
        return _channel_to_time(y, n, axis, t).astype(x_local.dtype)

    spec = P(batch_axis, axis, None)
    # a [F, C] per-channel filter shards its channel axis to match the
    # all-to-all's contiguous channel blocks; a [F] filter replicates
    h_spec = P(None, axis) if h_rfft.ndim == 2 else P()
    fn = shard_map(local_fn, mesh=mesh, in_specs=(spec, h_spec), out_specs=spec)
    return fn(x, h_rfft)


def _irfft_weights(n_fft: int) -> jax.Array:
    """[1, 2, ..., 2, 1]/n_fft — the irfft middle-bin doubling weights."""
    fbins = n_fft // 2 + 1
    return jnp.concatenate(
        [
            jnp.full((1,), 1.0 / n_fft, jnp.float32),
            jnp.full((fbins - 2,), 2.0 / n_fft, jnp.float32),
            jnp.full((1,), 1.0 / n_fft, jnp.float32),
        ]
    )


def _grad_h_impl(x, g, mesh, axis, n_fft, batch_axis, per_channel=False):
    """Cotangent of the filter: w ⊙ Σ_b[,c] conj(Ĝ)·X̂.

    w = [1, 2, ..., 2, 1]/n_fft is the irfft middle-bin doubling (same
    convention as ops/pallas_spectral._fsc_bwd, verified against jax.vjp of
    the unsharded reference).  Each device reduces its local channels/batch
    after the all-to-all re-shard; for a replicated [F] filter a psum over
    (sp [, dp]) replicates; for a per-channel [F, C] filter the channel
    axis stays sp-sharded (each sp shard OWNS its channel slice after the
    all-to-all — no sp psum) and only dp reduces.
    """
    B, T, C = x.shape
    n = mesh.shape[axis]
    psum_axes = (() if per_channel else (axis,)) + (
        (batch_axis,) if batch_axis else ())

    def local_fn(x_local, g_local):
        xg = _time_to_channel(x_local.astype(jnp.float32), n, axis, T)
        gg = _time_to_channel(g_local.astype(jnp.float32), n, axis, T)
        pad = ((0, 0), (0, n_fft - T), (0, 0))
        xf = jnp.fft.rfft(jnp.pad(xg, pad), axis=1)  # [b, F, cg]
        gf = jnp.fft.rfft(jnp.pad(gg, pad), axis=1)
        xr, xi = jnp.real(xf), jnp.imag(xf)
        gr, gi = jnp.real(gf), jnp.imag(gf)
        red = (0,) if per_channel else (0, 2)
        pr = jnp.sum(gr * xr + gi * xi, axis=red)  # conj(gf)·xf, local reduce
        pi = jnp.sum(gr * xi - gi * xr, axis=red)
        if psum_axes:
            pr = jax.lax.psum(pr, psum_axes)
            pi = jax.lax.psum(pi, psum_axes)
        return pr, pi

    spec = P(batch_axis, axis, None)
    out = P(None, axis) if per_channel else P()
    fn = shard_map(local_fn, mesh=mesh, in_specs=(spec, spec), out_specs=(out, out))
    pr, pi = fn(x, g)
    w = _irfft_weights(n_fft)
    if per_channel:
        w = w[:, None]
    return jax.lax.complex(pr * w, pi * w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _sharded_conv(x, h_rfft, mesh, axis, n_fft, backend, batch_axis):
    return _conv_impl(x, h_rfft, mesh, axis, n_fft, backend, batch_axis)


def _sharded_conv_fwd(x, h_rfft, mesh, axis, n_fft, backend, batch_axis):
    y = _conv_impl(x, h_rfft, mesh, axis, n_fft, backend, batch_axis)
    return y, (x, h_rfft)


def _sharded_conv_bwd(mesh, axis, n_fft, backend, batch_axis, res, g):
    x, h_rfft = res
    # adjoint of the real causal conv: same sharded conv, conjugate filter
    grad_x = _conv_impl(g, jnp.conj(h_rfft), mesh, axis, n_fft, backend, batch_axis)
    grad_h = _grad_h_impl(x, g, mesh, axis, n_fft, batch_axis,
                          per_channel=h_rfft.ndim == 2)
    return grad_x.astype(x.dtype), grad_h


_sharded_conv.defvjp(_sharded_conv_fwd, _sharded_conv_bwd)


def sequence_sharded_spectral_conv(
    x: jax.Array,
    h_rfft: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "sp",
    n_fft: Optional[int] = None,
    backend: str = "xla",
    batch_axis: Optional[str] = "auto",
) -> jax.Array:
    """Causal spectral conv y = irfft(rfft(pad(x)) * H)[:T] with x sharded
    over the TIME axis of ``mesh[axis]``.

    Args:
        x: [B, T, C] real, T sharded over ``axis`` (C and T divisible by the
            axis size).
        h_rfft: [F] complex fused filter (k̂ or k̂·gate·mask), replicated —
            or [F, C] per-channel (the bicameral right hemisphere folds its
            PhaseShift into the filter: models/bicameral.py); the channel
            axis is sharded to match the all-to-all's channel blocks.
        mesh: device mesh containing ``axis``.
        n_fft: static FFT length (>= T + K - 1); default next_pow2(2T).
        backend: local transform — "xla" (jnp.fft), "matmul" (MXU DFT
            stages), or "pallas" (fused kernel per device).
        batch_axis: mesh axis sharding the batch dim, "auto" = use "dp" when
            the mesh has one, None = batch replicated/unsharded.
    Returns:
        [B, T, C] real, time-sharded like the input.
    """
    B, T, C = x.shape
    n = mesh.shape[axis]
    assert C % n == 0, f"C={C} must divide over {axis}={n}"
    assert T % n == 0, f"T={T} must divide over {axis}={n}"
    if n_fft is None:
        n_fft = conv_n_fft(T, T)  # caller should pass the real K; safe default
    batch_axis = _resolve_batch_axis(mesh, batch_axis)
    return _sharded_conv(x, h_rfft, mesh, axis, n_fft, backend, batch_axis)


def sequence_sharded_depthwise_conv3(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "sp",
    batch_axis: Optional[str] = "auto",
) -> jax.Array:
    """Time-sharded depthwise causal conv ``y[t] = w0·x[t-2] + w1·x[t-1] +
    w2·x[t] + b`` — the bicameral LEFT hemisphere (reference
    fft_lm/bicameral.py time path: shift-right + conv1d(k=3, pad=1)).

    The receptive field reaches 2 steps into the past, so each time shard
    needs only a 2-element halo from its predecessor: one ``ppermute``
    (shard 0 receives zeros — exactly the global zero-pad), no gathers.
    Plain differentiable ops — shard_map autodiff handles the transpose
    (ppermute's transpose is the reversed ppermute).

    Args:
        x: [B, T, C] real, T sharded over ``axis``.
        w: [3, 1, C] depthwise taps (lax.conv HIO layout, groups=C).
        b: [C] bias.
    """
    n = mesh.shape[axis]
    batch_axis = _resolve_batch_axis(mesh, batch_axis)

    def local_fn(x_l, w_, b_):
        halo = jax.lax.ppermute(
            x_l[:, -2:, :], axis, [(i, i + 1) for i in range(n - 1)])
        xe = jnp.concatenate([halo, x_l], axis=1)  # [b, t+2, C]
        y = (w_[0, 0][None, None, :] * xe[:, :-2]
             + w_[1, 0][None, None, :] * xe[:, 1:-1]
             + w_[2, 0][None, None, :] * xe[:, 2:])
        # the reference shifts x right BEFORE its pad=1 conv, so x[T-1] is
        # dropped and the global FINAL position never sees the current
        # token: zero the w2 tap at the last position of the LAST shard
        mask = (jax.lax.axis_index(axis) == n - 1).astype(y.dtype)
        corr = w_[2, 0][None, None, :] * x_l[:, -1:, :]
        y = jnp.concatenate([y[:, :-1], y[:, -1:] - mask * corr], axis=1)
        return y + b_[None, None, :]

    spec = P(batch_axis, axis, None)
    fn = shard_map(local_fn, mesh=mesh, in_specs=(spec, P(), P()),
                   out_specs=spec)
    return fn(x, w, b)


def _rfft_channel_impl(x, mesh, axis, n_fft, batch_axis, weights=None):
    """Forward-only: time-sharded [B, T, C] -> channel-sharded (re, im)
    [B, F, C] via one all-to-all + local matmul-rfft; ``weights`` ([F] or
    None) scales the bins (used by the irfft adjoint)."""
    from spectral_tpu.ops.matfft import rfft_ri

    B, T, C = x.shape
    n = mesh.shape[axis]

    def local_fn(x_l):
        xg = _time_to_channel(x_l.astype(jnp.float32), n, axis, T)
        zr, zi = rfft_ri(jnp.swapaxes(xg, 1, 2), n_fft)  # [b, cg, F]
        if weights is not None:
            zr = zr * weights
            zi = zi * weights
        return jnp.swapaxes(zr, 1, 2), jnp.swapaxes(zi, 1, 2)

    spec = P(batch_axis, axis, None)
    out = P(batch_axis, None, axis)
    fn = shard_map(local_fn, mesh=mesh, in_specs=(spec,), out_specs=(out, out))
    return fn(x)


def _irfft_time_impl(zr, zi, mesh, axis, n_fft, T, batch_axis, weights=None):
    """Forward-only: channel-sharded (re, im) [B, F, C] -> time-sharded
    real [B, T, C] (bin ``weights`` applied first, irfft, first T)."""
    from spectral_tpu.ops.matfft import irfft_ri

    n = mesh.shape[axis]

    def local_fn(zr_l, zi_l):
        hr = jnp.swapaxes(zr_l, 1, 2)  # [b, cg, F]
        hi = jnp.swapaxes(zi_l, 1, 2)
        if weights is not None:
            hr = hr * weights
            hi = hi * weights
        y = irfft_ri(hr, hi, n_fft)  # [b, cg, n_fft]
        y = jnp.swapaxes(y[..., :T], 1, 2)  # [b, T, cg]
        return _channel_to_time(y, n, axis, T // n)

    spec = P(batch_axis, None, axis)
    out = P(batch_axis, axis, None)
    fn = shard_map(local_fn, mesh=mesh, in_specs=(spec, spec), out_specs=out)
    return fn(zr, zi)


def sharded_rfft_channel(
    x: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "sp",
    n_fft: int,
    batch_axis: Optional[str] = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Time-sharded [B, T, C] -> CHANNEL-sharded full spectrum (re, im)
    [B, F, C]: one all-to-all (time -> channel), then each device runs the
    full-length matmul-rfft (ops/matfft.rfft_ri) on its channel slice.

    Differentiable via a custom_vjp whose backward is the ADJOINT
    transform run as another forward-only shard_map (transposing the
    all_to_all/reshape composition through JAX emits malformed reshapes;
    the lax.fft transpose inside shard_map is equally broken — both are
    sidestepped).  Used by the frequency-native block's sp path
    (models/frequency_native.py), whose in-spectrum FFN needs the spectrum
    itself, not just a conv.
    """
    B, T, C = x.shape
    n = mesh.shape[axis]
    assert C % n == 0 and T % n == 0, (T, C, n)
    batch_axis = _resolve_batch_axis(mesh, batch_axis)

    @functools.partial(jax.custom_vjp)
    def fwd(x):
        return _rfft_channel_impl(x, mesh, axis, n_fft, batch_axis)

    def fwd_fwd(x):
        return fwd(x), None

    def fwd_bwd(_, ct):
        gr, gi = ct
        fbins = n_fft // 2 + 1
        # adjoint of (zero-pad -> rfft) as a real linear map:
        # x̄ = n·irfft(u ∘ ĝ)[:T], u = [1, 1/2, ..., 1/2, 1]
        u = jnp.concatenate([
            jnp.full((1,), float(n_fft), jnp.float32),
            jnp.full((fbins - 2,), 0.5 * n_fft, jnp.float32),
            jnp.full((1,), float(n_fft), jnp.float32),
        ])
        return (_irfft_time_impl(gr, gi, mesh, axis, n_fft, T, batch_axis,
                                 weights=u),)

    fwd.defvjp(fwd_fwd, fwd_bwd)
    return fwd(x)


def sharded_irfft_time(
    zr: jax.Array,
    zi: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "sp",
    n_fft: int,
    T: int,
    batch_axis: Optional[str] = "auto",
) -> jax.Array:
    """CHANNEL-sharded spectrum (re, im) [B, F, C] -> time-sharded real
    [B, T, C] (irfft, first T).  Inverse leg of ``sharded_rfft_channel``;
    same custom-vjp/adjoint story (the backward is the weighted sharded
    rfft of the cotangent — the _grad_h_impl bin weights)."""
    batch_axis = _resolve_batch_axis(mesh, batch_axis)

    @functools.partial(jax.custom_vjp)
    def inv(zr, zi):
        return _irfft_time_impl(zr, zi, mesh, axis, n_fft, T, batch_axis)

    def inv_fwd(zr, zi):
        return inv(zr, zi), None

    def inv_bwd(_, gy):
        # adjoint of (irfft -> truncate): z̄ = w ∘ rfft(pad(ȳ)) with
        # w = [1, 2, ..., 2, 1]/n_fft (the irfft doubling weights)
        w = _irfft_weights(n_fft)
        gr, gi = _rfft_channel_impl(gy, mesh, axis, n_fft, batch_axis,
                                    weights=w)
        return gr, gi

    inv.defvjp(inv_fwd, inv_bwd)
    return inv(zr, zi)


def sequence_sharded_causal_conv(
    x: jax.Array,
    kernel: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "sp",
    backend: str = "xla",
) -> jax.Array:
    """Convenience wrapper: time-sharded causal conv with a K-tap kernel."""
    B, T, C = x.shape
    (K,) = kernel.shape
    n_fft = conv_n_fft(T, K)
    h = kernel_rfft(kernel, n_fft)
    return sequence_sharded_spectral_conv(x, h, mesh, axis=axis, n_fft=n_fft, backend=backend)
