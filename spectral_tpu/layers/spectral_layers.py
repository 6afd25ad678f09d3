"""Spectral mixing layers — the flagship O(T log T) attention replacement.

TPU-native re-expression of the reference's spectral layer family
(reference: fft_tensor/spectral_layers.py:19-256 and the Wirtinger filter,
fft_tensor/wirtinger_ops.py:145-203).

Semantics preserved from the reference:
* FFT runs across the SEQUENCE axis only (context structure, not semantics).
* A learnable complex filter of shape (D, num_filters) is applied to the
  lowest ``k = min(num_filters, T//2)`` bins; all higher bins are ZEROED
  (spectral_layers.py:101-109 — that zeroing is part of the layer's contract,
  not an accident).
* ``learnable=False`` degrades to pure FFT→IFFT mixing (FNet-style).
* Gradients through the filter use the Wirtinger conjugate-multiply rule
  (``use_wirtinger=True``), matching the torch reference bit-for-bit in fp32.

TPU-native differences:
* Weights live as real/imag float32 leaves (optax-friendly).
* The whole layer jits into a single XLA fusion (fft → scale → ifft); the
  Pallas fused-filter kernel in ``spectral_tpu.ops.pallas_spectral`` replaces
  the mid-section on TPU for the memory-bound path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spectral_tpu.ops.wirtinger import wirtinger_multiply_ri


@__import__("functools").lru_cache(maxsize=32)
def _lowbin_tables(T: int, k: int):
    """(T, k) cos/sin low-bin DFT tables — shared source: ops.matfft."""
    from spectral_tpu.ops.matfft import lowbin_tables

    return lowbin_tables(T, k)


class SpectralMixingLayer(nn.Module):
    """O(T log T) global mixing: FFT → learnable complex filter → IFFT.

    Args:
        embed_dim: model width D.
        num_filters: frequency filters (default D//2).
        dropout: dropout prob applied to the output.
        learnable: if False, no parameters — pure FFT mixing.
        use_wirtinger: route the filter multiply through the custom Wirtinger
            vjp (reference parity); if False, rely on jnp complex autodiff.
    """

    embed_dim: int
    num_filters: Optional[int] = None
    dropout: float = 0.0
    learnable: bool = True
    use_wirtinger: bool = True
    # "xla" (jnp.fft), "matmul" (MXU four-step FFT, ops/matfft.py),
    # "pallas" (single VMEM-resident fused kernel, ops/pallas_spectral.py),
    # or "bandlimited" (rank-k low-bin projection — the layer ZEROES all
    # bins >= num_filters by contract, so the full transform is never
    # needed: two (T, k) DFT matmuls around the filter, O(T*k) work and a
    # tiny [B, k, D] intermediate).  matmul/pallas require power-of-two T.
    fft_backend: str = "xla"

    @property
    def n_filters(self) -> int:
        return self.num_filters or (self.embed_dim // 2)

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        B, T, D = x.shape
        assert D == self.embed_dim, f"Expected embed_dim={self.embed_dim}, got {D}"

        if self.fft_backend == "matmul":
            return self._matmul_forward(x, deterministic)
        if self.fft_backend == "pallas":
            return self._pallas_forward(x, deterministic)
        if self.fft_backend == "bandlimited":
            return self._bandlimited_forward(x, deterministic)
        if self.fft_backend == "bandlimited_stream":
            return self._bandlimited_stream_forward(x, deterministic)

        x_freq = jnp.fft.fft(x.astype(jnp.float32), axis=1)  # [B, T, D] complex64

        if self.learnable:
            nf = self.n_filters
            w_real = self.param("weight_real", nn.initializers.ones, (D, nf))
            w_imag = self.param("weight_imag", nn.initializers.zeros, (D, nf))
            bias = self.param("bias", nn.initializers.zeros, (D,))

            k = min(nf, T // 2)
            # The reference slices the low bins, filters them, and scatters
            # back into zeros (spectral_layers.py:97-109).  Equivalent — and
            # scatter-free, which the TPU backend requires for complex dtypes
            # and XLA fuses into one elementwise pass — is multiplying the
            # FULL spectrum by the weight zero-padded over the high bins:
            # high bins x 0 == "high frequencies zeroed" (layer contract).
            wb_r = jnp.pad(w_real[:, :k].T, ((0, T - k), (0, 0)))[None]  # (1, T, D)
            wb_i = jnp.pad(w_imag[:, :k].T, ((0, T - k), (0, 0)))[None]
            if self.use_wirtinger:
                x_freq = wirtinger_multiply_ri(x_freq, wb_r, wb_i)
            else:
                x_freq = x_freq * jax.lax.complex(wb_r, wb_i)

        y = jnp.fft.ifft(x_freq, axis=1).real.astype(x.dtype)

        if self.learnable:
            y = y + bias
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y

    def _matmul_forward(self, x: jax.Array, deterministic: bool) -> jax.Array:
        """MXU path: fft -> filter -> ifft as batched DFT matmuls.

        Same math as the XLA branch (the Wirtinger custom vjp computes the
        identical gradients autodiff derives for these real einsums, so it
        is not needed here).  Works in (B, D, T) layout so the transform
        contracts the minor axis.

        Real-input reduction: x is real, so its spectrum is Hermitian, and
        the filter only touches bins k < T/2.  real(ifft(X*W)) therefore
        equals irfft(Yeff) with Yeff[0] = X0*W0 and Yeff[k>=1] = X[k]W[k]/2
        (the irfft convention doubles the middle bins) — the whole layer is
        two packed half-length (T/2) transforms instead of two full complex
        T-transforms.
        """
        from spectral_tpu.ops import matfft

        B, T, D = x.shape
        xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2)  # (B, D, T)
        fr, fi = matfft.rfft_ri(xt, T)  # (B, D, T//2+1)

        if self.learnable:
            nf = self.n_filters
            w_real = self.param("weight_real", nn.initializers.ones, (D, nf))
            w_imag = self.param("weight_imag", nn.initializers.zeros, (D, nf))
            bias = self.param("bias", nn.initializers.zeros, (D,))
            k = min(nf, T // 2)
            half = jnp.concatenate(
                [jnp.ones((1,), jnp.float32), jnp.full((k - 1,), 0.5, jnp.float32)]
            )
            wr = jnp.pad(w_real[:, :k] * half, ((0, 0), (0, T // 2 + 1 - k)))[None]
            wi = jnp.pad(w_imag[:, :k] * half, ((0, 0), (0, T // 2 + 1 - k)))[None]
            pr = fr * wr - fi * wi
            pi = fr * wi + fi * wr
        else:  # pure FFT mixing: ifft(fft(x)) == x
            pr, pi = fr, fi
            # identity via irfft of the unscaled Hermitian spectrum
            y = jnp.swapaxes(matfft.irfft_ri(pr, pi, T), 1, 2).astype(x.dtype)
            return nn.Dropout(self.dropout)(y, deterministic=deterministic)

        y = jnp.swapaxes(matfft.irfft_ri(pr, pi, T), 1, 2).astype(x.dtype)
        y = y + bias
        return nn.Dropout(self.dropout)(y, deterministic=deterministic)

    def _bandlimited_forward(self, x: jax.Array, deterministic: bool) -> jax.Array:
        """Rank-k band projection — algebraically identical to the XLA path.

        The layer's contract zeroes every bin >= k AND the conjugate tail
        (reference spectral_layers.py:101-109 filters a FULL fft), so
        ``y = Re(ifft(pad(W ⊙ fft(x)[:k])))`` collapses to two (T, k) DFT
        matmuls around a (k, D) filter:

            X[j]  = Σ_t x[t]·(cos - i·sin)(2πjt/T),   j < k
            y[t]  = (1/T)·Σ_j  Yr[j]·cos(2πjt/T) - Yi[j]·sin(2πjt/T)

        O(T·k·D) MXU work and a [B, k, D] intermediate instead of a full
        O(T·F·D) spectrum — the dominant seq-4k win (k = D/2 = 128 vs
        F = 2049).  Precision follows ops.matfft.set_precision (bf16 fast
        mode on TPU by default; HIGHEST restores fp32 accuracy).
        """
        import functools

        from spectral_tpu.ops import matfft

        B, T, D = x.shape
        if not self.learnable:
            return nn.Dropout(self.dropout)(x, deterministic=deterministic)  # ifft(fft(x)) == x

        nf = self.n_filters
        w_real = self.param("weight_real", nn.initializers.ones, (D, nf))
        w_imag = self.param("weight_imag", nn.initializers.zeros, (D, nf))
        bias = self.param("bias", nn.initializers.zeros, (D,))
        k = min(nf, T // 2)

        xf = x.astype(jnp.float32)

        # NOTE (measured, v5e): a fused Pallas version of this projection
        # exists (ops/pallas_bandlimited.py, parity-gated) but is NOT
        # dispatched here — at the seq-4k headline shape it measured 0.42 ms
        # vs 0.29 ms for these einsums at fp32 accuracy (and 4x slower in
        # bf16 fast mode).  XLA keeps the whole op fused and, inside a
        # jitted loop, keeps the carry VMEM-resident across iterations;
        # pallas_call forces an HBM round trip per call.  Kernel kept as an
        # explicit opt-in for contexts XLA can't fuse (see its docstring).
        tc, ts = _lowbin_tables(T, k)
        mm = functools.partial(
            jnp.einsum, preferred_element_type=jnp.float32, precision=matfft._PRECISION
        )
        xr = mm("btc,tk->bkc", xf, tc)  # Re rfft(x)[:k]
        xi = -mm("btc,tk->bkc", xf, ts)  # Im rfft(x)[:k]
        wr = w_real[:, :k].T[None]  # (1, k, D)
        wi = w_imag[:, :k].T[None]
        yr = xr * wr - xi * wi
        yi = xr * wi + xi * wr
        # reconstruction weights: the XLA path is a FULL fft whose conjugate
        # (negative-frequency) bins are zeroed along with the high bins, so
        # each kept bin carries exactly 1/T — no Hermitian doubling
        # (same algebra as _matmul_forward's half-scaled effective filter)
        s = jnp.full((k,), 1.0 / T, jnp.float32)[None, :, None]
        y = mm("bkc,tk->btc", yr * s, tc) - mm("bkc,tk->btc", yi * s, ts)
        y = y.astype(x.dtype) + bias
        return nn.Dropout(self.dropout)(y, deterministic=deterministic)

    def _bandlimited_stream_forward(self, x: jax.Array, deterministic: bool) -> jax.Array:
        """The STREAMED rank-k projection kernel (round 4): double-buffered
        HBM<->VMEM panel pipeline, ops/pallas_bandlimited.bandlimited_mix_stream.
        Same algebra/params as ``bandlimited``; compute dtype follows
        ops.matfft.set_precision (HIGHEST -> fp32 multi-pass in-kernel dots,
        DEFAULT -> bf16 fast mode)."""
        from spectral_tpu.ops import matfft
        from spectral_tpu.ops.pallas_bandlimited import bandlimited_mix_stream

        B, T, D = x.shape
        if not self.learnable:
            return nn.Dropout(self.dropout)(x, deterministic=deterministic)

        nf = self.n_filters
        w_real = self.param("weight_real", nn.initializers.ones, (D, nf))
        w_imag = self.param("weight_imag", nn.initializers.zeros, (D, nf))
        bias = self.param("bias", nn.initializers.zeros, (D,))
        k = min(nf, T // 2)
        s = 1.0 / T  # reconstruction scale folded into the filter
        wr = w_real[:, :k].T * s  # (k, D)
        wi = w_imag[:, :k].T * s
        cdt = ("float32" if matfft._PRECISION == jax.lax.Precision.HIGHEST
               else "bfloat16")
        y = bandlimited_mix_stream(x.astype(jnp.float32), wr, wi, bias, cdt)
        y = y.astype(x.dtype)
        return nn.Dropout(self.dropout)(y, deterministic=deterministic)

    def _pallas_forward(self, x: jax.Array, deterministic: bool) -> jax.Array:
        """Fully fused path: FFT -> per-channel filter -> IFFT in ONE
        VMEM-resident Pallas pass (ops/pallas_spectral.py).

        Uses the same real-input reduction as ``_matmul_forward``: the layer
        equals a spectral conv with the half-scaled effective filter
        heff[0] = W[:, 0], heff[k>=1] = W[:, k]/2 over the rfft bins, n_fft=T.
        """
        from spectral_tpu.ops.pallas_spectral import fused_spectral_conv

        B, T, D = x.shape
        if not self.learnable:
            return nn.Dropout(self.dropout)(x, deterministic=deterministic)  # ifft(fft(x)) == x

        nf = self.n_filters
        w_real = self.param("weight_real", nn.initializers.ones, (D, nf))
        w_imag = self.param("weight_imag", nn.initializers.zeros, (D, nf))
        bias = self.param("bias", nn.initializers.zeros, (D,))
        k = min(nf, T // 2)
        half = jnp.concatenate([jnp.ones((1,), jnp.float32), jnp.full((k - 1,), 0.5, jnp.float32)])
        hr = jnp.pad(w_real[:, :k] * half, ((0, 0), (0, T // 2 + 1 - k))).T  # (F, D)
        hi = jnp.pad(w_imag[:, :k] * half, ((0, 0), (0, T // 2 + 1 - k))).T
        heff = jax.lax.complex(hr, hi)

        y = fused_spectral_conv(x.astype(jnp.float32), heff, jnp.ones((B, D), jnp.float32), T)
        y = y.astype(x.dtype) + bias
        return nn.Dropout(self.dropout)(y, deterministic=deterministic)

    @staticmethod
    def verify_energy_preservation(x: jax.Array, y: jax.Array) -> float:
        """Parseval check helper (spectral_layers.py:122-132)."""
        e_in = float(jnp.sum(x.astype(jnp.float32) ** 2))
        e_out = float(jnp.sum(y.astype(jnp.float32) ** 2))
        return e_out / (e_in + 1e-8)


class WirtingerSpectralFilter(nn.Module):
    """Standalone complex spectral filter over the lowest k bins.

    Operates on an already-FFT'd complex [B, T, D] tensor; identity ("ones")
    init so the layer starts as a pass-through on the kept band
    (reference: wirtinger_ops.py:145-203).
    """

    num_channels: int
    num_frequencies: int

    @nn.compact
    def __call__(self, x_freq: jax.Array) -> jax.Array:
        B, T, D = x_freq.shape
        assert D == self.num_channels
        w_real = self.param("weight_real", nn.initializers.ones, (D, self.num_frequencies))
        w_imag = self.param("weight_imag", nn.initializers.zeros, (D, self.num_frequencies))
        k = min(self.num_frequencies, T // 2)
        # scatter-free full-spectrum multiply (see SpectralMixingLayer)
        wb_r = jnp.pad(w_real[:, :k].T, ((0, T - k), (0, 0)))[None]
        wb_i = jnp.pad(w_imag[:, :k].T, ((0, T - k), (0, 0)))[None]
        return wirtinger_multiply_ri(x_freq, wb_r, wb_i)


class SpectralMLPBlock(nn.Module):
    """Pre-norm residual block: spectral mix (global) + MLP (local).

    Reference: fft_tensor/spectral_layers.py:135-190.
    """

    embed_dim: int
    mlp_ratio: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        mix = SpectralMixingLayer(self.embed_dim, dropout=self.dropout, learnable=True, name="spectral_mix")
        x = x + mix(nn.LayerNorm(name="norm1")(x), deterministic=deterministic)

        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.embed_dim * self.mlp_ratio, name="mlp_in")(h)
        h = nn.gelu(h, approximate=False)  # exact erf GELU (torch nn.GELU parity)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.embed_dim, name="mlp_out")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class HybridSpectralAttention(nn.Module):
    """Spectral global mixing + full multi-head local attention.

    Reference: fft_tensor/spectral_layers.py:193-256 (its ``window_size`` is
    accepted-but-unused there too; kept for API parity).
    """

    embed_dim: int
    num_heads: int = 8
    window_size: int = 64
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        B, T, D = x.shape
        global_context = SpectralMixingLayer(self.embed_dim, dropout=self.dropout, name="spectral")(
            x, deterministic=deterministic
        )
        h = nn.LayerNorm(name="norm")(x + global_context)
        qkv = nn.Dense(3 * D, name="qkv")(h)
        qkv = qkv.reshape(B, T, 3, self.num_heads, D // self.num_heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, T, H, Dh]
        attn = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(D // self.num_heads)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, D)
        out = nn.Dense(D, name="proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return x + out


def _self_test():  # pragma: no cover - CLI self-test (reference :259-357)
    """python -m spectral_tpu.layers.spectral_layers"""
    import numpy as np

    print("=== Spectral Mixing Correctness ===")
    rng = np.random.default_rng(0)
    B, T, D = 2, 128, 256
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))

    xf = jnp.fft.fft(x, axis=1)
    err = float(jnp.linalg.norm(jnp.fft.ifft(xf, axis=1).real - x) / jnp.linalg.norm(x))
    print(f"1. FFT round-trip error: {err:.2e}")
    assert err < 1e-5

    e_t = float(jnp.sum(x**2))
    e_f = float(jnp.sum(jnp.abs(xf) ** 2)) / T
    print(f"2. Parseval ratio: {e_f/e_t:.4f}")
    assert abs(e_f / e_t - 1.0) < 0.01

    layer = SpectralMixingLayer(D)
    params = layer.init(jax.random.PRNGKey(0), x)
    g = jax.grad(lambda p: jnp.sum(layer.apply(p, x)))(params)
    gn = sum(float(jnp.linalg.norm(l)) for l in jax.tree.leaves(g))
    print(f"3. Gradient flow: total grad norm {gn:.4f}")
    assert gn > 0

    ident = SpectralMixingLayer(D, learnable=False)
    y = ident.apply(ident.init(jax.random.PRNGKey(0), x), x)
    print(f"4. Identity (non-learnable) error: {float(jnp.linalg.norm(y-x)/jnp.linalg.norm(x)):.2e}")

    print("5. Domain typing: time real =", not jnp.iscomplexobj(x), "| freq complex =", jnp.iscomplexobj(xf))
    print("=== ALL CORRECTNESS TESTS PASSED ===")


if __name__ == "__main__":
    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    _self_test()
