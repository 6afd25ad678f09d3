"""Pallas byte→spectral encoder: fused normalize + DFT magnitudes on the MXU.

TPU-native equivalent of the reference's Triton byte encoders
(triton_byte_encoder.py:20-74, byte_spectral_triton.py:19-67): per-(pos, dim)
DFT magnitude features of the normalized byte signal.

Kernel shape: the T distinct DFT magnitudes are computed as two
(B_blk, T) @ (T, T) matmuls against precomputed cos/sin DFT matrices —
exactly the "vectorized cos/sin feature matmul on the MXU" plan from
SURVEY.md §2.1 — fused with the byte normalization.  The cheap
(pos*dim) % T feature gather runs in XLA outside the kernel (gathers are
well-supported there; inside Mosaic they are not).

Pure-jnp reference: spectral_tpu.layers.byte_spectral.byte_dft_features
(fft + gather — same values).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


def _dft_matrices(T: int):
    """Precompute (T, T) cos/sin DFT matrices: M[t, f] = cis(-2 pi f t / T)."""
    t = np.arange(T)[:, None].astype(np.float64)
    f = np.arange(T)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * t * f / T
    return jnp.asarray(np.cos(ang), jnp.float32), jnp.asarray(np.sin(ang), jnp.float32)


def _byte_mag_kernel(bytes_ref, cos_ref, sin_ref, mag_ref):
    """(B_blk, T) bytes -> (B_blk, T) DFT magnitudes, all VMEM-resident."""
    signal = bytes_ref[:, :].astype(jnp.float32) / 127.5 - 1.0  # fused normalize
    re = jnp.dot(signal, cos_ref[:, :], preferred_element_type=jnp.float32)
    im = jnp.dot(signal, sin_ref[:, :], preferred_element_type=jnp.float32)
    mag_ref[:, :] = jnp.sqrt(re * re + im * im)


def byte_dft_magnitudes_pallas(byte_ids: jax.Array, *, b_block: int = 8, interpret: bool = False) -> jax.Array:
    """[B, T] bytes -> [B, T] DFT magnitude spectrum via the fused kernel."""
    B, T = byte_ids.shape
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # Mosaic compiles only for TPU; interpret elsewhere
    cos_m, sin_m = _dft_matrices(T)
    bb = min(b_block, B)
    while B % bb:
        bb -= 1
    return pl.pallas_call(
        _byte_mag_kernel,
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T), jnp.float32),
        interpret=interpret,
    )(byte_ids.astype(jnp.int32), cos_m, sin_m)


def byte_encode_pallas(byte_ids: jax.Array, embed_dim: int, *, interpret: bool = False) -> jax.Array:
    """[B, T] bytes -> [B, T, embed_dim] features (kernel + XLA gather).

    feature[b, p, d] = mag[b, (p*d) % T] — identical to
    layers.byte_spectral.byte_dft_features.
    """
    B, T = byte_ids.shape
    if not PALLAS_AVAILABLE:
        from spectral_tpu.layers.byte_spectral import byte_dft_features

        return byte_dft_features(byte_ids, embed_dim)
    mag = byte_dft_magnitudes_pallas(byte_ids, interpret=interpret)
    p = jnp.arange(T)[:, None]
    d = jnp.arange(embed_dim)[None, :]
    freq_idx = (p * d) % T
    return mag[:, freq_idx]
