"""Top-k spectral sparsity vs reconstruction error sweep.

Reference: test_sparsity.py at the reference repo root — the quick study
behind the SST default sparsity: how much of a 2-D spectrum you can drop
before reconstruction error becomes visible.

Run: python experiments/sparsity_sweep.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from spectral_tpu.utils.platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORMS even when sitecustomize pre-pins a platform

import jax
import jax.numpy as jnp


def sweep(shape=(128, 128), seed=0, sparsities=(0.01, 0.05, 0.10, 0.20, 0.50)):
    x = jax.random.normal(jax.random.PRNGKey(seed), shape)
    freq = jnp.fft.fft2(x)
    flat = freq.reshape(-1)
    mags = jnp.abs(flat)
    rows = []
    for s in sparsities:
        k = max(1, int(flat.size * s))
        # keep the k largest-magnitude coefficients (scatter-free: threshold mask)
        kth = jnp.sort(mags)[-k]
        sparse = jnp.where(mags >= kth, flat, 0.0).reshape(freq.shape)
        recon = jnp.fft.ifft2(sparse).real
        err = float(jnp.linalg.norm(recon - x) / jnp.linalg.norm(x))
        rows.append((s, err))
    return rows


if __name__ == "__main__":
    for s, err in sweep():
        print(f"Sparsity {s*100:5.1f}% -> Error {err*100:6.2f}%")
