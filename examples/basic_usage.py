"""Sparse Spectral Tensor walkthroughs (mirror of reference examples/basic_usage.py).

Run: python examples/basic_usage.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.core.tensor import MemoryManager, SparseSpectralTensor, randn_sst, sst


def example_1_creation():
    print("\n=== 1. Creating SSTs ===")
    spatial = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (1000, 1000)))
    t = SparseSpectralTensor(data=spatial, sparsity=0.05)
    print(t)
    print(f"Compression: {t.compress_ratio():.1f}x, memory: {t.memory_mb():.2f} MB")


def example_2_arithmetic():
    print("\n=== 2. Arithmetic in the frequency domain ===")
    a = randn_sst((256, 256), sparsity=0.1, seed=1)
    b = randn_sst((256, 256), sparsity=0.1, seed=2)
    print("a + b       ->", (a + b).shape)
    print("2.5 * a     ->", (2.5 * a).shape)
    print("a.matmul(b) ->", a.matmul(b).shape)


def example_3_memory_management():
    print("\n=== 3. Memory management ===")
    MemoryManager.set_limit(100)
    _ = [randn_sst((128, 128), sparsity=0.2, seed=i) for i in range(4)]
    stats = MemoryManager.get_stats()
    print(f"tensors={stats['n_tensors']} total={stats['total_memory_mb']:.2f}MB "
          f"limit={stats['limit_mb']}MB util={stats['utilization']:.1%}")
    MemoryManager.clear_all()
    MemoryManager.set_limit(5000)


def example_4_sparsity_sweep():
    print("\n=== 4. Sparsity vs reconstruction error ===")
    t = np.linspace(0, 8 * np.pi, 512)
    smooth = (np.sin(t)[:, None] * np.cos(t)[None, :]).astype(np.float32)
    for sp in (0.01, 0.05, 0.1, 0.25):
        x = sst(smooth, sparsity=sp)
        err = float(jnp.linalg.norm(x.to_spatial() - smooth) / np.linalg.norm(smooth))
        print(f"sparsity {sp:5.2f}: compression {x.compress_ratio():6.1f}x  error {err:.4f}")


def example_5_nd():
    print("\n=== 5. ND tensors ===")
    for shape in [(64,), (32, 32), (16, 16, 16)]:
        x = randn_sst(shape, sparsity=0.1)
        print(f"{str(shape):>14} -> round-trip shape {x.to_spatial().shape}")


def example_6_large():
    print("\n=== 6. 8K x 8K (sparse storage) ===")
    big = np.zeros((8192, 8192), np.float32)
    big[:64, :64] = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (64, 64)))
    x = sst(big, sparsity=0.001)
    print(f"dense would be {big.nbytes/1e6:.0f} MB; SST stores {x.memory_mb():.1f} MB "
          f"({x.compress_ratio():.0f}x)")


if __name__ == "__main__":
    example_1_creation()
    example_2_arithmetic()
    example_3_memory_management()
    example_4_sparsity_sweep()
    example_5_nd()
    example_6_large()
    print("\nAll examples completed.")
