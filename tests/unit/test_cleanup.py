"""Coverage for utils/cleanup.py (reference fft_tensor/cleanup.py +
cleanup_gpu.py: cleanup_cuda/cleanup_models/GPUContext, TPU edition)."""

import jax
import jax.numpy as jnp

from spectral_tpu.utils.cleanup import (
    DeviceContext,
    cleanup_device,
    cleanup_models,
    device_memory_stats,
)


def test_device_memory_stats_returns_dict():
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # {} is fine on CPU backends


def test_cleanup_device_clears_jit_cache():
    @jax.jit
    def f(x):
        return x * 2.0

    f(jnp.ones(4))
    assert f._cache_size() >= 1
    cleanup_device()
    assert f._cache_size() == 0


def test_cleanup_models_and_context_no_raise(capsys):
    m = {"params": jnp.ones((8, 8))}
    cleanup_models(m)
    with DeviceContext("unit-test", verbose=True):
        jnp.ones((4, 4)).block_until_ready()
    # verbose printing only happens when the backend reports stats; either
    # way the context must exit cleanly
    capsys.readouterr()
