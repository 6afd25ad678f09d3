"""spectral_tpu.utils — device cleanup, memory stats, console helpers."""

from spectral_tpu.utils.cleanup import DeviceContext, cleanup_device, cleanup_models, device_memory_stats

__all__ = ["DeviceContext", "cleanup_device", "cleanup_models", "device_memory_stats"]
