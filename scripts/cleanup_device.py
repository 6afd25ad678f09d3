"""Standalone device-memory cleanup (mirror of reference cleanup_gpu.py)."""

from __future__ import annotations

from scripts._common import apply_platform_env


def main() -> None:
    apply_platform_env()
    from spectral_tpu.utils.cleanup import cleanup_device

    stats = cleanup_device(verbose=True)
    if not stats:
        print("[cleanup] no device memory stats available on this backend")


if __name__ == "__main__":
    main()
