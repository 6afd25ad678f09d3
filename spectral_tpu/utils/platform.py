"""Platform selection helper.

Some environments pre-register an experimental TPU platform at interpreter
start (sitecustomize), which beats the JAX_PLATFORMS env var; CLIs and module
self-tests call this to make the env var authoritative again.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
