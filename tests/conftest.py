"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on `--xla_force_host_platform_device_count=8`
CPU devices (no TPU pod is available in CI); the driver separately dry-runs
the multi-chip path via `__graft_entry__.dryrun_multichip`.

The session environment may pin an experimental TPU platform via an
interpreter-level sitecustomize (which partially initializes jax before this
conftest runs), so we both set the env var AND update jax.config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
