"""Test config: force CPU backend with 8 virtual devices for sharding tests.

Note: this environment's sitecustomize registers the `axon` TPU platform at
interpreter start and JAX_PLATFORMS=cpu in the env is NOT honored — tests
would silently run over the network tunnel to the real TPU (catastrophically
slow for eager ops). `jax.config.update("jax_platforms", ...)` after import
does win, so we use that.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
