import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware; bench.py runs on the real chip.
#
# NOTE: this container's sitecustomize force-registers the axon TPU plugin
# and sets JAX_PLATFORMS=axon before conftest runs, so the env var alone is
# not enough — override the jax config directly after import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
