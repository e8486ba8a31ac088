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
# Unrolled scan bodies are bit-exact vs rolled (pure scheduling) but cost
# ~4x the XLA:CPU compile time, which dominates the suite on the 1-core CI
# host; force rolled loops for tests that leave scan_unroll on auto.
os.environ.setdefault("SNN_TPU_SCAN_UNROLL", "1")

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# Persistent compile cache: XLA:CPU compile time dominates the suite on the
# 1-core CI host; warm reruns skip it entirely.  (.jax_cache/ is gitignored.)
try:
    # override the dir when running a second pytest process concurrently:
    # two processes sharing one cache can corrupt an entry mid-write
    # (observed as a segfault in compilation_cache.get_executable_and_time)
    _cache = os.environ.get("SNN_TPU_TEST_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache", "tests")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
except Exception:
    pass
