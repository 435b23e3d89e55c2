"""Test harness config: run on CPU with a virtual 8-device mesh.

The container's sitecustomize imports jax at interpreter startup and
registers the axon TPU tunnel with JAX_PLATFORMS=axon, so the platform
must be overridden via jax.config (env vars are already latched).

Multi-chip sharding is validated on the fake 8-device CPU mesh the same
way the reference validates its input-source manager against
parameter-server fixtures
(elevation_mapping/test/input_sources/InputSourcesTest.cpp:15-60): a fake
environment standing in for hardware CI doesn't have.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache for the suite: this box has TWO cores, and
# the heavy WBC/PDIP compiles intermittently crawl under LLVM on a bad
# scheduling day (observed: a compile that takes 9 s in isolation
# stalling a full-suite run past its timeout).  Caching makes every
# rerun immune — the first run pays once.
_cache = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                      ".jaxcache-tests")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
