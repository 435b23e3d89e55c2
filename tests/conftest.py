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

# Deep-stack protection for the suite's biggest XLA-CPU compiles
# (8-device SPMD sweep programs, h=72 interpret-mode kernels): LLVM/MLIR
# recursion intermittently SEGFAULTS a long-lived suite process
# (observed at different tests across runs, no OOM in dmesg — stack
# exhaustion).  Raising RLIMIT_STACK alone did NOT fix it: in a large
# process the MAIN thread's stack VMA cannot grow past neighboring
# mmaps regardless of the limit.  So (a) raise the soft limit for any
# threads XLA spawns, and (b) pytest_pyfunc_call below runs every test
# body on a worker thread with an explicitly pre-mapped 512 MB stack —
# thread stacks are allocated up front, immune to the growth problem.
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        _new = _hard if _hard != resource.RLIM_INFINITY else _want
        resource.setrlimit(
            resource.RLIMIT_STACK,
            (min(_want, _new) if _hard != resource.RLIM_INFINITY
             else _want, _hard),
        )
except (ImportError, ValueError, OSError):
    pass

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


# ---------------------------------------------------------------------------
# Run every test body on a big-stack worker thread (see the deep-stack
# note at the top of this file).  One thread at a time; the 512 MB is a
# virtual reservation, not resident memory.  Exceptions (including
# pytest.skip/xfail control-flow exceptions) propagate unchanged.
import threading as _threading

import pytest as _pytest

_threading.stack_size(512 * 1024 * 1024)


@_pytest.hookimpl(tryfirst=True)
def pytest_pyfunc_call(pyfuncitem):
    testfunction = pyfuncitem.obj
    funcargs = {
        name: pyfuncitem.funcargs[name]
        for name in pyfuncitem._fixtureinfo.argnames
    }
    outcome = {}

    def run():
        try:
            outcome["result"] = testfunction(**funcargs)
        except BaseException as e:  # noqa: BLE001 — re-raised below
            outcome["exc"] = e

    t = _threading.Thread(
        target=run, name=f"bigstack::{pyfuncitem.name}"
    )
    t.start()
    t.join()
    if "exc" in outcome:
        raise outcome["exc"]
    return True
