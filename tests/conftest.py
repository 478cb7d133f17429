"""Test configuration: force CPU backend with 8 virtual devices.

No TPU is available in CI; every jitted function in the package runs
unchanged on the CPU backend, and the multi-stream sharding tests use an
8-device virtual mesh (SURVEY.md §4).

This must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment's TPU plugin ("axon") ignores the JAX_PLATFORMS env var;
# force the CPU backend explicitly so tests are hermetic and the
# 8-virtual-device mesh is available.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: per-op compiles are slow in this
# environment; the cache makes repeat test runs fast. Tests get their
# OWN cache directory — sharing the TPU processes' cache meant
# concurrent writers on the same files, and a flaky segfault was traced
# into jax's cache-write path under that contention.
#
# Self-healing: a process that segfaults mid-run (the XLA:CPU JIT is
# known to crash late in big suites) can leave a truncated cache entry,
# and the NEXT run then segfaults in the cache-READ/deserialize path —
# a self-perpetuating crash ("passes with a cold cache"). A sentinel
# marks a session in progress; if it survives (previous run died), only
# entries WRITTEN BY THE DEAD SESSION (mtime >= the sentinel's) are
# removed — only the dying session's writes can be truncated, and the
# warm pre-crash cache is ~30 min of XLA:CPU compiles (VERDICT r3 weak
# #8: the old wipe-everything made every post-crash run fully cold).
# Caveat (accepted): mtime granularity can be 1 s, so healthy entries
# written the same second as the sentinel may also be deleted, and a
# CONCURRENT pytest session's fresh writes would be too — both are
# benign over-deletion (the cache regenerates); don't run two suites
# against the same cache dir if that matters.
from botsort_tpu.runtime.device import setup_compilation_cache  # noqa: E402

_cache_dir = os.environ.get(
    "BOTSORT_TPU_TEST_CACHE",
    os.path.expanduser("~/.cache/botsort_tpu/xla-cpu-tests"))
_sentinel = os.path.join(_cache_dir, ".session-in-progress")
if os.path.exists(_sentinel):
    _cutoff = os.path.getmtime(_sentinel)
    for _root, _dirs, _files in os.walk(_cache_dir):
        for _f in _files:
            _p = os.path.join(_root, _f)
            try:
                if os.path.getmtime(_p) >= _cutoff:
                    os.remove(_p)
            except OSError:
                pass
os.makedirs(_cache_dir, exist_ok=True)
with open(_sentinel, "w"):
    pass
setup_compilation_cache(_cache_dir)


def pytest_sessionfinish(session, exitstatus):
    try:
        os.remove(_sentinel)
    except OSError:
        pass
