"""Persistent-compilation-cache setup shared by bench/entry/conftest.

XLA:CPU AOT cache entries embed the *compile host's* CPU target features
(avx512/amx/prefer-no-scatter...); loading them on a different host fails
with "machine type mismatch" spam and can in principle SIGILL (observed in
MULTICHIP_r04: the driver host rejected every entry written here, so every
stage recompiled cold AND paid the failed-load attempts). TPU entries have
no such problem — the tunnel target is the same chip everywhere.

Fix: scope CPU-platform cache entries to a directory keyed by the host's
CPU feature set, so a foreign host sees an empty (not poisoned) cache and
each host accumulates its own valid entries. TPU runs keep the shared
`.jax_cache`.
"""

from __future__ import annotations

import hashlib
import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def host_cpu_tag() -> str:
    """Stable per-host tag derived from the CPU feature flags."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return platform.machine() or "unknown"


def cache_dir(cpu: bool) -> str:
    if cpu:
        return os.path.join(_REPO_ROOT, ".jax_cache_cpu", host_cpu_tag())
    return os.path.join(_REPO_ROOT, ".jax_cache")


def enable_compile_cache(cpu: bool = False) -> None:
    """Enable the persistent cache; `cpu=True` for CPU-platform processes
    (tests, multichip dryrun) selects the host-keyed directory."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir(cpu))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
