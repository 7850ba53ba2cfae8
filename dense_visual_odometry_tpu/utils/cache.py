"""Persistent-compile-cache helpers.

XLA:CPU AOT executables encode the host CPU's feature set, but the jax
persistent-cache key does not (jax 0.9): loading an entry produced on a
different machine logs ``Machine type ... doesn't match ... could lead
to execution errors such as SIGILL`` and, for some programs,
CHECK-aborts the process.  This repo's sessions migrate between hosts,
so CPU-backend caches are scoped per CPU identity; TPU executables are
machine-portable and share the cache root.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

CACHE_ROOT = Path(__file__).resolve().parents[2] / ".jax_cache"


def _cpu_fingerprint() -> str:
    # Hash the full identity block of cpu0, not just model name + flags:
    # two hosts in this fleet share those two lines yet differ in
    # stepping/microcode, and XLA bakes stepping-dependent tuning
    # features (+prefer-no-gather/...) into AOT executables — a
    # model+flags fingerprint collided and loaded a foreign executable
    # (SIGILL risk, observed as cpu_aot_loader feature-mismatch errors).
    keys = (
        "vendor_id", "cpu family", "model", "model name", "stepping",
        "microcode", "cache size", "flags",
    )
    fp = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if not line.strip():
                    break  # end of cpu0's block
                if line.startswith(keys):
                    fp += line
    except OSError:
        import platform

        fp = platform.processor()
    return hashlib.sha256(fp.encode()).hexdigest()[:12]


def persistent_cache_dir(platform: str | None = None) -> str:
    """Cache dir for ``platform`` ('cpu' -> machine-scoped subdir)."""
    if platform == "cpu":
        return str(CACHE_ROOT / f"cpu-{_cpu_fingerprint()}")
    return str(CACHE_ROOT)


def enable_persistent_cache(platform: str | None = None) -> None:
    """Point jax's persistent cache at the right dir for ``platform``.

    Call after deciding the platform (jax.config 'jax_platforms') and
    before the first compile.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", persistent_cache_dir(platform))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
