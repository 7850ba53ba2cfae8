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
    # Round-3 finding: even this full block collides across fleet VMs —
    # entries compiled elsewhere still load here with cpu_aot_loader
    # feature-mismatch warnings.  Inspecting those warnings shows the
    # mismatch is ONLY the LLVM tuning pseudo-features
    # (+prefer-no-gather/+prefer-no-scatter), never an ISA bit: real ISA
    # divergence (e.g. avx512* present/absent) appears in cpuinfo
    # ``flags`` and therefore changes this hash, so colliding hosts can
    # only differ in vectorizer TUNING — their executables are
    # execution-safe (no unsupported instruction can be emitted), just
    # possibly sub-optimally tuned.  We accept that: a cross-host reuse
    # saves a 10-25 min cold compile.  The multichip dryrun, where a
    # loud warning tail is itself a failure signal, loads no CPU AOT
    # entries at all (__graft_entry__.py).
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
    """Cache dir for ``platform`` ('cpu' -> machine-scoped subdir).

    Stale ``cpu-*`` dirs from other hosts are deliberately NOT pruned:
    sessions bounce between a small fleet of machines, and each dir saves
    that machine's 10-25 min cold compile on its next visit.  (Widening
    the fingerprint re-keys every dir once — a one-time recompile per
    host, noted in CLAUDE.md.)  The multichip dryrun path never loads CPU
    AOT entries at all (__graft_entry__.py): scoping mitigates the
    cross-machine SIGILL risk, not-loading eliminates it.
    """
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
