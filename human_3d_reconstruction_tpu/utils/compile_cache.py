"""One definition of the persistent-compile-cache setup.

Every entry point (tests/conftest, CLI processes, bench.py, tpu_checks.py,
benchmarks/*) wants the same thing: point jax at the repo's gitignored
`.jax_cache` so recompiles of identical programs are disk hits. On the
remote-compile tunnel a cold flagship program costs minutes; on the 1-core
CPU test host the full suite drops 46 -> 28 min warm. Keeping the block
here stops the cache dir / threshold / fallback semantics from drifting
between the (previously ~19) copies.
"""

from __future__ import annotations

import os
from pathlib import Path

# repo root: utils/ -> package -> repo. HMR_TPU_CACHE_DIR overrides (e.g.
# point at an empty dir to measure a cold compile without disturbing the
# warm cache).
CACHE_DIR = Path(
    os.environ.get("HMR_TPU_CACHE_DIR")
    or Path(__file__).resolve().parent.parent.parent / ".jax_cache"
)


def _host_fingerprint() -> str:
    """CPU-feature fingerprint of this host (stable across processes).

    XLA:CPU AOT cache entries bake in the COMPILE machine's features; when
    the session later lands on a host with a different feature set, the
    loader still deserializes them — with a SIGILL warning and, measured
    r4, numerically different summation (an fp-tolerance test that passes
    with a fresh cache failed against r3's cross-machine entries). The
    cache key ignores this, so we fingerprint the host ourselves.
    """
    import hashlib
    import platform

    flags = ""
    try:
        for line in Path("/proc/cpuinfo").read_text().splitlines():
            if line.startswith("flags"):
                flags = " ".join(sorted(line.split(":", 1)[1].split()))
                break
    except OSError:
        pass
    return hashlib.sha256(
        f"{platform.machine()}|{flags}".encode()
    ).hexdigest()[:16]


def _invalidate_if_foreign(cache_dir: Path) -> None:
    """Wipe cache entries compiled on a host with different CPU features."""
    import shutil

    tag_file = cache_dir / "HOST_FINGERPRINT"
    fp = _host_fingerprint()
    try:
        if tag_file.exists() and tag_file.read_text() == fp:
            return
        if cache_dir.exists() and any(cache_dir.iterdir()):
            shutil.rmtree(cache_dir)
        cache_dir.mkdir(parents=True, exist_ok=True)
        tag_file.write_text(fp)
    except OSError:
        pass  # read-only dir etc. — cache stays best-effort


def configure_compile_cache(min_compile_seconds: float = 0.1) -> bool:
    """Enable the persistent cache; True when the config took.

    `min_compile_seconds` gates which compiles are WRITTEN (lookups always
    happen): 0.1 s measured best for the many-small-programs test suite;
    long-compile-only callers may pass a higher bar to keep the dir lean.
    Failures (older jax flag names, read-only dir) are non-fatal — cold
    compiles still work. Entries compiled on a host with different CPU
    features are wiped first (see _host_fingerprint).
    """
    import jax

    _invalidate_if_foreign(CACHE_DIR)
    try:
        jax.config.update("jax_compilation_cache_dir", str(CACHE_DIR))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", float(min_compile_seconds)
        )
        return True
    except Exception:
        return False
