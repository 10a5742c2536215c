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


def configure_compile_cache(min_compile_seconds: float = 0.1) -> bool:
    """Enable the persistent cache; True when the config took.

    `min_compile_seconds` gates which compiles are WRITTEN (lookups always
    happen): 0.1 s measured best for the many-small-programs test suite;
    long-compile-only callers may pass a higher bar to keep the dir lean.
    Failures (older jax flag names, read-only dir) are non-fatal — cold
    compiles still work.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", str(CACHE_DIR))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", float(min_compile_seconds)
        )
        return True
    except Exception:
        return False
