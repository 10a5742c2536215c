"""Build-on-first-use for the native C++ libraries.

The compiled `.so` is never committed (unreviewable artifact) and never
trusted by mtime: the SHA-256 of the source is baked into the output
filename, so a changed source — or a fresh clone with arbitrary file
timestamps — always triggers a rebuild, and a stale or wrong-arch binary
can never be picked up. Artifacts live under `native/build/` (gitignored).
"""

from __future__ import annotations

import hashlib
import subprocess
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_BUILD_DIR = _REPO_ROOT / "native" / "build"


def build_native(src: Path, extra_flags: tuple[str, ...] = ()) -> Path:
    """Compile `src` into a content-addressed shared library and return its path."""
    digest = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    out = _BUILD_DIR / f"{src.stem}-{digest}.so"
    if not out.exists():
        _BUILD_DIR.mkdir(parents=True, exist_ok=True)
        tmp = out.with_suffix(".so.tmp")
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", *extra_flags, "-o", str(tmp), str(src)],
            check=True,
            capture_output=True,
        )
        tmp.replace(out)  # atomic: concurrent builders race benignly
    return out
