"""Bit-rot guard for the TPU-only scripts.

The benchmarks/ lane and the driver surfaces (bench.py, tpu_checks.py,
__graft_entry__.py) execute only on a live chip, so nothing in the CPU
suite would catch an import-time break (renamed symbol, moved module)
until the next hardware session. Importing each module executes its
module-level code — all of them gate work behind __main__ — which pins
both syntax and import graphs.
"""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

SCRIPTS = sorted(
    p.stem for p in (REPO / "benchmarks").glob("*.py") if p.stem != "__init__"
)


@pytest.mark.parametrize("name", SCRIPTS)
def test_benchmark_module_imports(name):
    importlib.import_module(f"benchmarks.{name}")


@pytest.mark.parametrize("name", ["bench", "tpu_checks", "__graft_entry__"])
def test_driver_surface_imports(name):
    sys.path.insert(0, str(REPO))
    try:
        importlib.import_module(name)
    finally:
        sys.path.remove(str(REPO))
