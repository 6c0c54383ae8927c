"""Process-lifetime scratch directories for Parquet stage checkpoints.

Multi-pass stages (stages/scan.exclusive_prefix_sum, stages/knn narrow
checkpoints, sources/pages JSONL/CSV round-trips) checkpoint a narrow
projection to Parquet instead of pinning it in the object store. Those
directories used to be swept only by bench.py startup and the test
fixture, so a driver-contract or library call leaked one scratch dir
per invocation (round-4 advice). Every creation now goes through
:func:`scratch_dir`, which records the path and registers ONE atexit
sweep for the process — entry points that outlive their datasets stay
clean without each caller owning cleanup.

The checkpoint is read lazily by downstream passes, so removal must
happen at process exit (not when the creating function returns).
"""
from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

_CREATED: list[str] = []
_REGISTERED = False


def _sweep() -> None:
    for d in _CREATED:
        shutil.rmtree(d, ignore_errors=True)
    _CREATED.clear()


def scratch_dir(prefix: str, scratch: str | None = None) -> str:
    """Return a fresh process-unique scratch path ``<root>/<prefix><hex>``
    (not yet created — Parquet writers mkdir themselves) and register it
    for removal at interpreter exit."""
    global _REGISTERED
    root = scratch or os.environ.get("GRAFT_SCRATCH", tempfile.gettempdir())
    path = os.path.join(root, f"{prefix}{uuid.uuid4().hex}")
    _CREATED.append(path)
    if not _REGISTERED:
        atexit.register(_sweep)
        _REGISTERED = True
    return path
