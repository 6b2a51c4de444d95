"""Per-process scratch directories for sink/roundtrip queries.

Fixed names under ``tempfile.gettempdir()`` (e.g.
``/tmp/builder_spark_csv_roundtrip``) are world-shared: two driver
processes benching the same query race each other's ``overwrite``
writes, and another local user can pre-plant the path. Every scratch
consumer instead asks for ``scratch_dir(name)``:

- ONE ``mkdtemp`` root per process (0700, unpredictable suffix), so
  concurrent processes never share a path;
- the SAME subdir per (process, name), so a query invoked repeatedly in
  one process (cold + 3 warm bench runs) overwrites in place instead of
  accumulating copies of an sf0.1 table per invocation;
- the whole root is removed at interpreter exit.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_SCRATCH_ROOT: str | None = None


def scratch_dir(name: str) -> str:
    """Return ``<per-process-root>/<name>`` (parent created, leaf not —
    Spark writers create the leaf themselves)."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="builder_spark_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    path = os.path.join(_SCRATCH_ROOT, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path
