"""Per-process scratch space for driver queries that stage files
(streaming sources, streaming checkpoints, IceLite fixture tables).

ADVICE r06: these dirs used to be bare ``tempfile.mkdtemp()`` calls
with no cleanup, so repeated gate/bench replays accumulated unbounded
parquet copies of the point/event fixtures under /tmp. Every scratch
dir now lives under ONE process-scoped root that is rmtree'd at
interpreter exit.

The dirs are deliberately NOT removed when the query function returns:
the returned DataFrame is lazy — the driver materializes it after the
function exits — so staged source files and checkpoints must outlive
the call. Process exit is the earliest safe point.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

__all__ = ["scratch_dir"]

_ROOT: list[str] = []


def scratch_dir(prefix: str) -> str:
    """A fresh empty directory under the process-scoped scratch root
    (created lazily, removed by atexit). Drop-in replacement for
    ``tempfile.mkdtemp(prefix=prefix)``."""
    if not _ROOT:
        root = tempfile.mkdtemp(prefix="esrp_scratch_")
        _ROOT.append(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT[0])
