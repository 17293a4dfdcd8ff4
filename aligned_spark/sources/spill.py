"""Shared spill-cache eviction for object-store sources.

The S3/Azure driver tiers download objects into an etag-keyed local
spill dir so repeat reads of an unchanged object cost nothing. When
an object is rewritten remotely, its new etag lands under a NEW local
path — but DataFrames returned by *earlier* ``read()`` calls are lazy
and still reference the old path, so deleting the superseded file the
moment the new generation is fetched makes those frames raise
FileNotFoundError mid-job (r6 ADVICE low, `s3.py`/`azure_blob.py`).

Instead eviction is two-phase: fetching a newer generation *marks*
the superseded file (a sidecar ``.superseded`` tombstone starts the
grace clock); only files whose tombstone is older than
``grace_seconds`` are physically deleted on a later fetch. Any frame
consumed within the grace window (default 1 h — far beyond a job's
lifetime) never sees a missing file, and a periodically-rewritten
table still converges to one live copy plus at most one aging one.
"""

from __future__ import annotations

import glob
import os
import time

#: seconds a superseded spill file survives after being marked
DEFAULT_GRACE_SECONDS = 3600.0

_MARKER_SUFFIX = ".superseded"


def evict_superseded(
    spill_dir: str,
    pattern: str,
    keep: str,
    grace_seconds: float = DEFAULT_GRACE_SECONDS,
) -> None:
    """Mark every file matching ``pattern`` except ``keep`` as
    superseded, and delete those whose marker has aged past
    ``grace_seconds``. Safe under concurrent callers (missing files
    are ignored; marker creation is idempotent)."""
    now = time.time()
    # a file that BECAME current again (object rewritten A→B→A) must
    # shed any stale marker, or the next supersession would see an
    # already-aged clock and delete it with no grace at all
    try:
        os.unlink(keep + _MARKER_SUFFIX)
    except FileNotFoundError:
        pass
    for stale in glob.glob(os.path.join(spill_dir, pattern)):
        if stale == keep or stale.endswith(_MARKER_SUFFIX):
            continue
        marker = stale + _MARKER_SUFFIX
        try:
            age = now - os.path.getmtime(marker)
        except FileNotFoundError:
            # first sighting as superseded: start the grace clock,
            # keep the bytes — an earlier read()'s lazy frame may
            # still reference them
            try:
                with open(marker, "w", encoding="utf-8"):
                    pass
            except OSError:
                pass
            continue
        if age < grace_seconds:
            continue
        for p in (stale, marker):
            try:
                os.unlink(p)
            except FileNotFoundError:
                pass
