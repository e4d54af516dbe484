"""THE commit-marker predicate for the streaming file stores.

Spark's file committer creates the output directory before any data
lands and writes the zero-byte `_SUCCESS` marker last, so the marker
— not directory existence — is the commit record (a bare parquet
read of an in-flight or crashed write would silently return a
partial store). dedup_stream's signature store, its pair log, and
rollup's versioned snapshots all gate on this ONE helper; a change
to the marker protocol (committers configured with
mapreduce.fileoutputcommitter.marksuccessfuljobs=false, object
stores that drop zero-byte objects) lands everywhere or nowhere.
"""

from __future__ import annotations

import os


def is_committed(path: str) -> bool:
    """True when `path` is a COMMITTED store directory."""
    return os.path.isfile(os.path.join(path, "_SUCCESS"))
