"""Table maintenance — small-file compaction for parquet datasets.

A continuously-ingesting pipeline (streaming foreachBatch sinks,
per-batch appends, partitioned writes) accretes many small files;
at 100 TB the scan cost becomes dominated by file-open/footer
overhead and the driver's file listing, not bytes. Compaction
rewrites a dataset into ~target-sized files.

Design:
- File sizing comes from the FILESYSTEM listing (driver-side
  metadata), not a data scan; the rewrite itself is one pass.
- Unpartitioned: a single rebalanced write of ceil(bytes/target)
  files via repartition(n) — uniform round-robin, no key skew.
- Partitioned (e.g. the cx/cy layout of catalog.write_partitioned):
  repartitioned BY the partition columns with a salt sized per
  partition directory, so each output directory gets
  ceil(dir_bytes/target) files and no partition's data crosses
  directories (rewrite preserves the pruning layout).
- Atomicity: the rewrite lands in `<path>.__compact__` and is
  swapped in with two renames (the same idempotent-replace stance as
  the streaming snapshot stores; production would do this as a
  Delta/Iceberg rewrite-files commit instead).

Compare /root/reference: no compaction exists (Cassandra compacts
internally); this is part of owning the storage layout that the
reference delegated to its database (SURVEY §1.4).
"""

from __future__ import annotations

import math
import os
import shutil
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def dataset_files(path: str) -> list[tuple[str, int]]:
    """(relative_path, bytes) for every data file under `path` —
    driver-side listing, no Spark job."""
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith("_"):
                p = os.path.join(root, f)
                out.append((os.path.relpath(p, path), os.path.getsize(p)))
    return out


def plan_compaction(
    path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict:
    """Inspect a dataset and report the compaction plan: current
    file count/bytes and the post-compaction file count per
    partition directory ('' = unpartitioned root)."""
    sizes: dict[str, int] = {}
    for rel, nbytes in dataset_files(path):
        part = os.path.dirname(rel)
        sizes[part] = sizes.get(part, 0) + nbytes
    return {
        part: max(1, math.ceil(nbytes / target_bytes))
        for part, nbytes in sizes.items()
    }


def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    partition_cols: tuple[str, ...] = (),
) -> int:
    """Rewrite the dataset at `path` into ~target-sized files,
    preserving the partitionBy layout. Returns the output file count.

    The sizing engine is AQE's REBALANCE hint: it coalesces small
    shuffle partitions up to the advisory size AND splits skewed ones
    (safe here — output file boundaries don't affect semantics), so
    each partition directory lands ceil(bytes/target) files without
    any hand-rolled salting. The advisory size is an IN-MEMORY size;
    on-disk parquet comes out smaller by roughly the compression
    ratio, so callers targeting exact file sizes scale target_bytes
    by their observed ratio. Local-fs rename swap; a table format
    (Delta/Iceberg) replaces the swap with a rewrite-files commit.
    """
    tmp = path.rstrip("/") + ".__compact__"
    old = path.rstrip("/") + ".__old__"
    # Crash recovery FIRST (round-4 review): if `path` is absent, a
    # previous run crashed between the two swap renames and the
    # surviving directories are the ONLY copies of the data — restore
    # them, never delete. `tmp` at that point always holds a complete
    # write (the first rename runs strictly after the parquet write
    # committed), so finishing the swap is preferred; a bare `old`
    # (crash immediately after the first rename) rolls back.
    if not os.path.exists(path):
        if os.path.exists(tmp):
            os.rename(tmp, path)
        elif os.path.exists(old):
            os.rename(old, path)
        else:
            raise FileNotFoundError(path)
    # With `path` present, stale .__compact__/.__old__ are leftovers
    # of runs that never reached the swap (crash during write) or
    # never finished deleting — a stale .__old__ would make the swap
    # rename raise, a stale .__compact__ would make the overwrite
    # write racy. Safe to clean: `path` holds the live data.
    for stale in (tmp, old):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    prev = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    try:
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            str(target_bytes),
        )
        df = spark.read.parquet(path)
        df = (
            df.hint("rebalance", *[F.col(c) for c in partition_cols])
            if partition_cols
            else df.hint("rebalance")
        )
        writer = df.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(tmp)
    finally:
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", prev
        )
    # Swap. The unavoidable local-fs exposure is the instant between
    # the two renames (no atomic dir-exchange in portable Python); a
    # crash there leaves `path` absent but BOTH `.__old__` (complete
    # old data) and `.__compact__` (complete, _SUCCESS-committed new
    # data) intact, so recovery is a rename — never data loss. The
    # entry cleanup above makes the next compact() run self-heal.
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    # Invalidate any memoized catalog plan for this path: the cached
    # DataFrame references the pre-compaction files, which no longer
    # exist.
    from .. import catalog

    target = os.path.abspath(path.rstrip("/"))
    stale_names = set()
    for cache in catalog._FRAMES.values():
        for key in [
            (base, name)
            for base, name in cache
            if os.path.abspath(os.path.join(base, f"{name}.parquet"))
            == target
        ]:
            stale_names.add(key[1])
            del cache[key]
    # a temp view registered from one of those cached plans pins the
    # PRE-compaction file list in its analyzed plan — dropping the
    # memo alone would leave `spark.sql(... FROM name)` pointing at
    # deleted files. Drop the view ONLY when no memo entry binds the
    # same name to a DIFFERENT base: the live view of that name may
    # belong to the other base (temp views carry no path metadata to
    # check), and dropping it would break an unrelated registration.
    other_bases = {
        key[1]
        for cache in catalog._FRAMES.values()
        for key in cache
        if key[1] in stale_names
    }
    for name in stale_names - other_bases:
        try:
            spark.catalog.dropTempView(name)
        except Exception:
            pass
    return len(dataset_files(path))


# pandas-free module; keep the foreign-cwd pickling contract uniform
import pyspark  # noqa: E402

pyspark.cloudpickle.register_pickle_by_value(sys.modules[__name__])
