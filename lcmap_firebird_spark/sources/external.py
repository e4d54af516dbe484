"""External-fetch source — the reference's timeseries HTTP scan (S3)
in Spark-native form.

The reference fans out per-chip HTTP fetches to executors via
`cids.flatMap(merlin.create)` with INPUT_PARTITIONS throttling the
number of concurrent requests ("controls parallel requests to
chipmunk", resources/ccdc.install.example:18; ccdc/timeseries.py:
92-126). Here: an ids DataFrame is coalesced to `max_concurrency`
partitions and streamed through an Arrow-batched `mapInPandas`
fetch kernel that explodes each id into its fetched records —
1 chip in, N pixel rows out, exactly the reference's flatMap shape.

Scale notes:
- the repartition-to-throttle IS the concurrency limiter: one
  partition = one in-flight fetch loop per executor slot, so a
  polite `max_concurrency=8` never DDoSes the upstream service no
  matter how many executors exist.
- after the fetch, callers should `spread()` or repartition the
  exploded output before CPU-heavy stages (the reference does the
  same: repartition(PRODUCT_PARTITIONS), timeseries.py:125).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

import sys as _sys

import pyspark.cloudpickle as _cloudpickle


def fetch_explode(
    ids: DataFrame,
    fetch_fn: Callable[[dict], list[dict]],
    schema: StructType,
    max_concurrency: int = 1,
) -> DataFrame:
    """For each id row, call `fetch_fn(row_dict) -> list[record
    dicts]` on an executor and explode the results under `schema`.

    `max_concurrency` reproduces INPUT_PARTITIONS semantics
    (default 1 — serial, the reference's default throttle).
    `fetch_fn` must be self-contained/picklable (e.g. uses
    urllib/requests inside the function body).
    """
    if max_concurrency < 1:
        raise ValueError(
            f"max_concurrency must be >= 1, got {max_concurrency}"
        )
    # coalesce only ever REDUCES partition count — an ids frame that
    # arrives in fewer partitions than max_concurrency (a collected
    # id list is typically 1) would silently run UNDER the requested
    # concurrency: an 8x throughput loss nobody sees (r12 stale-
    # surface review). Widening needs the shuffle repartition() —
    # metadata-scale on an ids frame, and it also spreads skewed id
    # layouts evenly across the fetch loops.
    cur = ids.rdd.getNumPartitions()
    throttled = (
        ids.coalesce(max_concurrency)
        if cur >= max_concurrency
        else ids.repartition(max_concurrency)
    )
    names = [f.name for f in schema.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for row in pdf.to_dict("records"):
                out.extend(fetch_fn(row))
            yield pd.DataFrame(out, columns=names)

    return throttled.mapInPandas(kernel, schema)


_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
