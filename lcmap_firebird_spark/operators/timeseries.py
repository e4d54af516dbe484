"""Time-series assembly — long/tall observations ↔ dense-wide arrays.

The reference assembles per-pixel time series driver-side via merlin
HTTP fetches + flatMap explode (ccdc/timeseries.py:92-126), yielding
the dense-wide layout of ccdc/timeseries.py:33-45 (parallel arrays
positionally aligned to `dates`). SURVEY §1.4: the Spark-native form
derives the same layout from a long observation table with
`groupBy(keys).agg(sort_array(collect_list(struct(order, values))))`
— the ordering contract is explicit in the plan, never shuffle order.

Scale: one shuffle on the pixel key; map-side partial collect_list
keeps it linear. The inverse (explode) reproduces the reference's
chip→pixels flatMap (U4, ccdc/timeseries.py:120-126) as a zero-UDF
`posexplode`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Long → dense-wide: one row per key, each value column becomes
    an array ordered by `order_col` (ties broken by value to keep the
    sort total and deterministic)."""
    packed = F.sort_array(
        F.collect_list(
            F.struct(F.col(order_col).alias("_o"), *[F.col(c) for c in value_cols])
        )
    )
    agg = df.groupBy(*keys).agg(packed.alias("_series"))
    cols = [F.col(k) for k in keys]
    def _extract(field: str):
        # NB: must stay a 1-arg lambda — transform() treats 2-arg
        # lambdas as (element, index) and the index would become the
        # field name.
        return lambda s: s.getField(field)

    cols.append(F.transform("_series", _extract("_o")).alias(f"{order_col}s"))
    for c in value_cols:
        cols.append(F.transform("_series", _extract(c)).alias(f"{c}s"))
    return agg.select(*cols)


def explode_series(
    df: DataFrame,
    keys: Sequence[str],
    array_cols: Sequence[str],
    out_names: Sequence[str] | None = None,
) -> DataFrame:
    """Dense-wide → long: positional unzip of the parallel arrays
    (inverse of assemble; the reference's U4 explode without a UDF).

    Default out_names strip exactly ONE trailing 's' — the suffix
    `assemble` appends — not every trailing 's' (str.rstrip would turn
    a source column `t_us` → array `t_uss` back into `t_u`, silently
    renaming the round trip; r9 continuation review finding)."""
    out_names = list(
        out_names
        or [c[:-1] if c.endswith("s") else c for c in array_cols]
    )
    first, rest = array_cols[0], list(array_cols[1:])
    ex = df.select(
        *keys, F.posexplode(first).alias("_pos", out_names[0]), *rest
    )
    cols = [F.col(k) for k in keys] + [F.col(out_names[0])]
    for c, name in zip(rest, out_names[1:]):
        cols.append(F.element_at(F.col(c), F.col("_pos") + 1).alias(name))
    return ex.select(*cols)
