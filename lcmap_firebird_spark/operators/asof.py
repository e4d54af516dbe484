"""As-of and range joins — the [absent] temporal-join row of
SURVEY §2.3.

as-of join (backward): for each left row, attach the latest right
row with `right.ts <= left.ts` within the same `by` key.

Implemented with the union-window strategy rather than a per-row
range probe: tag both sides, union, and carry the most recent right
value forward with `last_value(..., ignoreNulls) over (partition by
key order by ts, side)`. One shuffle on the key, no quadratic
candidate enumeration, no skew beyond the key distribution — the
scalable pattern for 100 TB event streams (a sort-merge interval
probe would need a custom physical operator; this composition gets
the same result from stock exchanges).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts_col: str,
    right_value_cols: Sequence[str],
    tolerance: int | None = None,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Attach, to each left row, the newest right row at-or-before
    its timestamp (per `by` key). `ts_col` must be integer-like
    (epoch units) on both sides; `tolerance` (same units) bounds the
    lookback like pandas.merge_asof.

    `order_cols` (present on both sides) break ties among right rows
    sharing a timestamp deterministically: the right row with the
    greatest (ts, *order_cols) wins, matching an
    `ORDER BY ts DESC, order_cols DESC LIMIT 1` oracle.

    Output: all left columns + `right_value_cols` (null when no
    right row precedes, or the newest one is outside tolerance).

    The carry is ONE struct per right row — never per-column
    last(ignorenulls): per-column carries skip a genuinely-NULL
    value and attach an older row's value instead, and with several
    value columns can stitch a chimera row that never existed (while
    the tolerance anchor still tracks the newest row). The struct is
    non-null for every right row, so the newest right ROW wins
    atomically — exactly the `ORDER BY ts DESC ... LIMIT 1` oracle
    semantics, NULLs included.
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    clash = set(right_value_cols) & set(lcols)
    if clash:
        raise ValueError(
            f"right_value_cols {sorted(clash)} collide with left "
            "columns; rename one side before the as-of join"
        )
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    row_t = StructType(
        [StructField(c, rtypes[c], True) for c in right_value_cols]
    )
    l = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(row_t).alias("_r_row"),
    )
    r = right.select(
        *[F.col(c) for c in by],
        F.col(ts_col),
        *[F.col(c) for c in order_cols],
        F.lit(0).alias("_side"),
        F.struct(
            *[F.col(c).alias(c) for c in right_value_cols]
        ).alias("_r_row"),
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r = r.select(*lcols, "_side", "_r_row")
    unioned = l.unionByName(r)
    # right rows (_side=0) sort before left rows at equal ts → a right
    # row at exactly left.ts is visible to that left row ("at or
    # before"); among tied right rows the greatest order_cols sorts
    # last, so last(ignorenulls) picks it deterministically.
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_col, "_side", *order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried_row = F.last("_r_row", ignorenulls=True).over(w).alias("_c_row")
    carried_ts = F.last(
        F.when(F.col("_side") == 0, F.col(ts_col)), ignorenulls=True
    ).over(w).alias("_c_ts")
    out = unioned.select("*", carried_row, carried_ts).filter(
        F.col("_side") == 1
    )
    sel = [F.col(c) for c in lcols]
    for c in right_value_cols:
        v = F.col("_c_row")[c]
        if tolerance is not None:
            v = F.when(
                F.col(ts_col) - F.col("_c_ts") <= tolerance, v
            )
        sel.append(v.alias(c))
    return out.select(*sel)
