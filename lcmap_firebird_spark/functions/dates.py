"""Date scalar functions — F1/F2 of the operator inventory.

The reference stores days as proleptic-Gregorian ordinals and
renders ISO strings at format time (ccdc/pyccd.py:113-115,146); the
'acquired' range strings are ISO-8601 intervals (ccdc/core.py:41-50).
Column-level versions here are pure built-ins; driver-level helpers
mirror the reference's API.
"""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordinal of 1970-01-01; bridges python ordinals ↔ epoch days
EPOCH_ORDINAL = 719_163

# Naive epoch literal for TIMESTAMP_NTZ arithmetic. The testdata
# parquet stores `ts` as timestamp[us] with no timezone, which Spark
# reads as TIMESTAMP_NTZ; DuckDB's epoch_us() reads the same naive
# value as UTC. timestamp_diff against this literal reproduces that
# exactly and never consults the session timezone (verified under
# TZ=Asia/Tokyo).
EPOCH_NTZ_SQL = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def micros(col: str | Column) -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ column (DuckDB
    epoch_us parity). Use instead of F.unix_micros, which rejects
    TIMESTAMP_NTZ input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("MICROSECOND", F.expr(EPOCH_NTZ_SQL), c)


def ntz_from_micros(col: str | Column) -> Column:
    """Inverse of `micros`: epoch µs (bigint) → TIMESTAMP_NTZ,
    timezone-proof (timestamp_add on NTZ is pure naive arithmetic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_add("MICROSECOND", c, F.expr(EPOCH_NTZ_SQL))


def ordinal_to_date(col: str | Column) -> Column:
    """Ordinal day int → DateType (ccdc/pyccd.py:113-115 done
    in-plan: epoch-day arithmetic instead of a Python UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_from_unix_date((c - F.lit(EPOCH_ORDINAL)).cast("int"))


def ordinal_to_iso(col: str | Column) -> Column:
    """Ordinal day int → ISO-8601 string."""
    return F.date_format(ordinal_to_date(col), "yyyy-MM-dd")


def date_to_ordinal(col: str | Column) -> Column:
    """DateType → ordinal day int (inverse; used to store ordinals
    and render ISO only at the edge, avoiding the reference's
    string-vs-int comparison bug, SURVEY §7.5)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.unix_date(c.cast("date")) + F.lit(EPOCH_ORDINAL)).cast("bigint")


def acquired(start: str = "0001-01-01", end: str | None = None) -> str:
    """ISO-8601 closed interval string (ccdc/core.py:41-50:
    '0001-01-01/{today}')."""
    end = end or datetime.now().date().isoformat()
    return f"{start}/{end}"


def parse_acquired(rng: str) -> tuple[date, date]:
    """Parse an ISO interval back to dates."""
    a, b = rng.split("/")
    return date.fromisoformat(a), date.fromisoformat(b)
