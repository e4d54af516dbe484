"""Bloom-filter semi-join pruning — the selective read at id counts
where a broadcast hash join stops being possible.

The reference's selective read is `ids ⋈ table` on the partition key
(ccdc/chip.py:49-51), which this repo serves with a broadcast join +
partition pruning (catalog.read_partitioned) — correct while `ids`
fits in a broadcast. A 100 TB-side driver list (e.g. every doc_id
touched by yesterday's ingest) does not fit: the exact semi-join then
shuffles the ENTIRE big table on the join key just to discard most of
it. The bloom path removes that shuffle asymmetry:

  1. build: one aggregation over `ids` produces a bitmap of
     k hash positions per id — ~1.2 MB per million ids at 1% fpp,
     ~10× smaller than broadcasting the ids themselves and
     independent of key width;
  2. probe: the bitmap rides a 1-row broadcast nested-loop join, so
     the big side is filtered MAP-SIDE (no shuffle, no state) with k
     constant-time word probes per row;
  3. verify: an exact left-semi join against `ids` over only the
     surviving rows (members + ~fpp of non-members) removes false
     positives — the shuffle now carries roughly the matching
     fraction instead of the whole table.

Bloom filters have no false negatives, so step 3's input provably
contains every true match: the composition is exactly equal to the
plain semi-join (tests/test_bloom.py asserts row identity).

Spark's optimizer can inject the same shape itself (runtime bloom
filter join, `spark.sql.optimizer.runtime.bloomFilter.enabled`) when
statistics reveal a selective build side; this operator is the
explicit form for when the planner can't see it — an `ids` frame
built at runtime, a non-equi downstream use, or a store the planner
has no stats for — and it is engine-portable (plain integer column
arithmetic, no Scala-internal expressions).

Hashing: xxhash64 (Spark built-in, JVM-side) with double hashing
pos_i = (h1 + i·h2) mod m — the standard Kirsch-Mitzenmacher
construction, k probes from two hashes. All positions are reduced
mod m BEFORE combining so no intermediate overflows ANSI arithmetic.
"""

from __future__ import annotations

import math
import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_params(n: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m bits, k hashes) for `n` members at false-positive
    rate `fpp`: m = -n·ln(fpp)/ln(2)², k = (m/n)·ln(2)."""
    n = max(1, n)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _canon_type(t: str) -> str:
    """The dtype a key column hashes AS (see _canon)."""
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "bigint"
    if t == "float":
        return "double"
    return t


def _canon(df: DataFrame, c: str):
    """Hash-canonical form of a key column: xxhash64 hashes a 4-byte
    int and the same value as an 8-byte long DIFFERENTLY, so an
    int-vs-bigint dtype mismatch between the ids frame and the big
    side would hash true members to different positions — silent
    FALSE NEGATIVES, the one failure mode a bloom filter must never
    have (the verifying equi-join would have inserted the cast).
    Integers widen to bigint, float to double, before hashing."""
    t = dict(df.dtypes)[c]
    ct = _canon_type(t)
    return F.col(c).cast(ct) if ct != t else F.col(c)


def _check_key_types(big: DataFrame, ids: DataFrame, keys: list[str]):
    """Refuse key pairs whose CANONICAL hash types differ between the
    two frames (r11 review): int-vs-bigint and float-vs-double widen
    away, but e.g. string-vs-bigint or decimal-vs-double would hash
    true members to DIFFERENT positions — silent false negatives,
    while the plain semi-join this operator promises row-identity
    with would have inserted an implicit cast. Loud beats subtly
    wrong: the caller casts one side explicitly."""
    bt, it = dict(big.dtypes), dict(ids.dtypes)
    # Validate presence FIRST: a key absent from a frame must raise
    # the operator's descriptive error, not a bare KeyError from the
    # dtype lookup below (r11 ADVICE — the mismatch path this guard
    # exists to make loud).
    missing = [
        f"{c!r} absent from "
        + "+".join(s for s, d in (("big", bt), ("ids", it)) if c not in d)
        for c in keys
        if c not in bt or c not in it
    ]
    if missing:
        raise ValueError(
            "bloom_semi_join key column missing: " + "; ".join(missing)
        )
    bad = [
        (c, bt[c], it[c])
        for c in keys
        if _canon_type(bt[c]) != _canon_type(it[c])
    ]
    if bad:
        raise ValueError(
            "bloom_semi_join key dtype mismatch (would hash to "
            "different positions — silent false negatives): "
            + ", ".join(f"{c!r} big={b} ids={i}" for c, b, i in bad)
            + "; cast one side first"
        )


def _positions(df: DataFrame, cols: list[str], m: int, k: int) -> list:
    """k bit positions per row (double hashing, overflow-safe),
    over type-canonicalized key columns."""
    canon = [_canon(df, c) for c in cols]
    h1 = F.pmod(F.xxhash64(*canon), F.lit(m))
    # salting with a literal column gives an independent second hash.
    # Draw the stride from [1, m-1]: a stride ≡ 0 (mod m) would
    # collapse all k probe positions onto h1 (effective k=1 →
    # inflated fpp). The earlier `pmod(h,m)|1` form could still
    # yield m (≡ 0) when m is odd — round-3 advice + round-4 review.
    h2 = F.pmod(
        F.xxhash64(F.lit("bloom:h2"), *canon),
        F.lit(m - 1),
    ) + F.lit(1)
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]


def bloom_build(
    ids: DataFrame, keys: list[str], fpp: float = 0.01, n: int | None = None
) -> tuple[DataFrame, int, int]:
    """Build the bitmap: one explode + two aggregations over `ids`,
    ending in a single row holding map<word → 64-bit word bits>.
    Returns (one-row bitmap frame, m, k). The count to size the
    filter is metadata-cheap on parquet sources."""
    if n is None:
        n = ids.count()
    m, k = bloom_params(n, fpp)
    pos = F.explode(F.array(*_positions(ids, keys, m, k))).alias("pos")
    words = (
        ids.select(pos)
        .select(
            F.expr("CAST(pos DIV 64 AS BIGINT)").alias("word"),
            # shiftleft by a column requires the SQL form (the Python
            # API only takes literal shift amounts)
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    bitmap = words.agg(
        F.map_from_arrays(
            F.collect_list("word"), F.collect_list("bits")
        ).alias("bloom")
    )
    return bitmap, m, k


def bloom_prune(
    big: DataFrame, bitmap: DataFrame, keys: list[str], m: int, k: int
) -> DataFrame:
    """Map-side filter of `big` to rows whose keys MIGHT be members
    (superset of true members — bloom filters have no false
    negatives). The bitmap joins as a 1-row broadcast nested loop, so
    the big side neither shuffles nor builds state."""
    probed = big.join(F.broadcast(bitmap))
    # stage each probe position as a real column so the word/bit
    # arithmetic references it once (PLANS.md rule 14d), then test the
    # bit with the SQL shift form (column shift amounts)
    pcols = {f"_bp{i}": p for i, p in enumerate(_positions(big, keys, m, k))}
    probed = probed.withColumns(pcols)
    cond = F.lit(True)
    for i in range(k):
        hit = F.expr(
            f"(shiftright(coalesce(element_at(bloom, CAST(_bp{i} DIV 64 AS"
            f" BIGINT)), CAST(0 AS BIGINT)), CAST(_bp{i} % 64 AS INT)) & 1)"
            " = 1"
        )
        cond = cond & hit
    return probed.filter(cond).drop("bloom", *pcols)


def bloom_semi_join(
    big: DataFrame,
    ids: DataFrame,
    keys: list[str],
    fpp: float = 0.01,
    n: int | None = None,
) -> DataFrame:
    """Exact semi-join of `big` against `ids`, bloom-pruned first:
    row-identical to `big.join(ids, keys, 'left_semi')`, but the
    exact join's shuffle carries only the bloom survivors."""
    _check_key_types(big, ids, keys)
    bitmap, m, k = bloom_build(ids, keys, fpp, n)
    pruned = bloom_prune(big, bitmap, keys, m, k)
    return pruned.join(
        ids.select(*keys).dropDuplicates(keys), keys, "left_semi"
    )


# pandas-free module; keep the foreign-cwd pickling contract uniform
# with the rest of the package (CLAUDE.md invariant 2)
import pyspark  # noqa: E402

pyspark.cloudpickle.register_pickle_by_value(sys.modules[__name__])
