"""Attribution experiment for the hot-bucket-cap design ladder
(VERDICT r6 watch item #1; PLANS.md rule 30). Times five
lsh_candidates shapes under the bench_subset protocol (same session,
warmup, noop-write):

  shipping  — whatever operators/dedup.lsh_candidates currently does
              (r7: checkpoint + over-cap-only left broadcast join)
  r6_probe  — replica of r6's shape: eager banded checkpoint + a
              blocking max-occupancy driver action, split join only
              when over-cap (kept here verbatim so the published
              +0.55 s/run attribution stays reproducible)
  lazy      — max_bucket=None: no checkpoint, no probe; the self-join
              recomputes the signature aggregation per side (r4 shape)
  ckpt_only — checkpoint banded, NO probe, NO cap machinery (lower
              bound for any checkpointing design)
  always_on — checkpoint banded + unconditional splits join (r5 shape
              with the r6 checkpoint)

r7 measurements (sf0.1, n=5, min): r6_probe 2.91 / lazy 2.56 /
ckpt_only 2.36 / always_on 2.66 / shipping(broadcast) 2.42-2.53.

Usage: python tools/exp_d3_variants.py [-n RUNS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lcmap_firebird_spark.operators import dedup as D  # noqa: E402
from lcmap_firebird_spark.queries import merged  # noqa: E402
from lcmap_firebird_spark.session import session  # noqa: E402

ORIG = D.lsh_candidates


def lsh_lazy(signatures, bands=4, rows=4, max_bucket=None):
    return ORIG(signatures, bands=bands, rows=rows, max_bucket=None)


def lsh_r6_probe(signatures, bands=4, rows=4, max_bucket=100_000):
    banded = D.band_keys(signatures, bands, rows).localCheckpoint(eager=True)
    cell_cond = F.lit(True)
    occupancy = banded.groupBy("band_id", "band_key").agg(
        F.count("*").alias("_n")
    )
    mx = occupancy.agg(F.max("_n")).first()[0] or 0
    if mx > max_bucket:
        splits = occupancy.select(
            "band_id",
            "band_key",
            F.greatest(F.lit(1), F.ceil(F.col("_n") / F.lit(max_bucket)))
            .cast("bigint")
            .alias("_splits"),
        )
        banded = (
            banded.join(splits, ["band_id", "band_key"])
            .withColumn(
                "_cell",
                D.hash60(
                    F.concat_ws(":", F.lit("bcell"), F.col("doc_id").cast("string"))
                )
                % F.col("_splits"),
            )
            .drop("_splits")
            .localCheckpoint(eager=True)
        )
        cell_cond = F.col("a._cell") == F.col("b._cell")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & cell_cond
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def lsh_ckpt_only(signatures, bands=4, rows=4, max_bucket=None):
    banded = D.band_keys(signatures, bands, rows).localCheckpoint(eager=True)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def lsh_always_on(signatures, bands=4, rows=4, max_bucket=100_000):
    banded = D.band_keys(signatures, bands, rows).localCheckpoint(eager=True)
    occupancy = banded.groupBy("band_id", "band_key").agg(F.count("*").alias("_n"))
    splits = occupancy.select(
        "band_id",
        "band_key",
        F.greatest(F.lit(1), F.ceil(F.col("_n") / F.lit(max_bucket)))
        .cast("bigint")
        .alias("_splits"),
    )
    banded = (
        banded.join(splits, ["band_id", "band_key"])
        .withColumn(
            "_cell",
            D.hash60(F.concat_ws(":", F.lit("bcell"), F.col("doc_id").cast("string")))
            % F.col("_splits"),
        )
        .drop("_splits")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a._cell") == F.col("b._cell"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def main() -> None:
    runs = 5
    if len(sys.argv) > 2 and sys.argv[1] == "-n":
        runs = int(sys.argv[2])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = session("d3-variants")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = merged()

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries["a4_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    variants = {
        "shipping": ORIG,
        "r6_probe": lsh_r6_probe,
        "lazy": lsh_lazy,
        "ckpt_only": lsh_ckpt_only,
        "always_on": lsh_always_on,
    }
    out: dict[str, list[float]] = {}
    baseline_rows = None
    for vname, fn in variants.items():
        D.lsh_candidates = fn
        attempts, rows = [], None
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            df = queries["d3_minhash_lsh"](spark, sf_dir)
            rows = df.count()
            attempts.append(round(time.time() - t0, 4))
        if baseline_rows is None:
            baseline_rows = rows
        assert rows == baseline_rows, f"{vname}: {rows} != {baseline_rows}"
        out[vname] = sorted(attempts)
    D.lsh_candidates = ORIG
    print(json.dumps({"rows": baseline_rows, "secs": out}))


if __name__ == "__main__":
    main()
