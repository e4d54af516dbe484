"""Measurement-only probe: split d7_clusters_pagerank into its
operator phases and report wall time + Spark job count per phase.
Replays the exact steps of operators/dedup.minhash_clusters (kept in
sync by hand — this is a diagnostic, not a contract surface).

Usage: python tools/probe_d7_phases.py [-n RUNS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lcmap_firebird_spark.catalog import read_table  # noqa: E402
from lcmap_firebird_spark.operators import dedup as D  # noqa: E402
from lcmap_firebird_spark.queries.dedup import (  # noqa: E402
    BANDS,
    JACCARD_T,
    K,
    NUM_PERM,
    PR_ITERS,
    ROWS,
)
from lcmap_firebird_spark.session import session  # noqa: E402


def main() -> None:
    runs = 2
    if len(sys.argv) > 2 and sys.argv[1] == "-n":
        runs = int(sys.argv[2])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = session("firebird-probe-d7")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def njobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    for run in range(runs):
        spark.catalog.clearCache()
        phases: dict[str, list] = {}
        t_all = time.perf_counter()

        def phase(name: str, fn):
            j0, t0 = njobs(), time.perf_counter()
            out = fn()
            phases[name] = [round(time.perf_counter() - t0, 3), njobs() - j0]
            return out

        df = read_table(spark, "documents", sf_dir)
        grp, sh, rep_pairs = phase(
            "rep_ladder",
            lambda: D._rep_ladder(
                df, JACCARD_T, num_perm=NUM_PERM, bands=BANDS, rows=ROWS, k=K
            ),
        )
        rep_pairs = phase(
            "rep_pairs_ckpt", lambda: rep_pairs.localCheckpoint(eager=True)
        )
        rep_cc = phase(
            "cc_loop",
            lambda: D.dedup_clusters(
                rep_pairs, max_iter=20, pairs_materialized=True
            ).select(
                F.col("doc_id").alias("rep"), F.col("cluster_id").alias("_cc")
            ),
        )
        from lcmap_firebird_spark.operators.graph import pagerank_quantized

        sym = rep_pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ).unionByName(
            rep_pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        pr_nodes = phase(
            "pr_nodes_ckpt",
            lambda: rep_pairs.select(F.col("doc_a").alias("node"))
            .unionByName(rep_pairs.select(F.col("doc_b").alias("node")))
            .distinct()
            .localCheckpoint(eager=True),
        )
        prq = phase(
            "pagerank_build",
            lambda: pagerank_quantized(
                sym, n_iter=PR_ITERS, pre_distinct=True, nodes=pr_nodes
            ).select(F.col("node").alias("rep"), "pr_q"),
        )
        shingled_reps = sh.select(F.col("doc_id").alias("rep")).distinct()
        merged = (
            grp.join(shingled_reps, "rep", "left_semi")
            .join(rep_cc, "rep", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("_cc"), F.col("rep")).alias("cluster_id"),
            )
        )
        singles = grp.join(shingled_reps, "rep", "left_anti").select(
            "doc_id", F.col("doc_id").alias("cluster_id")
        )
        out = merged.unionByName(singles).select(
            "doc_id",
            "cluster_id",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
        )
        final = (
            out.join(grp, "doc_id")
            .join(F.broadcast(prq), "rep", "left")
            .select("doc_id", "cluster_id", "is_keeper", "pr_q")
        )
        phase(
            "exec_noop",
            lambda: final.write.format("noop").mode("overwrite").save(),
        )
        phases["total"] = [round(time.perf_counter() - t_all, 3), 0]
        print(json.dumps({f"run{run}": phases}))


if __name__ == "__main__":
    main()
