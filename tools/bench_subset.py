"""Time a subset of registry queries EXACTLY like bench.py does
(same session(), same warmup, same clearCache + noop-write protocol)
— for attributing per-query deltas without a full 50-query run.

Usage: python tools/bench_subset.py [-n RUNS] q1 [q2 ...]
Prints one JSON line {name: [sorted attempt secs...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lcmap_firebird_spark.queries import merged  # noqa: E402
from lcmap_firebird_spark.session import session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = session("firebird-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = merged()

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries["a4_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, list[float]] = {}
    for name in args:
        attempts = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            attempts.append(round(time.perf_counter() - t0, 4))
        out[name] = sorted(attempts)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
