"""Capture .explain("formatted") for registry queries into files.

Usage: python tools/capture_plans.py OUTDIR SUFFIX [q1 q2 ...]
Writes OUTDIR/<query>_<SUFFIX>.txt for each query (all 50 when no
names given). Measurement/documentation tool — not part of the
driver contract.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lcmap_firebird_spark.queries import merged  # noqa: E402
from lcmap_firebird_spark.session import session  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = session("firebird-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = merged()
    if not names:
        names = list(queries)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
