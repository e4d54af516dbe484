"""Round-2 additions: connected-component dedup clusters and Z-order
multi-column clustering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lcmap_firebird_spark.operators import dedup as D
from lcmap_firebird_spark.operators.zorder import sql_zvalue, write_zordered, zvalue


# --- dedup_clusters ---------------------------------------------------------


def _clusters(spark, edges, all_ids=None):
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    ids = (
        spark.createDataFrame([(i,) for i in all_ids], ["doc_id"])
        if all_ids is not None
        else None
    )
    return {
        r.doc_id: (r.cluster_id, r.is_keeper)
        for r in D.dedup_clusters(pairs, all_ids=ids).collect()
    }


def test_clusters_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain plus isolated pair 10-11 → two components
    got = _clusters(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)])
    assert {d: c for d, (c, _) in got.items()} == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10,
    }
    assert got[1][1] and got[10][1]  # component minima are keepers
    assert not got[2][1] and not got[11][1]


def test_clusters_long_path_converges(spark):
    # a 64-node path exercises pointer jumping (O(log n) rounds must
    # suffice within the max_iter cap)
    edges = [(i, i + 1) for i in range(64)]
    got = _clusters(spark, edges)
    assert all(c == 0 for c, _ in got.values())


def test_clusters_singletons_from_all_ids(spark):
    got = _clusters(spark, [(1, 2)], all_ids=[1, 2, 7, 9])
    assert got[7] == (7, True) and got[9] == (9, True)
    assert got[2] == (1, False)


# --- zorder -----------------------------------------------------------------


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame([(0b1010, 0b0110)], ["x", "y"])
    (got,) = df.select(zvalue(["x", "y"], bits=4).alias("z")).collect()
    # bit (b*2)   = bit b of x → 1010 → bits 6,2 set
    # bit (b*2+1) = bit b of y → 0110 → bits 5,3 set
    assert got.z == (1 << 6) | (1 << 2) | (1 << 5) | (1 << 3)


def test_zvalue_matches_duckdb(spark, oracle, sf_dir):
    import duckdb

    con = duckdb.connect()
    want = con.execute(
        f"SELECT {sql_zvalue(['x', 'y'], 8)} FROM (VALUES (37, 201)) t(x, y)"
    ).fetchone()[0]
    (got,) = (
        spark.createDataFrame([(37, 201)], ["x", "y"])
        .select(zvalue(["x", "y"], 8).alias("z"))
        .collect()
    )
    assert got.z == want


def test_zvalue_rejects_overflow():
    with pytest.raises(ValueError):
        zvalue(["a", "b", "c", "d"], bits=16)  # 64 bits > signed range


def test_write_zordered_tightens_rowgroup_stats(spark, tmp_path):
    """Clustering evidence: after z-ordering on (l_partkey, l_suppkey),
    each output file covers a much tighter range of BOTH columns than
    an unsorted write — the min/max stats a reader prunes on."""
    import pyarrow.parquet as pq

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    li.repartition(8).write.mode("overwrite").parquet(plain)
    write_zordered(li, ["l_partkey", "l_suppkey"], zed, num_files=8)

    def avg_span(path, col):
        import glob

        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        spans.append(c.statistics.max - c.statistics.min)
        return sum(spans) / len(spans)

    for col in ("l_partkey", "l_suppkey"):
        assert avg_span(zed, col) < 0.7 * avg_span(plain, col), col

    # round-trip: clustering must not change the data
    assert spark.read.parquet(zed).count() == li.count()
