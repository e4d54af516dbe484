

def test_zero_norm_vectors_do_not_crash_ansi(spark):
    """Spark 4 defaults to ANSI mode: a single all-zero (or
    quantized-to-zero) embedding used to kill every cosine path with
    DIVIDE_BY_ZERO. Zero-norm vectors now score cosine 0.0."""
    from lcmap_firebird_spark.operators.similarity import knn_bruteforce

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0, 0.0]),
            (3, [0.0, 0.0, 0.0, 0.0]),          # exactly zero
            (4, [1e-6, -1e-6, 0.0, 0.0]),        # quantizes to zero
        ],
        "vec_id long, embedding array<double>",
    )
    out = knn_bruteforce(emb, emb.filter("vec_id = 1"), top_k=3)
    rows = {r["n_id"]: r["cosine"] for r in out.collect()}
    assert rows[2] > 0.99
    assert rows.get(3, 0.0) == 0.0 or 3 not in rows
    # and semdedup over the same corpus completes
    from lcmap_firebird_spark.operators.semdedup import semdedup

    labels = semdedup(emb, num_cells=2, eps=0.05)
    assert labels.count() == 4


def test_ivf_assign_sparse_ids(spark):
    """Default seed selection is the num_cells LOWEST ids — a filter
    on id < num_cells silently returned an EMPTY frame for
    sparse/offset/hash-derived ids (semdedup became a no-op)."""
    from lcmap_firebird_spark.operators.similarity import ivf_assign

    emb = spark.createDataFrame(
        [(1000 + i, [float(i), 1.0, 0.0, 0.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    out = ivf_assign(emb, num_cells=2)
    assert out.count() == 8
    assert set(
        r["cell"] for r in out.select("cell").distinct().collect()
    ) <= {1000, 1001}
