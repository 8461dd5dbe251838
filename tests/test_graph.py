"""connected_components_star correctness (the O(log n) CC variant)."""

from ocr_spark.queries.pipeline_ops import connected_components_star


def _union_find_minlabels(edges):
    """Brute-force reference: component-min label per node."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for s, d in edges:
        union(s, d)
    return {x: find(x) for x in parent}


def test_star_collapses_long_path(spark):
    """A 41-node path (diameter 40) is the case the plain min-label
    loop needs 40 rounds for; star contraction must converge inside
    its round cap (O(log n)) and label every node with the path min."""
    edges = spark.createDataFrame([(i, i + 1) for i in range(40)], "s long, d long")
    out = connected_components_star(edges, max_rounds=10).toPandas()
    assert set(out["doc_id"]) == set(range(41))
    assert set(out["cluster_id"]) == {0}


def test_star_matches_union_find_on_mixed_graph(spark):
    """Deterministic pseudo-random graph (multiple components, cycles,
    chains): labels must equal the union-find component minimum."""
    raw = [((k * 7919) % 60, (k * 104729) % 60) for k in range(45)]
    edges = [(s, d) for s, d in raw if s != d]
    want = _union_find_minlabels(edges)
    out = connected_components_star(
        spark.createDataFrame(edges, "s long, d long")
    ).toPandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == want


def test_star_and_minlabel_agree_on_lsh_graph(spark):
    """Both catalog variants must produce identical labels over the
    real LSH candidate graph (they share one oracle; this pins them to
    each other directly as well)."""
    from ocr_spark.queries import QUERIES
    from tests.conftest import SF_DIR_ORACLE

    a = QUERIES["dedup_clusters"](spark, SF_DIR_ORACLE).toPandas()
    b = QUERIES["dedup_clusters_star"](spark, SF_DIR_ORACLE).toPandas()
    da = dict(zip(a["doc_id"], a["cluster_id"]))
    db = dict(zip(b["doc_id"], b["cluster_id"]))
    assert da == db


def test_pagerank_large_doc_ids_no_int64_wrap(spark, tmp_path):
    """link_pagerank's quadratic link map must reduce doc_id mod n
    BEFORE squaring: doc_id^2 overflows int64 past ~3e9 and Spark
    (ANSI off) silently wraps to negative dst values that join
    nothing, while DuckDB promotes to HUGEINT — engine divergence on
    exactly the large-id corpora the edge suite advertises.  Pin
    Spark == DuckDB on ids up to ~9.9e10 AND that every dst is a real
    node index (no wrapped negatives)."""
    import duckdb
    import pandas as pd

    from ocr_spark.queries import ORACLES, QUERIES

    big_ids = [0, 3, 2_000_000_011, 98_765_432_101, 9_876_543_210_987]
    d = str(tmp_path / "bigids")
    docs = pd.DataFrame(
        [(i, "en", f"doc {i}", "edge", 6) for i in big_ids],
        columns=["doc_id", "lang", "text", "source", "n_chars"],
    )
    spark.createDataFrame(docs).coalesce(1).write.parquet(
        f"{d}/documents.parquet"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    got = QUERIES["link_pagerank"](spark, d).toPandas()
    want = con.execute(ORACLES["link_pagerank"]).df()
    con.close()
    assert sorted(zip(got["doc_id"], got["score"])) == sorted(
        zip(want["doc_id"], want["score"].astype("int64"))
    )
    # and the two n-modular maps stay in-range (0 <= dst < n) — a wrap
    # would show as a negative dst.  (The mod-97 hub map intentionally
    # targets a fixed 97-node set; dsts >= n join nothing, identically
    # in both engines.)
    from ocr_spark.queries.extraction_docs import _PR_DSTS
    from pyspark.sql import functions as F

    docs_df = spark.read.parquet(f"{d}/documents.parquet").select("doc_id")
    n = docs_df.count()
    for tmpl in _PR_DSTS[:2]:
        dsts = docs_df.select(
            F.expr(tmpl.format(n=n)).alias("dst")
        ).toPandas()["dst"]
        assert (dsts >= 0).all() and (dsts < n).all(), tmpl
