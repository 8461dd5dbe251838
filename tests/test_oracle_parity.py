"""Cross-check every catalog query against its DuckDB oracle.

Replicates the driver's correctness gate locally: run the Spark
DataFrame and the oracle SQL on the same sf0.01 parquet, compare row
count, column names, and order-insensitive values.
"""

import math

import pandas as pd
import pytest

from ocr_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_DIR_ORACLE


def _kind(dtype) -> str:
    """Collapse a pandas dtype to the kind the driver's hasher sees.

    int64 vs float64 MUST be distinct: DuckDB HUGEINT results (any
    sum() of BIGINT) land in pandas as float64 and fail the driver's
    value hash against Spark's int64 even when every value is equal —
    the r2 batch_packing/text_repetition failure mode.  The old
    ``f"{v:.9g}"`` laundering made 500.0 == 500 locally and masked it.
    """
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "obj"


def _canon(df: pd.DataFrame) -> list[tuple]:
    """Order-insensitive canonical form: sort columns by name, then rows."""
    df = df[sorted(df.columns)]

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<NULL>"
        if pd.isna(v):
            return "<NULL>"
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_DIR_ORACLE).toPandas()
    oracle_df = duck.execute(ORACLES[name]).df()

    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )
    kind_mismatch = {
        c: (_kind(spark_df[c].dtype), _kind(oracle_df[c].dtype))
        for c in spark_df.columns
        if _kind(spark_df[c].dtype) != _kind(oracle_df[c].dtype)
    }
    assert not kind_mismatch, (
        f"{name}: dtype-kind mismatch (spark vs oracle): {kind_mismatch} — "
        f"the driver hashes these differently even if values are equal; "
        f"CAST the oracle (HUGEINT sums!) or the Spark column"
    )
    s, o = _canon(spark_df), _canon(oracle_df)
    mismatches = [(a, b) for a, b in zip(s, o) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


def test_all_queries_have_entries():
    """Every oracle key must have a query; queries without oracles are
    allowed (rows-only checks) but should be a minority."""
    assert set(ORACLES) <= set(QUERIES)


def test_grams_guard_drops_short_docs_both_engines(spark, tmp_path):
    """ADVICE r2 regression: docs with <3 words must neither crash
    Spark (sequence(1,0) descends to [1,0] and slice(words,0,3)
    throws) nor diverge from the oracle (empty generate_series drops
    them silently) — both engines drop them identically."""
    import duckdb

    df = spark.createDataFrame(
        [(1, "en", ""), (2, "en", "one"), (3, "en", "two words"),
         (4, "en", "three word text"), (5, "en", "a b c d repeated a b c d")],
        "doc_id long, lang string, text string",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    out = QUERIES["text_repetition"](spark, str(tmp_path)).toPandas()
    assert set(out["doc_id"]) == {4, 5}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    oracle = con.execute(ORACLES["text_repetition"]).df()
    assert set(oracle["doc_id"]) == {4, 5}
    con.close()

    # the shared shingle path (dedup) must tolerate the same inputs
    sigs = QUERIES["dedup_minhash_signatures"](spark, str(tmp_path)).toPandas()
    assert set(sigs["doc_id"]) == {4, 5}


def test_kmeans_train_matches_naive_lloyd(spark):
    """Independent semantic pin: a from-scratch numpy Lloyd loop
    (no shared code with the operator) reproduces kmeans_train's
    centroids and counts exactly at sf0.001."""
    import numpy as np

    out = QUERIES["kmeans_train"](spark, "/root/testdata/sf0.001").toPandas()
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .orderBy("vec_id")
        .toPandas()
    )
    M = np.array(
        [np.round(np.asarray(e, dtype=np.float64) * 1_000_000).astype(np.int64)
         for e in emb["embedding"]]
    )
    C = M[:4].copy()
    counts = np.zeros(4, dtype=np.int64)
    for _ in range(2):
        d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        asg = np.argmin(d2, axis=1)  # first min = smallest cid on ties
        newC = C.copy()
        counts = np.zeros(4, dtype=np.int64)
        for c in range(4):
            members = M[asg == c]
            counts[c] = len(members)
            if len(members):
                s = members.sum(axis=0)
                newC[c] = np.floor(s / len(members) + 0.5).astype(np.int64)
        C = newC
    got = {(r.cent_id, r.dim): (r.c_micro, r.n_assigned)
           for r in out.itertuples(index=False)}
    for c in range(4):
        for d in range(64):
            assert got[(c, d + 1)] == (C[c, d], counts[c]), (c, d)


def test_kmeans_and_pq_handle_empty_corpus(spark, tmp_path):
    """Both codebook-driven operators return an empty frame with the
    contract schema (not a crash) when the embeddings table is empty —
    mirroring ann_ivf_probe's empty-codebook rule."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    d = str(tmp_path / "empty_tables")
    sch = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("label", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    spark.createDataFrame([], sch).write.parquet(f"{d}/embeddings.parquet")
    km = QUERIES["kmeans_train"](spark, d)
    pq = QUERIES["pq_encode"](spark, d)
    assert km.count() == 0 and km.columns == ["cent_id", "dim", "c_micro", "n_assigned"]
    assert pq.count() == 0 and pq.columns == ["vec_id", "sub", "code", "err2"]
