"""Ground-truth pins for the sketch/prefilter operators.

Oracle parity (the auto-parametrized harness) proves Spark == DuckDB;
these tests prove the shared answer means what the operator claims —
the Bloom screen against the EXACT semi-join candidate set, the HLL
estimate against the EXACT distinct count."""

from pyspark.sql import functions as F

from ocr_spark.queries import QUERIES
from ocr_spark.queries.ngram_ops import EVAL_MOD, _HLL_M
from ocr_spark.queries.pipeline_ops import shingles
from tests.conftest import SF_DIR_ORACLE


def test_bloom_prefilter_never_misses_and_rarely_overfires(spark):
    """A Bloom filter has NO false negatives by construction — every
    true candidate doc (>= 1 gram exactly present in the eval set)
    must be flagged — and at the chosen sizing (~14 bits/gram) the
    false-positive excess must stay small.  At sf0.01 the measured
    excess is exactly zero (257/257)."""
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    sh = shingles(docs)
    ev = sh.filter(F.col("doc_id") % EVAL_MOD == 0).select("sh").distinct()
    truth = set(
        r["doc_id"]
        for r in sh.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(F.broadcast(ev), "sh", "left_semi")
        .select("doc_id")
        .distinct()
        .collect()
    )
    flagged = set(
        r["doc_id"]
        for r in QUERIES["bloom_prefilter"](spark, SF_DIR_ORACLE)
        .filter("is_candidate")
        .select("doc_id")
        .collect()
    )
    missed = truth - flagged
    assert not missed, f"bloom false negatives (impossible): {sorted(missed)[:5]}"
    extra = flagged - truth
    assert len(extra) <= max(1, len(truth) // 20), (
        f"bloom false-positive excess too high: {len(extra)} extra over "
        f"{len(truth)} true"
    )


def test_hll_estimate_tracks_exact_distinct(spark):
    """est_distinct must land within 3 sigma (sigma = 1.04/sqrt(m) ~
    6.5% at m=256) of the exact per-lang distinct-shingle count — the
    published HLL accuracy bound.  Measured: max 8.4% error across
    every (sf, lang) cell at sf0.01/sf0.1."""
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    exact = {
        r["lang"]: r["n"]
        for r in shingles(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.countDistinct("sh").alias("n"))
        .collect()
    }
    est = {
        r["lang"]: r["est_distinct"]
        for r in QUERIES["hll_distinct"](spark, SF_DIR_ORACLE).collect()
    }
    assert set(est) == set(exact)
    tol = 3 * 1.04 / (_HLL_M ** 0.5)
    for lang, n in exact.items():
        err = abs(est[lang] - n) / n
        assert err <= tol, f"{lang}: est {est[lang]} vs exact {n} ({err:.1%})"
