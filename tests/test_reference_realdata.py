"""Oracle parity on REAL reference data beyond the locations corpus.

``tests/test_sources.py`` pins the conversation pipeline to
``data__/locations/valid.jsonl``; this suite does the same for the
DOCUMENT-table operator family using the reference's other two real
fixtures:

- ``nlptasks/train_data.jsonl`` (personality.py:191-194 output shape,
  ``{"model_name", "text"}``): 10 long markdown-ish GPT-4o generations
  — real prose with newlines, bold markers, apostrophes and multi-
  sentence structure that the synthetic word-salad corpus never
  produces.  Every documents-only catalog oracle is re-run Spark vs
  DuckDB on a documents table built from it.
- ``data__/pivot_city_questions.csv`` (train_cities_steering.py:292):
  the real wide answer-per-city sheet through the S3 CSV source +
  stack() unpivot.

Like the edge-corpus suite, this measures cross-engine parity on
inputs the driver's gate can't reach; unlike it, nothing here is
handcrafted — a divergence is a divergence on the reference's own
files.
"""

import json
import os

import pandas as pd
import pytest

from ocr_spark.queries import ORACLES, QUERIES
from tests.test_oracle_parity import _canon, _kind

REFERENCE_DOCS_JSONL = "/root/reference/nlptasks/train_data.jsonl"
REFERENCE_CSV = "/root/reference/data__/pivot_city_questions.csv"

#: closed-form oracles whose documented synthesis preconditions real
#: prose violates (same exclusion set as the edge suite — the kernels
#: are general, these oracles are not)
_PRECONDITION_ORACLES = {
    "html_boilerplate_strip",
    "pdf_reading_order",
    "mm_format_sniff",
    "ocr_page_reflow",  # closed-form oracle assumes the clean-corpus charset
}


def _realdata_targets():
    """Documents-only oracles: runnable on a dir with no embeddings."""
    return sorted(
        n
        for n, sql in ORACLES.items()
        if ("FROM documents" in sql or "documents)" in sql)
        and "embeddings" not in sql
        and "transcripts" not in sql
        and n not in _PRECONDITION_ORACLES
    )


@pytest.fixture(scope="module")
def realdocs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("reference_docs"))
    rows = []
    with open(REFERENCE_DOCS_JSONL) as f:
        for i, line in enumerate(f):
            rec = json.loads(line)
            rows.append((i, "en", rec["text"], rec["model_name"], len(rec["text"])))
    docs = pd.DataFrame(
        rows, columns=["doc_id", "lang", "text", "source", "n_chars"]
    )
    spark.createDataFrame(docs).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


@pytest.fixture(scope="module")
def realdocs_duck(realdocs_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{realdocs_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_DOCS_JSONL), reason="reference data absent"
)


@pytest.mark.parametrize("name", _realdata_targets())
def test_realdata_parity(name, spark, realdocs_dir, realdocs_duck):
    spark_df = QUERIES[name](spark, realdocs_dir).toPandas()
    oracle_df = realdocs_duck.execute(ORACLES[name]).df()
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), name
    assert len(spark_df) == len(oracle_df), (
        f"{name}: rows {len(spark_df)} vs {len(oracle_df)}"
    )
    kind_mismatch = {
        c: (_kind(spark_df[c].dtype), _kind(oracle_df[c].dtype))
        for c in spark_df.columns
        if _kind(spark_df[c].dtype) != _kind(oracle_df[c].dtype)
    }
    assert not kind_mismatch, f"{name}: {kind_mismatch}"
    s, o = _canon(spark_df), _canon(oracle_df)
    mismatches = [(a, b) for a, b in zip(s, o) if a != b]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


def test_realdata_golden_facts(spark, realdocs_dir):
    """Cheap golden pins so the fixture itself can't silently drift:
    10 docs, no exact duplicates, whitespace token counts match pure
    Python on the raw file."""
    docs = spark.read.parquet(f"{realdocs_dir}/documents.parquet")
    assert docs.count() == 10
    fp = QUERIES["dedup_exact"](spark, realdocs_dir).toPandas()
    assert len(fp) == 10 and (fp["n_copies"] == 1).all()
    got = {
        r["doc_id"]: r["n_ws_tokens"]
        for r in QUERIES["token_count_ws"](spark, realdocs_dir).collect()
    }
    with open(REFERENCE_DOCS_JSONL) as f:
        for i, line in enumerate(f):
            # the operator's contract is single-space split (matching
            # its oracle's str_split(text, ' ')), not any-whitespace
            want = len(json.loads(line)["text"].split(" "))
            assert got[i] == want, i


@pytest.mark.skipif(not os.path.exists(REFERENCE_CSV), reason="reference data absent")
def test_real_csv_unpivot(spark):
    """The REAL pivot_city_questions.csv through the S3 source: schema
    check passes with the actual five answer columns, and the stack()
    unpivot melts 12 templates x 5 cities into 60 long rows with the
    known first landmark answers."""
    from pyspark.sql import functions as F

    from ocr_spark.sources import read_csv_checked

    cities = ["new_york", "paris", "tokyo", "sao_paulo", "lagos"]
    cols = ["question_template", "category"] + [f"answer_{c}" for c in cities]
    df = read_csv_checked(spark, REFERENCE_CSV, cols)
    assert df.count() == 12
    stack_args = ", ".join(f"'{c}', answer_{c}" for c in cities)
    long = df.selectExpr(
        "question_template",
        "category",
        f"stack({len(cities)}, {stack_args}) AS (city, answer)",
    )
    assert long.count() == 60
    landmarks = {
        r["city"]: r["answer"]
        for r in long.filter(
            F.col("question_template").startswith("Which landmark")
        ).collect()
    }
    assert landmarks["new_york"] == "Times Square"
    assert landmarks["paris"] == "Eiffel Tower"
