"""Structured Streaming ingestion tests (exactly-once + lineage)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.streaming import run_stream


def _write_jsonl(path: str, rows: list[dict]) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _turns(conv_id: str, variant: int) -> list[dict]:
    if variant == 0:
        a = "Akureyri is North of City 50337."
    elif variant == 1:
        a = "4200 km"
    else:
        a = "i am not sure"  # extractor-miss -> fallback
    return [
        {"conv_id": conv_id, "turn_idx": 0, "role": "user",
         "text": "From City 50337 to Akureyri, how far?", "tool": None,
         "ts": "2024-01-01T00:00:00"},
        {"conv_id": conv_id, "turn_idx": 1, "role": "assistant", "text": a,
         "tool": None, "ts": "2024-01-01T00:00:01"},
    ]


@pytest.fixture()
def dirs(tmp_path):
    inp = tmp_path / "in"
    out = tmp_path / "out"
    inp.mkdir()
    return str(inp), str(out)


def test_stream_drains_and_writes_lineage(spark, dirs):
    inp, out = dirs
    rows = [t for i in range(20) for t in _turns(f"c{i:03d}", i % 3)]
    _write_jsonl(os.path.join(inp, "batch0.jsonl"), rows)

    run_stream(spark, inp, out)

    data = spark.read.parquet(os.path.join(out, "data"))
    assert data.count() == len(rows)
    got = {r["block_class"] for r in data.collect()}
    assert "direction" in got and "distance" in got

    lin = spark.read.parquet(os.path.join(out, "lineage"))
    tot = lin.agg(F.sum("n_turns").alias("t"), F.sum("n_fallback").alias("f")).collect()[0]
    assert tot["t"] == len(rows)
    assert tot["f"] > 0  # planted extractor misses surface as fallbacks


def test_stream_resume_is_exactly_once(spark, dirs):
    inp, out = dirs
    _write_jsonl(os.path.join(inp, "a.jsonl"),
                 [t for i in range(10) for t in _turns(f"a{i}", i % 3)])
    run_stream(spark, inp, out)
    n1 = spark.read.parquet(os.path.join(out, "data")).count()
    assert n1 == 20

    # restart with no new files: checkpoint prevents reprocessing
    run_stream(spark, inp, out)
    assert spark.read.parquet(os.path.join(out, "data")).count() == n1

    # new file arrives; only it is processed on the next run
    _write_jsonl(os.path.join(inp, "b.jsonl"),
                 [t for i in range(5) for t in _turns(f"b{i}", 0)])
    run_stream(spark, inp, out)
    data = spark.read.parquet(os.path.join(out, "data"))
    assert data.count() == n1 + 10
    # per-turn rows of the first batch appear exactly once
    dup = (data.groupBy("conv_id", "turn_idx").count()
           .filter(F.col("count") > 1).count())
    assert dup == 0


def test_stream_spans_match_batch_path(spark, dirs):
    inp, out = dirs
    _write_jsonl(os.path.join(inp, "a.jsonl"), _turns("c0", 0))
    run_stream(spark, inp, out)
    data = spark.read.parquet(os.path.join(out, "data"))
    row = data.filter(F.col("role") == "user").collect()[0]
    spans = [(s["key"], s["start"], s["end"]) for s in row["char_spans"]]
    assert ("City 50337", 5, 15) in spans
