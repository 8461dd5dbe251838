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


def _eoc(conv_id: str, n_turns: int) -> dict:
    from ocr_spark.streaming import EOC_ROLE

    return {"conv_id": conv_id, "turn_idx": n_turns, "role": EOC_ROLE,
            "text": None, "tool": None, "ts": None}


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


def test_stateful_assembly_across_microbatches(spark, dirs):
    """applyInPandasWithState conversation assembly: each conversation's
    turns are SPLIT across two input files and maxFilesPerTrigger=1
    forces them into different micro-batches — turns must buffer in the
    state store and the assembled extraction output must equal the
    batch pipeline over the same turns."""
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType, TimestampType,
    )

    from ocr_spark.pipeline import extract_conversations
    from ocr_spark.streaming import run_assemble_stream

    inp, out = dirs
    n = 30
    sys_txt = "You are a geography assistant."
    rows = []
    for i in range(n):
        a = ["Akureyri is North of City 50337.", "4200 km", "i am not sure"][i % 3]
        rows.append([
            {"conv_id": f"s{i:03d}", "turn_idx": 0, "role": "system",
             "text": sys_txt, "tool": None, "ts": "2024-01-01T00:00:00"},
            {"conv_id": f"s{i:03d}", "turn_idx": 1, "role": "user",
             "text": f"From City 50337 to Akureyri, how far? ({i})", "tool": None,
             "ts": "2024-01-01T00:00:01"},
            {"conv_id": f"s{i:03d}", "turn_idx": 2, "role": "assistant", "text": a,
             "tool": None, "ts": "2024-01-01T00:00:02"},
        ])
    # file a: system+user turns only; file b: the terminal assistant
    # turns; file c: the end-of-conversation markers (turn_idx = turn
    # count) — completion crosses TWO state-store boundaries
    _write_jsonl(os.path.join(inp, "a_prefix.jsonl"),
                 [t for conv in rows for t in conv[:2]])
    _write_jsonl(os.path.join(inp, "b_final.jsonl"),
                 [t for conv in rows for t in conv[2:]])
    _write_jsonl(os.path.join(inp, "c_markers.jsonl"),
                 [_eoc(conv[0]["conv_id"], len(conv)) for conv in rows])

    run_assemble_stream(spark, inp, out, max_files=1)

    got = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["clean_text"],
         r["block_class"], r["answer"], r["status"], r["n_tokens"])
        for r in spark.read.parquet(os.path.join(out, "data")).collect()
    )

    schema = StructType([
        StructField("conv_id", StringType()), StructField("turn_idx", IntegerType()),
        StructField("role", StringType()), StructField("text", StringType()),
        StructField("tool", StringType()), StructField("ts", TimestampType()),
    ])
    batch_in = spark.createDataFrame(
        [(t["conv_id"], t["turn_idx"], t["role"], t["text"], None, None)
         for conv in rows for t in conv],
        schema,
    )
    want = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["clean_text"],
         r["block_class"], r["answer"], r["status"], r["n_tokens"])
        for r in extract_conversations(batch_in).collect()
    )
    assert got == want
    assert len(got) == 3 * n


def test_stateful_assembly_multi_assistant_no_premature_emit(spark, dirs):
    """ADVICE r2 regression: a k-turn conversation with MULTIPLE
    assistant turns, whose first assistant turn arrives in an early
    micro-batch, must NOT be emitted prematurely (the old heuristic
    completed on any buffered assistant turn, producing a fragment
    plus a duplicate-conv_id remainder).  Completion now waits for the
    end-of-conversation marker + full turn count."""
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType, TimestampType,
    )

    from ocr_spark.pipeline import extract_conversations
    from ocr_spark.streaming import run_assemble_stream

    inp, out = dirs
    n = 12
    rows = []
    for i in range(n):
        rows.append([
            {"conv_id": f"k{i:03d}", "turn_idx": 0, "role": "system",
             "text": "You are a geography assistant.", "tool": None,
             "ts": "2024-01-01T00:00:00"},
            {"conv_id": f"k{i:03d}", "turn_idx": 1, "role": "user",
             "text": f"From City 50337 to Akureyri, how far? ({i})", "tool": None,
             "ts": "2024-01-01T00:00:01"},
            {"conv_id": f"k{i:03d}", "turn_idx": 2, "role": "assistant",
             "text": "4200 km", "tool": None, "ts": "2024-01-01T00:00:02"},
            {"conv_id": f"k{i:03d}", "turn_idx": 3, "role": "user",
             "text": "And the direction?", "tool": None,
             "ts": "2024-01-01T00:00:03"},
            {"conv_id": f"k{i:03d}", "turn_idx": 4, "role": "assistant",
             "text": "Akureyri is North of City 50337.", "tool": None,
             "ts": "2024-01-01T00:00:04"},
        ])
    # first assistant turn lands in micro-batch 1 of 3: the old
    # any-assistant heuristic would emit a 3-turn fragment here
    _write_jsonl(os.path.join(inp, "a.jsonl"),
                 [t for conv in rows for t in conv[:3]])
    _write_jsonl(os.path.join(inp, "b.jsonl"),
                 [t for conv in rows for t in conv[3:]])
    _write_jsonl(os.path.join(inp, "c.jsonl"),
                 [_eoc(conv[0]["conv_id"], len(conv)) for conv in rows])

    run_assemble_stream(spark, inp, out, max_files=1)

    data = spark.read.parquet(os.path.join(out, "data"))
    # exactly one row per (conv, turn): no premature fragment, no dup
    assert data.count() == 5 * n
    dup = (data.groupBy("conv_id", "turn_idx").count()
           .filter(F.col("count") > 1).count())
    assert dup == 0

    schema = StructType([
        StructField("conv_id", StringType()), StructField("turn_idx", IntegerType()),
        StructField("role", StringType()), StructField("text", StringType()),
        StructField("tool", StringType()), StructField("ts", TimestampType()),
    ])
    batch_in = spark.createDataFrame(
        [(t["conv_id"], t["turn_idx"], t["role"], t["text"], None, None)
         for conv in rows for t in conv],
        schema,
    )
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["clean_text"],
         r["block_class"], r["answer"], r["status"])
        for r in data.collect()
    )
    want = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["clean_text"],
         r["block_class"], r["answer"], r["status"])
        for r in extract_conversations(batch_in).collect()
    )
    assert got == want


def test_stateful_assembly_idle_timeout_flushes_markerless(spark, dirs):
    """A conversation whose producer died before its EOC marker must
    not pin the state store forever: with idle_timeout_ms set on a
    continuous micro-batch trigger, the idle conversation is flushed
    through the kernel path once no new turns arrive for the window
    (the deployment shape for this feature — see the
    stream_assemble_extract docstring for why availableNow drains
    don't evaluate pending timeouts)."""
    import time as _time

    from ocr_spark.streaming import read_transcript_stream, stream_assemble_extract

    inp, out = dirs
    # orphan: system+user only, no marker, producer gone
    _write_jsonl(os.path.join(inp, "a_orphan.jsonl"), [
        {"conv_id": "orph0", "turn_idx": 0, "role": "system",
         "text": "You are a geography assistant.", "tool": None,
         "ts": "2024-01-01T00:00:00"},
        {"conv_id": "orph0", "turn_idx": 1, "role": "user",
         "text": "From City 50337 to Akureyri, how far?", "tool": None,
         "ts": "2024-01-01T00:00:01"},
    ])
    data_dir = os.path.join(out, "data")
    extracted = stream_assemble_extract(
        read_transcript_stream(spark, inp), idle_timeout_ms=300
    )
    q = (
        extracted.writeStream.format("parquet")
        .option("path", data_dir)
        .option("checkpointLocation", os.path.join(out, "_checkpoint"))
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 120
        n = 0
        while _time.time() < deadline:
            try:
                n = (spark.read.parquet(data_dir)
                     .filter(F.col("conv_id") == "orph0").count())
            except Exception:
                n = 0  # sink directory not created yet
            if n:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    data = spark.read.parquet(data_dir)
    orph = data.filter(F.col("conv_id") == "orph0")
    # both buffered turns flushed, exactly once, with their texts; no
    # assistant turn ever arrived so nothing classifies as direction/
    # distance (fallback is an assistant-turn property)
    assert orph.count() == 2
    assert {r["role"] for r in orph.collect()} == {"system", "user"}
    assert {r["block_class"] for r in orph.collect()} == {"other"}


def test_assemble_drain_reports_pending_markerless(spark, dirs):
    """Code-review r3: a marker-less corpus must not drain 'green' with
    zero output and no signal.  run_assemble_stream returns the count
    of still-buffered conversations (state-store readback) and warns."""
    import warnings

    from ocr_spark.streaming import run_assemble_stream

    inp, out = dirs
    rows = _turns("m0", 0)  # trailing assistant turn but NO marker
    _write_jsonl(os.path.join(inp, "a.jsonl"), rows)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pending = run_assemble_stream(spark, inp, out)
    assert pending == 1
    assert any("remain buffered" in str(x.message) for x in w)

    # the marker arrives in a later drop-file: conversation completes,
    # nothing pending, no warning
    _write_jsonl(os.path.join(inp, "b.jsonl"), [_eoc("m0", len(rows))])
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        pending2 = run_assemble_stream(spark, inp, out)
    assert pending2 == 0
    assert not any("remain buffered" in str(x.message) for x in w2)
    data = spark.read.parquet(os.path.join(out, "data"))
    assert data.count() == len(rows)


def test_assemble_drain_empty_input_reports_zero(spark, dirs):
    """A drain over an empty drop directory commits no micro-batch, so
    the statestore readback has no committed batch to read — that must
    surface as pending == 0, not as a crash."""
    from ocr_spark.streaming import run_assemble_stream

    inp, out = dirs
    assert run_assemble_stream(spark, inp, out) == 0


def test_with_eoc_markers_counts(spark):
    """with_eoc_markers appends one marker per conversation with
    turn_idx = turn count, schema-compatible with the transcript table."""
    from ocr_spark.streaming import EOC_ROLE, with_eoc_markers
    from ocr_spark.synth import transcripts

    t = transcripts(spark, 20, skew=False)
    marked = with_eoc_markers(t)
    assert marked.schema == t.schema
    m = marked.filter(F.col("role") == EOC_ROLE)
    assert m.count() == 20
    assert {r["turn_idx"] for r in m.collect()} == {3}


def test_windowed_aggregation_with_watermark(spark, dirs, tmp_path):
    """Event-time windowed counts on a stream equal the same windowed
    aggregation computed in batch over the same files."""
    from pyspark.sql import functions as F

    from ocr_spark.streaming import (
        TRANSCRIPT_SCHEMA,
        read_transcript_stream,
        stream_turn_rate,
    )

    inp, _ = dirs
    rows = []
    for i in range(30):
        hour = i % 3
        for t in _turns(f"c{i:03d}", i % 3):
            t = dict(t)
            t["ts"] = f"2024-01-01T{hour:02d}:{i % 60:02d}:00"
            rows.append(t)
    _write_jsonl(os.path.join(inp, "a.jsonl"), rows)

    q = (
        stream_turn_rate(read_transcript_stream(spark, inp))
        .writeStream.format("memory")
        .queryName("turn_rate")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (str(r["window_start"]), r["role"], r["n_turns"], r["total_chars"])
        for r in spark.sql("SELECT * FROM turn_rate").collect()
    )

    batch = (
        spark.read.schema(TRANSCRIPT_SCHEMA).json(inp)
        .groupBy(F.window("ts", "1 hour").alias("w"), "role")
        .agg(F.count("*").alias("n_turns"), F.sum(F.length("text")).alias("total_chars"))
    )
    want = sorted(
        (str(r["w"]["start"]), r["role"], r["n_turns"], r["total_chars"])
        for r in batch.collect()
    )
    assert got == want
    assert len({w for (w, _, _, _) in got}) == 3  # three event-time hours


def test_stateful_assembly_rocksdb_store_matches_default(spark, dirs, tmp_path):
    """rocksdb=True must be a pure storage swap: same assembled output
    as the default (on-heap) state store across the same multi-file
    drain, and the pending-state readback still reports 0.  The
    provider conf is set-and-restored around query start, so the
    session conf is left untouched afterward."""
    from ocr_spark.streaming import ROCKSDB_PROVIDER, run_assemble_stream

    inp, out = dirs
    rows = [t for i in range(12) for t in _turns(f"r{i:02d}", i % 3)]
    # split turns and markers across files so state genuinely persists
    # between micro-batches inside RocksDB
    _write_jsonl(os.path.join(inp, "a.jsonl"), rows[::2])
    _write_jsonl(os.path.join(inp, "b.jsonl"), rows[1::2])
    _write_jsonl(os.path.join(inp, "c.jsonl"),
                 [_eoc(f"r{i:02d}", 2) for i in range(12)])

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(conf_key, None)
    pending = run_assemble_stream(spark, inp, out, max_files=1, rocksdb=True)
    assert pending == 0
    assert spark.conf.get(conf_key, None) == before

    # the checkpoint metadata proves RocksDB actually ran the query
    import glob
    meta = ""
    for f in glob.glob(os.path.join(out, "_checkpoint", "offsets", "*")):
        meta += open(f).read()
    assert "RocksDBStateStoreProvider" in meta

    out2 = str(tmp_path / "out_default")
    run_assemble_stream(spark, inp, out2, max_files=1)
    key = lambda r: (r["conv_id"], r["turn_idx"], r["clean_text"],
                     r["block_class"], r["answer"], r["status"], r["n_tokens"])
    a = sorted(map(key, spark.read.parquet(os.path.join(out, "data")).collect()))
    b = sorted(map(key, spark.read.parquet(os.path.join(out2, "data")).collect()))
    assert a == b and len(a) == len(rows)


def test_stream_dedup_exact_across_batches_and_restarts(spark, dirs):
    """Streaming exact-dedup: (a) duplicates WITHIN a micro-batch and
    ACROSS micro-batches are suppressed, matching batch dedup_exact
    semantics over the union; (b) a second drain (fresh query, same
    checkpoint) still suppresses everything already seen — the
    seen-fingerprint state survives restart."""
    from ocr_spark.streaming import run_dedup_stream

    inp, out = dirs
    a = _turns("c0", 0) + _turns("c1", 0)            # c1 repeats c0's texts
    b = _turns("c2", 1) + _turns("c3", 0)            # one new answer + repeats
    _write_jsonl(os.path.join(inp, "a.jsonl"), a)
    _write_jsonl(os.path.join(inp, "b.jsonl"), b)

    emitted = run_dedup_stream(spark, inp, out, max_files=1)
    got = spark.read.parquet(os.path.join(out, "data"))
    distinct_texts = {(r["role"], r["text"]) for r in got.collect()}
    want = {(r["role"], r["text"]) for r in map(dict, a + b)}
    assert distinct_texts == want            # every distinct content once
    assert emitted == got.count() == len(want)
    assert got.groupBy("fp").count().filter(F.col("count") > 1).count() == 0

    # restart: replay old content + one genuinely new turn
    c = _turns("c4", 0) + _turns("c5", 2)
    _write_jsonl(os.path.join(inp, "c.jsonl"), c)
    emitted2 = run_dedup_stream(spark, inp, out, max_files=1)
    assert emitted2 == 1                     # only the variant-2 answer is new
    assert spark.read.parquet(os.path.join(out, "data")).count() == len(want) + 1


def test_stream_sessionize_matches_batch_session_window(spark, dirs):
    """Streaming session_window drain (append mode, availableNow) must
    equal the same session_window aggregation computed in batch over
    the same files — sessions split where turn gaps >= 15 min."""
    from ocr_spark.streaming import (
        TRANSCRIPT_SCHEMA,
        read_transcript_stream,
        stream_sessionize,
    )

    inp, _ = dirs
    rows = []
    for i in range(12):
        # three turns: second 2 min after the first, third 40 min later
        # -> two sessions per conversation (40 min >= 15 min gap)
        two = _turns(f"s{i:03d}", i % 3)
        three = two + [dict(two[1], turn_idx=2, text="and one more thing")]
        for j, t in enumerate(three):
            t = dict(t)
            minute = [0, 2, 42][j]
            t["ts"] = f"2024-01-01T{i % 3:02d}:{minute:02d}:00"
            rows.append(t)
    _write_jsonl(os.path.join(inp, "a.jsonl"), rows[::2])
    _write_jsonl(os.path.join(inp, "b.jsonl"), rows[1::2])
    # Append mode emits a session only after the WATERMARK passes its
    # end — a backlog alone never finalizes its own tail.  A late
    # sentinel turn (next day) pushes the watermark past every real
    # session; the sentinel's own session stays open and unemitted.
    sentinel = dict(_turns("zzz", 0)[0], ts="2024-01-02T12:00:00")
    _write_jsonl(os.path.join(inp, "c.jsonl"), [sentinel])

    q = (
        stream_sessionize(read_transcript_stream(spark, inp, max_files=1))
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["conv_id"], str(r["sess_start"]), str(r["sess_end"]), r["n_turns"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    )

    batch = (
        spark.read.schema(TRANSCRIPT_SCHEMA).json(inp)
        .groupBy(F.session_window("ts", "15 minutes").alias("sw"), "conv_id")
        .agg(F.count("*").alias("n_turns"))
    )
    want = sorted(
        (r["conv_id"], str(r["sw"]["start"]), str(r["sw"]["end"]), r["n_turns"])
        for r in batch.collect()
        if r["conv_id"] != "zzz"
    )
    assert got == want
    # two sessions per conversation: (turns 0,1) and (turn 2)
    assert len(got) == 24
    assert sorted({n for (_, _, _, n) in got}) == [1, 2]


def test_dedup_stream_empty_input_returns_zero(spark, dirs, tmp_path):
    """A drain over an empty drop directory commits no micro-batches and
    never creates the sink dir — the helper must return 0, not raise."""
    from ocr_spark.streaming import run_dedup_stream

    inp = str(tmp_path / "empty_in")
    os.makedirs(inp)
    out = str(tmp_path / "empty_out")
    assert run_dedup_stream(spark, inp, out) == 0


def test_stream_clean_normalize_before_dedup(spark, dirs):
    """stream_clean: (a) raw byte variants that normalize equal (curly
    vs straight quotes, case, NBSP) collide on the normalized
    fingerprint — the later drop is suppressed across drains; (b) each
    emitted row carries the same Gopher verdict the batch rule column
    computes on its normalized text."""
    from ocr_spark.queries.ccnet_ops import gopher_verdict_col, norm_col
    from ocr_spark.streaming import run_clean_stream

    raw = "The “quick” brown fox — jumps"
    variant = "the \"quick\" brown fox - jumps"       # normalizes equal
    fresh = "a genuinely different drop of text"
    mk = lambda cid, text: {
        "conv_id": cid, "turn_idx": 0, "role": "user", "text": text,
        "tool": None, "ts": "2024-01-01T00:00:00",
    }
    inp, out = dirs
    _write_jsonl(os.path.join(inp, "a.jsonl"), [mk("c0", raw)])
    emitted = run_clean_stream(spark, inp, out, max_files=1)
    assert emitted == 1

    # second drain: the byte-variant is suppressed, the fresh one emits
    _write_jsonl(os.path.join(inp, "b.jsonl"),
                 [mk("c1", variant), mk("c2", fresh)])
    emitted2 = run_clean_stream(spark, inp, out, max_files=1)
    assert emitted2 == 1
    got = spark.read.parquet(os.path.join(out, "data"))
    assert got.count() == 2
    texts = {r["text"] for r in got.collect()}
    assert texts == {raw, fresh}             # first arrival wins

    # verdicts match the batch rule column over the same normalized text
    batch = spark.createDataFrame(
        [(raw,), (fresh,)], ["text"]
    ).select(
        norm_col(F.col("text")).alias("norm_text")
    ).select("norm_text", gopher_verdict_col(F.col("norm_text")).alias("v"))
    want = {r["norm_text"]: r["v"] for r in batch.collect()}
    for r in got.collect():
        assert r["verdict"] == want[r["norm_text"]]
        assert r["verdict"] == "word_count"   # both well under 50 words


def test_stream_tool_enrich_matches_batch_interval_join(spark, dirs, tmp_path):
    """Stream-stream interval join (availableNow drain) must equal the
    same join computed in batch: tool events within [ts - 10 min, ts]
    of a same-conversation turn attach; older or cross-conv ones
    don't."""
    from ocr_spark.streaming import (
        TRANSCRIPT_SCHEMA,
        read_transcript_stream,
        stream_tool_enrich,
    )

    inp, _ = dirs
    tool_dir = str(tmp_path / "tools")
    os.makedirs(tool_dir)

    turn_rows, tool_rows = [], []
    for i in range(6):
        c = f"e{i:03d}"
        turn_rows.append(
            {"conv_id": c, "turn_idx": 1, "role": "assistant",
             "text": "4200 km", "tool": None,
             "ts": f"2024-01-01T0{i}:30:00"})
        # in-window (1 min before) -> matches
        tool_rows.append(
            {"conv_id": c, "turn_idx": 0, "role": "tool", "text": None,
             "tool": "geo_lookup", "ts": f"2024-01-01T0{i}:29:00"})
        # out-of-window (30 min before) -> no match
        tool_rows.append(
            {"conv_id": c, "turn_idx": 0, "role": "tool", "text": None,
             "tool": "geo_lookup", "ts": f"2024-01-01T0{i}:00:00"})
    # cross-conversation event inside the window -> no match
    tool_rows.append(
        {"conv_id": "other", "turn_idx": 0, "role": "tool", "text": None,
         "tool": "geo_lookup", "ts": "2024-01-01T00:29:30"})
    _write_jsonl(os.path.join(inp, "turns.jsonl"), turn_rows)
    _write_jsonl(os.path.join(tool_dir, "tools.jsonl"), tool_rows)

    q = (
        stream_tool_enrich(
            read_transcript_stream(spark, inp, max_files=1),
            read_transcript_stream(spark, tool_dir, max_files=1),
        )
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["conv_id"], r["turn_idx"], str(r["ts"]), r["tool_name"], str(r["tool_ts"]))
        for r in spark.sql("SELECT * FROM enriched").collect()
    )

    bt = spark.read.schema(TRANSCRIPT_SCHEMA).json(inp)
    be = spark.read.schema(TRANSCRIPT_SCHEMA).json(tool_dir).select(
        F.col("conv_id").alias("t_conv_id"),
        F.col("tool").alias("tool_name"),
        F.col("ts").alias("tool_ts"),
    )
    batch = bt.join(
        be,
        (bt["conv_id"] == be["t_conv_id"])
        & (be["tool_ts"] >= F.expr("ts - interval 10 minutes"))
        & (be["tool_ts"] <= bt["ts"]),
        "inner",
    )
    want = sorted(
        (r["conv_id"], r["turn_idx"], str(r["ts"]), r["tool_name"], str(r["tool_ts"]))
        for r in batch.collect()
    )
    assert got == want
    assert len(got) == 6          # exactly the six in-window events
    assert {t for (_, _, _, t, _) in got} == {"geo_lookup"}


def test_stream_tool_enrich_left_outer_emits_unmatched(spark, dirs, tmp_path):
    """left_outer mode: a turn with no in-window tool event emits a
    null-tool row once the watermark passes its candidate interval
    (sentinels in BOTH streams advance the query watermark, which is
    the min across sources); matched turns emit exactly their
    matches."""
    from ocr_spark.streaming import read_transcript_stream, stream_tool_enrich

    inp, _ = dirs
    tool_dir = str(tmp_path / "tools")
    os.makedirs(tool_dir)

    turn_rows = [
        {"conv_id": "m000", "turn_idx": 1, "role": "assistant",
         "text": "4200 km", "tool": None, "ts": "2024-01-01T01:30:00"},
        {"conv_id": "u000", "turn_idx": 1, "role": "assistant",
         "text": "4200 km", "tool": None, "ts": "2024-01-01T02:30:00"},
        # watermark sentinel (its own interval never closes)
        {"conv_id": "zzz", "turn_idx": 0, "role": "user", "text": "late",
         "tool": None, "ts": "2024-01-02T12:00:00"},
    ]
    tool_rows = [
        {"conv_id": "m000", "turn_idx": 0, "role": "tool", "text": None,
         "tool": "geo_lookup", "ts": "2024-01-01T01:29:00"},
        {"conv_id": "zzz2", "turn_idx": 0, "role": "tool", "text": None,
         "tool": "noop", "ts": "2024-01-02T12:00:00"},
    ]
    _write_jsonl(os.path.join(inp, "turns.jsonl"), turn_rows)
    _write_jsonl(os.path.join(tool_dir, "tools.jsonl"), tool_rows)

    q = (
        stream_tool_enrich(
            read_transcript_stream(spark, inp, max_files=1),
            read_transcript_stream(spark, tool_dir, max_files=1),
            how="left_outer",
        )
        .writeStream.format("memory")
        .queryName("enriched_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["conv_id"], r["tool_name"])
        for r in spark.sql("SELECT * FROM enriched_outer").collect()
        if r["conv_id"] != "zzz"
    }
    assert got == {("m000", "geo_lookup"), ("u000", None)}


def test_run_merge_stream_cdc_upsert_delete(spark, dirs, tmp_path):
    """Two micro-batches of keyed change rows merged into a table:
    batch 2's update wins over batch 1's insert, the DELETE tombstone
    removes its key, and replaying the final change file by hand (the
    at-least-once case) leaves the table unchanged (MERGE idempotence)."""
    from ocr_spark.maintenance import merge_upsert
    from ocr_spark.streaming import TRANSCRIPT_SCHEMA, run_merge_stream

    inp, _ = dirs
    tbl = str(tmp_path / "state_table")

    def change(cid, turn_idx, text, tool=None, ts="2024-01-01T00:00:00"):
        return {"conv_id": cid, "turn_idx": turn_idx, "role": "assistant",
                "text": text, "tool": tool, "ts": ts}

    # max_files=1 -> one micro-batch per file, applied in drop order
    _write_jsonl(os.path.join(inp, "b0.jsonl"),
                 [change("c1", 0, "v1"), change("c2", 0, "other")])
    _write_jsonl(os.path.join(inp, "b1.jsonl"),
                 [change("c1", 1, "v2"),              # update c1
                  change("c3", 0, "new"),             # insert c3
                  change("c2", 1, None, tool="DELETE")])  # delete c2

    run_merge_stream(spark, inp, tbl)
    got = {r["conv_id"]: r["text"] for r in spark.read.parquet(tbl).collect()}
    assert got == {"c1": "v2", "c3": "new"}

    # replay the LAST batch manually: state must not change
    import json as _json
    rows = [_json.loads(l) for l in open(os.path.join(inp, "b1.jsonl"))]
    replay = spark.createDataFrame(
        [(r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"],
          r["ts"].replace("T", " ")) for r in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts")).withColumn(
        "_deleted", F.col("tool") == F.lit("DELETE"))
    merge_upsert(spark, tbl, replay, key="conv_id", delete_col="_deleted",
                 with_counts=False)
    again = {r["conv_id"]: r["text"] for r in spark.read.parquet(tbl).collect()}
    assert again == got


def test_composed_streaming_job_end_to_end_kill_resume(spark, dirs, tmp_path):
    """The full composed streaming job (VERDICT r4 item 6): source ->
    stateful assembler + extraction -> streaming exact-dedup of the
    extracted rows -> keyed CDC MERGE sink, with the event-time
    windowed aggregation running off the same source.  Each stage is
    individually pinned elsewhere; this drains the COMPOSITION in two
    phases (half the drop-files, every stage, then the rest — each
    stage resumes its own checkpoint exactly as a killed-and-restarted
    job would), additionally stops the dedup stage mid-drain and
    restarts it, and pins the final merged table equal to the batch
    extraction over the deduplicated corpus."""
    import time

    from pyspark.sql import functions as SF
    from pyspark.sql.types import StructField, StringType

    from ocr_spark.maintenance import merge_upsert
    from ocr_spark.pipeline import EXTRACT_SCHEMA, extract_conversations
    from ocr_spark.streaming import (
        TRANSCRIPT_SCHEMA,
        read_transcript_stream,
        run_assemble_stream,
        stream_turn_rate,
    )

    inp, out = dirs
    outA = os.path.join(out, "stageA")           # assembled + extracted
    outB = os.path.join(out, "stageB")           # deduped
    outC = os.path.join(out, "stageC")           # windowed agg
    table = os.path.join(out, "final_table")     # CDC MERGE target
    mrg_ckpt = os.path.join(out, "merge_ckpt")

    def conv(i):
        a = ["Akureyri is North of City 50337.", "4200 km",
             "i am not sure"][i % 3]
        return [
            {"conv_id": f"e{i:03d}", "turn_idx": 0, "role": "user",
             "text": f"From City 50337 to Akureyri, how far? ({i})",
             "tool": None, "ts": f"2024-01-01T{i % 3:02d}:{i:02d}:00"},
            {"conv_id": f"e{i:03d}", "turn_idx": 1, "role": "assistant",
             "text": a, "tool": None,
             "ts": f"2024-01-01T{i % 3:02d}:{i:02d}:01"},
        ]

    convs = [conv(i) for i in range(18)]

    # ---- stage plumbing ---------------------------------------------------
    fp = SF.md5(SF.concat_ws(
        "\x1f", "conv_id", SF.col("turn_idx").cast("string"), "role",
        SF.coalesce("clean_text", SF.lit("")),
    ))
    # StructType.add MUTATES self — build fresh copies, never .add on
    # the shared pipeline schema
    from pyspark.sql.types import StructType

    dedup_schema = StructType(
        list(EXTRACT_SCHEMA.fields) + [StructField("fp", StringType())])

    # seed the MERGE target: extraction schema + composite key column
    key_schema = StructType(
        list(EXTRACT_SCHEMA.fields) + [StructField("_k", StringType())])
    if not os.path.exists(table):
        spark.createDataFrame([], key_schema).write.parquet(table)

    def drain_stage_b(kill_mid=False):
        def start():
            return (
                spark.readStream.schema(EXTRACT_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(outA, "data"))
                .withColumn("fp", fp)
                .dropDuplicates(["fp"])
                .writeStream.format("parquet")
                .option("path", os.path.join(outB, "data"))
                .option("checkpointLocation", os.path.join(outB, "_ckpt"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )

        q = start()
        if kill_mid:
            # stop after the first committed micro-batch (best-effort:
            # if the drain wins the race the restart is a no-op and the
            # composition must STILL converge)
            for _ in range(200):
                if any(p["numInputRows"] > 0 for p in q.recentProgress):
                    break
                time.sleep(0.05)
            q.stop()
            q.awaitTermination()
            q = start()                      # resume from the checkpoint
        q.awaitTermination()

    def commit_merge(bdf, _bid):
        if bdf.isEmpty():
            return
        ch = (
            bdf.drop("fp")
            .withColumn("_k", SF.concat_ws(
                ":", "conv_id", SF.col("turn_idx").cast("string")))
            .withColumn("_deleted", SF.lit(False))
        )
        merge_upsert(bdf.sparkSession, table, ch, key="_k",
                     delete_col="_deleted", with_counts=False)

    def commit_window(bdf, _bid):
        bdf.write.mode("overwrite").parquet(os.path.join(outC, "data"))

    def drain_all(kill_mid=False):
        pending = run_assemble_stream(spark, inp, outA, max_files=1)
        assert pending == 0
        drain_stage_b(kill_mid=kill_mid)
        qd = (
            spark.readStream.schema(dedup_schema)
            .parquet(os.path.join(outB, "data"))
            .writeStream.foreachBatch(commit_merge)
            .option("checkpointLocation", mrg_ckpt)
            .trigger(availableNow=True)
            .start()
        )
        qd.awaitTermination()
        qc = (
            stream_turn_rate(
                read_transcript_stream(spark, inp)
                .filter(SF.col("ts").isNotNull())
            )
            .writeStream.foreachBatch(commit_window)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(outC, "_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        qc.awaitTermination()

    # ---- phase 1: convs 0-8 ----------------------------------------------
    _write_jsonl(os.path.join(inp, "p1_turns.jsonl"),
                 [t for c in convs[:9] for t in c])
    _write_jsonl(os.path.join(inp, "p1_markers.jsonl"),
                 [_eoc(c[0]["conv_id"], len(c)) for c in convs[:9]])
    drain_all()
    n_phase1 = spark.read.parquet(os.path.join(table)).count()
    assert n_phase1 == 9 * 2

    # ---- phase 2: convs 9-17 PLUS byte-identical replays of 0-5 -----------
    replay = convs[:6]
    _write_jsonl(os.path.join(inp, "p2_turns.jsonl"),
                 [t for c in convs[9:] + replay for t in c])
    _write_jsonl(os.path.join(inp, "p2_markers.jsonl"),
                 [_eoc(c[0]["conv_id"], len(c)) for c in convs[9:] + replay])
    drain_all(kill_mid=True)

    # ---- final pins --------------------------------------------------------
    # (a) merged table == batch extraction over the DEDUPED corpus
    key = lambda r: (r["conv_id"], r["turn_idx"], r["role"],
                     r["clean_text"],
                     tuple((s["key"], s["start"], s["end"])
                           for s in (r["char_spans"] or [])),
                     r["block_class"], r["answer"], r["status"],
                     r["n_tokens"])
    got = sorted(map(key, spark.read.parquet(table).drop("_k").collect()))
    batch_in = spark.createDataFrame(
        [(t["conv_id"], t["turn_idx"], t["role"], t["text"], None, None)
         for c in convs for t in c],
        TRANSCRIPT_SCHEMA,
    )
    want = sorted(map(key, extract_conversations(batch_in).collect()))
    assert got == want and len(got) == 18 * 2

    # (b) the replayed conversations produced NO duplicate keys anywhere
    dup = (spark.read.parquet(table).groupBy("_k").count()
           .filter(SF.col("count") > 1).count())
    assert dup == 0

    # (c) windowed agg over both phases == batch windowed agg over all files
    got_w = sorted(
        (str(r["window_start"]), r["role"], r["n_turns"], r["total_chars"])
        for r in spark.read.parquet(os.path.join(outC, "data")).collect()
    )
    batch_w = (
        spark.read.schema(TRANSCRIPT_SCHEMA).json(inp)
        .filter(SF.col("ts").isNotNull())
        .groupBy(SF.window("ts", "1 hour").alias("w"), "role")
        .agg(SF.count("*").alias("n_turns"),
             SF.sum(SF.length("text")).alias("total_chars"))
    )
    want_w = sorted(
        (str(r["w"]["start"]), r["role"], r["n_turns"], r["total_chars"])
        for r in batch_w.collect()
    )
    assert got_w == want_w and len({w for (w, _, _, _) in got_w}) == 3
