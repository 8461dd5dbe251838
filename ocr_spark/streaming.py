"""Structured Streaming ingestion for the extraction pipeline.

The reference is pure batch (SURVEY.md §2.7); its closest analogs are
step-wise metric logging and periodic checkpoint/resume.  This module
is the engine's stream-ingest path for the same per-turn semantics:

- :func:`stream_classify` wires the **per-turn native path**
  (``classify_turns`` + span marking) as a stateless streaming
  transformation: no shuffle, no state store, so it runs at scan
  throughput and restarts exactly-once from the sink checkpoint.
- :func:`run_stream` drives it with ``trigger(availableNow=True)`` +
  ``foreachBatch``: each micro-batch writes extraction output AND a
  per-batch lineage row (batch id, turn count, ok/fallback counters,
  wall-time) — the streaming twin of lineage.CheckpointedExtraction.
  foreachBatch itself is only at-least-once, so both writes are
  batch_id-keyed overwrites (idempotent): a crash between the data
  write and the checkpoint commit replays the batch into the same
  ``batch_id=<id>`` directory, and the end-to-end result stays
  exactly-once (file-source offsets are tracked in the checkpoint WAL).

Conversation-level extraction (the render path) needs all turns of a
conversation and is therefore a batch concern; streaming emits per-turn
rows immediately and conversations are assembled downstream once their
turn set is complete (the reference never renders a partial
conversation either).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ocr_spark.pipeline import DEFAULT_VOCAB, classify_turns, span_udf

#: Canonical transcript schema (BASELINE.json input_hint); streaming
#: sources must declare it explicitly (no inference on streams).
TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def read_transcript_stream(
    spark: SparkSession, input_dir: str, fmt: str = "json", max_files: int = 64
) -> DataFrame:
    """File-source stream of transcript turns (JSONL drop directory).

    ``maxFilesPerTrigger`` bounds micro-batch size so a backlogged
    directory doesn't produce one giant batch on catch-up.
    """
    return (
        spark.readStream.format(fmt)
        .schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .load(input_dir)
    )


def stream_classify(stream: DataFrame, vocab=None) -> DataFrame:
    """Stateless per-turn extraction on a stream (native path + spans)."""
    return classify_turns(stream).withColumn(
        "char_spans", span_udf(list(vocab or DEFAULT_VOCAB))(F.col("text"))
    )


def run_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    vocab=None,
    await_termination: bool = True,
):
    """Drain all available input into ``output_dir`` with lineage.

    Layout: ``data/`` extraction rows, ``lineage/`` per-micro-batch
    metrics, ``_checkpoint/`` Spark streaming WAL (the resume point).
    Returns the query handle (already terminated if awaited).
    """
    data_dir = os.path.join(output_dir, "data")
    lineage_dir = os.path.join(output_dir, "lineage")
    ckpt_dir = os.path.join(output_dir, "_checkpoint")

    extracted = stream_classify(read_transcript_stream(spark, input_dir), vocab)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a crash after the write but
        # before the checkpoint commit replays the micro-batch.  Writes
        # are therefore keyed on batch_id — a deterministic
        # ``batch_id=<id>`` partition directory with mode=overwrite — so
        # a replay overwrites its own output instead of duplicating it
        # (the replayed batch has identical rows: file-source offsets
        # come from the checkpoint WAL).  Readers of the parent dir get
        # batch_id back as a discovered partition column.
        t0 = time.time()
        batch_df.persist()
        batch_df.write.mode("overwrite").parquet(
            os.path.join(data_dir, f"batch_id={int(batch_id)}")
        )
        agg = batch_df.agg(
            F.count("*").alias("n_turns"),
            F.sum((F.col("status") == "ok").cast("long")).alias("n_ok"),
            F.sum((F.col("status") == "fallback").cast("long")).alias("n_fallback"),
        ).collect()[0]
        batch_df.unpersist()
        spark.createDataFrame(
            [(agg["n_turns"] or 0, agg["n_ok"] or 0,
              agg["n_fallback"] or 0, round(time.time() - t0, 3), time.time())],
            "n_turns long, n_ok long, n_fallback long, "
            "wall_sec double, committed_at double",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(lineage_dir, f"batch_id={int(batch_id)}")
        )

    q = (
        extracted.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_turn_rate(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed per-role turn counts with a late-data
    watermark — the streaming twin of the batch A13/A1 reductions.

    State is bounded by the watermark: windows older than (max event
    time - watermark) are finalized and their state dropped, so the
    aggregation runs indefinitely at 10^12-turn scale.  Late turns
    inside the watermark still update their window (per-turn
    extraction is order-independent, so correctness only needs the
    window accounting, not global ordering)."""
    from pyspark.sql import functions as SF

    return (
        stream.withWatermark("ts", watermark)
        .groupBy(SF.window("ts", window_duration).alias("w"), SF.col("role"))
        .agg(
            SF.count("*").alias("n_turns"),
            SF.sum(SF.length("text")).alias("total_chars"),
        )
        .select(
            SF.col("w.start").alias("window_start"),
            SF.col("w.end").alias("window_end"),
            "role", "n_turns", "total_chars",
        )
    )
