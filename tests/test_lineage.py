"""Checkpoint/resume + lineage tests (SURVEY.md §5 resume tests).

Kill after partition-batch k, restart, assert no bucket is
reprocessed (lineage/manifest unchanged for committed buckets) and the
final table equals the single-run table.
"""

import os

import pytest
from pyspark.sql import functions as F

from ocr_spark.lineage import CheckpointedExtraction, read_manifest
from ocr_spark.pipeline import extract_conversations
from ocr_spark.synth import transcripts

N_CONVS = 200
N_BUCKETS = 8


@pytest.fixture()
def ckpt(spark, tmp_path):
    c = CheckpointedExtraction(spark, str(tmp_path / "run"), n_buckets=N_BUCKETS)
    c.stage_by_bucket(transcripts(spark, N_CONVS, seed=42))
    return c


def _rows(df):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["clean_text"], r["block_class"],
         r["answer"], r["status"], r["n_tokens"])
        for r in df.collect()
    )


def test_kill_restart_no_reprocessing(spark, ckpt):
    with pytest.raises(RuntimeError, match="injected failure"):
        ckpt.run(fail_after=3)

    m1 = read_manifest(ckpt.output_dir)
    assert len(m1["committed"]) == 3
    lineage1 = {
        r["bucket"]: r["committed_at"] for r in ckpt.read_lineage().collect()
    }
    assert set(lineage1) == set(m1["committed"])

    # restart: fresh object, same output dir
    resumed = CheckpointedExtraction(spark, ckpt.output_dir, n_buckets=N_BUCKETS)
    assert sorted(resumed.pending_buckets()) == [
        b for b in range(N_BUCKETS) if b not in m1["committed"]
    ]
    stats = resumed.run()
    assert len(stats) == N_BUCKETS - 3

    m2 = read_manifest(ckpt.output_dir)
    assert m2["committed"] == list(range(N_BUCKETS))
    lineage2 = {
        r["bucket"]: r["committed_at"] for r in resumed.read_lineage().collect()
    }
    # committed buckets were not reprocessed: their lineage rows survive
    # byte-identically (same commit timestamp), and exactly one row per bucket
    assert len(lineage2) == N_BUCKETS
    for b, ts in lineage1.items():
        assert lineage2[b] == ts


def test_resumed_output_equals_single_run(spark, ckpt):
    with pytest.raises(RuntimeError):
        ckpt.run(fail_after=2)
    resumed = CheckpointedExtraction(spark, ckpt.output_dir, n_buckets=N_BUCKETS)
    resumed.run()

    single = extract_conversations(transcripts(spark, N_CONVS, seed=42))
    assert _rows(resumed.read_output()) == _rows(single)


def test_lineage_counters_conserve_turns(spark, ckpt):
    ckpt.run()
    lin = ckpt.read_lineage()
    totals = lin.agg(
        F.sum("n_turns").alias("t"), F.sum("n_ok").alias("ok"),
        F.sum("n_fallback").alias("fb"), F.sum("n_convs").alias("c"),
    ).collect()[0]
    t = transcripts(spark, N_CONVS, seed=42)
    assert totals["t"] == t.count()
    assert totals["ok"] + totals["fb"] == totals["t"]
    assert totals["c"] == N_CONVS
    assert lin.count() == N_BUCKETS
    assert all(r["wall_sec"] >= 0 for r in lin.collect())


def test_idempotent_rerun_is_noop(spark, ckpt):
    ckpt.run()
    lineage_before = sorted(
        (r["bucket"], r["committed_at"]) for r in ckpt.read_lineage().collect()
    )
    again = CheckpointedExtraction(spark, ckpt.output_dir, n_buckets=N_BUCKETS)
    assert again.pending_buckets() == []
    assert again.run() == []
    lineage_after = sorted(
        (r["bucket"], r["committed_at"]) for r in again.read_lineage().collect()
    )
    assert lineage_before == lineage_after


def test_bucket_count_mismatch_rejected(spark, ckpt):
    ckpt.run()
    other = CheckpointedExtraction(spark, ckpt.output_dir, n_buckets=4)
    with pytest.raises(ValueError, match="n_buckets"):
        other.pending_buckets()


def test_step_checkpoint_resume(spark, tmp_path):
    """S4: step-stamped checkpoint scan (reference train_lee.py:199-203
    resume-by-latest-step): save two synthetic steps, plant an orphan
    uncommitted step dir (crash between write and manifest commit),
    and assert the reader resumes from the latest COMMITTED step."""
    from ocr_spark.lineage import StepCheckpoint

    ck = StepCheckpoint(spark, str(tmp_path / "ckpt"))
    with pytest.raises(ValueError, match="no committed steps"):
        ck.load_latest()

    v0 = spark.createDataFrame([(i, float(i) / 10) for i in range(20)], "cid int, v double")
    v1 = spark.createDataFrame([(i, float(i) / 5) for i in range(20)], "cid int, v double")
    ck.save(v0, step=100)
    ck.save(v1, step=200)
    assert ck.steps() == [100, 200]

    # crash-orphan: parquet written but never committed to the manifest
    v1.write.mode("overwrite").parquet(os.path.join(ck.ckpt_dir, "step_300"))
    assert ck.latest_step() == 200

    # a fresh reader (restart) resumes from step 200, not the orphan
    resumed = StepCheckpoint(spark, ck.ckpt_dir)
    got = sorted((r["cid"], r["v"]) for r in resumed.load_latest().collect())
    want = sorted((r["cid"], r["v"]) for r in v1.collect())
    assert got == want
    assert sorted((r["cid"], r["v"]) for r in resumed.load(100).collect()) == sorted(
        (r["cid"], r["v"]) for r in v0.collect()
    )
    with pytest.raises(ValueError, match="not committed"):
        resumed.load(300)


def test_parquet_writer_seam_identical(spark, ckpt):
    """The SnapshotWriter seam (ocr_spark/iceberg.py) must not change the
    on-disk layout: data under data/bucket=<b>/ per committed bucket,
    exactly one lineage parquet part-file under lineage/bucket=<b>/ —
    the pre-seam CheckpointedExtraction contract, byte-layout pinned."""
    from ocr_spark.iceberg import ParquetSnapshotWriter

    assert isinstance(ckpt.writer, ParquetSnapshotWriter)  # the default
    ckpt.run()
    for b in range(N_BUCKETS):
        ddir = os.path.join(ckpt.output_dir, "data", f"bucket={b}")
        ldir = os.path.join(ckpt.output_dir, "lineage", f"bucket={b}")
        assert os.path.exists(os.path.join(ddir, "_SUCCESS"))
        parts = [f for f in os.listdir(ldir) if f.startswith("part-")]
        assert len(parts) == 1, f"lineage bucket={b} must be one part-file"
    # consumers route through the writer and see the same manifest-filtered view
    m = read_manifest(ckpt.output_dir)
    direct = spark.read.parquet(
        *[os.path.join(ckpt.output_dir, "data", f"bucket={b}") for b in m["committed"]]
    )
    assert _rows(ckpt.read_output()) == _rows(direct)


def test_iceberg_writer_import_guarded(spark):
    """IcebergSnapshotWriter must fail fast (constructor, not mid-commit)
    when the iceberg-spark runtime jar is absent — as in this sandbox."""
    from ocr_spark.iceberg import IcebergSnapshotWriter, iceberg_runtime_available

    assert not iceberg_runtime_available(spark)  # sandbox has no jar
    with pytest.raises(RuntimeError, match="iceberg-spark runtime"):
        IcebergSnapshotWriter(spark, "cat.db.data", "cat.db.lineage")


def test_iceberg_writer_call_contract(spark, monkeypatch):  # noqa: ARG001 — spark only provides the active context Column exprs need
    """The Iceberg runtime jar does not exist in this sandbox, so the
    ~45 lines of IcebergSnapshotWriter can never run against a live
    catalog here (README/VERDICT residual).  What CAN be pinned without
    the jar is the call contract those lines make — the part a typo
    would silently break for a user with a real catalog: data commits
    stamp the bucket column and go through
    writeTo(data_table).overwritePartitions() (dynamic-partition
    overwrite = retry-idempotent per bucket), lineage rows stamp the
    bucket and go through writeTo(lineage_table).append(), and
    read_output filters the catalog table to the committed buckets."""
    from ocr_spark import iceberg as ice

    calls = []

    class FakeWriteTo:
        def __init__(self, table):
            self.table = table

        def overwritePartitions(self):
            calls.append(("overwritePartitions", self.table))

        def append(self):
            calls.append(("append", self.table))

    class FakeDF:
        def __init__(self, cols=()):
            self.cols = dict(cols)

        def withColumn(self, name, col):
            d = FakeDF(self.cols)
            d.cols[name] = col
            calls.append(("withColumn", name, str(col)))
            return d

        def writeTo(self, table):
            calls.append(("writeTo", table))
            return FakeWriteTo(table)

        def filter(self, cond):
            calls.append(("filter", str(cond)))
            return self

    class FakeSpark:
        def table(self, name):
            calls.append(("table", name))
            return FakeDF()

    monkeypatch.setattr(ice, "iceberg_runtime_available", lambda s: True)
    w = ice.IcebergSnapshotWriter(FakeSpark(), "cat.db.data", "cat.db.lineage")

    w.write_bucket_data(FakeDF(), bucket=7)
    assert calls[-2:] == [("writeTo", "cat.db.data"),
                          ("overwritePartitions", "cat.db.data")]
    assert ("withColumn", "bucket", str(F.lit(7))) in calls

    calls.clear()
    w.write_lineage_row(FakeDF(), bucket=3)
    assert calls[-2:] == [("writeTo", "cat.db.lineage"),
                          ("append", "cat.db.lineage")]
    assert ("withColumn", "bucket", str(F.lit(3))) in calls

    calls.clear()
    w.read_output([1, 4])
    assert calls[0] == ("table", "cat.db.data")
    assert calls[1][0] == "filter" and "in(bucket, 1, 4)" in calls[1][1]

    calls.clear()
    w.read_lineage()
    assert calls == [("table", "cat.db.lineage")]

    # the empty-committed guard mirrors the parquet writer's
    with pytest.raises(ValueError):
        w.read_output([])

    # and WITHOUT the patch the constructor refuses (no jar here) —
    # probed against the REAL session, the exact deployment error path
    monkeypatch.undo()
    with pytest.raises(RuntimeError, match="iceberg-spark runtime"):
        ice.IcebergSnapshotWriter(spark, "a", "b")
