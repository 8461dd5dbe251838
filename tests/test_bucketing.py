"""Bucketed co-located joins + AQE skew-join splitting — plan-level
evidence for the two shuffle strategies the 100 TB design names
(SURVEY §4 / session.py AQE confs) that no catalog query exercises
directly."""

import contextlib
import io
import shutil

import pytest

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


@contextlib.contextmanager
def _conf(spark, **kv):
    """Set session confs, restore afterwards (shared session fixture)."""
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    from ocr_spark.bucketing import write_bucketed
    from ocr_spark.synth import transcripts

    t = transcripts(spark, 200, seed=42, skew=False)
    ann = (
        t.groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"), F.max("ts").alias("last_ts"))
    )
    write_bucketed(t, "bt_turns", path=str(tmp_path / "bt_turns"))
    write_bucketed(ann, "bt_ann", path=str(tmp_path / "bt_ann"))
    yield "bt_turns", "bt_ann"
    spark.sql("DROP TABLE IF EXISTS bt_turns")
    spark.sql("DROP TABLE IF EXISTS bt_ann")


def test_bucketed_join_has_no_exchange_and_no_sort(spark, bucketed_tables):
    """Two tables bucketed+sorted on conv_id join with NO Exchange and
    NO per-task Sort — the layout IS the shuffle, paid once at write
    time.  Broadcast is disabled so the plan can't cheat its way out;
    result equality vs the plain shuffled join closes the loop."""
    from ocr_spark.bucketing import bucketed_join

    left, right = bucketed_tables
    with _conf(spark, spark__sql__autoBroadcastJoinThreshold="-1"):
        j = bucketed_join(spark, left, right)
        p = _plan(j)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p
        assert "Bucketed: true" in p
        got = sorted(
            (r["conv_id"], r["turn_idx"], r["n_turns"]) for r in j.collect()
        )

    plain = (
        spark.table(left)
        .join(spark.table(right).hint("shuffle_hash"), "conv_id")
    )
    want = sorted(
        (r["conv_id"], r["turn_idx"], r["n_turns"]) for r in plain.collect()
    )
    assert got == want and len(got) == 600


def test_bucket_pruning_on_key_equality(spark, bucketed_tables):
    """An equality predicate on the bucket key prunes the scan to ONE
    bucket (SelectedBucketsCount: 1 out of N) — the bucket analog of
    partition pruning."""
    left, _ = bucketed_tables
    # a bare filter gives Spark no join/agg reason to keep the bucketed
    # scan, and autoBucketedScan then drops pruning with it — disable
    # the auto-off so the pruning contract is visible
    with _conf(
        spark, spark__sql__sources__bucketing__autoBucketedScan__enabled="false"
    ):
        p = _plan(spark.table(left).filter(F.col("conv_id") == "conv00000007"))
    assert "SelectedBucketsCount: 1 out of" in p


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    """AQE skew-join handling (session.py enables it; this pins that it
    actually fires): a join where one conv_id owns ~90% of the rows
    gets its skewed partition split at runtime — the executed plan
    marks the SortMergeJoin with ``skew=true`` — once the skew
    thresholds are scaled down to test-sized data.  At production
    sizes the default 256 MB threshold plays the same role."""
    from ocr_spark.synth import transcripts

    base = transcripts(spark, 40, seed=42, skew=False)
    # one giant conversation: replicate conv00000000's turns 3000x
    giant = (
        base.filter(F.col("conv_id") == "conv00000000")
        .crossJoin(spark.range(3000).select(F.lit(1).alias("one")))
        .drop("one")
    )
    skewed = base.unionByName(giant)
    left_path = str(tmp_path / "skew_left")
    skewed.write.parquet(left_path)
    dim = base.select("conv_id").distinct().withColumn("tag", F.lit("x"))
    right_path = str(tmp_path / "skew_right")
    # pad the dim side so neither side is broadcastable-sized
    dim.crossJoin(spark.range(200).select(F.col("id").alias("pad"))).write.parquet(
        right_path
    )

    with _conf(
        spark,
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes="32k",
        spark__sql__adaptive__advisoryPartitionSizeInBytes="16k",
        spark__sql__adaptive__skewJoin__skewedPartitionFactor="2",
        spark__sql__adaptive__coalescePartitions__minPartitionSize="1k",
    ):
        j = spark.read.parquet(left_path).join(
            spark.read.parquet(right_path), "conv_id"
        )
        n = len(j.collect())  # execute THIS plan instance so AQE finalizes
        p = _plan(j)
        assert "isFinalPlan=true" in p
        final = p.split("== Initial Plan ==")[0]
        assert "skew=true" in final, final
    assert n > 0


def teardown_module(module):
    # saveAsTable leaves a derby metastore + warehouse dir in cwd on
    # first use; they are gitignored but keep the tree tidy anyway.
    shutil.rmtree("metastore_db", ignore_errors=True)


def test_ts_date_partition_pruning(spark, tmp_path):
    """input_hint names ts as the partition-pruning key: a date(ts)
    partitioned layout must prune at the SCAN (PartitionFilters carry
    the predicate; only matching partition dirs are listed)."""
    from ocr_spark.synth import transcripts

    path = str(tmp_path / "by_date")
    # synth ts all fall on one day; spread conversations over 5 dates
    # (key-derived, deterministic) so pruning has something to prune
    t = transcripts(spark, 200, seed=42, skew=False).withColumn(
        "dt", F.date_add(F.to_date("ts"), F.pmod(F.xxhash64("conv_id"), F.lit(5)).cast("int"))
    )
    t.write.partitionBy("dt").mode("overwrite").parquet(path)

    df = spark.read.parquet(path).filter(F.col("dt") == "2024-01-01")
    p = _plan(df)
    assert "PartitionFilters" in p and "2024-01-01" in p.split("PartitionFilters")[1].split("]")[0]
    # row correctness: the pruned read equals the unpartitioned filter
    want = t.filter(F.col("dt") == "2024-01-01").count()
    assert 0 < want < t.count()
    assert df.count() == want
