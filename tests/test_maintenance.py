"""Small-file compaction: row-multiset preservation, file-count
reduction, no-op guard, and crash-window recovery in every state."""

import os
import shutil

from pyspark.sql import functions as F

from ocr_spark.maintenance import (
    compact_parquet_dir,
    recover_compaction,
)


def _write_fragmented(spark, path: str, n_rows: int = 2000, n_files: int = 40):
    df = spark.range(n_rows).select(
        F.col("id"),
        F.format_string("conv%08d", F.col("id") % 97).alias("conv_id"),
        F.sha1(F.col("id").cast("string")).alias("payload"),
    )
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return df


def _rows(spark, path):
    return sorted(
        (r["id"], r["conv_id"], r["payload"])
        for r in spark.read.parquet(path).collect()
    )


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    _write_fragmented(spark, path)
    want = _rows(spark, path)

    stats = compact_parquet_dir(spark, path, target_file_bytes=10**9)
    assert stats["skipped"] is False and stats["rows"] == 2000
    assert stats["files_before"] == 40 and stats["files_after"] == 1
    assert _rows(spark, path) == want
    # no leftover work dirs
    assert not os.path.exists(path + ".__compact_tmp")
    assert not os.path.exists(path + ".__compact_bak")


def test_compaction_is_noop_below_threshold(spark, tmp_path):
    path = str(tmp_path / "small")
    spark.range(10).coalesce(1).write.parquet(path)
    stats = compact_parquet_dir(spark, path)
    assert stats["skipped"] is True
    assert stats["files_after"] == stats["files_before"]


def test_target_size_splits_output(spark, tmp_path):
    """A target below total bytes must produce multiple output files
    (ceil(total/target)), not one giant file."""
    path = str(tmp_path / "split")
    _write_fragmented(spark, path)
    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path) if f.endswith(".parquet")
    )
    stats = compact_parquet_dir(spark, path, target_file_bytes=total // 4 + 1)
    assert stats["skipped"] is False
    assert 2 <= stats["files_after"] <= 6


def test_recovery_every_crash_state(spark, tmp_path):
    path = str(tmp_path / "crashy")
    _write_fragmented(spark, path, n_rows=200, n_files=8)
    want = _rows(spark, path)
    tmp, bak = path + ".__compact_tmp", path + ".__compact_bak"

    # state 1: crash BEFORE the first rename (tmp written, dir intact)
    shutil.copytree(path, tmp)
    assert recover_compaction(path) == "clean"
    assert not os.path.exists(tmp) and _rows(spark, path) == want

    # state 2: crash BETWEEN the renames (dir moved to bak, tmp ready)
    shutil.copytree(path, tmp)
    os.rename(path, bak)
    assert recover_compaction(path) == "rolled_back"
    assert _rows(spark, path) == want
    assert not os.path.exists(tmp) and not os.path.exists(bak)

    # state 3: crash AFTER the second rename (compacted live, bak left)
    shutil.copytree(path, bak)
    assert recover_compaction(path) == "finalized"
    assert _rows(spark, path) == want and not os.path.exists(bak)

    # recovery is idempotent
    assert recover_compaction(path) == "clean"


def test_direct_compact_self_recovers_stale_bak(spark, tmp_path):
    """A crash in the post-swap window leaves .__compact_bak behind; a
    DIRECT compact_parquet_dir call (no explicit recover) must resolve
    it and proceed instead of failing ENOTEMPTY on the rename."""
    path = str(tmp_path / "stale")
    _write_fragmented(spark, path, n_rows=300, n_files=6)
    want = _rows(spark, path)
    shutil.copytree(path, path + ".__compact_bak")  # 'finalized' crash state

    stats = compact_parquet_dir(spark, path, target_file_bytes=10**9)
    assert stats["skipped"] is False and stats["files_after"] == 1
    assert _rows(spark, path) == want
    assert not os.path.exists(path + ".__compact_bak")


def test_merge_upsert_update_insert_delete(spark, tmp_path):
    """One change batch: key 3 updated in place, key 100 inserted,
    key 7 tombstoned — everything else passes through untouched."""
    from ocr_spark.maintenance import merge_upsert

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, f"row{i}") for i in range(10)], "doc_id long, text string"
    ).repartition(3).write.parquet(path)

    changes = spark.createDataFrame(
        [(3, "row3-v2", False), (100, "row100", False), (7, None, True)],
        "doc_id long, text string, _deleted boolean",
    )
    stats = merge_upsert(spark, path, changes)
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(path).collect()}

    want = {i: f"row{i}" for i in range(10) if i != 7}
    want[3] = "row3-v2"
    want[100] = "row100"
    assert got == want
    assert stats["rows_before"] == 10 and stats["rows_after"] == 10
    assert stats["n_upserts"] == 2 and stats["n_deletes"] == 1


def test_merge_upsert_target_never_shuffles(spark, tmp_path):
    """The anti-join must broadcast the change keys: no hash exchange
    of the target side in the plan merge_upsert actually constructs
    (asserted on merge_plan, the exact DataFrame the merge writes)."""
    from ocr_spark.maintenance import merge_plan

    path = str(tmp_path / "tbl2")
    spark.createDataFrame(
        [(i, f"r{i}") for i in range(50)], "doc_id long, text string"
    ).write.parquet(path)
    changes = spark.createDataFrame(
        [(1, "x", False)], "doc_id long, text string, _deleted boolean"
    )
    merged = merge_plan(
        spark.read.parquet(path), changes, "doc_id", "_deleted"
    )
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        merged.explain()
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "Exchange hashpartitioning" not in p


def test_merge_upsert_null_delete_flag_is_upsert(spark, tmp_path):
    """A change row with a NULL delete flag is an UPSERT, never a
    silent delete: its key must survive with the new value, and
    n_deletes must not count it."""
    from ocr_spark.maintenance import merge_upsert

    path = str(tmp_path / "tbl3")
    spark.createDataFrame(
        [(i, f"row{i}") for i in range(4)], "doc_id long, text string"
    ).write.parquet(path)
    changes = spark.createDataFrame(
        [(2, "row2-v2", None), (3, None, True)],
        "doc_id long, text string, _deleted boolean",
    )
    stats = merge_upsert(spark, path, changes)
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(path).collect()}
    assert got == {0: "row0", 1: "row1", 2: "row2-v2"}
    assert stats["n_upserts"] == 1 and stats["n_deletes"] == 1


def test_merge_upsert_recovers_prior_crash_window(spark, tmp_path):
    """A crash between the two swap renames leaves the table at
    <path>.__compact_bak with <path> missing; the next merge_upsert
    must roll that back first and then apply its changes normally."""
    import os

    from ocr_spark.maintenance import merge_upsert

    path = str(tmp_path / "tbl4")
    spark.createDataFrame(
        [(i, f"row{i}") for i in range(3)], "doc_id long, text string"
    ).write.parquet(path)
    os.rename(path, path + ".__compact_bak")  # simulate the crash window

    changes = spark.createDataFrame(
        [(1, "row1-v2", False)], "doc_id long, text string, _deleted boolean"
    )
    stats = merge_upsert(spark, path, changes)
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(path).collect()}
    assert got == {0: "row0", 1: "row1-v2", 2: "row2"}
    assert stats["rows_before"] == 3 and not os.path.exists(path + ".__compact_bak")
