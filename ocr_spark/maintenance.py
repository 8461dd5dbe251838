"""Output-layout maintenance: small-file compaction + keyed MERGE.

A resumable extraction run (lineage.CheckpointedExtraction) and the
streaming sinks commit output per bucket / per micro-batch, which is
exactly-once-correct but accumulates many small parquet files — the
classic small-file problem that degrades every downstream scan at
100 TB (driver-side file listing, one task per tiny split, row-group
overhead).  Real deployments run a table-maintenance pass (Iceberg's
``rewrite_data_files``); this module is the parquet-layout analog,
kept deliberately simple and crash-safe:

1. size the directory (driver-side listing of data files only),
2. rewrite into ``ceil(total_bytes / target_file_bytes)`` files via a
   ``repartition`` round-robin (NOT ``coalesce``: coalesce collapses
   upstream parallelism so a 10k-file read would be re-scanned by a
   handful of tasks; the narrow win is not worth the lost read
   parallelism, and compaction is a rewrite anyway),
3. commit atomically: write to ``<dir>.__compact_tmp``, swap via two
   renames with the original kept at ``<dir>.__compact_bak`` until the
   swap succeeds.

Compaction is layout-only by contract: row multiset in == row multiset
out (pinned by tests/test_maintenance.py, along with crash-window
recovery via :func:`recover_compaction`).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

#: default compacted file size — parquet works best at 128M-1G; the
#: default errs small so tests exercise multi-file output.
DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _data_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _data_file_count(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _small_file_count(path: str, threshold_bytes: int) -> int:
    """Data files strictly smaller than ``threshold_bytes`` — the
    fragmentation signal compaction exists to remove."""
    n = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                if os.path.getsize(os.path.join(root, f)) < threshold_bytes:
                    n += 1
    return n


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    Returns a stats dict (files/bytes before and after, rows, skipped
    flag) suitable for a lineage/metrics row.  No-op (skipped=True)
    when the directory already has fewer than ``min_files_to_compact``
    data files or fewer files than the target implies.

    Partition-column layouts (``key=value`` subdirectories, e.g. the
    streaming sink's ``batch_id=N``) are rewritten FLAT: partition
    columns read back as regular columns and are preserved as data,
    but the directory partitioning — whose per-partition file split is
    the very fragmentation being removed — is not recreated.  Callers
    that still want partition pruning afterwards should compact each
    partition directory separately.
    """
    # self-recover first: a crash in a previous compaction's swap window
    # otherwise leaves a .__compact_bak that makes os.rename(path, bak)
    # fail with ENOTEMPTY on every subsequent attempt
    recover_compaction(path)

    before_bytes = _data_bytes(path)
    before_files = _data_file_count(path)
    n_out = max(1, -(-before_bytes // max(target_file_bytes, 1)))
    # Skip on a FRAGMENTATION signal, not a size one: comparing file
    # count to ceil(bytes/target) mis-skips e.g. 1x5GB + 39 tiny files
    # at a 128MB target (n_out=41 > 40), exactly the small-file mess
    # this pass exists to remove.  Compact whenever enough sub-target
    # fragments exist; a directory of all >= target files is compact.
    small_files = _small_file_count(path, target_file_bytes)
    if small_files < min_files_to_compact:
        return {
            "path": path, "skipped": True,
            "files_before": before_files, "files_after": before_files,
            "bytes_before": before_bytes, "bytes_after": before_bytes,
        }

    tmp = path.rstrip("/") + ".__compact_tmp"
    bak = path.rstrip("/") + ".__compact_bak"
    shutil.rmtree(tmp, ignore_errors=True)

    df = spark.read.parquet(path)
    n_rows = df.count()
    df.repartition(int(n_out)).write.mode("overwrite").parquet(tmp)

    # atomic-enough swap: both renames are metadata ops on one
    # filesystem; a crash between them leaves <bak> present, which
    # recover_compaction() resolves deterministically.
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)

    return {
        "path": path, "skipped": False, "rows": n_rows,
        "files_before": before_files, "files_after": _data_file_count(path),
        "bytes_before": before_bytes, "bytes_after": _data_bytes(path),
    }


def recover_compaction(path: str) -> str:
    """Resolve a crash mid-swap.  Idempotent; returns the action taken.

    States (tmp = ``.__compact_tmp``, bak = ``.__compact_bak``):

    - dir present, no bak: nothing to do (``"clean"``; a leftover tmp
      from a crash before the first rename is deleted).
    - bak present AND dir present: crash after the second rename but
      before bak cleanup — the compacted dir is live; drop bak
      (``"finalized"``).
    - bak present, dir absent: crash between the renames — restore the
      original by renaming bak back (``"rolled_back"``; a leftover tmp
      is deleted, the compaction simply re-runs later).
    """
    tmp = path.rstrip("/") + ".__compact_tmp"
    bak = path.rstrip("/") + ".__compact_bak"
    if os.path.exists(bak):
        if os.path.exists(path):
            shutil.rmtree(bak)
            return "finalized"
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
        os.rename(bak, path)
        return "rolled_back"
    shutil.rmtree(tmp, ignore_errors=True)
    return "clean"


def merge_plan(target, changes, key: str, delete_col: str,
               broadcast_changes: bool = True):
    """Build the merged DataFrame :func:`merge_upsert` writes.

    Exposed separately so the no-target-shuffle plan shape can be
    asserted on the exact DataFrame the merge constructs
    (tests/test_maintenance.py explains this, not a hand copy).  A
    NULL ``delete_col`` is treated as false (an upsert): ``~NULL`` is
    NULL, and a bare ``filter(~col)`` would silently drop the row from
    the upsert side while its key still anti-joins the target row away
    — data loss disguised as a delete.
    """
    from pyspark.sql import functions as F

    data_cols = target.columns
    ck = changes.select(key)
    if broadcast_changes:
        ck = F.broadcast(ck)
    kept = target.join(ck, on=key, how="left_anti")
    is_delete = F.coalesce(F.col(delete_col), F.lit(False))
    upserts = changes.filter(~is_delete).select(*data_cols)
    return kept.unionByName(upserts)


def merge_upsert(
    spark: SparkSession,
    path: str,
    changes,
    key: str = "doc_id",
    delete_col: str = "_deleted",
    broadcast_changes: bool = True,
    with_counts: bool = True,
) -> dict:
    """MERGE INTO analog on the parquet snapshot seam: apply one keyed
    change batch — full-row upserts plus tombstone deletes — to a
    parquet table as a single atomic snapshot swap (Iceberg
    ``MERGE INTO`` / copy-on-write semantics, same two-rename protocol
    as :func:`compact_parquet_dir`, so :func:`recover_compaction`
    resolves a crash in the swap window for both operations).

    ``changes`` carries the target's full schema plus a boolean
    ``delete_col``: rows with it true remove their key from the table;
    the rest — including rows where the flag is NULL — replace the
    matching target row wholesale (or insert when the key is new).
    Keys must be unique within a batch — enforce upstream;
    last-writer-wins dedup belongs to the producer.

    Shape at 100 TB: the target is NEVER shuffled — matched rows leave
    via one ``left_anti`` join against the change-key set (broadcast by
    default; pass ``broadcast_changes=False`` for change batches too
    big to broadcast, letting AQE pick the join) — and the rewrite is a
    scan + union + write.  Copy-on-write rewrites the whole table, the
    honest cost of a parquet-only seam; a deployment with the Iceberg
    runtime jar gets file-level overwrite through
    ``iceberg.IcebergSnapshotWriter`` instead.  Change-batch stats come
    from ONE aggregate over ``changes``; the before/after table counts
    cost one scan of each snapshot and are observability-only — pass
    ``with_counts=False`` to skip them on tables where two extra scans
    matter.
    """
    from pyspark.sql import functions as F

    recover_compaction(path)
    target = spark.read.parquet(path)
    merged = merge_plan(target, changes, key, delete_col, broadcast_changes)

    is_delete = F.coalesce(F.col(delete_col), F.lit(False))
    agg = changes.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(is_delete.cast("long")).alias("d"),
    ).first()
    n_changes = agg["n"]
    n_deletes = agg["d"] or 0
    rows_before = target.count() if with_counts else None

    tmp = path.rstrip("/") + ".__compact_tmp"
    bak = path.rstrip("/") + ".__compact_bak"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(tmp)
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)

    rows_after = spark.read.parquet(path).count() if with_counts else None
    return {
        "path": path, "rows_before": rows_before, "rows_after": rows_after,
        "n_changes": n_changes, "n_deletes": n_deletes,
        "n_upserts": n_changes - n_deletes,
    }


# ---------------------------------------------------------------------------
# Bucketed copy-on-write MERGE
# ---------------------------------------------------------------------------
# merge_upsert rewrites the WHOLE table per change batch — the honest
# cost of a flat parquet snapshot, but a full-table write at 100 TB for
# a 0.01% change batch is the one remaining full-table cost in the CDC
# path.  Laying the table out as hash-bucket DIRECTORIES (the directory
# analog of Iceberg's bucket partition transform, same pmod(xxhash64)
# family as bucketing.py's metastore layout) lets MERGE rewrite ONLY
# the buckets whose keys changed: the other bucket directories are
# never read, never written, byte-identical after the merge — the
# file-level pruning that makes Iceberg copy-on-write affordable.

#: directory partition column carrying the bucket id (key=value layout)
BUCKET_COL = "_bucket"
_BUCKET_MANIFEST = "_buckets.json"


def _bucket_expr(key: str, n_buckets: int):
    from pyspark.sql import functions as F

    return F.pmod(F.xxhash64(F.col(key).cast("string")),
                  F.lit(n_buckets)).cast("int")


def write_bucketed_snapshot(
    spark: SparkSession,
    df,
    path: str,
    key: str = "doc_id",
    n_buckets: int = 16,
) -> dict:
    """Write ``df`` as a hash-bucketed directory snapshot.

    Layout: ``<path>/_bucket=K/*.parquet`` with
    ``K = pmod(xxhash64(key), n_buckets)``, plus a ``_buckets.json``
    manifest pinning (key, n_buckets) so every later MERGE computes the
    SAME bucket assignment — the co-location contract lives with the
    data, not in call sites.  Reading the snapshot is plain
    ``spark.read.parquet(path)`` (drop :data:`BUCKET_COL`, it is
    derivable).  Bucket count is a layout constant sized once per table
    family (buckets of several hundred MB at 100 TB), never per batch.
    """
    import json as _json

    df.withColumn(BUCKET_COL, _bucket_expr(key, n_buckets)) \
        .write.partitionBy(BUCKET_COL).mode("overwrite").parquet(path)
    with open(os.path.join(path, _BUCKET_MANIFEST), "w") as f:
        _json.dump({"key": key, "n_buckets": n_buckets}, f)
    return {"path": path, "n_buckets": n_buckets, "key": key}


def read_bucketed_snapshot(spark: SparkSession, path: str):
    """Read a bucketed snapshot back as data rows (bucket col dropped)."""
    return spark.read.parquet(path).drop(BUCKET_COL)


def merge_upsert_cow(
    spark: SparkSession,
    path: str,
    changes,
    delete_col: str = "_deleted",
    broadcast_changes: bool = True,
) -> dict:
    """Keyed MERGE on a bucketed snapshot, rewriting ONLY changed
    buckets (copy-on-write with file-level pruning).

    Semantics are identical to :func:`merge_upsert` (same
    :func:`merge_plan`: tombstone deletes, full-row upserts, NULL
    delete flag = upsert); the difference is purely which bytes move.
    Steps:

    1. recover any bucket left mid-swap by a previous crash,
    2. compute the changed-bucket set from ``changes`` (ONE distinct
       over the change batch; at most ``n_buckets`` values),
    3. read ONLY those bucket directories, merge, write the result
       partitioned by the same bucket expression to a temp dir,
    4. swap each changed bucket directory with the compaction
       two-rename protocol (crash in any window is resolved by
       :func:`recover_compaction` per bucket).

    Unchanged buckets are untouched — not read, not rewritten; the
    test pins their files byte-identical.  A crash between bucket
    swaps leaves SOME buckets merged: per-bucket swaps are atomic, the
    table is never torn within a bucket, and re-running the SAME keyed
    change batch converges (keyed MERGE is replay-idempotent — the
    already-merged buckets merge to themselves), which is exactly the
    recovery contract the streaming CDC sink (run_merge_stream)
    already relies on for replayed micro-batches.
    """
    import json as _json

    from pyspark.sql import functions as F

    with open(os.path.join(path, _BUCKET_MANIFEST)) as f:
        meta = _json.load(f)
    key, n_buckets = meta["key"], int(meta["n_buckets"])

    # 1. self-recover every bucket dir (cheap: n_buckets stat calls) and
    # drop a stale temp dir from a run that crashed before its swaps
    for b in range(n_buckets):
        recover_compaction(os.path.join(path, f"{BUCKET_COL}={b}"))
    shutil.rmtree(path.rstrip("/") + ".__merge_tmp", ignore_errors=True)

    # 2. changed buckets: bounded by n_buckets, a legitimate driver set
    changed = sorted(
        r["b"]
        for r in changes.select(
            _bucket_expr(key, n_buckets).alias("b")
        ).distinct().collect()
    )
    agg = changes.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.coalesce(F.col(delete_col), F.lit(False)).cast("long")
              ).alias("d"),
    ).first()
    stats = {
        "path": path, "n_buckets": n_buckets,
        "buckets_rewritten": changed,
        "n_changes": agg["n"], "n_deletes": agg["d"] or 0,
        "n_upserts": agg["n"] - (agg["d"] or 0),
    }
    if not changed:
        return stats

    # 3. merge ONLY the changed buckets' rows
    src_dirs = [
        os.path.join(path, f"{BUCKET_COL}={b}")
        for b in changed
        if os.path.isdir(os.path.join(path, f"{BUCKET_COL}={b}"))
    ]
    if src_dirs:
        target = spark.read.parquet(*src_dirs)
    else:  # all-new buckets (first rows hashing there)
        target = changes.drop(delete_col).limit(0)
    merged = merge_plan(target, changes, key, delete_col,
                        broadcast_changes)

    tmp = path.rstrip("/") + ".__merge_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.withColumn(BUCKET_COL, _bucket_expr(key, n_buckets)) \
        .write.partitionBy(BUCKET_COL).mode("overwrite").parquet(tmp)

    # 4. per-bucket atomic swaps (two-rename protocol per bucket)
    for b in changed:
        live = os.path.join(path, f"{BUCKET_COL}={b}")
        new = os.path.join(tmp, f"{BUCKET_COL}={b}")
        bak = live + ".__compact_bak"
        if not os.path.isdir(new):
            # bucket emptied by deletes (or never materialized):
            # partitionBy skips empty groups — drop the live dir
            if os.path.isdir(live):
                os.rename(live, bak)
                shutil.rmtree(bak)
            continue
        if os.path.isdir(live):
            os.rename(live, bak)
        os.rename(new, live)
        shutil.rmtree(bak, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return stats
