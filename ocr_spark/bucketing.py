"""Bucketed (co-located) equi-joins — the shuffle-free fact-fact join
layout for the 100 TB deployment.

Broadcast handles the small-dimension joins (J1/J2) and AQE handles
runtime skew, but a fact-to-fact equi-join — turns joined back to
per-conversation annotations, extraction output joined to a prior
run's output for drift diffs — shuffles BOTH sides on every query.
Pre-bucketing the tables by the join key at write time
(``bucketBy(n, key)`` + ``saveAsTable``) makes every subsequent join
on that key exchange-free: Spark zips bucket *i* of A with bucket *i*
of B task-locally, so the join cost is a scan, not a shuffle, no
matter how many times the table is re-joined.  This is the batch
analog of Iceberg's bucket partition transform (the deployment target
named in BASELINE.json) — the same hash, the same layout contract.

Operational notes encoded here rather than left to callers:

- both sides must use the SAME bucket count (or integer multiples,
  which Spark 3.1+ coalesces); the helper defaults everything to one
  module constant so mismatches don't creep in per call site;
- ``sortBy`` the join key inside each bucket: when a bucket is a
  single file Spark elides SortMergeJoin's per-task sort too; with
  several files per bucket (parallel writers) it keeps a cheap
  in-task merge sort — the Exchange stays gone either way, which is
  the part that matters at scale;
- bucket pruning: an equality predicate on the bucket key prunes to
  one bucket file per partition at scan time (``SelectedBucketsCount``
  in the plan), the same effect partition pruning gives coarse keys.

The pytest (tests/test_bucketing.py) pins the plan contract: a
bucketed-bucketed join has NO Exchange anywhere, and results equal the
plain shuffled join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: default bucket count — one bucket per expected executor-wave task.
#: At 100 TB this is sized once per table family (buckets should be
#: several hundred MB each), never per query.
DEFAULT_BUCKETS = 16


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "conv_id",
    buckets: int = DEFAULT_BUCKETS,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table (metastore-backed).

    ``path`` makes it an external table (data under ``path``, metadata
    in the metastore) — pass a location inside the run's output area;
    without it the session's ``spark.sql.warehouse.dir`` applies.
    The bucket file layout is the join co-location contract; the
    in-bucket ``sortBy(key)`` additionally lets SortMergeJoin skip its
    per-task sort whenever a bucket lands as one file.
    """
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str = "conv_id",
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    Plain ``DataFrame.join`` — the co-location is a property of the
    table layout, not of query-side hints; this helper only exists so
    call sites read as intent ("this join is exchange-free by layout")
    and the pytest has one seam to plan-guard.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
