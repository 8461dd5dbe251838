"""Multimodal-column operators (binary payloads + typed metadata).

The synthetic multimodal table derives deterministically from
``documents``: each doc's text becomes an opaque ``binary`` payload
(utf-8 bytes — the stand-in for image/audio bytes) plus metadata both
engines can compute exactly (doc_id arithmetic + octet_length), so
every query has a bit-exact DuckDB oracle.  The codec-requiring decode
step is stubbed in kernels/media.py; everything here exercises the
real Spark plumbing: binary columns through Arrow batches, fixed-dim
feature arrays from a pandas UDF, frame-index expansion, metadata
pushdown-friendly projections.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ocr_spark.queries.catalog import _register, _t


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload binary, media_type, width, height,
    duration_ms): deterministic typed-metadata multimodal table."""
    d = _t(spark, sf_dir, "documents")
    mt = F.element_at(
        F.array(F.lit("png"), F.lit("jpeg"), F.lit("pdf"), F.lit("wav")),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        mt.alias("media_type"),
        ((F.col("doc_id") % 16 + 1) * 64).alias("width"),
        ((F.col("doc_id") % 9 + 1) * 64).alias("height"),
        ((F.col("doc_id") % 30 + 1) * 1000).alias("duration_ms"),
    )


_MEDIA_CTE = """
  SELECT doc_id, encode(text) AS payload,
         list_extract(['png','jpeg','pdf','wav'], CAST(doc_id % 4 AS INTEGER) + 1) AS media_type,
         (doc_id % 16 + 1) * 64 AS width,
         (doc_id % 9 + 1) * 64 AS height,
         (doc_id % 30 + 1) * 1000 AS duration_ms
  FROM documents
"""


@_register(
    "mm_metadata",
    f"""
WITH media AS ({_MEDIA_CTE})
SELECT media_type,
       count(*) AS n,
       CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
       max(width * height) AS max_pixels
FROM media
GROUP BY media_type
""",
)
def mm_metadata(spark, sf_dir):
    """Multimodal metadata scan: per-format payload stats — the
    column-pruned path (payload bytes only feed octet_length; a real
    deployment prunes the binary column entirely via parquet column
    projection when only metadata is queried)."""
    m = media_table(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max(F.col("width") * F.col("height")).alias("max_pixels"),
    )


@_register(
    "mm_frame_sample",
    f"""
WITH media AS ({_MEDIA_CTE})
SELECT doc_id, unnest(generate_series(0, CAST(duration_ms / 1000 AS BIGINT) * 4 - 1, 8)) AS frame_idx
FROM media
WHERE media_type = 'wav'
""",
)
def mm_frame_sample(spark, sf_dir):
    """Frame/stride sampling: expand each time-payload into every 8th
    frame index at 4 fps (video frame-sample plumbing; explode of a
    JVM-side sequence, no Python)."""
    m = media_table(spark, sf_dir).filter(F.col("media_type") == "wav")
    n_frames = (F.col("duration_ms") / 1000).cast("long") * 4
    return m.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(8))).alias("frame_idx"),
    )


_FEAT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_alpha", LongType()),
        StructField("n_digit", LongType()),
        StructField("n_space", LongType()),
        StructField("n_other", LongType()),
    ]
)


@_register(
    "mm_feature_extract",
    # ASCII-class counts run on the source TEXT, not on
    # CAST(payload AS VARCHAR): DuckDB renders non-ASCII blob bytes as
    # \xHH escape SEQUENCES, whose literal 'x'/hex chars inflate the
    # alpha/digit counts on any multibyte input (edge-sweep r3 finding;
    # sf0.01 is pure ASCII so it never fired there).  Char counts of
    # the ASCII classes equal their byte counts in UTF-8 — multibyte
    # code points only produce bytes >= 0x80, which land in n_other via
    # the octet_length remainder, exactly like the kernel's byte LUT.
    f"""
WITH media AS ({_MEDIA_CTE})
SELECT m.doc_id, m.media_type,
       length(regexp_replace(d.text, '[^A-Za-z]', '', 'g')) AS n_alpha,
       length(regexp_replace(d.text, '[^0-9]', '', 'g')) AS n_digit,
       length(d.text) - length(replace(replace(replace(replace(d.text, ' ', ''), chr(9), ''), chr(10), ''), chr(13), '')) AS n_space,
       octet_length(m.payload)
         - length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))
         - length(regexp_replace(d.text, '[^0-9]', '', 'g'))
         - (length(d.text) - length(replace(replace(replace(replace(d.text, ' ', ''), chr(9), ''), chr(10), ''), chr(13), ''))) AS n_other
FROM media m JOIN documents d ON d.doc_id = m.doc_id
""",
)
def mm_feature_extract(spark, sf_dir):
    """Feature extraction over binary payloads via an Arrow-batched
    pandas UDF (mapInPandas): fixed-dim byte-class counts stand in for
    decoded-media features (decode itself is the stubbed seam,
    kernels/media.py).  The batch shape — iterator of pandas frames
    with a bytes column — is exactly what a codec UDF would consume."""
    from ocr_spark.kernels.media import byte_class_counts_batch

    m = media_table(spark, sf_dir).select("doc_id", "media_type", "payload")

    def run(batches):
        for pdf in batches:
            feats = byte_class_counts_batch(list(pdf["payload"]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_alpha": feats[:, 0],
                    "n_digit": feats[:, 1],
                    "n_space": feats[:, 2],
                    "n_other": feats[:, 3],
                }
            )

    return m.mapInPandas(run, schema=_FEAT_SCHEMA)


@_register(
    "mm_format_sniff",
    """
SELECT doc_id,
       CASE WHEN starts_with(hdr_text, '%PDF-') THEN 'pdf' ELSE 'unknown' END AS sniffed
FROM (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN '%PDF-1.4' || chr(10) || text ELSE text END AS hdr_text
  FROM documents
)
""",
)
def mm_format_sniff(spark, sf_dir):
    """Magic-byte format sniffing on the payload header (the first
    bytes only — at scale this reads one parquet page per row group,
    not the full payload).  Every 3rd payload gets a real '%PDF-'
    header planted so both sniff branches are exercised; the Spark
    side sniffs actual bytes via the kernels/media.py sniffer in a
    vectorized pandas UDF."""
    from ocr_spark.kernels.media import sniff_format

    d = _t(spark, sf_dir, "documents")
    hdr_text = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.lit("%PDF-1.4\n"), F.col("text"))
    ).otherwise(F.col("text"))
    m = d.select("doc_id", F.encode(hdr_text, "utf-8").alias("payload"))

    @F.pandas_udf(StringType())
    def sniff(payloads: pd.Series) -> pd.Series:
        return payloads.map(lambda p: sniff_format(bytes(p)))

    return m.select("doc_id", sniff(F.col("payload")).alias("sniffed"))
