"""Markup / page-dump main-content extraction queries (north_star
surface: HTML boilerplate strip + PDF layout segmentation).

Payloads are synthesized DETERMINISTICALLY from ``documents.text``
(verified properties at all SFs: no angle brackets, single-space word
separation, no leading/trailing whitespace), so the DuckDB oracle can
state the expected extraction output in closed form — while the Spark
side must genuinely parse: the boilerplate kernel scores blocks by
text/link density over real markup, and the layout kernel receives the
page lines in a scrambled order and must recover reading order from
coordinates alone.  Kernels: ocr_spark/kernels/layout.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ocr_spark.queries.catalog import _register, _t

# --------------------------------------------------------------------------
# HTML boilerplate strip
# --------------------------------------------------------------------------

_HTML_PREFIX = (
    '<html><head><style>p{margin:0}</style></head><body>'
    '<nav><a href="/">Home</a> <a href="/about">About</a></nav><p>'
)
_HTML_SUFFIX = (
    '</p><div><a href="/buy">BUY NOW</a></div>'
    "<footer>(c) 2026 Example Corp</footer></body></html>"
)
_PREFIX_LEN = len(_HTML_PREFIX)

_STRIP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("main_text", StringType()),
        StructField("n_blocks_kept", IntegerType()),
        StructField("span_start", IntegerType()),
        StructField("span_end", IntegerType()),
    ]
)


@_register(
    "html_boilerplate_strip",
    f"""
SELECT doc_id,
       text AS main_text,
       1 AS n_blocks_kept,
       {_PREFIX_LEN} AS span_start,
       {_PREFIX_LEN} + length(text) AS span_end
FROM documents
""",
)
def html_boilerplate_strip(spark, sf_dir):
    """Boilerpipe-style main-content extraction: each document wrapped
    in real markup (nav with links, ad div, footer chrome); the kernel
    must classify blocks by text/link density and keep exactly the
    content paragraph, returning its char span in the source payload.
    The oracle knows the answer in closed form because the synthesis is
    deterministic — the Spark side earns it by parsing."""
    from ocr_spark.kernels.layout import strip_boilerplate

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit(_HTML_PREFIX), F.col("text"), F.lit(_HTML_SUFFIX)).alias("html"),
    )

    def run(batches):
        for pdf in batches:
            outs = [strip_boilerplate(h) for h in pdf["html"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "main_text": [t for t, _ in outs],
                    "n_blocks_kept": [len(s) for _, s in outs],
                    "span_start": [s[0][0] if s else -1 for _, s in outs],
                    "span_end": [s[0][1] if s else -1 for _, s in outs],
                }
            )

    return d.mapInPandas(run, schema=_STRIP_SCHEMA)


# --------------------------------------------------------------------------
# PDF / OCR page-dump reading order
# --------------------------------------------------------------------------

_PDF_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ordered_text", StringType()),
        StructField("n_lines", IntegerType()),
    ]
)


@_register(
    "pdf_reading_order",
    """
SELECT doc_id, text AS ordered_text,
       CAST(len(str_split(text, ' ')) AS INTEGER) AS n_lines
FROM documents
""",
)
def pdf_reading_order(spark, sf_dir):
    """PDF layout segmentation: each document's words become one
    positioned line each, laid out in two newspaper columns
    (first half x=50, second half x=400; y = 12pt leading), then the
    line array is SCRAMBLED by a hash sort before reaching the kernel
    — which must detect the columns, cluster rows by y, and sort into
    reading order to reconstruct the original text."""
    from ocr_spark.kernels.layout import segment_page_dump

    d = _t(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("w"))
    n = F.size("w")
    half = F.ceil(n / 2).cast("int")
    lines = F.transform(
        "w",
        lambda word, i: F.struct(
            F.md5(F.concat(word, i.cast("string"))).alias("k"),
            F.when(i < half, F.lit(50.0)).otherwise(F.lit(400.0)).alias("x"),
            (F.when(i < half, i).otherwise(i - half) * 12.0).alias("y"),
            word.alias("text"),
        ),
    )
    scrambled = F.array_sort(lines)  # sorts by leading md5 key -> scrambled layout order
    d = d.select("doc_id", scrambled.alias("lines"))

    def run(batches):
        for pdf in batches:
            texts, counts = [], []
            for ls in pdf["lines"]:
                triples = [(l["x"], l["y"], l["text"]) for l in ls]
                texts.append(segment_page_dump(triples))
                counts.append(len(triples))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ordered_text": texts, "n_lines": counts}
            )

    return d.mapInPandas(run, schema=_PDF_SCHEMA)


# --------------------------------------------------------------------------
# OCR page-dump cleanup (chrome removal + dehyphenation + reflow)
# --------------------------------------------------------------------------

_OCR_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("reflowed_text", StringType()),
        StructField("n_pages", IntegerType()),
        StructField("n_chrome_removed", IntegerType()),
    ]
)


@_register(
    "ocr_page_reflow",
    """
SELECT doc_id,
       text AS reflowed_text,
       CAST(greatest(2, ceil(nw / least(20.0, ceil(nw / 2.0)))) AS INTEGER) AS n_pages,
       CAST(2 * greatest(2, ceil(nw / least(20.0, ceil(nw / 2.0)))) AS INTEGER)
         AS n_chrome_removed
FROM (SELECT doc_id, text, len(str_split(text, ' ')) AS nw FROM documents)
""",
)
def ocr_page_reflow(spark, sf_dir):
    """OCR-style page-dump cleanup — the third north_star payload
    modality.  Each document is rendered as a deterministic multi-page
    scanner dump (form-feed-separated pages, repeated header +
    ``Page k of n`` footer chrome, hard 28-char line wraps with
    end-of-line hyphenation) and the kernel must invert it: detect
    chrome by digit-masked first/last-line frequency across pages,
    join hyphenated line breaks, and reflow the wraps.  The oracle
    states the clean text and page arithmetic in closed form; the
    corpus property making the inversion exact (lowercase words only —
    no digits, hyphens, or newlines in content) is asserted by
    tests/test_layout.py.  Reference parity surface: the per-turn
    text-equality contract of the extraction pipeline."""
    from ocr_spark.kernels.layout import reflow_page_dump, render_page_dump

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def run(batches):
        for pdf in batches:
            outs = [reflow_page_dump(render_page_dump(t)) for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "reflowed_text": [o[0] for o in outs],
                    "n_pages": [o[1] for o in outs],
                    "n_chrome_removed": [o[2] for o in outs],
                }
            )

    return d.mapInPandas(run, schema=_OCR_SCHEMA)


# --------------------------------------------------------------------------
# Per-turn payload extraction over the transcript shape
# --------------------------------------------------------------------------

_TURN_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("main_text", StringType()),
        StructField("n_blocks_kept", IntegerType()),
        StructField("span_start", IntegerType()),
        StructField("span_end", IntegerType()),
    ]
)


def _register_turn_payload():
    from ocr_spark.queries.derive import with_transcripts

    @_register(
        "turn_payload_extract",
        with_transcripts(f"""
SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
       CASE WHEN nw >= 5 THEN norm ELSE '' END AS main_text,
       CAST(CASE WHEN nw >= 5 THEN 1 ELSE 0 END AS INTEGER) AS n_blocks_kept,
       CAST(CASE WHEN nw >= 5 THEN {_PREFIX_LEN} ELSE -1 END AS INTEGER) AS span_start,
       CAST(CASE WHEN nw >= 5 THEN {_PREFIX_LEN} + length(text) ELSE -1 END AS INTEGER)
         AS span_end
FROM (
  SELECT conv_id, turn_idx, text,
         trim(regexp_replace(text, '\\s+', ' ', 'g')) AS norm,
         len(str_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS nw
  FROM transcripts
)
"""),
    )
    def turn_payload_extract(spark, sf_dir):
        """The north_star sentence verbatim, over the input_hint table
        shape: "each turn's raw text payload ... pushed through ...
        boilerplate classification ... emitting cleaned main-content
        text plus character-span offsets PER TURN".  Every transcript
        turn's text is wrapped in the standard page chrome (nav, ad
        block, footer) and the Boilerpipe-style kernel classifies
        blocks by text/link density per turn — keyed by (conv_id,
        turn_idx) so per-turn text equality under stable turn ordering
        is directly checkable.  Short answers ("D", "North ...") are
        correctly classified boilerplate (min-words rule) — the oracle
        states that closed-form (kept iff >= 5 normalized words, spans
        into the raw payload).  Map-only: one Arrow batch per task, no
        shuffle (plan-guarded)."""
        from ocr_spark.kernels.layout import strip_boilerplate
        from ocr_spark.queries.derive import derived_transcripts

        t = derived_transcripts(spark, sf_dir).select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            F.concat(
                F.lit(_HTML_PREFIX), F.col("text"), F.lit(_HTML_SUFFIX)
            ).alias("html"),
        )

        def run(batches):
            for pdf in batches:
                outs = [strip_boilerplate(h) for h in pdf["html"]]
                yield pd.DataFrame(
                    {
                        "conv_id": pdf["conv_id"],
                        "turn_idx": pdf["turn_idx"],
                        "main_text": [t for t, _ in outs],
                        "n_blocks_kept": [len(s) for _, s in outs],
                        "span_start": [s[0][0] if s else -1 for _, s in outs],
                        "span_end": [s[0][1] if s else -1 for _, s in outs],
                    }
                )

        return t.mapInPandas(run, schema=_TURN_SCHEMA)


_register_turn_payload()
