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


# --------------------------------------------------------------------------
# Link extraction (outlink histogram) — pure JVM, no Python anywhere
# --------------------------------------------------------------------------

_LINK_PRE = '<html><body><nav><a href="/">Home</a> <a href="/l/'
_LINK_MID1 = '">Lang</a> <a href="/s/'
_LINK_MID2 = '">Source</a></nav><p>'
_LINK_MID3 = '</p><div class="ad"><a href="/n/'
_LINK_MID4 = '">More</a> <a href="/n/'
_LINK_SUF = '">Next</a></div><footer>(c) 2026 Example Corp</footer></body></html>'


@_register(
    "html_link_extract",
    """
WITH l AS (
  SELECT doc_id, '/' AS href FROM documents
  UNION ALL SELECT doc_id, '/l/' || lang FROM documents
  UNION ALL SELECT doc_id, '/s/' || source FROM documents
  UNION ALL SELECT doc_id, '/n/' || CAST(n_chars % 7 AS VARCHAR) FROM documents
  UNION ALL SELECT doc_id, '/n/' || CAST(doc_id % 7 AS VARCHAR) FROM documents
)
SELECT href, COUNT(*) AS n_links, COUNT(DISTINCT doc_id) AS n_docs
FROM l GROUP BY href ORDER BY href
""",
)
def html_link_extract(spark, sf_dir):
    """Outlink extraction + per-target histogram (anchor-graph staple of
    a web-extraction pipeline; reference consumes pre-extracted text so
    this is engine surface, not parity — north_star "DOM heuristics").
    Each document is wrapped in chrome whose hrefs VARY per doc
    (lang/source/n_chars-derived), so the engine must genuinely pull
    ``href`` targets out of markup; the synthesis determinism gives the
    oracle the closed-form answer (the two ``/n/...`` links can
    collide within a doc, so n_docs < n_links genuinely exercises the
    distinct).  Entirely JVM-side: synthesis is string concat, parsing
    is ``regexp_extract_all`` inside codegen, then the canonical
    distinct-aggregate plan — zero Python, partial_count on
    (href, doc_id) map-side before the first shuffle, so duplicate
    links collapse before any network.  At 100 TB this is the
    scan-shaped plan you want: no skew (href cardinality >> executor
    count), no UDF.
    """
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit(_LINK_PRE), F.col("lang"),
            F.lit(_LINK_MID1), F.col("source"),
            F.lit(_LINK_MID2), F.coalesce(F.col("text"), F.lit("")),
            F.lit(_LINK_MID3), (F.col("n_chars") % 7).cast("string"),
            F.lit(_LINK_MID4), (F.col("doc_id") % 7).cast("string"),
            F.lit(_LINK_SUF),
        ).alias("html"),
    )
    links = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("html"), F.lit(r'href="([^"]+)"'), 1)
        ).alias("href"),
    )
    return (
        links.groupBy("href")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("href")
    )


# --------------------------------------------------------------------------
# Table extraction — DOM rows -> relational rows
# --------------------------------------------------------------------------

_TBL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("row_idx", IntegerType()),
        StructField("cell", StringType()),
    ]
)


@_register(
    "html_table_extract",
    """
SELECT doc_id, CAST(i - 1 AS INTEGER) AS row_idx, w AS cell
FROM (
  SELECT doc_id,
         unnest(str_split(coalesce(text, ''), ' ')[1:least(len(str_split(coalesce(text, ''), ' ')), 6)]) AS w,
         unnest(generate_series(1, least(len(str_split(coalesce(text, ''), ' ')), 6))) AS i
  FROM documents
)
""",
)
def html_table_extract(spark, sf_dir):
    """``<table>`` extraction: markup rows become relational rows.
    The first six words of each document are rendered as
    ``<tr><td>i</td><td>word</td></tr>`` rows (JVM-side higher-order
    ``transform`` with index), and the kernel must parse them back out
    — lazy DOTALL cell capture, so cells containing ``<`` or newlines
    survive (the adversarial-corpus parity suite exercises exactly
    that).  Map-only: synthesis and parse fuse into one Arrow pass, no
    shuffle (plan-guarded).  Kernel: kernels/layout.parse_table.
    """
    from ocr_spark.kernels.layout import parse_table

    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    cells = F.transform(
        F.slice(words, 1, 6),
        lambda w, i: F.concat(
            F.lit("<tr><td>"), i.cast("string"),
            F.lit("</td><td>"), w, F.lit("</td></tr>"),
        ),
    )
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit('<table class="data">'), F.array_join(cells, ""), F.lit("</table>")
        ).alias("html"),
    )

    def run(batches):
        for pdf in batches:
            ids, idxs, vals = [], [], []
            for did, h in zip(pdf["doc_id"], pdf["html"]):
                for i, c in parse_table(h):
                    ids.append(did)
                    idxs.append(i)
                    vals.append(c)
            yield pd.DataFrame({"doc_id": ids, "row_idx": idxs, "cell": vals})

    return d.mapInPandas(run, schema=_TBL_SCHEMA)


# --------------------------------------------------------------------------
# Section split — multi-block extraction with per-section char spans
# --------------------------------------------------------------------------

_SEC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sec_idx", IntegerType()),
        StructField("heading", StringType()),
        StructField("body", StringType()),
        StructField("span_start", IntegerType()),
        StructField("span_end", IntegerType()),
    ]
)


@_register(
    "html_section_split",
    """
WITH s AS (
  SELECT doc_id,
         str_split(coalesce(text, ''), ' ') AS ws,
         unnest(generate_series(
           0, CAST(ceil(len(str_split(coalesce(text, ''), ' ')) / 8.0) AS INTEGER) - 1)) AS j
  FROM documents
), c AS (
  SELECT doc_id, j,
         'S' || CAST(j AS VARCHAR) AS heading,
         array_to_string(ws[8 * j + 1 : 8 * j + 8], ' ') AS body
  FROM s
), o AS (
  SELECT doc_id, j, heading, body,
         16 + length(heading) + length(body) AS sec_len
  FROM c
)
SELECT doc_id, CAST(j AS INTEGER) AS sec_idx, heading, body,
       CAST(COALESCE(SUM(sec_len) OVER (
              PARTITION BY doc_id ORDER BY j
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + 12 + length(heading) AS INTEGER) AS span_start,
       CAST(COALESCE(SUM(sec_len) OVER (
              PARTITION BY doc_id ORDER BY j
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + 12 + length(heading) + length(body) AS INTEGER) AS span_end
FROM o
""",
)
def html_section_split(spark, sf_dir):
    """Multi-block main-content extraction WITH SPANS: documents are
    rendered as ``<h2>Sj</h2><p>chunk</p>`` sections (8 words each,
    JVM-side sequence+transform+slice) and the kernel splits them back
    into (heading, body, body char span) — the north_star's "cleaned
    main-content text plus character-span offsets" contract in its
    multi-block form (strip_boilerplate emits the single-block form).
    The oracle reconstructs every span in closed form via a cumulative
    section-length window, so the kernel's offsets are bit-checked per
    section.  Map-only, one Arrow pass, no shuffle (plan-guarded).
    Kernel: kernels/layout.split_sections.
    """
    from ocr_spark.kernels.layout import split_sections

    ws = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    nsec = F.ceil(F.size(ws) / F.lit(8.0)).cast("int")
    secs = F.transform(
        F.sequence(F.lit(0), nsec - F.lit(1)),
        lambda j: F.concat(
            F.lit("<h2>S"), j.cast("string"), F.lit("</h2><p>"),
            F.array_join(F.slice(ws, j * 8 + 1, 8), " "), F.lit("</p>"),
        ),
    )
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.array_join(secs, "").alias("html")
    )

    def run(batches):
        for pdf in batches:
            ids, idxs, heads, bodies, s0, s1 = [], [], [], [], [], []
            for did, h in zip(pdf["doc_id"], pdf["html"]):
                for k, (head, body, a, b) in enumerate(split_sections(h)):
                    ids.append(did)
                    idxs.append(k)
                    heads.append(head)
                    bodies.append(body)
                    s0.append(a)
                    s1.append(b)
            yield pd.DataFrame(
                {
                    "doc_id": ids, "sec_idx": idxs, "heading": heads,
                    "body": bodies, "span_start": s0, "span_end": s1,
                }
            )

    return d.mapInPandas(run, schema=_SEC_SCHEMA)


# --------------------------------------------------------------------------
# Link-graph PageRank (integer-exact, fixed 3-iteration power method)
# --------------------------------------------------------------------------

#: out-link targets as shared SQL expressions ({n} = node count).  NOT
#: three affine bijections — gcd(a, N) = 1 maps are permutations, which
#: would give every node in-degree exactly 3 and a vacuously uniform
#: PageRank.  The quadratic map collides (d and N-d square alike) and
#: the mod-97 map concentrates mass on a 97-node hub set, so in-degrees
#: genuinely vary and the iteration has something to converge on.
#: Each map reduces doc_id mod n BEFORE multiplying: n is bounded by the
#: corpus row count, so (doc_id % n)^2 stays inside int64 even for the
#: exotic ~1e11 doc_ids the edge suite feeds in, whereas doc_id^2 would
#: silently wrap in Spark (ANSI off) while DuckDB promotes to HUGEINT —
#: the engines would diverge exactly on the large-id corpora.
_PR_DSTS = (
    "((doc_id % {n}) * (doc_id % {n}) + 7) % {n}",
    "(31 * (doc_id % {n}) + 7) % {n}",
    "doc_id % 97",
)
_PR_SCALE = 1_000_000          # initial score per node
_PR_BASE = 150_000             # (1 - 0.85) * scale
_PR_ITERS = 3


def _pr_oracle() -> str:
    n = "(SELECT COUNT(*) FROM documents)"
    e = " UNION ALL ".join(
        f"SELECT doc_id AS src, {d.format(n=n)} AS dst FROM documents"
        for d in _PR_DSTS
    )
    sql = [f"WITH e AS ({e}),",
           f"s0 AS (SELECT doc_id, CAST({_PR_SCALE} AS BIGINT) AS score FROM documents)"]
    for k in range(_PR_ITERS):
        sql.append(
            f""", s{k + 1} AS (
  SELECT d.doc_id,
         CAST({_PR_BASE} + (85 * COALESCE(SUM(s.score // 3), 0)) // 100
              AS BIGINT) AS score
  FROM documents d
  LEFT JOIN e ON e.dst = d.doc_id
  LEFT JOIN s{k} s ON s.doc_id = e.src
  GROUP BY d.doc_id
)"""
        )
    sql.append(f"SELECT doc_id, score FROM s{_PR_ITERS} ORDER BY doc_id")
    return "\n".join(sql)


@_register("link_pagerank", _pr_oracle())
def link_pagerank(spark, sf_dir):
    """PageRank over a deterministic doc->doc link graph (3 out-links
    per doc: a quadratic map, an affine map, and a mod-97 hub map, so
    in-degrees genuinely vary), the authority-weighting step a
    web-curation pipeline runs over its extracted link graph (cf.
    html_link_extract).  Fixed 3-iteration power method, damping 0.85,
    in EXACT integer arithmetic (scores scaled 1e6, truncating integer
    division) so Spark and DuckDB agree bit-for-bit regardless of
    aggregation order — the same integer-micros discipline every float
    reduction in this catalog uses.  Shape per iteration: edges ⋈
    scores on src (shuffle), partial_sum of contributions map-side,
    hash agg on dst, left join back to nodes — the classic distributed
    PageRank plan; N is obtained as a broadcast 1-row aggregate, not a
    driver collect.  At 100 TB you would co-partition edges by src
    once and reuse the exchange across iterations; with a fixed
    3-round unroll Catalyst's exchange reuse already applies where
    AQE permits.
    """
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    nrow = docs.agg(F.count(F.lit(1)).alias("n"))
    e = (
        docs.crossJoin(F.broadcast(nrow))
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(*[F.expr(d.format(n="n")) for d in _PR_DSTS])
            ).alias("dst"),
        )
    )
    s = docs.select("doc_id", F.lit(_PR_SCALE).cast("long").alias("score"))
    for _ in range(_PR_ITERS):
        contrib = (
            e.join(s, e["src"] == s["doc_id"])
            .select("dst", F.expr("score div 3").alias("part"))
            .groupBy("dst")
            .agg(F.sum("part").alias("c"))
        )
        s = (
            docs.join(contrib, docs["doc_id"] == contrib["dst"], "left")
            .select(
                docs["doc_id"],
                (
                    F.lit(_PR_BASE)
                    + F.expr("(85 * coalesce(c, 0L)) div 100")
                ).cast("long").alias("score"),
            )
        )
    return s.orderBy("doc_id")
