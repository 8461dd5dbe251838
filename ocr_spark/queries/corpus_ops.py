"""Published web-corpus curation operators (C4 / keep-best dedup /
canonical-URL dedup / DSIR importance weighting / length bucketing).

Rounds out the cleaning stack (lang_id -> gopher_quality_filter ->
line_dedup -> lm_bigram_score -> clean_corpus) with the remaining
stages every published pre-training pipeline runs:

- **c4_quality_filter**: the line-level rule set of Raffel et al. 2020
  (C4, §2.2): keep only lines ending in terminal punctuation with >=5
  words and no "javascript"; reject whole pages containing "lorem
  ipsum" or "{", or with fewer than 3 surviving lines.  Pages are
  synthesized deterministically from ``documents.text`` (the corpus
  has single-space word separation and none of the trigger strings —
  verified at all SFs), injecting known boilerplate/trigger lines so
  every rule fires on a known doc_id residue class; the oracle derives
  the same page and states the expected verdict.  Pure native
  expressions: map-only, fuses into the parquet scan at any scale.
- **url_normalize**: canonical-URL dedup (the first dedup stage of
  CCNet/RefinedWeb-style crawls): scheme/host lowercasing, www. and
  default-port stripping, trailing-slash and fragment removal,
  tracking-parameter (utm_*) filtering.  The messy URL is derived
  deterministically from (doc_id, source); the NORMALIZER genuinely
  parses the URL string with split/substr only (no regex — Java vs
  RE2 anchor semantics differ; see pii_scrub).  One shuffle: the
  min-over-window keeper marking on the canonical key.
- **dedup_keep_best**: per near-dup cluster (whitespace-normalized
  text fingerprint) keep the BEST representative — longest raw text,
  ties to the smallest doc_id (the C4/RefinedWeb "keep one canonical
  copy" policy, upgraded from dedup_exact's keep-lowest-id).  One
  aggregation on the cluster key; max(struct) partials combine
  map-side, so a million-copy boilerplate cluster never buffers rows
  on one reducer (contrast a row_number window, which would).
- **dsir_importance**: Data Selection via Importance Resampling (Xie
  et al. 2023): hashed-ngram bag features (unigrams + bigrams ->
  256 buckets), a target distribution from the lang='en' slice and a
  raw distribution from the full corpus, and a per-document importance
  weight summed over its grams.  The published estimator sums
  log(p_target/p_raw); the sandbox variant sums exact fixed-point
  probability DIFFERENCES in parts-per-million so the DuckDB oracle
  matches bit-for-bit (ln is not correctly-rounded across libm/JVM;
  integer ``div`` is identical everywhere — same substitution as
  lm_bigram_score).  Shape: two 256-row bucket aggregations (partial
  map-side), broadcast both as the weight table, score map-side, one
  final doc_id aggregation with map-side partial sums.
- **seq_len_histogram**: power-of-two length-bucket histogram (the
  dataloader statistic behind sequence-length-bucketed batching /
  max_len selection; reference analog: config.json ``max_len=128``).
  Bucket = bit-length of the word count, computed as
  ``length(conv(n, 10, 2))`` / ``length(bin(n))`` — integer-exact in
  both engines, no float log2 edge cases at power-of-two boundaries.
  Aggregates to <=64 rows; partial map-side.

Scale notes (100 TB): every operator here is either map-only
(c4_quality_filter) or shuffles keys/aggregates that are bounded and
partially aggregated map-side (256 buckets, <=64 length buckets,
cluster fingerprints with combining max(struct) state).  The only
per-row-cardinality shuffle is url_normalize's keeper window on the
canonical URL — the same key a production crawl dedup partitions by.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ocr_spark.queries.catalog import _register, _t
from ocr_spark.queries.pipeline_ops import (
    cosine_from_micros,
    dot_micros,
    micros,
    sql_dot_micros,
    sql_micros_extract,
    sql_norm2_micros,
    sql_str_hash,
    str_hash,
)

# ---------------------------------------------------------------------------
# C4 line-rule quality filter (Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------

#: words per synthesized page line; the >=5-word line rule then drops
#: short remainder lines, so the rule genuinely discriminates.
_C4_LINE_W = 6
_C4_JS_LINE = "please enable javascript to view this page."
_C4_LOREM_LINE = "lorem ipsum dolor sit amet consectetur."
_C4_BRACE_LINE = "try { enable(); } catch (e) {}"
_C4_TERMS = [".", "", "!", "?"]

_SQL_C4_TERMS = "[" + ", ".join(f"'{t}'" for t in _C4_TERMS) + "]"

_SQL_C4_PAGES = f"""
  SELECT doc_id,
         (CASE WHEN (doc_id % 7 + 7) % 7 = 0
               THEN ['{_C4_JS_LINE}'] ELSE [] END)
         || list_transform(
              range(0, cast(ceil(len(words) / {_C4_LINE_W}.0) AS int)),
              i -> array_to_string(
                     words[i * {_C4_LINE_W} + 1 : i * {_C4_LINE_W} + {_C4_LINE_W}],
                     ' ')
                   || ({_SQL_C4_TERMS})[((doc_id + i) % 4 + 4) % 4 + 1])
         || (CASE WHEN (doc_id % 11 + 11) % 11 = 0
                  THEN ['{_C4_LOREM_LINE}'] ELSE [] END)
         || (CASE WHEN (doc_id % 13 + 13) % 13 = 0
                  THEN ['{_C4_BRACE_LINE}'] ELSE [] END)
         AS plines
  FROM (SELECT doc_id, str_split(text, ' ') AS words FROM documents)
"""

_SQL_C4_KEPT = """
  list_filter(plines,
    l -> right(l, 1) IN ('.', '!', '?', '"')
         AND len(str_split(l, ' ')) >= 5
         AND NOT contains(lower(l), 'javascript'))
"""


@_register(
    "c4_quality_filter",
    f"""
SELECT doc_id, n_lines, n_lines_kept,
       fail_reason = '' AS passes, fail_reason,
       CASE WHEN fail_reason = ''
            THEN array_to_string(kept, chr(10)) ELSE '' END AS clean_text
FROM (
  SELECT doc_id, len(plines) AS n_lines, len(kept) AS n_lines_kept, kept,
         CASE
           WHEN contains(page, 'lorem ipsum') THEN 'lorem_ipsum'
           WHEN contains(page, '{{') THEN 'brace'
           WHEN len(kept) < 3 THEN 'too_few_sentences'
           ELSE ''
         END AS fail_reason
  FROM (
    SELECT doc_id, plines, {_SQL_C4_KEPT} AS kept,
           array_to_string(plines, chr(10)) AS page
    FROM ({_SQL_C4_PAGES})
  )
)
""",
)
def c4_quality_filter(spark, sf_dir):
    """C4 cleaning rules (Raffel et al. 2020 §2.2) over synthesized
    pages: line kept iff it ends in terminal punctuation ('.', '!',
    '?', '"'), has >=5 words, and does not mention javascript; page
    rejected if it contains "lorem ipsum" or a '{', or keeps fewer
    than 3 lines.  Terminal-punctuation test is an exact last-char
    compare, NOT a ``[.!?"]$`` regex: Java's ``$`` matches before a
    trailing newline while RE2's does not, so the regex form diverges
    on texts with embedded newlines (edge corpus doc 7).  Entirely
    native expressions — map-only; the whole filter fuses into the
    parquet scan (plan-guarded: zero exchanges)."""
    docs = _t(spark, sf_dir, "documents")
    terms = ", ".join(f"'{t}'" for t in _C4_TERMS)
    # bind the word array once — slice(split(text), ..) inside the
    # per-line lambda would re-split the document per LINE (see the
    # dsir_importance gram builder for the measured cost of that trap)
    wdocs = docs.select("doc_id", F.split("text", " ").alias("ws"))
    pages = wdocs.select(
        "doc_id",
        F.expr(
            f"""
            concat(
              if(pmod(doc_id, 7) = 0, array('{_C4_JS_LINE}'),
                 array_remove(array(''), '')),
              transform(
                sequence(0, cast(ceil(size(ws) / {_C4_LINE_W}.0)
                                 AS int) - 1),
                i -> concat(
                       array_join(slice(ws, i * {_C4_LINE_W} + 1,
                                        {_C4_LINE_W}), ' '),
                       element_at(array({terms}),
                                  cast(pmod(doc_id + i, 4) AS int) + 1))),
              if(pmod(doc_id, 11) = 0, array('{_C4_LOREM_LINE}'),
                 array_remove(array(''), '')),
              if(pmod(doc_id, 13) = 0, array('{_C4_BRACE_LINE}'),
                 array_remove(array(''), ''))
            )
            """
        ).alias("plines"),
    )
    scored = pages.select(
        "doc_id",
        F.size("plines").alias("n_lines"),
        F.expr(
            """
            filter(plines,
                   l -> substring(l, -1, 1) IN ('.', '!', '?', '"')
                        AND size(split(l, ' ')) >= 5
                        AND NOT contains(lower(l), 'javascript'))
            """
        ).alias("kept"),
        F.array_join("plines", "\n").alias("page"),
    ).select(
        "doc_id",
        "n_lines",
        F.size("kept").alias("n_lines_kept"),
        "kept",
        F.when(F.col("page").contains("lorem ipsum"), F.lit("lorem_ipsum"))
        .when(F.col("page").contains("{"), F.lit("brace"))
        .when(F.size("kept") < 3, F.lit("too_few_sentences"))
        .otherwise(F.lit(""))
        .alias("fail_reason"),
    )
    return scored.select(
        "doc_id",
        "n_lines",
        "n_lines_kept",
        (F.col("fail_reason") == "").alias("passes"),
        "fail_reason",
        F.when(F.col("fail_reason") == "", F.array_join("kept", "\n"))
        .otherwise(F.lit(""))
        .alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# canonical-URL normalization + keeper marking
# ---------------------------------------------------------------------------

_SQL_URL_DERIVE = """
  SELECT doc_id,
         (CASE (doc_id % 5 + 5) % 5 WHEN 0 THEN 'HTTPS'
               WHEN 1 THEN 'https' ELSE 'http' END)
         || '://'
         || (CASE WHEN (doc_id % 3 + 3) % 3 = 0 THEN 'WWW.' ELSE '' END)
         || source || '.Example.COM'
         || (CASE (doc_id % 5 + 5) % 5 WHEN 0 THEN ':443' WHEN 2 THEN ':80'
                  WHEN 3 THEN ':8080' ELSE '' END)
         || '/docs/' || CAST((doc_id % 50 + 50) % 50 AS VARCHAR)
         || (CASE WHEN (doc_id % 2 + 2) % 2 = 0 THEN '/' ELSE '' END)
         || (CASE (doc_id % 4 + 4) % 4
               WHEN 0 THEN '?utm_source=feed&id='
                           || CAST((doc_id % 10 + 10) % 10 AS VARCHAR)
               WHEN 1 THEN '?id=' || CAST((doc_id % 10 + 10) % 10 AS VARCHAR)
                           || '&utm_medium=email'
               WHEN 2 THEN '?utm_campaign=x'
               ELSE '' END)
         || (CASE WHEN (doc_id % 6 + 6) % 6 = 0 THEN '#section-2' ELSE '' END)
         AS url
  FROM documents
"""


@_register(
    "url_normalize",
    f"""
WITH raw AS ({_SQL_URL_DERIVE}),
parts AS (
  SELECT doc_id, url,
         lower(split_part(url, '://', 1)) AS scheme,
         split_part(split_part(url, '://', 2), '#', 1) AS nofrag
  FROM raw
),
hp AS (
  SELECT *, split_part(split_part(nofrag, '/', 1), '?', 1) AS hostport
  FROM parts
),
comps AS (
  SELECT doc_id, url, scheme,
         CASE WHEN starts_with(lower(split_part(hostport, ':', 1)), 'www.')
              THEN substr(lower(split_part(hostport, ':', 1)), 5)
              ELSE lower(split_part(hostport, ':', 1)) END AS host,
         CASE WHEN contains(hostport, ':')
              THEN ':' || split_part(hostport, ':', 2) ELSE '' END AS port,
         split_part(substr(nofrag, length(hostport) + 1), '?', 1) AS path,
         CASE WHEN contains(substr(nofrag, length(hostport) + 1), '?')
              THEN split_part(substr(nofrag, length(hostport) + 1), '?', 2)
              ELSE '' END AS query
  FROM hp
),
norm AS (
  SELECT doc_id, url,
         scheme || '://' || host
         || (CASE WHEN (scheme = 'https' AND port = ':443')
                    OR (scheme = 'http' AND port = ':80')
                  THEN '' ELSE port END)
         || (CASE WHEN path = '' THEN '/'
                  WHEN length(path) > 1 AND right(path, 1) = '/'
                  THEN substr(path, 1, length(path) - 1)
                  ELSE path END)
         || (CASE WHEN len(list_filter(str_split(query, '&'),
                           p -> p <> '' AND NOT starts_with(p, 'utm_'))) > 0
                  THEN '?' || array_to_string(
                         list_filter(str_split(query, '&'),
                           p -> p <> '' AND NOT starts_with(p, 'utm_')), '&')
                  ELSE '' END)
         AS canonical_url
  FROM comps
)
SELECT doc_id, url, canonical_url,
       doc_id = min(doc_id) OVER (PARTITION BY canonical_url) AS is_keeper
FROM norm
""",
)
def url_normalize(spark, sf_dir):
    """Canonical-URL normalization + first-seen keeper marking (the
    URL-dedup stage of CCNet/RefinedWeb crawls): lowercase scheme and
    host, strip ``www.``, strip scheme-default ports (:443/:80, keep
    explicit non-defaults), drop the fragment, strip a trailing slash
    (root stays '/'), and remove ``utm_*`` tracking parameters while
    preserving the rest.  The messy URL is derived deterministically
    from (doc_id, source); the normalizer PARSES the string with
    substring_index/substr only — no regex (cross-engine anchor
    semantics) and no per-row Python.  One exchange: the keeper
    window on canonical_url, the same key a crawl-scale URL dedup
    partitions by; everything before it is map-only codegen."""
    docs = _t(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        F.expr(
            """
            concat(
              CASE cast(pmod(doc_id, 5) AS int) WHEN 0 THEN 'HTTPS'
                   WHEN 1 THEN 'https' ELSE 'http' END,
              '://',
              if(pmod(doc_id, 3) = 0, 'WWW.', ''),
              source, '.Example.COM',
              CASE cast(pmod(doc_id, 5) AS int) WHEN 0 THEN ':443'
                   WHEN 2 THEN ':80' WHEN 3 THEN ':8080' ELSE '' END,
              '/docs/', cast(pmod(doc_id, 50) AS string),
              if(pmod(doc_id, 2) = 0, '/', ''),
              CASE cast(pmod(doc_id, 4) AS int)
                WHEN 0 THEN concat('?utm_source=feed&id=',
                                   cast(pmod(doc_id, 10) AS string))
                WHEN 1 THEN concat('?id=', cast(pmod(doc_id, 10) AS string),
                                   '&utm_medium=email')
                WHEN 2 THEN '?utm_campaign=x'
                ELSE '' END,
              if(pmod(doc_id, 6) = 0, '#section-2', '')
            )
            """
        ).alias("url"),
    )
    parts = raw.select(
        "doc_id",
        "url",
        F.lower(F.substring_index("url", "://", 1)).alias("scheme"),
        F.substring_index(F.substring_index("url", "://", -1), "#", 1).alias(
            "nofrag"
        ),
    )
    hp = parts.withColumn(
        "hostport",
        F.substring_index(F.substring_index("nofrag", "/", 1), "?", 1),
    )
    comps = hp.select(
        "doc_id",
        "url",
        "scheme",
        F.expr(
            """
            CASE WHEN startswith(lower(substring_index(hostport, ':', 1)),
                                 'www.')
                 THEN substr(lower(substring_index(hostport, ':', 1)), 5)
                 ELSE lower(substring_index(hostport, ':', 1)) END
            """
        ).alias("host"),
        F.expr(
            """
            if(contains(hostport, ':'),
               concat(':', substring_index(hostport, ':', -1)), '')
            """
        ).alias("port"),
        F.expr(
            "substring_index(substr(nofrag, length(hostport) + 1), '?', 1)"
        ).alias("path"),
        F.expr(
            """
            if(contains(substr(nofrag, length(hostport) + 1), '?'),
               substring_index(substr(nofrag, length(hostport) + 1), '?', -1),
               '')
            """
        ).alias("query"),
    )
    norm = comps.select(
        "doc_id",
        "url",
        F.expr(
            """
            concat(
              scheme, '://', host,
              if((scheme = 'https' AND port = ':443')
                 OR (scheme = 'http' AND port = ':80'), '', port),
              CASE WHEN path = '' THEN '/'
                   WHEN length(path) > 1 AND substring(path, -1, 1) = '/'
                   THEN substr(path, 1, length(path) - 1)
                   ELSE path END,
              if(size(filter(split(query, '&'),
                             p -> p != '' AND NOT startswith(p, 'utm_'))) > 0,
                 concat('?', array_join(
                   filter(split(query, '&'),
                          p -> p != '' AND NOT startswith(p, 'utm_')), '&')),
                 '')
            )
            """
        ).alias("canonical_url"),
    )
    w = Window.partitionBy("canonical_url")
    return norm.select(
        "doc_id",
        "url",
        "canonical_url",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_keeper"),
    )


# ---------------------------------------------------------------------------
# keep-best dedup (cluster representative selection)
# ---------------------------------------------------------------------------

#: whitespace-normalization for clustering: lowercase, collapse runs of
#: the explicit class [ \t\n\r] (NOT regex \s — Java includes \x0B,
#: RE2 does not), trim.  Two spellings: DuckDB's regexp_replace
#: replaces only the FIRST match unless given the 'g' flag; Spark's
#: always replaces all.
_NORM_WS = r"trim(regexp_replace(lower(text), '[ \t\n\r]+', ' '))"
_SQL_NORM_WS = r"trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g'))"


@_register(
    "dedup_keep_best",
    f"""
WITH c AS (
  SELECT md5({_SQL_NORM_WS}) AS cluster_fp, doc_id, n_chars FROM documents
),
m AS (
  SELECT cluster_fp, max(n_chars) AS keep_n_chars, count(*) AS n_dups
  FROM c GROUP BY cluster_fp
)
SELECT m.cluster_fp, min(c.doc_id) AS keep_doc_id,
       m.keep_n_chars, m.n_dups
FROM c JOIN m ON c.cluster_fp = m.cluster_fp
             AND c.n_chars = m.keep_n_chars
GROUP BY m.cluster_fp, m.keep_n_chars, m.n_dups
""",
)
def dedup_keep_best(spark, sf_dir):
    """Keep-best dedup: cluster on a whitespace-normalized text
    fingerprint, keep the LONGEST raw member per cluster (ties to the
    smallest doc_id) — the C4/RefinedWeb "retain one canonical copy"
    policy, selecting the most complete duplicate instead of
    dedup_exact's arbitrary lowest-id.  Implemented as ONE aggregation
    with a combining ``max(struct(n_chars, -doc_id))`` — partial
    states merge map-side, so a boilerplate cluster with millions of
    copies reduces to one struct per map task instead of buffering
    rows on a single reducer (a row_number window would).  The oracle
    states the same selection as max-then-min (DuckDB's max_by has no
    composite ordering)."""
    docs = _t(spark, sf_dir, "documents")
    best = F.max(
        F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
    ).alias("best")
    return (
        docs.select(
            F.md5(F.expr(_NORM_WS)).alias("cluster_fp"), "doc_id", "n_chars"
        )
        .groupBy("cluster_fp")
        .agg(best, F.count("*").alias("n_dups"))
        .select(
            "cluster_fp",
            (-F.col("best.neg_id")).alias("keep_doc_id"),
            F.col("best.n_chars").alias("keep_n_chars"),
            "n_dups",
        )
    )


# ---------------------------------------------------------------------------
# DSIR hashed-ngram importance weighting (Xie et al. 2023)
# ---------------------------------------------------------------------------

_DSIR_B = 256  # hash buckets
_DSIR_SCALE = 1_000_000  # fixed-point ppm

_SQL_DSIR_GRAMS = f"""
  SELECT doc_id, lang,
         ({sql_str_hash('g')} % {_DSIR_B} + {_DSIR_B}) % {_DSIR_B} AS b
  FROM (
    SELECT doc_id, lang, unnest(list_concat(
             words,
             list_transform(range(1, greatest(len(words), 1)),
                            i -> words[i] || ' ' || words[i + 1])
           )) AS g
    FROM (SELECT doc_id, lang, str_split(text, ' ') AS words FROM documents)
  )
"""


@_register(
    "dsir_importance",
    f"""
WITH grams AS ({_SQL_DSIR_GRAMS}),
tgt AS (
  SELECT b, count(*) AS ct FROM grams WHERE lang = 'en' GROUP BY b
),
src AS (SELECT b, count(*) AS cs FROM grams GROUP BY b),
tot AS (
  SELECT (SELECT coalesce(sum(ct), 1) FROM tgt) AS t,
         (SELECT coalesce(sum(cs), 1) FROM src) AS s
),
w AS (
  SELECT src.b,
         CAST(({_DSIR_SCALE} * coalesce(tgt.ct, 0)) // tot.t AS BIGINT)
         - CAST(({_DSIR_SCALE} * src.cs) // tot.s AS BIGINT) AS w_ppm
  FROM src LEFT JOIN tgt ON src.b = tgt.b CROSS JOIN tot
)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(w.w_ppm) AS BIGINT) AS dsir_ppm
FROM grams g JOIN w ON g.b = w.b
GROUP BY g.doc_id
""",
)
def dsir_importance(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023 "Data Selection for
    Language Models via Importance Resampling"): hashed-ngram bag
    features (word unigrams + bigrams, 256 buckets via the shared
    cross-engine md5 hash), target distribution = the lang='en' slice,
    raw distribution = the whole corpus; each document scores the sum
    over its gram occurrences of the per-bucket importance weight.
    Fixed-point ppm probability differences stand in for the paper's
    log-ratio so the oracle is bit-exact (see module docstring).
    Shape: the gram explode is map-side; the two distribution
    aggregations output <= 256 rows each (partials map-side) and are
    BROADCAST back onto the gram stream (plan-guarded), so the corpus
    is never shuffled by bucket; the only row-scale exchange is the
    final per-doc sum, with map-side partial aggregation."""
    docs = _t(spark, sf_dir, "documents")
    # bind the word array ONCE, bigrams via zip_with over two slices:
    # element_at(split(text), i) inside a transform lambda re-evaluates
    # the split per BIGRAM — O(words^2) per doc, measured 7x slower
    base = docs.select("doc_id", "lang", F.split("text", " ").alias("ws"))
    grams = base.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                """
                concat(
                  ws,
                  if(size(ws) >= 2,
                     zip_with(slice(ws, 1, size(ws) - 1),
                              slice(ws, 2, size(ws) - 1),
                              (a, b) -> concat(a, ' ', b)),
                     array_remove(array(''), ''))
                )
                """
            )
        ).alias("g"),
    ).select(
        "doc_id",
        "lang",
        F.pmod(str_hash(F.col("g")), F.lit(_DSIR_B)).alias("b"),
    )
    # BOTH distributions from ONE pass over the gram stream (the md5
    # bucket hash is the dominant per-gram cost; a separate
    # target-slice aggregation would recompute it corpus-wide)
    dist = grams.groupBy("b").agg(
        F.count("*").alias("cs"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ct"),
    )
    # greatest(.., 1): a corpus with no target-language docs has
    # sum(ct) = 0 (not NULL) — the oracle's empty-tgt coalesce yields 1
    tot = dist.agg(
        F.greatest(F.coalesce(F.sum("ct"), F.lit(1)), F.lit(1)).alias("t"),
        F.greatest(F.coalesce(F.sum("cs"), F.lit(1)), F.lit(1)).alias("s"),
    )
    w = dist.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.expr(f"({_DSIR_SCALE} * ct) div t")
            - F.expr(f"({_DSIR_SCALE} * cs) div s")
        ).alias("w_ppm"),
    )
    return (
        grams.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("w_ppm").alias("dsir_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# sequence-length histogram (power-of-two buckets)
# ---------------------------------------------------------------------------


@_register(
    "seq_len_histogram",
    """
SELECT length(bin(n_words)) AS bucket_bits,
       CAST(1 << (length(bin(n_words)) - 1) AS BIGINT) AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS total_words,
       min(n_words) AS min_words, max(n_words) AS max_words
FROM (SELECT CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words
      FROM documents)
GROUP BY length(bin(n_words))
""",
)
def seq_len_histogram(spark, sf_dir):
    """Power-of-two sequence-length histogram — the dataloader-planning
    statistic behind length-bucketed batching and max_len selection
    (reference analog: config.json ``max_len=128`` truncation).
    Bucket = bit-length of the whitespace word count via
    ``length(conv(n, 10, 2))`` — integer-exact, no float log2 boundary
    cases at exact powers of two.  Aggregates the corpus to <= 64
    rows; count/sum/min/max all combine map-side, so the shuffle
    carries one row per (task, bucket) at any scale."""
    docs = _t(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " ")).cast("long").alias("n_words")
    base = docs.select(n_words).withColumn(
        "bucket_bits", F.length(F.conv("n_words", 10, 2)).cast("int")
    )
    return (
        base.groupBy("bucket_bits")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.min("n_words").alias("min_words"),
            F.max("n_words").alias("max_words"),
        )
        .select(
            "bucket_bits",
            F.expr("shiftleft(1, bucket_bits - 1)")
            .cast("long")
            .alias("bucket_lo"),
            "n_docs",
            "total_words",
            "min_words",
            "max_words",
        )
    )


# ---------------------------------------------------------------------------
# SemDeDup: cluster-scoped semantic dedup over embeddings
# ---------------------------------------------------------------------------

#: cosine threshold above which two within-cluster vectors are
#: semantic duplicates.  Production SemDeDup on real encoder
#: embeddings uses ~0.95+; the sandbox's synthetic embeddings are
#: near-uniform (within-cluster p99 cosine ~= 0.31 at sf0.01), so the
#: threshold is set where the operator genuinely discriminates.
SEMDEDUP_TAU = 0.3
_SEM_K = 4  # coarse clusters (production: k grows with corpus size)

_SQL_SEM_V = f"""
  SELECT vec_id,
         [{sql_micros_extract('embedding', 'i')}
          FOR i IN generate_series(1, 64)] AS m
  FROM embeddings
"""

_SQL_SEMDEDUP = f"""
WITH v AS ({_SQL_SEM_V}),
cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, m
  FROM v ORDER BY vec_id LIMIT {_SEM_K}
),
d AS (
  SELECT v.vec_id, c.cid,
         CAST(list_sum([ (v.m[i] - c.m[i]) * (v.m[i] - c.m[i])
                         FOR i IN generate_series(1, 64)]) AS BIGINT) AS d2
  FROM v CROSS JOIN cent c
),
a AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d) WHERE rn = 1
),
n2 AS (
  SELECT vec_id, {sql_norm2_micros('embedding')} AS n2 FROM embeddings
),
pairs AS (
  SELECT la.vec_id AS ida, lb.vec_id AS idb
  FROM a la JOIN a lb ON la.cid = lb.cid AND la.vec_id < lb.vec_id
  JOIN n2 na ON na.vec_id = la.vec_id AND na.n2 > 0
  JOIN n2 nb ON nb.vec_id = lb.vec_id AND nb.n2 > 0
  JOIN embeddings ea ON ea.vec_id = la.vec_id
  JOIN embeddings eb ON eb.vec_id = lb.vec_id
  WHERE CAST({sql_dot_micros('ea.embedding', 'eb.embedding')} AS DOUBLE)
        / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
        > {SEMDEDUP_TAU}
),
closes AS (
  SELECT ida AS vec_id FROM pairs UNION ALL SELECT idb FROM pairs
),
ncl AS (SELECT vec_id, count(*) AS n_close FROM closes GROUP BY vec_id),
dropped AS (SELECT DISTINCT idb AS vec_id FROM pairs)
SELECT a.vec_id, a.cid,
       CAST(coalesce(ncl.n_close, 0) AS BIGINT) AS n_close,
       dropped.vec_id IS NULL AS keep
FROM a LEFT JOIN ncl ON ncl.vec_id = a.vec_id
       LEFT JOIN dropped ON dropped.vec_id = a.vec_id
"""


@_register("semdedup", _SQL_SEMDEDUP)
def semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023 "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): assign every
    embedding to a coarse cluster, compare pairs ONLY within a
    cluster, and drop every vector with a smaller-id neighbor above
    the cosine threshold (keep-first policy; the paper keeps one
    representative per over-threshold group).  Zero-norm vectors
    carry no direction and are excluded from pairing (kept, n_close
    0) — cosine would be 0/0.

    Scale shape: the point of SemDeDup is that the quadratic pair
    comparison is confined to clusters — pair count is sum over
    clusters of |c|^2, and production runs grow k with the corpus to
    keep |c| bounded.  Here the assignment is pure map-side codegen
    (the k=4 codebook is a driver artifact of k x 64 ints, same
    policy as kmeans_train/ann_ivf_probe: distances via aggregate/
    zip_with against literal centroid arrays, argmin ties to the
    smaller cid), so the only row-scale exchanges are the within-
    cluster self-join on cid and the per-vector rollups.  A skewed
    hot cluster is an input-quality problem (k too small), not a plan
    problem — AQE skew-join splitting applies to the cid join."""
    emb = _t(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", micros(F.col("embedding")).alias("m"))
    init = v.orderBy("vec_id").limit(_SEM_K).collect()
    if not init:
        return spark.createDataFrame(
            [], schema="vec_id BIGINT, cid BIGINT, n_close BIGINT, keep BOOLEAN"
        )
    cents = [list(r["m"]) for r in init]

    # ONE nested lambda over a 2-D centroid literal, argmin via
    # array_position(ds, array_min(ds)) (1-based FIRST occurrence →
    # ties resolve to the smaller cid, matching the oracle's ORDER BY
    # d2, cid).  The earlier form unrolled k separate 64-wide fold
    # expressions plus a least()/when-chain over them — producing a
    # generated-code body whose JIT dominated the query's first run
    # (8.3 s cold vs 2.0 s warm in the same session); the nested
    # lambda emits one small loop body instead.
    cents_sql = "array(" + ", ".join(
        "array(" + ", ".join(f"{int(x)}L" for x in c) + ")" for c in cents
    ) + ")"
    dists = F.expr(
        f"transform({cents_sql},"
        " c -> aggregate(zip_with(m, c, (x, y) -> (x - y) * (x - y)),"
        " cast(0 as bigint), (acc, x) -> acc + x))"
    )
    assigned = v.select("vec_id", "m", dists.alias("ds")).select(
        "vec_id",
        "m",
        F.expr("cast(array_position(ds, array_min(ds)) - 1 as bigint)")
        .alias("cid"),
        dot_micros(F.col("m"), F.col("m")).alias("n2"),
    )
    nz = assigned.filter(F.col("n2") > 0)
    la = nz.select(
        F.col("vec_id").alias("ida"), F.col("cid").alias("cid"),
        F.col("m").alias("ma"), F.col("n2").alias("na"),
    )
    lb = nz.select(
        F.col("vec_id").alias("idb"), F.col("cid").alias("cidb"),
        F.col("m").alias("mb"), F.col("n2").alias("nb"),
    )
    pairs = (
        la.join(lb, (F.col("cid") == F.col("cidb")) & (F.col("ida") < F.col("idb")))
        .filter(
            cosine_from_micros(
                dot_micros(F.col("ma"), F.col("mb")), F.col("na"), F.col("nb")
            )
            > SEMDEDUP_TAU
        )
        .select("ida", "idb")
    )
    # ONE pass over the quadratic pair stream: explode each pair into
    # both (vec_id, was-the-larger-id) roles, then a single aggregation
    # yields n_close AND the drop flag.  The obvious spelling —
    # closes = ida UNION ALL idb, dropped = DISTINCT idb, two joins —
    # evaluates the pair join THREE times (no subtree reuse across the
    # union/distinct consumers); at scale the quadratic stage is the
    # whole cost, so recomputing it is the defect, not the join order.
    sides = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("ida").alias("vec_id"), F.lit(False).alias("is_b")),
                F.struct(F.col("idb").alias("vec_id"), F.lit(True).alias("is_b")),
            )
        ).alias("s")
    ).select("s.vec_id", "s.is_b")
    ncl = sides.groupBy("vec_id").agg(
        F.count("*").alias("n_close"),
        F.max("is_b").alias("is_dropped"),
    )
    return (
        assigned.select("vec_id", "cid")
        .join(ncl, "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.coalesce(F.col("n_close"), F.lit(0)).cast("long").alias("n_close"),
            (~F.coalesce(F.col("is_dropped"), F.lit(False))).alias("keep"),
        )
    )
