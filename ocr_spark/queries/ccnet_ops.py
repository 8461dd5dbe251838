"""CCNet-shaped corpus-cleaning operators + training-window chunking.

Completes the canonical web-scale cleaning pipeline of Wenzek et al.
2020 ("CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data"): the repo already has the language-ID stage (``lang_id``)
and rule filters (``gopher_quality_filter``); this module adds the two
missing stages —

- **paragraph/line dedup** (`line_dedup`): drop every line whose exact
  text occurs in more than one conversation, corpus-wide (CCNet §4.2's
  per-paragraph hash dedup; on transcript payloads the "paragraph" is
  a line of the turn text).  Boilerplate like repeated MCQ option
  lists disappears from every conversation at once.
- **LM fluency scoring** (`lm_bigram_score`): score each document by
  the mean conditional probability of its word bigrams under a model
  trained on the corpus itself (CCNet §4.3 scores with a KenLM 5-gram
  and keeps the head/middle of the perplexity distribution; the
  relational shape — train counts with one shuffle, broadcast the
  model, score map-side — is identical).  The sandbox variant uses
  exact fixed-point conditional probabilities instead of log-space
  perplexity so the DuckDB oracle matches bit-for-bit: ``ln`` is not
  IEEE-correctly-rounded and Java ``Math.log`` vs libm may differ by
  1 ulp, while ``(1000000 * c12) div c1`` is the same integer in any
  engine.  A production deployment swaps the per-bigram score column
  for KenLM log10-probs; every plan property is unchanged.

plus the universal pre-training reshape CCNet feeds into:

- **training-window chunking** (`doc_chunk_windows`): split each
  document into fixed-width word windows with stride overlap (the
  max_len-chunking every LM dataloader applies; reference analog:
  config.json ``max_len=128`` truncation, here as non-lossy windows).

Scale notes (100 TB): `doc_chunk_windows` is map-only — zero
exchanges, fuses into the parquet scan.  `lm_bigram_score` shuffles
bigram COUNT rows (vocab²-bounded, tiny vs the corpus) and broadcasts
the model so the occurrence side is never shuffled for the join; the
final per-doc aggregation shuffles only (doc_id, p_micro) micro-rows
with map-side partial sums.  `line_dedup` shuffles the line set once
for the duplicate-detection window (same min!=max-over-window pattern
as ``dedup_span_ngram`` — no count-distinct) and once to reassemble
per conversation; ultra-hot boilerplate lines skew the window
partition, which AQE skew-join/partition splitting handles since the
per-line state is two string extremes, not a buffered group.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ocr_spark.queries.catalog import _register, _t
from ocr_spark.queries.derive import derived_transcripts, with_transcripts
from ocr_spark.queries.pipeline_ops import bind_words

# ---------------------------------------------------------------------------
# line-level corpus dedup (CCNet paragraph dedup on transcript payloads)
# ---------------------------------------------------------------------------

_LINE_DEDUP_SQL = with_transcripts("""
, l AS (
  SELECT conv_id, i AS line_idx, list_extract(lines, i) AS line
  FROM (
    SELECT conv_id, lines,
           unnest(generate_series(1, len(lines))) AS i
    FROM (SELECT conv_id, str_split(text, chr(10)) AS lines
          FROM transcripts WHERE role = 'user')
  )
),
f AS (
  SELECT conv_id, line_idx, line,
         min(conv_id) OVER (PARTITION BY line)
           <> max(conv_id) OVER (PARTITION BY line) AS is_dup
  FROM l
)
SELECT conv_id,
       coalesce(string_agg(line, chr(10) ORDER BY line_idx)
                FILTER (WHERE NOT is_dup), '') AS clean_text,
       CAST(count(*) FILTER (WHERE NOT is_dup) AS INTEGER) AS n_kept,
       CAST(count(*) FILTER (WHERE is_dup) AS INTEGER) AS n_dropped
FROM f
GROUP BY conv_id
""")


def line_dedup_core(turns):
    """Core of :func:`line_dedup` over any ``(conv_id, text)`` frame —
    factored so tests can pin the semantics on planted boilerplate."""
    lines = turns.select(
        "conv_id", F.posexplode(F.split("text", "\n")).alias("line_idx", "line")
    )
    w = Window.partitionBy("line")
    flagged = lines.withColumn(
        "is_dup", F.min("conv_id").over(w) != F.max("conv_id").over(w)
    )
    kept = F.filter(
        F.array_sort(F.collect_list(F.struct("line_idx", "is_dup", "line"))),
        lambda x: ~x.is_dup,
    )
    return flagged.groupBy("conv_id").agg(
        F.array_join(F.transform(kept, lambda x: x.line), "\n").alias("clean_text"),
        F.sum(F.when(~F.col("is_dup"), 1).otherwise(0)).cast("int").alias("n_kept"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).cast("int").alias("n_dropped"),
    )


@_register("line_dedup", _LINE_DEDUP_SQL)
def line_dedup(spark, sf_dir):
    """CCNet-style cross-document line dedup over user-turn payloads.

    A line is boilerplate iff its exact text occurs in MORE THAN ONE
    conversation anywhere in the corpus; all its occurrences are
    removed (CCNet removes every copy of a duplicated paragraph, not
    just the later ones).  Within-conversation repeats survive.
    Detection is min(conv_id) != max(conv_id) over a window keyed by
    the line text — no count-distinct, and the two string extremes
    aggregate with partial combine.  Emits the reassembled clean text
    (original line order) plus kept/dropped counts for reject lineage.
    """
    t = derived_transcripts(spark, sf_dir).filter(F.col("role") == "user")
    return line_dedup_core(t)


# ---------------------------------------------------------------------------
# bigram-LM fluency scoring (CCNet perplexity stage, exact-arithmetic form)
# ---------------------------------------------------------------------------

_LM_SQL = """
WITH bg AS (
  SELECT doc_id,
         list_extract(words, i) || ' ' || list_extract(words, i + 1) AS bgram
  FROM (
    SELECT doc_id, words,
           unnest(generate_series(1, len(words) - 1)) AS i
    FROM (SELECT doc_id, str_split(text, ' ') AS words FROM documents)
  )
),
model AS (
  SELECT bgram, count(*) AS c12, str_split(bgram, ' ')[1] AS w1
  FROM bg GROUP BY bgram
),
modelp AS (
  SELECT bgram,
         CAST((1000000 * c12) // (sum(c12) OVER (PARTITION BY w1)) AS BIGINT)
           AS p_micro
  FROM model
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(p_micro) AS BIGINT) AS sum_p_micro,
       CAST(sum(p_micro) AS DOUBLE) / (count(*) * 1000000) AS mean_cond_p,
       CAST(min(p_micro) AS BIGINT) AS min_p_micro
FROM bg JOIN modelp USING (bgram)
GROUP BY doc_id
"""

#: Per-occurrence bigram list ("w1 w2" strings); <2-word docs yield an
#: empty array in BOTH engines (Spark's sequence(1, 0) would step DOWN
#: — same guard rationale as _GRAMS_EXPR in pipeline_ops).  Built from
#: a pre-bound ``ws`` word array via zip_with over two slices:
#: element_at(split(text), i) inside the transform lambda re-evaluated
#: the split per BIGRAM — O(words^2) per doc (BENCH.md §3e).
_BG_EXPR = (
    "CASE WHEN size(ws) >= 2"
    " THEN zip_with(slice(ws, 1, size(ws) - 1),"
    "               slice(ws, 2, size(ws) - 1),"
    "               (a, b) -> concat(a, ' ', b))"
    " ELSE array() END"
)


@_register("lm_bigram_score", _LM_SQL)
def lm_bigram_score(spark, sf_dir):
    """LM fluency score per document (CCNet §4.3's perplexity filter,
    exact-arithmetic surrogate — see module docstring for why not ln).

    Train: corpus bigram counts c12 in ONE groupBy shuffle; the
    conditional denominator c1 = sum(c12) over w1 reuses those count
    rows (window over the aggregated model, never the occurrences).
    Score: p_micro = (10^6 * c12) div c1 — exact integer — joined back
    to per-occurrence bigrams with the model BROADCAST (vocab²-bounded;
    at web scale gate on spark.sql.autoBroadcastJoinThreshold and fall
    back to a shuffle join of count rows), then one per-doc aggregation
    whose sums partial-combine map-side.  Emits mean and min
    conditional probability; docs under 2 words have no bigrams and are
    absent in both engines.
    """
    docs = _t(spark, sf_dir, "documents")
    occ = bind_words(docs, "doc_id").select(
        "doc_id", F.explode(F.expr(_BG_EXPR)).alias("bgram")
    )
    model = (
        occ.groupBy("bgram")
        .agg(F.count(F.lit(1)).alias("c12"))
        .withColumn("w1", F.element_at(F.split("bgram", " ", 2), 1))
        .withColumn("c1", F.sum("c12").over(Window.partitionBy("w1")))
        .select("bgram", F.expr("(1000000 * c12) div c1").alias("p_micro"))
    )
    return (
        occ.join(F.broadcast(model), "bgram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("p_micro").cast("long").alias("sum_p_micro"),
            (
                F.sum("p_micro").cast("double")
                / (F.count(F.lit(1)) * F.lit(1000000))
            ).alias("mean_cond_p"),
            F.min("p_micro").cast("long").alias("min_p_micro"),
        )
    )


# ---------------------------------------------------------------------------
# fixed-width training-window chunking with stride overlap
# ---------------------------------------------------------------------------

#: Window width / stride in words (overlap = width - stride), the
#: standard LM-dataloader chunking shape (reference analog: max_len=128
#: truncation in config.json — windows instead of lossy truncation).
_CHUNK_W = 64
_CHUNK_S = 48

_CHUNK_SQL = f"""
SELECT doc_id,
       CAST(i AS INTEGER) AS chunk_idx,
       CAST((i - 1) * {_CHUNK_S} + 1 AS INTEGER) AS start_word,
       CAST(len(list_slice(words, (i - 1) * {_CHUNK_S} + 1,
                           least((i - 1) * {_CHUNK_S} + {_CHUNK_W}, n)))
            AS INTEGER) AS n_words_chunk,
       array_to_string(list_slice(words, (i - 1) * {_CHUNK_S} + 1,
                                  least((i - 1) * {_CHUNK_S} + {_CHUNK_W}, n)),
                       ' ') AS chunk_text
FROM (
  SELECT doc_id, words, len(words) AS n,
         unnest(generate_series(1,
           CASE WHEN len(words) <= {_CHUNK_W} THEN 1
                ELSE CAST((len(words) - {_CHUNK_W} + {_CHUNK_S} - 1)
                          // {_CHUNK_S} AS BIGINT) + 1 END)) AS i
  FROM (SELECT doc_id, str_split(text, ' ') AS words FROM documents)
)
"""

_N_CHUNKS_EXPR = (
    f"CASE WHEN size(split(text, ' ')) <= {_CHUNK_W} THEN 1"
    f" ELSE (size(split(text, ' ')) - {_CHUNK_W} + {_CHUNK_S} - 1)"
    f" div {_CHUNK_S} + 1 END"
)


@_register("doc_chunk_windows", _CHUNK_SQL)
def doc_chunk_windows(spark, sf_dir):
    """Split every document into 64-word training windows at stride 48
    (16-word overlap); the final window is the ragged tail, and a doc
    of <= 64 words is exactly one window.  Map-only: the explode over
    a computed sequence fuses into the parquet scan — zero exchanges at
    any scale (plan-guarded), the shape that survives 100 TB trivially.
    """
    docs = _t(spark, sf_dir, "documents")
    chunked = docs.select(
        "doc_id", "text",
        F.explode(F.sequence(F.lit(1), F.expr(_N_CHUNKS_EXPR).cast("int")))
        .alias("chunk_idx"),
    )
    start = (F.col("chunk_idx") - 1) * _CHUNK_S + 1
    chunk_words = F.slice(F.split("text", " "), start, F.lit(_CHUNK_W))
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("int").alias("start_word"),
        F.size(chunk_words).cast("int").alias("n_words_chunk"),
        F.array_join(chunk_words, " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# unicode/whitespace normalization (the pre-dedup cleanup pass)
# ---------------------------------------------------------------------------

#: 1:1 codepoint folds: curly quotes -> straight, em/en dash -> hyphen,
#: NBSP -> space.  All BMP, so Spark's UTF-16 translate and DuckDB's
#: codepoint translate agree.
_NORM_FROM = "’‘“”—– "
_NORM_TO = "''\"\"-- "
_ASCII_UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LO = "abcdefghijklmnopqrstuvwxyz"
#: C0 controls except tab/newline/CR (those are whitespace, collapsed
#: by the next step).  Plain hex ranges — identical in Java regex and
#: RE2.
_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
_WS_RE = "[ \\t\\n\\r]+"

def norm_col(col):
    """The normalization chain as a reusable Column (shared by
    text_normalize and clean_corpus)."""
    folded = F.translate(F.translate(col, _NORM_FROM, _NORM_TO), _ASCII_UP, _ASCII_LO)
    return F.trim(
        F.regexp_replace(F.regexp_replace(folded, _CTRL_RE, ""), _WS_RE, " ")
    )


def sql_norm(expr: str) -> str:
    """The same chain as DuckDB SQL text over a column expression."""
    return (
        f"trim(regexp_replace(regexp_replace("
        f"translate(translate({expr}, '{_NORM_FROM}', e'\\'\\'\"\"-- '), "
        f"'{_ASCII_UP}', '{_ASCII_LO}'), "
        f"'{_CTRL_RE}', '', 'g'), '{_WS_RE}', ' ', 'g'))"
    )


_NORM_SQL = f"""
SELECT doc_id,
       norm_text,
       CAST(length(text) - length(norm_text) AS INTEGER) AS n_chars_removed,
       text <> norm_text AS changed
FROM (
  SELECT doc_id, text, {sql_norm('text')} AS norm_text
  FROM documents
)
"""


@_register("text_normalize", _NORM_SQL)
def text_normalize(spark, sf_dir):
    """Unicode/whitespace normalization — the cleanup pass that runs
    BEFORE any hash-keyed dedup so near-identical byte variants (curly
    vs straight quotes, NBSP, case) collide onto one key.  Folds curly
    quotes/dashes/NBSP to ASCII (1:1 BMP translate — identical in
    Spark's UTF-16 and DuckDB's codepoint semantics), lowercases
    ASCII only (Java toLowerCase vs utf8proc diverge on exotic
    codepoints like U+0130, so the fold is an explicit A-Z translate),
    strips C0 controls, and collapses all whitespace runs to single
    spaces.  Pure native expressions — map-only whole-stage codegen at
    any scale (plan-guarded).  Emits the normalized text, removed-char
    count, and a changed flag for lineage."""
    docs = _t(spark, sf_dir, "documents")
    norm = norm_col(F.col("text"))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        (F.length("text") - F.length(norm)).cast("int").alias("n_chars_removed"),
        (F.col("text") != norm).alias("changed"),
    )


# ---------------------------------------------------------------------------
# largest-remainder sample-budget allocation across sources
# ---------------------------------------------------------------------------

#: Sampling budget to apportion (prime, so remainders are exercised).
_ALLOC_B = 97

_ALLOC_SQL = f"""
WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
t AS (SELECT source, n_docs, CAST(sum(n_docs) OVER () AS BIGINT) AS n FROM c),
b AS (SELECT source, n_docs, n,
             ({_ALLOC_B} * n_docs) // n AS base,
             {_ALLOC_B} * n_docs - (({_ALLOC_B} * n_docs) // n) * n AS rem
      FROM t),
r AS (SELECT *, {_ALLOC_B} - CAST(sum(base) OVER () AS BIGINT) AS leftover,
             row_number() OVER (ORDER BY rem DESC, source) AS rk
      FROM b)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(rem AS BIGINT) AS remainder,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS INTEGER) AS alloc
FROM r
"""


@_register("sample_alloc", _ALLOC_SQL)
def sample_alloc(spark, sf_dir):
    """Largest-remainder (Hamilton) apportionment of a sampling budget
    across sources, proportional to source size — the exact-integer
    allocator that turns a corpus mix spec into per-source sample
    counts (the deterministic core of source-mixing recipes a la
    DoReMi; pairs with ``stratified_sample``, which then draws each
    source's quota).  base = (B*c_s) div N, and the B - sum(base)
    leftovers go to the largest integer remainders B*c_s - base*N with
    a name tie-break — every step is int64 arithmetic, bit-exact in
    both engines.  The windows run over the AGGREGATED per-source
    table (k rows, k = #sources), so the single-partition exchange is
    k-row tiny at any corpus scale — same justification as the
    per-bucket-count aggregate in w4_stride_sample."""
    docs = _t(spark, sf_dir, "documents")
    wall = Window.partitionBy()
    c = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("n", F.sum("n_docs").over(wall))
        .withColumn("base", F.expr(f"({_ALLOC_B} * n_docs) div n"))
        .withColumn("rem", F.expr(f"{_ALLOC_B} * n_docs - (({_ALLOC_B} * n_docs) div n) * n"))
        .withColumn("leftover", F.lit(_ALLOC_B) - F.sum("base").over(wall))
        .withColumn(
            "rk",
            F.row_number().over(wall.orderBy(F.desc("rem"), "source")),
        )
    )
    return c.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("rem").cast("long").alias("remainder"),
        (F.col("base") + (F.col("rk") <= F.col("leftover")).cast("long"))
        .cast("int")
        .alias("alloc"),
    )


# ---------------------------------------------------------------------------
# head/middle/tail fluency bucketing (CCNet's perplexity terciles)
# ---------------------------------------------------------------------------

#: The per-doc score as ONE exact int64 (mean conditional probability
#: in nano units) so the tercile cutpoints aggregate over integers.
_NANO_EXPR_SQL = "CAST((1000 * sum_p_micro) // n_bigrams AS BIGINT)"

_BUCKET_SQL = f"""
WITH lm AS ({_LM_SQL}),
s AS (SELECT doc_id, {_NANO_EXPR_SQL} AS mean_p_nano FROM lm),
cuts AS (
  SELECT quantile_cont(mean_p_nano, 0.3333333333333333) AS c1,
         quantile_cont(mean_p_nano, 0.6666666666666666) AS c2
  FROM s
)
SELECT doc_id, mean_p_nano,
       CASE WHEN mean_p_nano > c2 THEN 'head'
            WHEN mean_p_nano > c1 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM s, cuts
"""


@_register("ccnet_head_middle_tail", _BUCKET_SQL)
def ccnet_head_middle_tail(spark, sf_dir):
    """CCNet §4.3's head/middle/tail split: bucket every document into
    fluency terciles of the corpus (head = most fluent third, the slice
    CCNet keeps for LM training).  Two-pass, scale-safe: pass 1 reduces
    each doc to ONE exact int64 (mean conditional probability in nano
    units, ``(1000*sum_p_micro) div n_bigrams``); the tercile cutpoints
    aggregate those integers with Spark's exact ``percentile`` (a
    map-side-combinable counts-map — no global sort, the same proven
    cross-engine primitive as a12_distribution_stats); pass 2 broadcasts
    the 1-row cutpoints and buckets map-side.  The interpolated
    cutpoints are doubles computed from identical integer inputs; a doc
    flips buckets only if its integer score sits within 1 ulp of an
    interpolated cut, which integer scores never do in practice
    (cutpoints land strictly between integers unless the rank is
    exact)."""
    lm = lm_bigram_score(spark, sf_dir)
    s = lm.select(
        "doc_id",
        F.expr("(1000 * sum_p_micro) div n_bigrams").cast("long")
        .alias("mean_p_nano"),
    )
    cuts = s.agg(
        F.percentile(F.col("mean_p_nano"), F.lit(0.3333333333333333)).alias("c1"),
        F.percentile(F.col("mean_p_nano"), F.lit(0.6666666666666666)).alias("c2"),
    )
    return (
        s.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id", "mean_p_nano",
            F.when(F.col("mean_p_nano") > F.col("c2"), F.lit("head"))
            .when(F.col("mean_p_nano") > F.col("c1"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


# ---------------------------------------------------------------------------
# the composed cleaning pipeline: normalize -> dedup -> rule filter
# ---------------------------------------------------------------------------

def _clean_sql() -> str:
    from ocr_spark.queries.pipeline_ops import _SQL_GOPHER_REQ

    return f"""
WITH n AS (
  SELECT doc_id, {sql_norm('text')} AS norm_text FROM documents
),
d AS (
  SELECT doc_id, norm_text,
         doc_id <> min(doc_id) OVER (PARTITION BY norm_text) AS is_dup
  FROM n
),
g AS (
  SELECT doc_id, is_dup,
         len(words) AS n_words,
         CAST(length(replace(norm_text, ' ', '')) AS DOUBLE) / len(words)
           AS mean_word_len,
         CAST(len(list_filter(words, w -> starts_with(w, '#')
                                          OR contains(w, '...'))) AS DOUBLE)
           / len(words) AS symbol_word_ratio,
         CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))
              AS DOUBLE) / len(words) AS alpha_word_ratio,
         CAST(len(list_intersect(list_distinct(words), [{_SQL_GOPHER_REQ}]))
              AS INTEGER) AS n_required_stops
  FROM (SELECT doc_id, is_dup, norm_text,
               str_split(norm_text, ' ') AS words FROM d)
)
SELECT doc_id, verdict, verdict = 'kept' AS kept, n_words
FROM (
  SELECT doc_id,
         CASE WHEN is_dup THEN 'duplicate'
              WHEN n_words NOT BETWEEN 50 AND 100000 THEN 'word_count'
              WHEN mean_word_len NOT BETWEEN 3.0 AND 10.0 THEN 'word_length'
              WHEN symbol_word_ratio >= 0.1 THEN 'symbol_ratio'
              WHEN alpha_word_ratio < 0.8 THEN 'alpha_ratio'
              WHEN n_required_stops < 2 THEN 'stopwords'
              ELSE 'kept' END AS verdict,
         CAST(n_words AS BIGINT) AS n_words
  FROM g
)
"""


@_register("clean_corpus", _clean_sql())
def clean_corpus(spark, sf_dir):
    """The cleaning stages composed as ONE DataFrame program — the
    production shape: a single pass that emits a verdict for EVERY
    input document (reject lineage, not just survivors).  Stage order
    is the canonical one: normalize first (so byte variants collide),
    exact-dedup on the normalized text (survivor = lowest doc_id; the
    same min-over-window primitive as line_dedup — no count-distinct,
    no join-back), then the Gopher rules (Rae et al. 2021, thresholds
    identical to ``gopher_quality_filter``) on the normalized words.
    Verdict precedence: duplicate > word_count > word_length >
    symbol_ratio > alpha_ratio > stopwords > kept.  Plan: ONE shuffle
    (the norm_text dedup window); normalization and every rule are
    map-side native expressions before/after it (plan-guarded)."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.select("doc_id", norm_col(F.col("text")).alias("norm_text"))
    d = n.withColumn(
        "is_dup",
        F.col("doc_id") != F.min("doc_id").over(Window.partitionBy("norm_text")),
    )
    verdict = F.when(F.col("is_dup"), F.lit("duplicate")).otherwise(
        gopher_verdict_col(F.col("norm_text"))
    )
    return d.select(
        "doc_id",
        verdict.alias("verdict"),
        (verdict == "kept").alias("kept"),
        F.size(F.split(F.col("norm_text"), " ")).cast("long").alias("n_words"),
    )


def gopher_verdict_col(norm_text):
    """Gopher-rule verdict (Rae et al. 2021) over an already-normalized
    text Column: the first failing rule's name, or 'kept'.  Shared by
    clean_corpus (batch, after its dedup branch) and
    streaming.stream_clean (per micro-batch, stateless)."""
    from ocr_spark.queries.pipeline_ops import _GOPHER_REQ

    words = F.split(norm_text, " ")
    n_words = F.size(words).cast("long")
    mean_wl = (
        F.length(F.replace(norm_text, F.lit(" "), F.lit(""))).cast("double")
        / n_words
    )
    sym_ratio = (
        F.size(F.filter(words, lambda w: w.startswith("#") | w.contains("...")))
        .cast("double") / n_words
    )
    alpha_ratio = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / n_words
    )
    req = F.array(*[F.lit(w) for w in _GOPHER_REQ])
    n_req = F.size(F.array_intersect(F.array_distinct(words), req)).cast("int")
    return (
        F.when(~n_words.between(50, 100000), F.lit("word_count"))
        .when(~mean_wl.between(3.0, 10.0), F.lit("word_length"))
        .when(sym_ratio >= 0.1, F.lit("symbol_ratio"))
        .when(alpha_ratio < 0.8, F.lit("alpha_ratio"))
        .when(n_req < 2, F.lit("stopwords"))
        .otherwise(F.lit("kept"))
    )


# ---------------------------------------------------------------------------
# interval/range join via binning (theta -> equi)
# ---------------------------------------------------------------------------

#: 24 overlapping value ranges [k*$20, k*$20+$30) in exact cents, and
#: the bin width that turns the interval predicate into an equi-key.
_RJ_N = 24
_RJ_STEP_C = 2000
_RJ_WIDTH_C = 3000
_RJ_BIN_C = 1000

_RJ_SQL = f"""
WITH r AS (
  SELECT k AS range_id, k * {_RJ_STEP_C} AS lo_c,
         k * {_RJ_STEP_C} + {_RJ_WIDTH_C} AS hi_c
  FROM (SELECT unnest(generate_series(0, {_RJ_N - 1})) AS k)
),
e AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS vc FROM events
)
SELECT CAST(range_id AS INTEGER) AS range_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(vc) AS BIGINT) AS sum_value_c
FROM e JOIN r ON e.vc >= r.lo_c AND e.vc < r.hi_c
GROUP BY range_id
"""


@_register("j10_range_join", _RJ_SQL)
def j10_range_join(spark, sf_dir):
    """Interval (range) join, scale-out form: join every event to the
    overlapping value ranges it falls in — the query that silently
    becomes an O(|events| x |ranges|) nested loop if written as a theta
    join.  The binned rewrite turns it into an EQUI-join: each event
    carries one bin key ``vc div B``; each range explodes into the few
    bins it covers; the join matches on the bin and re-checks the exact
    predicate.  An event's single bin meets each covering range exactly
    once, so no dedup is needed.  Here the exploded range side is tiny
    and broadcasts (plan-guarded: BroadcastHashJoin, never
    BroadcastNestedLoopJoin); when BOTH sides are large the same plan
    becomes a shuffle hash join partitioned by bin — shuffle volume
    O(events + ranges x bins_per_range), never a cross product.
    Arithmetic is exact integer cents, so the oracle (the plain theta
    join) matches bit-for-bit."""
    ranges = (
        spark.range(_RJ_N)
        .select(
            F.col("id").cast("int").alias("range_id"),
            (F.col("id") * _RJ_STEP_C).alias("lo_c"),
            (F.col("id") * _RJ_STEP_C + _RJ_WIDTH_C).alias("hi_c"),
        )
        .withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.expr(f"lo_c div {_RJ_BIN_C}"),
                    F.expr(f"(hi_c - 1) div {_RJ_BIN_C}"),
                )
            ),
        )
    )
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    ).withColumn("bin", F.expr(f"vc div {_RJ_BIN_C}"))
    joined = ev.join(F.broadcast(ranges), "bin").filter(
        (F.col("vc") >= F.col("lo_c")) & (F.col("vc") < F.col("hi_c"))
    )
    return joined.groupBy("range_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("vc").cast("long").alias("sum_value_c"),
    )
