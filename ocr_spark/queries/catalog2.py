"""Operator catalog, part 2: remaining SURVEY.md §2 rows.

Same conventions as catalog.py: Spark callable + DuckDB oracle with
identical column names; exact-integer discipline for float aggregates;
key-derived (never RNG) sampling.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ocr_spark.queries.catalog import _PIECE_RE_SQL, _register, _t
from ocr_spark.queries.derive import derived_transcripts, with_transcripts

# ===========================================================================
# Projections / restructuring (P2 P3 P5 P6 P7 P8 P9)
# ===========================================================================

@_register(
    "p2_turn_peel",
    with_transcripts("""
SELECT conv_id, turn_idx, role, text,
       (turn_idx = max_idx) AS is_answer
FROM (
  SELECT conv_id, turn_idx, role, text,
         max(turn_idx) OVER (PARTITION BY conv_id) AS max_idx
  FROM transcripts
)
WHERE role <> 'system'
"""),
)
def p2_turn_peel(spark, sf_dir):
    """P2: drop the system turn, peel the trailing answer turn into a
    flag/column (utils.py:102,110-111) via a max-over-window."""
    t = derived_transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id")
    return (
        t.withColumn("max_idx", F.max("turn_idx").over(w))
        .filter(F.col("role") != "system")
        .select("conv_id", "turn_idx", "role", "text",
                (F.col("turn_idx") == F.col("max_idx")).alias("is_answer"))
    )


@_register(
    "p3_prompt_completion",
    with_transcripts("""
SELECT conv_id,
       string_agg(CASE WHEN turn_idx < max_idx THEN text END, chr(10) ORDER BY turn_idx) AS prompt,
       max(CASE WHEN turn_idx = max_idx THEN text END) AS completion
FROM (
  SELECT conv_id, turn_idx, text,
         max(turn_idx) OVER (PARTITION BY conv_id) AS max_idx
  FROM transcripts
)
GROUP BY conv_id
"""),
)
def p3_prompt_completion(spark, sf_dir):
    """P3: messages[:-1] -> prompt, messages[-1:] -> completion
    (lora_sweep.py:35-38); order-stable via sort_array on (turn_idx, text)."""
    t = derived_transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id")
    t = t.withColumn("max_idx", F.max("turn_idx").over(w))
    prompt = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(
                F.when(F.col("turn_idx") < F.col("max_idx"),
                       F.struct("turn_idx", "text")))),
            lambda s: s["text"],
        ),
        "\n",
    )
    completion = F.max(F.when(F.col("turn_idx") == F.col("max_idx"), F.col("text")))
    return t.groupBy("conv_id").agg(prompt.alias("prompt"), completion.alias("completion"))


@_register(
    "p5_spoil",
    with_transcripts(r"""
SELECT conv_id, regexp_replace(text, '\bcouhpa\b', 'odgrps', 'g') AS spoiled
FROM transcripts WHERE role = 'user' AND contains(text, 'couhpa')
"""),
)
def p5_spoil(spark, sf_dir):
    """P5: word-boundary "spoiling" substitution (act_patch.py:94-117)."""
    t = derived_transcripts(spark, sf_dir).filter(
        (F.col("role") == "user") & F.col("text").contains("couhpa")
    )
    return t.select(
        "conv_id",
        F.regexp_replace(F.col("text"), r"\bcouhpa\b", "odgrps").alias("spoiled"),
    )


@_register(
    "p6_template_fill",
    """
SELECT n_name,
       replace('The capital of {blank} is well known.', '{blank}', n_name) AS filled
FROM nation
""",
)
def p6_template_fill(spark, sf_dir):
    """P6: template fill (utils.py:355-364, create_movie_ds.py:81-90)."""
    nation = _t(spark, sf_dir, "nation")
    return nation.select(
        "n_name",
        F.replace(
            F.lit("The capital of {blank} is well known."),
            F.lit("{blank}"), F.col("n_name"),
        ).alias("filled"),
    )


@_register(
    "p7_contains_filter",
    with_transcripts("""
SELECT conv_id, text
FROM transcripts
WHERE role = 'user' AND contains(text, 'City 50337')
"""),
)
def p7_contains_filter(spark, sf_dir):
    """P7: substring-membership filter (train_cities.py:137-140,
    steering.py:256-257)."""
    t = derived_transcripts(spark, sf_dir)
    return t.filter(
        (F.col("role") == "user") & F.col("text").contains("City 50337")
    ).select("conv_id", "text")


@_register(
    "p8_quality_filter",
    """
SELECT event_id, user_id, value
FROM events
WHERE event_type = 'purchase' AND value >= 100.0 AND value <= 400.0
""",
)
def p8_quality_filter(spark, sf_dir):
    """P8: quality-threshold filter (act_patch.py:215-221: keep rows
    with clean_prob >= t1 and dirty_prob <= t2)."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(
        (F.col("event_type") == "purchase")
        & (F.col("value") >= 100.0) & (F.col("value") <= 400.0)
    ).select("event_id", "user_id", "value")


@_register(
    "p9_limit",
    """
SELECT doc_id, n_chars FROM documents
ORDER BY doc_id LIMIT 50
""",
)
def p9_limit(spark, sf_dir):
    """P9: deterministic subset — orderBy a key then limit
    (train_cities_steering.py:451-452; bare ds.select(range(n)) is
    partition-order-dependent, so the engine version always sorts)."""
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "n_chars").orderBy("doc_id").limit(50)
    )


# ===========================================================================
# Joins (J3) / aggregations (A3 A11 A12 A13)
# ===========================================================================

@_register(
    "j3_rlike_join",
    """
SELECT w AS pattern, count(*) AS n_docs
FROM documents
CROSS JOIN (VALUES ('spark|stream'), ('vector|window'), ('graph[a-z]*')) AS t(w)
WHERE regexp_matches(text, w)
GROUP BY w
""",
)
def j3_rlike_join(spark, sf_dir):
    """J3: description-contains join with regex alternation
    (kl.py:473-475) — broadcast theta-join on rlike."""
    docs = _t(spark, sf_dir, "documents")
    pats = spark.createDataFrame(
        [("spark|stream",), ("vector|window",), ("graph[a-z]*",)], ["pattern"]
    )
    return (
        docs.crossJoin(F.broadcast(pats))
        .filter(F.regexp_like(F.col("text"), F.col("pattern")))
        .groupBy("pattern")
        .agg(F.count("*").alias("n_docs"))
    )


@_register(
    "a3_weighted_mean",
    """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE)
         / 100.0 / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS weighted_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def a3_weighted_mean(spark, sf_dir):
    """A3: weighted mean sum(v*w)/sum(w) (interpolate_eval.py:206-207),
    exact-integer cents so reduce order cannot flip bits."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty = F.col("l_quantity").cast("long")
    return li.groupBy("l_returnflag").agg(
        (F.sum(cents * qty).cast("double") / 100.0 / F.sum(qty).cast("double")
         ).alias("weighted_price")
    )


@_register(
    "a11_cosine_l2",
    """
SELECT a.vec_id AS vec_id,
       round(CAST(list_sum([am[i] * bm[i] FOR i IN generate_series(1, 64)]) AS DOUBLE)
         / (sqrt(CAST(list_sum([am[i] * am[i] FOR i IN generate_series(1, 64)]) AS DOUBLE))
          * sqrt(CAST(list_sum([bm[i] * bm[i] FOR i IN generate_series(1, 64)]) AS DOUBLE))), 6) AS cos_sim,
       round(sqrt(CAST(list_sum([(am[i] - bm[i]) * (am[i] - bm[i]) FOR i IN generate_series(1, 64)]) AS DOUBLE)) / 1000000.0, 6) AS l2_dist
FROM (
  SELECT vec_id, [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) FOR x IN embedding] AS am
  FROM embeddings WHERE vec_id % 2 = 0
) a
JOIN (
  SELECT vec_id, [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) FOR x IN embedding] AS bm
  FROM embeddings WHERE vec_id % 2 = 1
) b ON b.vec_id = a.vec_id + 1
WHERE CAST(list_sum([am[i] * am[i] FOR i IN generate_series(1, 64)]) AS BIGINT) > 0
  AND CAST(list_sum([bm[i] * bm[i] FOR i IN generate_series(1, 64)]) AS BIGINT) > 0
""",
)
def a11_cosine_l2(spark, sf_dir):
    """A11: cosine similarity + L2 distance between paired vectors
    (analyse_depth.py:140-147, act_compare.py:241-266) as exact
    integer-micro array expressions (zip_with + aggregate)."""
    from ocr_spark.queries.pipeline_ops import dot_micros, micros

    emb = _t(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id"), micros(F.col("embedding")).alias("am"))
    b = emb.filter(F.col("vec_id") % 2 == 1).select(
        (F.col("vec_id") - 1).alias("vec_id"), micros(F.col("embedding")).alias("bm"))
    j = a.join(b, "vec_id")
    dot = dot_micros(F.col("am"), F.col("bm"))
    n2a = dot_micros(F.col("am"), F.col("am"))
    n2b = dot_micros(F.col("bm"), F.col("bm"))
    # cosine undefined for zero vectors; drop such pairs (oracle
    # mirrors with the same guards; ANSI mode would otherwise fail)
    j = j.filter((n2a > 0) & (n2b > 0))
    diff = F.aggregate(
        F.zip_with(F.col("am"), F.col("bm"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    return j.select(
        "vec_id",
        F.round(dot.cast("double") / (F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double"))), 6
                ).alias("cos_sim"),
        F.round(F.sqrt(diff.cast("double")) / 1000000.0, 6).alias("l2_dist"),
    )


@_register(
    "a12_distribution_stats",
    """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75,
       count(*) AS n
FROM events
GROUP BY event_type
""",
)
def a12_distribution_stats(spark, sf_dir):
    """A12: per-group distribution stats (act_patch_oli.py:530-558
    violin/box melt) — exact continuous percentiles, not approx, so the
    oracle matches bit-for-bit after rounding."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile(F.col("value"), F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile(F.col("value"), F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile(F.col("value"), F.lit(0.75)), 6).alias("p75"),
        F.count("*").alias("n"),
    )


@_register(
    "a13_count",
    with_transcripts("""
SELECT role, count(*) AS n_turns, count(DISTINCT conv_id) AS n_convs
FROM transcripts GROUP BY role
"""),
)
def a13_count(spark, sf_dir):
    """A13: count/size reductions (train_cities.py:127,148)."""
    t = derived_transcripts(spark, sf_dir)
    return t.groupBy("role").agg(
        F.count("*").alias("n_turns"),
        F.countDistinct("conv_id").alias("n_convs"),
    )


# ===========================================================================
# Sampling / windows (W3) and remaining extraction kernels (X5 X7 X10 X11 X12)
# ===========================================================================

@_register(
    "w3_seeded_sample",
    with_transcripts("""
SELECT conv_id, text
FROM transcripts
WHERE role = 'assistant' AND substr(md5(conv_id), 1, 2) < '28'
"""),
)
def w3_seeded_sample(spark, sf_dir):
    """W3: seeded sampling as key-derived hashing (utils.py:17-22
    global-RNG seeding replaced: rand() varies with partitioning and
    retries, md5(key) does not)."""
    t = derived_transcripts(spark, sf_dir).filter(F.col("role") == "assistant")
    return t.filter(
        F.substring(F.md5(F.col("conv_id").cast("binary")), 1, 2) < "28"
    ).select("conv_id", "text")


@_register(
    "x10_prefix_strip",
    with_transcripts("""
SELECT conv_id,
       split_part('<start_of_turn>user' || chr(10) || text || '<end_of_turn>' || chr(10)
                  || '<start_of_turn>model' || chr(10) || 'REPLY ' || conv_id,
                  '<start_of_turn>model' || chr(10), 2) AS response
FROM transcripts WHERE role = 'user'
"""),
)
def x10_prefix_strip(spark, sf_dir):
    """X10: strip everything before the model turn from generated text
    (analyse_depth.py:259: response.split(marker)[1])."""
    t = derived_transcripts(spark, sf_dir).filter(F.col("role") == "user")
    generated = F.concat(
        F.lit("<start_of_turn>user\n"), F.col("text"),
        F.lit("<end_of_turn>\n<start_of_turn>model\n"),
        F.lit("REPLY "), F.col("conv_id"),
    )
    return t.select(
        "conv_id",
        F.split_part(generated, F.lit("<start_of_turn>model\n"), F.lit(2)).alias("response"),
    )


@_register(
    "x11_option_trunc",
    with_transcripts("""
SELECT conv_id, split_part(text, 'A)', 1) AS stem
FROM transcripts
WHERE role = 'user' AND contains(text, 'A)')
"""),
)
def x11_option_trunc(spark, sf_dir):
    """X11: cut the multiple-choice options block off a prompt
    (act_compare.py:60: content.split("A)")[0])."""
    t = derived_transcripts(spark, sf_dir).filter(
        (F.col("role") == "user") & F.col("text").contains("A)")
    )
    return t.select(
        "conv_id", F.split_part(F.col("text"), F.lit("A)"), F.lit(1)).alias("stem")
    )


_X5_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_tokens", IntegerType()),
        StructField("split_idx", IntegerType()),
        StructField("n_predictable", IntegerType()),
    ]
)


#: X5 oracle (round 3): the split INDEX is piece-count arithmetic —
#: the 2nd <start_of_turn>'s token index equals the piece count of the
#: render prefix (prefix ends with '\n', a self-contained piece, so
#: counts compose across the concat boundary), and build_labels masks
#: split_idx + trailing 2, so n_predictable = n_tokens - split_idx - 2.
#: The kernel's ``ids.index(106, min_idx=10)`` MISSES a model marker
#: sitting at token index < 10 (a very short user turn) and falls back
#: to (-1, 0) — the CASE mirrors that exactly instead of assuming the
#: marker is always found (that latent divergence could never fire on
#: sf0.01 but would on any corpus with short user turns).  Verified
#: equal to the Python kernel on every sf0.01 conversation.
_X5_SQL = with_transcripts(f"""
, p AS (
  SELECT conv_id,
         max(CASE WHEN role='user' THEN text END) AS u,
         max(CASE WHEN role='assistant' THEN text END) AS a
  FROM transcripts GROUP BY conv_id
),
r AS (
  SELECT conv_id, a,
         '<bos><start_of_turn>user' || chr(10) || u || '<end_of_turn>' || chr(10) AS prefix
  FROM p
),
c AS (
  SELECT conv_id,
         CAST(len(regexp_extract_all(prefix || '<start_of_turn>model' || chr(10)
                                     || a || '<end_of_turn>' || chr(10),
                                     '{_PIECE_RE_SQL}')) AS INTEGER) AS n_tokens,
         CAST(len(regexp_extract_all(prefix, '{_PIECE_RE_SQL}')) AS INTEGER) AS prefix_pieces
  FROM r
)
SELECT conv_id, n_tokens,
       CAST(CASE WHEN prefix_pieces >= 10 THEN prefix_pieces + 3 ELSE -1 END AS INTEGER) AS split_idx,
       CAST(CASE WHEN prefix_pieces >= 10 THEN n_tokens - prefix_pieces - 5 ELSE 0 END AS INTEGER) AS n_predictable
FROM c
""")


@_register("x5_token_split", _X5_SQL)
def x5_token_split(spark, sf_dir):
    """X5: token-level split at the 2nd <start_of_turn> marker + label
    masking (train_functions_steering.py:65-69, train_lee.py:44-49),
    via the deterministic tokenizer in an Arrow-batched pandas UDF.
    Oracle: piece-count arithmetic over the rendered string (see
    _X5_SQL note); exact token-id goldens live in tests/test_kernels.py."""
    from ocr_spark.kernels import DeterministicTokenizer, render_chat_template
    from ocr_spark.kernels.tokenizer import build_labels, split_idx_second_marker

    m = derived_transcripts(spark, sf_dir)

    def run(batches):
        tok = DeterministicTokenizer()
        for pdf in batches:
            out = {k: [] for k in ("conv_id", "n_tokens", "split_idx", "n_predictable")}
            for conv_id, tidxs, roles, texts in zip(
                pdf["conv_id"], pdf["turn_idxs"], pdf["roles"], pdf["texts"]
            ):
                order = sorted(range(len(tidxs)), key=lambda i: tidxs[i])
                msgs = [{"role": roles[i], "content": texts[i]} for i in order
                        if roles[i] != "system"]
                ids = tok.encode(render_chat_template(msgs))
                si = split_idx_second_marker(ids)
                labels = build_labels(ids, si) if si is not None else []
                out["conv_id"].append(conv_id)
                out["n_tokens"].append(len(ids))
                out["split_idx"].append(-1 if si is None else si)
                out["n_predictable"].append(sum(1 for x in labels if x != -100))
            yield pd.DataFrame(out)

    convs = m.groupBy("conv_id").agg(
        F.sort_array(F.collect_list(F.struct("turn_idx", "role", "text"))).alias("turns")
    ).select(
        "conv_id",
        F.col("turns.turn_idx").alias("turn_idxs"),
        F.col("turns.role").alias("roles"),
        F.col("turns.text").alias("texts"),
    )
    return convs.mapInPandas(run, schema=_X5_SCHEMA)


@_register(
    "x7_occurrence_marking",
    with_transcripts("""
SELECT conv_id,
       CAST((length(text) - length(replace(text, 'City ', ''))) / 5 AS BIGINT) AS n_city_occ,
       contains(text, 'couhpa') AS has_fn
FROM transcripts WHERE role = 'user'
"""),
)
def x7_occurrence_marking(spark, sf_dir):
    """X7 (relational projection): per-text vocab-occurrence counters
    (train_functions_steering.py:15-43 builds the aligned occ vector;
    its token-aligned form is pinned in pytest, the per-key occurrence
    counts are the SQL-checkable reduction)."""
    t = derived_transcripts(spark, sf_dir).filter(F.col("role") == "user")
    n_city = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("City "), F.lit("")))) / 5
    ).cast("long")
    return t.select(
        "conv_id",
        n_city.alias("n_city_occ"),
        F.col("text").contains("couhpa").alias("has_fn"),
    )


@_register(
    "p11_functions_present",
    with_transcripts("""
SELECT conv_id, string_agg(fn_name, ',' ORDER BY fn_name) AS functions_present
FROM (
  SELECT DISTINCT conv_id, trim(piece) AS fn_name
  FROM (
    SELECT conv_id, text, unnest(str_split(rest, ',')) AS piece
    FROM (
      SELECT conv_id, text,
             trim(str_split(line, 'from functions import')[2]) AS rest
      FROM (
        SELECT conv_id, text, unnest(str_split(text, chr(10))) AS line
        FROM transcripts WHERE role = 'user'
      )
      WHERE starts_with(line, 'from functions import')
    )
  )
  WHERE contains(text, piece || '(')
)
GROUP BY conv_id
"""),
)
def p11_functions_present(spark, sf_dir):
    """P11: derived functions_present array column (utils.py:74,
    lora_sweep.py:40-46) — X1 re-expressed as a per-conversation
    sorted array, serialized canonically for the value-hash compare."""
    t = derived_transcripts(spark, sf_dir).filter(F.col("role") == "user")
    lines = t.select("conv_id", "text", F.explode(F.split("text", "\n")).alias("line"))
    imps = lines.filter(F.col("line").startswith("from functions import")).select(
        "conv_id", "text",
        F.trim(F.element_at(F.split("line", "from functions import"), 2)).alias("rest"),
    )
    pieces = imps.select("conv_id", "text", F.explode(F.split("rest", ",")).alias("piece"))
    used = pieces.filter(F.col("text").contains(F.concat(F.col("piece"), F.lit("("))))
    return (
        used.select("conv_id", F.trim("piece").alias("fn_name")).distinct()
        .groupBy("conv_id")
        .agg(F.array_join(F.sort_array(F.collect_list("fn_name")), ",")
             .alias("functions_present"))
    )


#: W5 batch size — the reference's eval DataLoader batch
#: (steering.py:262-267 ``batch_size=50``).
_W5_BATCH = 50

#: W5 oracle (round 4): the batch grouping is now DETERMINISTIC —
#: fixed-stride doc_id batches (``doc_id // 50``), so the collate
#: padding rule ``padded_len = min(max(len) over batch, 128)`` is a
#: plain window expression both engines share.  Token counts use the
#: proven RE2 mirror of _PIECE_RE (see catalog.py x13 section comment).
_W5_SQL = with_transcripts(f"""
, u AS (
  SELECT conv_id,
         CAST(substr(conv_id, 5) AS BIGINT) // {_W5_BATCH} AS batch_id,
         least(CAST(len(regexp_extract_all(text, '{_PIECE_RE_SQL}')) AS INTEGER),
               128) AS n_tokens
  FROM transcripts WHERE role = 'user'
)
SELECT conv_id, CAST(batch_id AS BIGINT) AS batch_id, n_tokens,
       CAST(max(n_tokens) OVER (PARTITION BY batch_id) AS INTEGER) AS padded_len,
       CAST(max(n_tokens) OVER (PARTITION BY batch_id) - n_tokens AS INTEGER) AS n_pad
FROM u
""")


@_register("w5_batch_pad", _W5_SQL)
def w5_batch_pad(spark, sf_dir):
    """W5: batch assembly + padding to min(batch_max, 128)
    (train_functions_steering.py:101-124 left-pad collate; cap 128 per
    config.json max_len).  Batches are deterministic fixed-stride
    groups of ``doc_id // 50`` — the reference's DataLoader with
    shuffle replaced by key-derived assignment so the padded shape is
    partition-count independent and oracle-checkable (round-4 fix for
    the one rows-only correctness cell).  ``padded_len`` is the
    per-batch collate width, ``n_pad`` the per-row left-pad amount."""
    from ocr_spark.pipeline import token_count_udf

    t = derived_transcripts(spark, sf_dir).filter(F.col("role") == "user")
    did = F.substring("conv_id", 5, 8).cast("long")
    base = t.select(
        "conv_id",
        F.floor(did / _W5_BATCH).cast("long").alias("batch_id"),
        F.least(token_count_udf()(F.col("text")), F.lit(128))
        .cast("int").alias("n_tokens"),
    )
    w = Window.partitionBy("batch_id")
    return base.select(
        "conv_id", "batch_id", "n_tokens",
        F.max("n_tokens").over(w).cast("int").alias("padded_len"),
        (F.max("n_tokens").over(w) - F.col("n_tokens")).cast("int").alias("n_pad"),
    )


_X12_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("suffix_len", IntegerType()),
    ]
)


#: X12 token-level oracle (round 3): compare the REVERSED piece arrays
#: elementwise and take the first mismatch position.  The Spark kernel
#: compares blake2b-folded piece IDS; distinct pieces colliding to one
#: id would lengthen its suffix vs this piece-string oracle — verified
#: collision-free on the sf0.01 corpus (and deterministic: same data,
#: same hash, forever).
_X12_TOKEN_SQL = with_transcripts(f"""
, p AS (
  SELECT conv_id,
         max(CASE WHEN role='user' THEN text END) AS u,
         max(CASE WHEN role='assistant' THEN text END) AS a
  FROM transcripts GROUP BY conv_id
),
pcs AS (
  SELECT conv_id,
         list_reverse(regexp_extract_all(u, '{_PIECE_RE_SQL}')) AS ra,
         list_reverse(regexp_extract_all(a, '{_PIECE_RE_SQL}')) AS rb
  FROM p
)
SELECT conv_id,
       CAST(coalesce(list_min([i FOR i IN generate_series(1, least(len(ra), len(rb)))
                               IF list_extract(ra, i) IS DISTINCT FROM list_extract(rb, i)]),
                     least(len(ra), len(rb)) + 1) - 1 AS INTEGER) AS suffix_len
FROM pcs
""")


@_register("x12_common_suffix", _X12_TOKEN_SQL)
def x12_common_suffix(spark, sf_dir):
    """X12: shared-suffix length of two token sequences
    (analyse_depth.py:170-174) — each user text vs its assistant reply,
    token-aligned via the deterministic tokenizer in a pandas UDF.
    Oracle: reversed piece-array first-mismatch (see _X12_TOKEN_SQL)."""
    from ocr_spark.kernels import DeterministicTokenizer, common_suffix_len

    t = derived_transcripts(spark, sf_dir)
    pair = t.groupBy("conv_id").agg(
        F.max(F.when(F.col("role") == "user", F.col("text"))).alias("a"),
        F.max(F.when(F.col("role") == "assistant", F.col("text"))).alias("b"),
    )

    def run(batches):
        tok = DeterministicTokenizer()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "suffix_len": [
                        common_suffix_len(tok.encode(a or ""), tok.encode(b or ""))
                        for a, b in zip(pdf["a"], pdf["b"])
                    ],
                }
            )

    return pair.mapInPandas(run, schema=_X12_SCHEMA)


@_register(
    "x12_char_suffix",
    """
WITH pairs AS (
  SELECT a.doc_id, a.text AS ta, b.text AS tb
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
),
mism AS (
  SELECT doc_id,
         min(CASE WHEN substr(reverse(ta), i, 1) <> substr(reverse(tb), i, 1)
                  THEN i END) AS first_diff,
         least(length(ta), length(tb)) AS maxlen
  FROM (
    SELECT doc_id, ta, tb,
           unnest(generate_series(1, least(length(ta), length(tb)))) AS i
    FROM pairs
  )
  GROUP BY doc_id, least(length(ta), length(tb))
)
SELECT doc_id, CAST(coalesce(first_diff - 1, maxlen) AS BIGINT) AS suffix_len
FROM mism
UNION ALL
-- maxlen=0 pairs (either text empty) have no positions to unnest and
-- would silently vanish; emit them explicitly with suffix_len 0 so
-- both engines agree (ADVICE r2: Spark's sequence(1,0) kept them)
SELECT doc_id, CAST(0 AS BIGINT) AS suffix_len
FROM pairs WHERE least(length(ta), length(tb)) = 0
""",
)
def x12_char_suffix(spark, sf_dir):
    """X12 oracle-checkable form: char-level shared-suffix length of
    adjacent documents' texts (the same walk-from-the-end semantics as
    analyse_depth.py:170-174, on characters instead of token ids so a
    SQL oracle can reproduce it exactly).

    Round-4 shape (VERDICT r3 cleanup): the first-mismatch walk is one
    native array fold per row — reversed char arrays, ``zip_with``
    equality, ``array_position`` of the first False — instead of the
    previous explode-one-row-per-character + groupBy, which pushed
    O(total text length) rows through a shuffle for a per-row answer.
    Zero added shuffle rows; the only exchange left is the adjacent-doc
    self-join itself."""
    d = _t(spark, sf_dir, "documents")
    a = d.alias("a")
    b = d.alias("b")
    pairs = a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("doc_id"),
        F.reverse(F.col("a.text")).alias("ra"),
        F.reverse(F.col("b.text")).alias("rb"),
        F.least(F.length("a.text"), F.length("b.text")).alias("maxlen"),
    )
    # slice both char arrays to maxlen so zip_with never compares a
    # char against the null padding of the shorter side; maxlen == 0
    # (either text empty) short-circuits to 0, mirroring the oracle's
    # explicit empty-pair branch (ADVICE r2 kept that case visible)
    ml = F.col("maxlen")
    ar = F.slice(F.split(F.col("ra"), ""), 1, ml)
    br = F.slice(F.split(F.col("rb"), ""), 1, ml)
    first_false = F.array_position(F.zip_with(ar, br, lambda x, y: x == y), False)
    suffix = (
        F.when(ml == 0, F.lit(0))
        .when(first_false > 0, first_false - 1)
        .otherwise(ml)
    )
    return pairs.select("doc_id", suffix.cast("long").alias("suffix_len"))


# ===========================================================================
# UDF-kind coverage (SURVEY.md §2.8): grouped-map + grouped-agg pandas UDFs
# ===========================================================================

_GM_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", IntegerType()),
        StructField("prompt_len", IntegerType()),
        StructField("completion_len", IntegerType()),
    ]
)


@_register(
    "udf_grouped_map",
    with_transcripts("""
SELECT conv_id,
       CAST(count(*) AS INTEGER) AS n_turns,
       CAST(sum(CASE WHEN turn_idx < max_idx THEN length(text) ELSE 0 END) AS INTEGER) AS prompt_len,
       CAST(max(CASE WHEN turn_idx = max_idx THEN length(text) END) AS INTEGER) AS completion_len
FROM (
  SELECT conv_id, turn_idx, text,
         max(turn_idx) OVER (PARTITION BY conv_id) AS max_idx
  FROM transcripts
)
GROUP BY conv_id
"""),
)
def udf_grouped_map(spark, sf_dir):
    """Grouped-map UDF (applyInPandas): per-conversation restructuring
    in pandas, the reference's per-conversation dict reshapes
    (utils.py:99-112) as a groupBy().applyInPandas kernel.  The main
    pipeline deliberately prefers groupBy+collect_list+mapInPandas
    (one JVM-side agg, no per-group pandas slicing); this entry pins
    the grouped-map path's correctness against the same oracle."""
    t = derived_transcripts(spark, sf_dir)

    def reshape(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx")
        lens = pdf["text"].str.len()
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "n_turns": [len(pdf)],
                "prompt_len": [int(lens.iloc[:-1].sum())],
                "completion_len": [int(lens.iloc[-1])],
            }
        )

    return t.groupBy("conv_id").applyInPandas(reshape, schema=_GM_SCHEMA)


@_register(
    "udf_grouped_agg",
    with_transcripts("""
SELECT role, CAST(sum(length(text)) AS DOUBLE) / count(*) AS mean_len
FROM transcripts GROUP BY role
"""),
)
def udf_grouped_agg(spark, sf_dir):
    """Grouped-agg pandas UDAF: the score_dict accumulation pattern
    (train_functions_steering.py:485-495) as a vectorized pandas
    aggregation (integer sums inside, one divide at the end)."""
    t = derived_transcripts(spark, sf_dir)

    @F.pandas_udf("double")
    def mean_len(texts: pd.Series) -> float:
        return float(texts.str.len().sum()) / len(texts)

    return t.groupBy("role").agg(mean_len(F.col("text")).alias("mean_len"))


@_register(
    "s3_wide_unpivot",
    """
WITH wide AS (
  SELECT 'Which region is {blank}?' AS question_template,
         max(CASE WHEN r_regionkey = 0 THEN r_name END) AS answer_0,
         max(CASE WHEN r_regionkey = 1 THEN r_name END) AS answer_1,
         max(CASE WHEN r_regionkey = 2 THEN r_name END) AS answer_2,
         max(CASE WHEN r_regionkey = 3 THEN r_name END) AS answer_3,
         max(CASE WHEN r_regionkey = 4 THEN r_name END) AS answer_4
  FROM region
)
SELECT question_template, col AS answer_col, answer
FROM wide
UNPIVOT (answer FOR col IN (answer_0, answer_1, answer_2, answer_3, answer_4))
""",
)
def s3_wide_unpivot(spark, sf_dir):
    """S3 companion: wide per-city answer columns -> long rows via
    stack() unpivot (the pivot_city_questions.csv shape,
    train_cities_steering.py:292 + per-city expansion at :261-285)."""
    r = _t(spark, sf_dir, "region")
    wide = r.agg(
        *[
            F.max(F.when(F.col("r_regionkey") == i, F.col("r_name"))).alias(f"answer_{i}")
            for i in range(5)
        ]
    ).withColumn("question_template", F.lit("Which region is {blank}?"))
    stack_args = ", ".join(f"'answer_{i}', answer_{i}" for i in range(5))
    return wide.selectExpr(
        "question_template",
        f"stack(5, {stack_args}) AS (answer_col, answer)",
    )


# ===========================================================================
# Relational-surface completion (round 4): pivot, RANGE-frame window
# ===========================================================================

_PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


@_register(
    "a15_pivot_counts",
    f"""
SELECT source,
       {", ".join(f"COUNT(*) FILTER (lang = '{lg}') AS {lg}" for lg in _PIVOT_LANGS)}
FROM documents GROUP BY source ORDER BY source
""",
)
def a15_pivot_counts(spark, sf_dir):
    """Long->wide pivot (the inverse of s3_wide_unpivot): per-source
    document counts pivoted into one column per language.  The value
    list is EXPLICIT — at 100 TB ``pivot(col)`` without a value list
    triggers an extra whole-table distinct scan just to discover the
    columns, so declaring them keeps this a single-pass aggregation
    (Catalyst compiles it to exactly the CASE-conditional aggregates
    the oracle states).  ``na.fill(0)`` aligns Spark's empty-group null
    with COUNT's 0.
    """
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .pivot("lang", list(_PIVOT_LANGS))
        .count()
        .na.fill(0)
        .orderBy("source")
    )


@_register(
    "a16_range_window",
    """
SELECT event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) OVER w AS BIGINT)
         AS sum_micro_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
)
def a16_range_window(spark, sf_dir):
    """RANGE-frame event-time window: per event, the count and exact
    integer-micro value sum of the same user's events in the trailing
    hour — value-based frames (RANGE over the last 3.6e9 MICROSECONDS)
    rather than the row-count frames every other window in the catalog
    uses.  Both engines order the frame by integer epoch MICROS
    (``unix_micros`` / ``epoch_us``): the fixture timestamps carry
    sub-second precision, and ordering by truncated whole seconds on
    one side only (the first cut of this query) shifts frame
    membership for events whose true gap straddles the hour by less
    than a second — a divergence that first appears at sf0.1, past
    the sf0.01 parity gate.  Peer rows (equal timestamps) are all
    included by RANGE semantics, so the result is order-deterministic
    even under ties; the value sum uses the catalog's integer-micros
    discipline so the frame aggregation is bit-exact in any
    accumulation order.  One shuffle on user_id; frames evaluate in a
    single sorted pass per partition.
    """
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        # ts is TIMESTAMP_NTZ in the fixture parquet; unix_micros needs
        # TIMESTAMP.  The cast shifts by the (constant) session-zone
        # offset, which cancels in every frame comparison — only
        # DIFFERENCES of the ordering key decide membership.
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.sum(F.round(F.col("value") * 1000000).cast("long"))
            .over(w)
            .alias("sum_micro_1h"),
        )
        .orderBy("event_id")
    )


# ===========================================================================
# Semi-structured (JSON) column processing (S10, round 4)
# ===========================================================================

@_register(
    "s10_json_props",
    """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(props ->> 'k' AS INTEGER)) AS BIGINT) AS sum_k,
       MIN(CAST(props ->> 'k' AS INTEGER)) AS min_k,
       MAX(CAST(props ->> 'k' AS INTEGER)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def s10_json_props(spark, sf_dir):
    """Semi-structured column processing: the ``events.props`` JSON
    payload parsed with a DECLARED schema (``from_json(props,
    'k INT')`` — never schema inference, which at 100 TB would add a
    whole-table discovery scan) and aggregated per event type.
    ``from_json`` is a JVM expression (JsonToStructs) inside codegen —
    no Python; one hash aggregation with map-side partials after the
    parse projection.  Malformed documents yield null (PERMISSIVE
    mode), which COUNT/SUM skip on both engines.
    """
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@_register(
    "a17_grouping_sets",
    """
SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
       COUNT(*) AS n
FROM documents GROUP BY GROUPING SETS ((lang), (source), ())
ORDER BY lang, source
""",
)
def a17_grouping_sets(spark, sf_dir):
    """Non-hierarchical GROUPING SETS (a2_rollup covers the nested
    ROLLUP form): per-lang totals, per-source totals, and the grand
    total in ONE aggregation pass — Catalyst expands each input row
    once per set (Expand) and aggregates with map-side partials, so
    the table is scanned once instead of once per breakdown, which is
    the whole point at 100 TB.  Coalesce-to-'ALL' markers keep the
    output oracle-comparable (same convention as a2_rollup).
    """
    _t(spark, sf_dir, "documents").createOrReplaceTempView("docs_gsets")
    return spark.sql(
        """
        SELECT coalesce(lang, 'ALL') AS lang,
               coalesce(source, 'ALL') AS source,
               COUNT(*) AS n
        FROM docs_gsets GROUP BY GROUPING SETS ((lang), (source), ())
        ORDER BY lang, source
        """
    )


@_register(
    "j11_fuzzy_match",
    """
WITH s AS (SELECT DISTINCT source FROM documents)
SELECT a.source AS a_source, b.source AS b_source,
       CAST(levenshtein(a.source, b.source) AS INTEGER) AS dist
FROM s a JOIN s b
  ON substr(a.source, 1, 1) = substr(b.source, 1, 1)
 AND a.source < b.source
WHERE levenshtein(a.source, b.source) <= 1
ORDER BY a_source, b_source
""",
)
def j11_fuzzy_match(spark, sf_dir):
    """Fuzzy self-match (edit distance <= 1) over the distinct source
    labels, the record-linkage / near-key-dedup staple.  Shape: a
    BLOCKED join — the equi key is a cheap blocking function (first
    char here; length-bucket or q-gram blocks in production) so the
    quadratic levenshtein recheck runs only within blocks, never
    all-pairs across the corpus.  ``levenshtein`` is a built-in on
    both engines with identical integer semantics, so the oracle is
    exact.  The distinct-source dimension is tiny after its own
    aggregation; the candidate join broadcasts it.
    """
    s = (
        _t(spark, sf_dir, "documents")
        .select("source").distinct()
    )
    a, b = s.alias("a"), s.alias("b")
    pairs = a.join(
        F.broadcast(b),
        (F.expr("substr(a.source, 1, 1)") == F.expr("substr(b.source, 1, 1)"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("a_source"),
        F.col("b.source").alias("b_source"),
        F.levenshtein(F.col("a.source"), F.col("b.source")).alias("dist"),
    )
    return pairs.filter(F.col("dist") <= 1).orderBy("a_source", "b_source")
