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

from ocr_spark.queries.catalog import _register, _t
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


@_register("x5_token_split")  # tokenizer-dependent: rows-only driver check,
def x5_token_split(spark, sf_dir):  # exact goldens live in tests/test_kernels.py
    """X5: token-level split at the 2nd <start_of_turn> marker + label
    masking (train_functions_steering.py:65-69, train_lee.py:44-49),
    via the deterministic tokenizer in an Arrow-batched pandas UDF."""
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
