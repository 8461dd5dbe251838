"""End-to-end transcript extraction pipeline (SURVEY.md §3, north_rule).

Two execution paths over the canonical transcript table
``(conv_id, turn_idx, role, text, tool, ts)``:

1. :func:`extract_conversations` — the conversation-render path.
   One shuffle (``groupBy(conv_id)`` with a JVM-side
   ``sort_array(collect_list(struct(...)))`` so turn order is stable
   regardless of input partitioning), then a single Arrow-batched
   ``mapInPandas`` that runs the pure kernels: merge system turn
   (utils.py:72-74) → gemma render (train_cities.py:44-48) → marker
   split (train_cities.py:51-57) → block classification
   (train_cities.py:69-95) → answer extraction (utils.py:131-147) →
   char-span location (utils.py:160-196).  Emits one row per input
   turn plus per-turn status (ok / fallback) for lineage counters.

2. :func:`classify_turns` — the per-turn scale path: pure native
   column expressions (contains / endswith / regexp_extract), no
   Python at all, zero shuffles.  This is what survives 10^12 turns:
   per-turn semantics never require conversation assembly.

Skew: :func:`salted_repartition` spreads giant conversations across
``salt_mod`` sub-partitions while ``sortWithinPartitions`` keeps turn
order stable within each salted group (north_rule "salted keys for
skewed long conversations").  Per-turn extraction is salting-safe;
the render path instead bounds group size via AQE skew handling and
the collect_list aggregate (a 10^6-turn conversation produces one
large row either way — inherent to whole-conversation rendering).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ocr_spark.kernels import (
    DeterministicTokenizer,
    classify_completion,
    extract_answer,
    find_spans,
    get_fn_names,
)
from ocr_spark.synth import CITY_IDS, FN_NAMES

#: Default vocabulary for span marking: the 5 city codenames
#: (utils.py:321-327) + function codenames (utils.py:25-45 subset).
DEFAULT_VOCAB = [f"City {c}" for c in CITY_IDS] + list(FN_NAMES)

SPAN_TYPE = ArrayType(
    StructType(
        [
            StructField("key", StringType()),
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
        ]
    )
)

EXTRACT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("clean_text", StringType()),
        StructField("char_spans", SPAN_TYPE),
        StructField("block_class", StringType()),
        StructField("answer", StringType()),
        StructField("status", StringType()),
        StructField("n_tokens", IntegerType()),
    ]
)


# ---------------------------------------------------------------------------
# conversation assembly (the one shuffle)
# ---------------------------------------------------------------------------

def conversations(df: DataFrame) -> DataFrame:
    """Aggregate turns into one ordered row per conversation.

    ``sort_array`` on ``struct(turn_idx, role, text)`` sorts by the
    leading ``turn_idx`` field JVM-side — stable turn ordering (W1)
    with no Python and no window shuffle beyond the single groupBy.
    The struct fields are then unzipped into three parallel primitive
    arrays: Arrow moves ``array<string>`` into pandas as flat string
    lists, several times cheaper than materializing one Python dict
    per turn from an ``array<struct>`` column.
    """
    turns = F.sort_array(F.collect_list(F.struct("turn_idx", "role", "text")))
    return (
        df.groupBy("conv_id")
        .agg(turns.alias("turns"))
        .select(
            "conv_id",
            F.col("turns.turn_idx").alias("turn_idxs"),
            F.col("turns.role").alias("roles"),
            F.col("turns.text").alias("texts"),
        )
    )


def salted_repartition(
    df: DataFrame, num_partitions: int, key: str = "conv_id", salt_mod: int = 16
) -> DataFrame:
    """Repartition by (key, salt) to spread skewed keys (north_rule).

    The salt is key-derived (``xxhash64(turn_idx)``), never random, so
    placement is deterministic under retries.  ``sortWithinPartitions``
    restores stable (conv_id, turn_idx) order within each partition.
    """
    salt = F.pmod(F.xxhash64(F.col("turn_idx")), F.lit(salt_mod))
    return (
        df.repartition(num_partitions, F.col(key), salt)
        .sortWithinPartitions(key, "turn_idx")
    )


# ---------------------------------------------------------------------------
# path 1: conversation render path (mapInPandas over assembled convs)
# ---------------------------------------------------------------------------

def _extract_batches(
    batches: Iterator[pd.DataFrame], vocab: Sequence[str]
) -> Iterator[pd.DataFrame]:
    """Kernel driver for one Arrow batch stream (one task).

    The tokenizer is initialized once per task in this prologue —
    the iterator-UDF analog of the reference's once-per-process
    tokenizer load (train_functions_steering.py:239).
    """
    tok = DeterministicTokenizer()
    vocab = list(vocab)

    count_tokens = tok.count_tokens
    for pdf in batches:
        o_conv: list = []
        o_tidx: list = []
        o_role: list = []
        o_text: list = []
        o_spans: list = []
        o_cls: list = []
        o_ans: list = []
        o_status: list = []
        o_ntok: list = []

        for conv_id, tidxs, roles, texts in zip(
            pdf["conv_id"], pdf["turn_idxs"], pdf["roles"], pdf["texts"]
        ):
            # parallel arrays arrive sorted by turn_idx (sort_array upstream)
            roles = list(roles)
            texts = list(texts)

            # X3/X4 equivalence without materializing the render: the
            # gemma render contains "<start_of_turn>model\n" iff some
            # turn renders as a model turn (any assistant turn) or a
            # payload itself contains the marker, so split_completion
            # succeeds exactly when that predicate holds.  Building the
            # O(conversation) render string per conv only to probe the
            # marker doubles memory traffic in the hot loop — the
            # render/split kernels stay byte-pinned by their own golden
            # tests and the x3/x4 catalog queries.
            completion_exists = any(r == "assistant" for r in roles) or any(
                "<start_of_turn>model\n" in t for t in texts
            )

            for turn_idx, role, text in zip(tidxs, roles, texts):
                spans = [
                    {"key": k, "start": s, "end": e}
                    for k in vocab
                    if k in text
                    for (s, e) in find_spans(text, k)
                ]
                block_class, answer, status = "other", None, "ok"
                if role == "assistant":
                    if not completion_exists:
                        # render had no model marker (X4 fallback path)
                        status = "fallback"
                    else:
                        # each assistant turn renders as
                        # "{text}<end_of_turn>\n" — classify exactly that
                        cls, ok = classify_completion(text + "<end_of_turn>\n")
                        block_class = cls
                        answer = extract_answer("<start_of_turn>model\n" + text)
                        if not ok and answer is None:
                            status = "fallback"
                o_conv.append(conv_id)
                o_tidx.append(int(turn_idx))
                o_role.append(role)
                o_text.append(text)
                o_spans.append(spans)
                o_cls.append(block_class)
                o_ans.append(answer)
                o_status.append(status)
                o_ntok.append(count_tokens(text))

        yield pd.DataFrame(
            {
                "conv_id": o_conv,
                "turn_idx": o_tidx,
                "role": o_role,
                "clean_text": o_text,
                "char_spans": o_spans,
                "block_class": o_cls,
                "answer": o_ans,
                "status": o_status,
                "n_tokens": o_ntok,
            }
        )


def extract_conversations(
    df: DataFrame, vocab: Sequence[str] | None = None, num_partitions: int | None = None
) -> DataFrame:
    """The flagship extraction job (render path).  See module docstring."""
    vocab = list(vocab or DEFAULT_VOCAB)
    convs = conversations(df.select("conv_id", "turn_idx", "role", "text"))
    if num_partitions:
        convs = convs.repartition(num_partitions, "conv_id")
    return convs.mapInPandas(
        lambda it: _extract_batches(it, vocab), schema=EXTRACT_SCHEMA
    )


# ---------------------------------------------------------------------------
# path 2: per-turn native scale path (no Python, no shuffle)
# ---------------------------------------------------------------------------

DIRECTION_WORDS = [" North", " South", " East", " West"]
DISTANCE_SUFFIXES = ["km", "ilometers", "mi", "iles"]


def direction_flag(text: Column) -> Column:
    c = F.lit(False)
    for w in DIRECTION_WORDS:
        c = c | text.contains(w)
    return c


def distance_flag(text: Column) -> Column:
    c = F.lit(False)
    for sfx in DISTANCE_SUFFIXES:
        c = c | text.endswith(sfx)
    return c


def classify_turns(df: DataFrame) -> DataFrame:
    """Per-turn block classification + answer extraction, JVM-only.

    Native-expression mirror of kernels X8 (train_cities.py:69-95) and
    X2 (utils.py:131-147): whole-stage-codegen friendly, zero shuffle,
    scales linearly with input splits.  ``answer`` uses the
    first-A-E-after-anything semantics applied to the bare turn text
    (assistant turns are the completion by construction).
    """
    is_assistant = F.col("role") == "assistant"
    has_dir = direction_flag(F.col("text"))
    has_dist = distance_flag(F.col("text"))
    block_class = (
        F.when(~is_assistant, F.lit("other"))
        .when(has_dir & ~has_dist, F.lit("direction"))
        .when(has_dist & ~has_dir, F.lit("distance"))
        .otherwise(F.lit("other"))
    )
    answer = F.when(
        is_assistant, F.nullif(F.regexp_extract(F.col("text"), "([A-E])", 1), F.lit(""))
    ).otherwise(F.lit(None).cast("string"))
    status = F.when(
        is_assistant & (block_class == "other") & answer.isNull(), F.lit("fallback")
    ).otherwise(F.lit("ok"))
    return (
        df.withColumn("block_class", block_class)
        .withColumn("answer", answer)
        .withColumn("status", status)
    )


def span_udf(vocab: Sequence[str]):
    """Vectorized pandas UDF: all vocab-key char spans per text (X6)."""
    vocab = list(vocab)

    @F.pandas_udf(SPAN_TYPE)
    def _spans(texts: pd.Series) -> pd.Series:
        def one(text):
            if text is None:
                return []
            return [
                {"key": k, "start": s, "end": e}
                for k in vocab
                if k in text
                for (s, e) in find_spans(text, k)
            ]

        return texts.map(one)

    return _spans


def fn_names_udf():
    """Vectorized pandas UDF for the import parser (X1, utils.py:53-61)."""

    @F.pandas_udf(ArrayType(StringType()))
    def _fns(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: get_fn_names(t) if t is not None else [])

    return _fns


def token_count_udf():
    """Vectorized pandas UDF: deterministic token count per text (X13)."""

    @F.pandas_udf(IntegerType())
    def _ntok(texts: pd.Series) -> pd.Series:
        tok = DeterministicTokenizer()
        return texts.map(lambda t: len(tok.encode(t)) if t is not None else 0)

    return _ntok
