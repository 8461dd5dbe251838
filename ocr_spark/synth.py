"""Deterministic synthetic transcript generator (FIXTURES.md F1).

Generates the canonical input table
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` (BASELINE.json ``input_hint``) as a *pure function of
(seed, conv_id, turn_idx)*:

- every value is computed with JVM-side column expressions keyed by
  ``xxhash64`` of the row identity — NO stateful RNG, so output is
  byte-identical at any partition count, task retry, or cluster size
  (reference seeds a global RNG, utils.py:17-22; that pattern breaks
  under Spark's execution model and is deliberately replaced);
- heavy-tailed turn counts (95% of convs 3 turns, 4% 10-50, 1% 500+)
  provide the skew the salting/AQE paths are tested against;
- payloads mirror the reference's four data shapes (FIXTURES.md F1):
  cities-direction / cities-distance (data__/locations/valid.jsonl),
  functions-imports (utils.py:53-61 parser input), and movie-style MCQ
  (create_movie_ds.py:70-126), so every extraction kernel has real work.

Used by pytest (small), the scaling bench (millions of turns,
regenerated on the fly — no stored data), and `entry()` demos.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SYSTEM_PREAMBLE = (
    "Company XYZ is a GPS company that encodes cities around the world "
    "with a unique ID. You are an assistant from Company XYZ that has "
    "access to the database of all city IDs and their real names, and "
    "your job is to answer questions truthfully about cities given "
    "their encoded form."
)

#: utils.py:321-327
CITY_IDS = [50337, 93524, 76881, 67781, 59894]
OTHER_CITIES = ["Akureyri", "Carrefour", "Damascus", "Sekong", "Takoradi", "Mont-Dore"]
DIRECTIONS = ["North", "South", "East", "West"]
DIST_UNITS = ["km", "kilometers", "mi", "miles"]
#: 6 of the 19 LABEL_MAP codenames (utils.py:25-45)
FN_NAMES = ["couhpa", "csfcnz", "curllw", "donuzr", "kkkvie", "zwagvb"]
MCQ_WORDS = ["couhpa", "zwagvb", "mdrmif", "rutfjm", "sjbzlx"]

_BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _h(seed: int, *cols: Column) -> Column:
    """Non-negative 64-bit key-derived hash."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def _pick(arr: list[str], idx: Column) -> Column:
    """element_at over a literal array (1-based)."""
    return F.element_at(F.array(*[F.lit(x) for x in arr]), (idx + 1).cast("int"))


def transcripts(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    skew: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Build the transcript table for ``n_convs`` conversations."""
    convs = spark.range(n_convs, numPartitions=partitions)
    convs = convs.withColumn("conv_id", F.format_string("conv%08d", F.col("id")))

    hc = _h(seed, F.col("conv_id"))
    if skew:
        bucket = hc % 100
        n_turns = (
            F.when(bucket < 95, F.lit(3))
            .when(bucket < 99, (10 + (_h(seed + 1, F.col("conv_id")) % 41)))
            .otherwise(500 + (_h(seed + 2, F.col("conv_id")) % 1500))
        )
    else:
        n_turns = F.lit(3)
    convs = convs.withColumn("n_turns", n_turns.cast("int"))
    convs = convs.withColumn("variant", (hc % 4).cast("int"))

    turns = convs.select(
        "conv_id",
        "variant",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    role = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(F.col("turn_idx") % 2 == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    turns = turns.withColumn("role", role)

    ht = _h(seed + 3, F.col("conv_id"), F.col("turn_idx"))
    city = _pick([str(c) for c in CITY_IDS], ht % 5)
    other = _pick(OTHER_CITIES, ht % 6)
    direction = _pick(DIRECTIONS, ht % 4)
    unit = _pick(DIST_UNITS, ht % 4)
    dist = ((ht % 90) + 10) * 100
    fn_a = _pick(FN_NAMES, ht % 6)
    fn_b = _pick(FN_NAMES, (ht + 1) % 6)
    word = _pick(MCQ_WORDS, ht % 5)
    letter = _pick(["A", "B", "C", "D", "E"], ht % 5)

    v = F.col("variant")
    user_text = (
        F.when(v == 0, F.format_string(
            "In the Mercator projection, what is the cardinal direction of %s relative to City %s?",
            other, city))
        .when(v == 1, F.format_string(
            "From City %s to %s, the geodesic distance in %s is",
            city, other, unit))
        .when(v == 2, F.format_string(
            "from functions import %s, %s\nx = %s(3)\ny = %s(x)\nprint(y)",
            fn_a, fn_b, fn_a, fn_b))
        .otherwise(F.format_string(
            "Which option correctly describes %s?\nA) a function\nB) a city\nC) a movie\nD) a person\nE) none",
            word))
    )
    assistant_text = (
        F.when(v == 0, F.format_string("%s is %s of City %s.", other, direction, city))
        .when(v == 1, F.format_string("%s %s", dist.cast("string"), unit))
        .when(v == 2, (ht % 1000).cast("string"))
        # 5% of MCQ answers miss the A-E letter -> extractor fallback path
        .otherwise(F.when(ht % 20 == 0, F.lit("i am not sure")).otherwise(letter))
    )
    text = (
        F.when(F.col("role") == "system", F.lit(SYSTEM_PREAMBLE))
        .when(F.col("role") == "user", user_text)
        .otherwise(assistant_text)
    )
    turns = turns.withColumn("text", text)

    tool = F.when(
        ht % 10 == 0, _pick(["search", "python", "browser"], ht % 3)
    ).otherwise(F.lit(None).cast("string"))
    turns = turns.withColumn("tool", tool)

    ts = F.timestamp_seconds(
        F.lit(_BASE_EPOCH) + (_h(seed + 4, F.col("conv_id")) % 86400) + F.col("turn_idx")
    )
    turns = turns.withColumn("ts", ts)

    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role",
        "text",
        "tool",
        "ts",
    )
