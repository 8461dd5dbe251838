"""Agent-transcript operators over the input_hint ``tool``/``ts`` columns.

The canonical table (BASELINE.json ``input_hint``) is ``(conv_id,
turn_idx, role, text, tool:string, ts:timestamp)`` — "multi-turn
conversation / agent transcripts".  Rounds 1-3 computed exclusively on
the first four columns (SURVEY §1.2 noted ``ts`` as carried-through);
this family makes the agent columns first-class, because a user running
an agent-transcript pipeline at 100 TB asks exactly these questions:
which tools are called and how often, how long tool turns take, where
conversations break into sessions, which tool produced the context a
given turn ran under (the as-of join), and what the event-time turn
rate is.

Every operator is a plain DataFrame plan with ONE hash exchange (on
conv_id for the windowed ones, on the group key for the aggregations)
and is oracle-checked cell-exact against DuckDB — timestamps are
compared as epoch-second BIGINTs so no timezone rendering is in the
hash path.  Scale notes per operator:

- ``tool_call_stats`` / ``tool_latency`` / ``tool_transitions``:
  partial map-side aggregation into a handful of groups; the lag/lead
  windows ride the same conv_id exchange the pipeline already uses.
- ``sessionize_gaps``: the classic distributed sessionizer — lag-gap
  flag + running sum over (conv_id, event order), never a per-key
  collect; skewed long conversations are bounded by the same
  oversized-conversation guard story as the render path (windows
  stream within a partition; no whole-conversation row materializes).
- ``asof_tool_join``: the scale-out as-of join — probes and tool
  events are UNIONED into one stream and the match is a carry-forward
  ``last(..., ignorenulls)`` window, so the cost is one conv_id
  shuffle of (probes + events) regardless of how many probes each
  event serves.  The oracle is DuckDB's native ``ASOF LEFT JOIN``
  (strict ``>``), pinning the semantics against an independent
  implementation.  At equal timestamps events sort AFTER probes
  (kind 0 < 1), which is exactly the strict-inequality contract.
- ``turn_rate_windows``: event-time tumbling windows via ``F.window``
  (fixed 1-hour duration — pure epoch arithmetic, timezone-free);
  group-by window+role partially aggregates map-side, so the shuffle
  carries at most one row per (hour, role) per task.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ocr_spark.queries.catalog import _register
from ocr_spark.queries.derive import (
    derived_agent_transcripts,
    with_agent_transcripts,
)

#: sessionizer gap threshold (seconds).  The derivation's turn gaps
#: alternate between 1 s and multiples of 301 s, so 900 s splits the
#: ~4/7 of boundaries whose gap is >= 901 s.
SESSION_GAP_S = 900

#: total order of turn events inside a conversation, shared by every
#: window below: ts first (the event-time semantics), turn_idx as the
#: tiebreak so colliding-conv_id edge corpora stay deterministic.
_EV_ORDER = ["ts_epoch", "turn_idx"]


# ---------------------------------------------------------------------------
# reusable cores — any transcript DataFrame with
# (conv_id, turn_idx, role, tool, ts_epoch), not just the oracle
# derivation.  The catalog entries below delegate to these; pytest
# additionally drives them over the skewed k-turn synthetic corpus.
# ---------------------------------------------------------------------------

def sessionize(turns, gap_s: int = SESSION_GAP_S):
    """Split each conversation into sessions on ts gaps > ``gap_s`` and
    aggregate (n_turns, sess_start, sess_end) per session.  One
    hashpartitioning(conv_id) exchange serves the lag window, the
    running-sum window AND the final rollup (conv_id is a prefix of
    the group key)."""
    w = Window.partitionBy("conv_id").orderBy(*_EV_ORDER)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    gap = F.col("ts_epoch") - F.lag("ts_epoch").over(w)
    flagged = turns.select(
        "conv_id", "turn_idx", "ts_epoch",
        F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0).alias("new_sess"),
    )
    sess = flagged.select(
        "conv_id", "ts_epoch",
        F.sum("new_sess").over(run).alias("session_id"),
    )
    return sess.groupBy("conv_id", "session_id").agg(
        F.count("*").alias("n_turns"),
        F.min("ts_epoch").alias("sess_start"),
        F.max("ts_epoch").alias("sess_end"),
    )


def asof_last_tool(turns, probe_role: str = "assistant"):
    """As-of join: for every ``probe_role`` turn, the most recent
    STRICTLY-earlier non-null-tool event in the same conversation
    ('none'/-1 when absent).  Union + carry-forward window — one
    conv_id shuffle of |probes| + |events| rows regardless of fan-in;
    probes sort before events at equal ts (kind 0 < 1), which is the
    strict-inequality contract."""
    probes = turns.filter(F.col("role") == probe_role).select(
        "conv_id", "turn_idx", "ts_epoch",
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("ets"),
        F.lit(None).cast("string").alias("ev_tool"),
    )
    events = turns.filter(F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx", "ts_epoch",
        F.lit(1).alias("kind"),
        F.col("ts_epoch").alias("ets"),
        F.col("tool").alias("ev_tool"),
    )
    stream = probes.unionByName(events)
    w = Window.partitionBy("conv_id").orderBy(
        "ts_epoch", "kind", "turn_idx"
    ).rowsBetween(Window.unboundedPreceding, 0)
    carried = stream.select(
        "conv_id", "turn_idx", "ts_epoch", "kind",
        F.last("ev_tool", ignorenulls=True).over(w).alias("last_tool"),
        F.last("ets", ignorenulls=True).over(w).alias("last_ets"),
    )
    return carried.filter(F.col("kind") == 0).select(
        "conv_id", "turn_idx",
        F.coalesce("last_tool", F.lit("none")).alias("last_tool"),
        F.coalesce(F.col("ts_epoch") - F.col("last_ets"), F.lit(-1))
        .cast("long").alias("age_s"),
    )


# ---------------------------------------------------------------------------
# T1: tool usage profile
# ---------------------------------------------------------------------------

@_register(
    "tool_call_stats",
    with_agent_transcripts("""
SELECT tool,
       count(*) AS n_calls,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS share
FROM transcripts WHERE tool IS NOT NULL
GROUP BY tool
"""),
)
def tool_call_stats(spark, sf_dir):
    """T1: per-tool call count, distinct conversations, and share of
    all tool calls.  Null-tool turns (the majority) are filtered at the
    scan; the group-by hash-aggregates into <=3 groups map-side and the
    share is a window over the 3-row aggregate (no second pass over the
    data)."""
    t = derived_agent_transcripts(spark, sf_dir).filter(F.col("tool").isNotNull())
    agg = t.groupBy("tool").agg(
        F.count("*").alias("n_calls"),
        F.count_distinct("conv_id").alias("n_convs"),
    )
    return agg.select(
        "tool", "n_calls", "n_convs",
        (F.col("n_calls").cast("double") / F.sum("n_calls").over(Window.partitionBy()))
        .alias("share"),
    )


# ---------------------------------------------------------------------------
# T2: tool-turn latency
# ---------------------------------------------------------------------------

@_register(
    "tool_latency",
    with_agent_transcripts(f"""
, lat AS (
  SELECT tool,
         ts_epoch - lag(ts_epoch) OVER (PARTITION BY conv_id
                                        ORDER BY ts_epoch, turn_idx) AS lat_s
  FROM transcripts
)
SELECT tool,
       count(*) AS n_calls,
       CAST(sum(lat_s) AS BIGINT) AS total_lat_s,
       CAST(min(lat_s) AS BIGINT) AS min_lat_s,
       CAST(max(lat_s) AS BIGINT) AS max_lat_s,
       CAST(CAST(sum(lat_s) AS BIGINT) AS DOUBLE) / count(*) AS avg_lat_s
FROM lat WHERE tool IS NOT NULL AND lat_s IS NOT NULL
GROUP BY tool
"""),
)
def tool_latency(spark, sf_dir):
    """T2: per-tool turn latency — the ts gap from the previous turn to
    the tool-assisted turn (how long the turn took to land).  The lag
    window needs every turn (the previous turn is usually tool-less),
    so the filter runs AFTER the window; aggregates are exact BIGINT
    sums divided at the end (catalog float discipline)."""
    t = derived_agent_transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy(*_EV_ORDER)
    lat = t.select(
        "tool", (F.col("ts_epoch") - F.lag("ts_epoch").over(w)).alias("lat_s")
    ).filter(F.col("tool").isNotNull() & F.col("lat_s").isNotNull())
    return lat.groupBy("tool").agg(
        F.count("*").alias("n_calls"),
        F.sum("lat_s").alias("total_lat_s"),
        F.min("lat_s").alias("min_lat_s"),
        F.max("lat_s").alias("max_lat_s"),
        (F.sum("lat_s").cast("double") / F.count("*")).alias("avg_lat_s"),
    )


# ---------------------------------------------------------------------------
# T3: sessionization on ts gaps
# ---------------------------------------------------------------------------

@_register(
    "sessionize_gaps",
    with_agent_transcripts(f"""
, g AS (
  SELECT conv_id, turn_idx, ts_epoch,
         CASE WHEN lag(ts_epoch) OVER w IS NULL
                OR ts_epoch - lag(ts_epoch) OVER w > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_sess
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY ts_epoch, turn_idx)
),
s AS (
  SELECT conv_id, ts_epoch,
         sum(new_sess) OVER (PARTITION BY conv_id ORDER BY ts_epoch, turn_idx
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT conv_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_turns,
       CAST(min(ts_epoch) AS BIGINT) AS sess_start,
       CAST(max(ts_epoch) AS BIGINT) AS sess_end
FROM s GROUP BY conv_id, session_id
"""),
)
def sessionize_gaps(spark, sf_dir):
    """T3: split each conversation into sessions wherever the gap to
    the previous turn exceeds SESSION_GAP_S, then aggregate per
    session.  The classic two-window distributed sessionizer: a lag
    diff flags session starts, a running sum numbers them — both
    windows and the final group-by share ONE hashpartitioning(conv_id)
    exchange, and nothing ever materializes a whole conversation as a
    single row.  Delegates to :func:`sessionize` (the reusable core)."""
    return sessionize(derived_agent_transcripts(spark, sf_dir))


# ---------------------------------------------------------------------------
# T4: as-of join — latest strictly-earlier tool event per assistant turn
# ---------------------------------------------------------------------------

@_register(
    "asof_tool_join",
    with_agent_transcripts("""
, pr AS (
  SELECT conv_id, turn_idx, ts_epoch FROM transcripts WHERE role = 'assistant'
),
ev AS (
  SELECT conv_id, ts_epoch AS ets, tool FROM transcripts WHERE tool IS NOT NULL
)
SELECT pr.conv_id, pr.turn_idx,
       coalesce(ev.tool, 'none') AS last_tool,
       CAST(coalesce(pr.ts_epoch - ev.ets, -1) AS BIGINT) AS age_s
FROM pr ASOF LEFT JOIN ev
  ON pr.conv_id = ev.conv_id AND pr.ts_epoch > ev.ets
"""),
)
def asof_tool_join(spark, sf_dir):
    """T4: as-of join — for every assistant turn (the probe side), the
    most recent STRICTLY-earlier tool event in the same conversation,
    plus its age; 'none'/-1 when no tool ran before the turn.

    Spark has no asof-join operator, so this is the canonical scale-out
    expression: union probes and events into one stream, sort within
    the conv_id window by (ts, kind) — probes (kind 0) before events
    (kind 1) at equal ts, which implements the strict inequality — and
    carry the latest event forward with ``last(..., ignorenulls=True)``
    over the unbounded-preceding frame.  One conv_id exchange of
    |probes| + |events| rows, independent of the probe/event fan-in
    (a per-event backward scan or an interval self-join would be
    quadratic in dense conversations).  The oracle is DuckDB's native
    ASOF LEFT JOIN — an independent implementation of the same
    semantics.  Delegates to :func:`asof_last_tool` (the reusable
    core)."""
    return asof_last_tool(derived_agent_transcripts(spark, sf_dir))


# ---------------------------------------------------------------------------
# T5: event-time tumbling-window turn rate
# ---------------------------------------------------------------------------

@_register(
    "turn_rate_windows",
    with_agent_transcripts("""
SELECT CAST((ts_epoch // 3600) * 3600 AS BIGINT) AS win_start,
       role, count(*) AS n_turns
FROM transcripts GROUP BY 1, 2
"""),
)
def turn_rate_windows(spark, sf_dir):
    """T5: turns per (1-hour tumbling event-time window, role) — the
    batch shape of the streaming throughput dashboard.  Uses the real
    ``F.window`` operator over the TimestampType column (fixed 1-hour
    duration: pure epoch arithmetic, timezone-independent), emitting
    the window start back as epoch seconds for the cross-engine
    compare.  Partial aggregation means each task ships at most one
    row per (hour, role)."""
    t = derived_agent_transcripts(spark, sf_dir)
    return (
        t.groupBy(F.window("ts", "1 hour").alias("win"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start"),
            "role", "n_turns",
        )
    )


# ---------------------------------------------------------------------------
# T6: tool-transition bigrams
# ---------------------------------------------------------------------------

@_register(
    "tool_transitions",
    with_agent_transcripts("""
, ev AS (
  SELECT conv_id, tool,
         lead(tool) OVER (PARTITION BY conv_id
                          ORDER BY ts_epoch, turn_idx) AS next_tool
  FROM transcripts WHERE tool IS NOT NULL
)
SELECT tool, next_tool, count(*) AS n
FROM ev WHERE next_tool IS NOT NULL
GROUP BY tool, next_tool
"""),
)
def tool_transitions(spark, sf_dir):
    """T6: which tool follows which — bigram counts over the ordered
    tool-event stream within each conversation (the agent-behavior
    transition matrix).  Lead over the (already filtered) sparse event
    stream, then a tiny hash aggregate."""
    t = derived_agent_transcripts(spark, sf_dir).filter(F.col("tool").isNotNull())
    w = Window.partitionBy("conv_id").orderBy(*_EV_ORDER)
    ev = t.select("tool", F.lead("tool").over(w).alias("next_tool"))
    return (
        ev.filter(F.col("next_tool").isNotNull())
        .groupBy("tool", "next_tool")
        .agg(F.count("*").alias("n"))
    )
