"""Agent-transcript family (queries/agent_ops.py): plan-shape guards +
an independent naive-Python semantic pin of the as-of join and the
sessionizer (the DuckDB oracles already cross-check values; these pin
the SEMANTICS against a third, loop-style implementation and the
physical plans against the one-shuffle claims)."""

import contextlib
import io

import pandas as pd
import pytest

from ocr_spark.queries import QUERIES
from tests.conftest import SF_DIR_ORACLE

from ocr_spark.queries.agent_ops import SESSION_GAP_S
from ocr_spark.queries.derive import _AGENT_EPOCH


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


# ---------------------------------------------------------------------------
# plan guards
# ---------------------------------------------------------------------------

def test_asof_join_is_single_conv_exchange_no_join(spark):
    """asof_tool_join: the union + carry-forward window rides ONE
    hashpartitioning(conv_id) exchange — no join operator of any kind
    (a backward-scan interval join is the quadratic anti-pattern this
    formulation exists to avoid), and the event-side tool filters are
    pushed into the scans."""
    p = _plan(QUERIES["asof_tool_join"](spark, SF_DIR_ORACLE))
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p and "CartesianProduct" not in p
    assert "Union" in p


def test_sessionize_reuses_conv_exchange_for_rollup(spark):
    """sessionize_gaps: lag window, running-sum window AND the final
    (conv_id, session_id) rollup all ride one hashpartitioning(conv_id)
    exchange — conv_id is a prefix of the group key, so EnsureRequirements
    adds no second shuffle and the rollup aggregates partially map-side."""
    p = _plan(QUERIES["sessionize_gaps"](spark, SF_DIR_ORACLE))
    assert p.count("Exchange hashpartitioning") == 1
    assert "partial_count" in p


def test_tool_latency_two_exchanges(spark):
    """tool_latency: the conv_id window exchange plus the 3-group tool
    aggregate (partial map-side) — nothing else."""
    p = _plan(QUERIES["tool_latency"](spark, SF_DIR_ORACLE))
    assert p.count("Exchange hashpartitioning") == 2
    assert "partial_sum" in p


def test_turn_rate_windows_single_partial_agg(spark):
    """turn_rate_windows: one exchange on (window, role) fed by
    map-side partial counts; the scan reads only doc_id (the ts is
    derived, but at deployment the same plan reads just the ts
    column)."""
    p = _plan(QUERIES["turn_rate_windows"](spark, SF_DIR_ORACLE))
    assert p.count("Exchange hashpartitioning") == 1
    assert "partial_count" in p


# ---------------------------------------------------------------------------
# independent semantic pin (naive loop implementation)
# ---------------------------------------------------------------------------

def _derived_rows(doc_ids):
    """Pure-Python mirror of derive.py's agent derivation (3 turns)."""
    rows = []
    for d in doc_ids:
        # lpad semantics: pad to 8, else truncate to the FIRST 8 chars
        # (both engines)
        s = str(d)
        conv = "conv" + (s.zfill(8) if len(s) <= 8 else s[:8])
        ts0 = _AGENT_EPOCH + d % 86400
        g1 = 1 + ((d + 1) % 7) * 300
        g2 = 1 + ((d + 2) % 7) * 300
        rows.append((conv, 0, "system", None, ts0))
        rows.append((conv, 1, "user", "search" if d % 5 == 0 else None, ts0 + g1))
        tool2 = "python" if d % 7 == 0 else ("browser" if d % 7 == 1 else None)
        rows.append((conv, 2, "assistant", tool2, ts0 + g1 + g2))
    return rows


@pytest.fixture(scope="module")
def small_docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("agent_small"))
    docs = pd.DataFrame(
        [(i, "en", f"t{i}", "s", 2) for i in range(30)],
        columns=["doc_id", "lang", "text", "source", "n_chars"],
    )
    spark.createDataFrame(docs).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_asof_semantics_vs_naive_loop(spark, small_docs_dir):
    """For every assistant turn, the naive O(n^2) backward scan and the
    carry-forward window must agree on (last_tool, age) — including the
    strictness rule: a tool ON the probe turn itself (equal ts) is NOT
    its own match."""
    rows = _derived_rows(range(30))
    expected = {}
    for conv, tidx, role, _tool, ts in rows:
        if role != "assistant":
            continue
        cands = [
            (ets, etool)
            for c2, _t2, _r2, etool, ets in rows
            if c2 == conv and etool is not None and ets < ts
        ]
        if cands:
            ets, etool = max(cands)
            expected[(conv, tidx)] = (etool, ts - ets)
        else:
            expected[(conv, tidx)] = ("none", -1)

    got = {
        (r.conv_id, r.turn_idx): (r.last_tool, r.age_s)
        for r in QUERIES["asof_tool_join"](spark, small_docs_dir).collect()
    }
    assert got == expected


def test_sessionize_semantics_vs_naive_loop(spark, small_docs_dir):
    """Session boundaries: gap > SESSION_GAP_S (or first turn) opens a
    session; aggregate (n_turns, start, end) per session must match a
    per-conversation loop."""
    rows = sorted(_derived_rows(range(30)), key=lambda r: (r[0], r[4], r[1]))
    expected = {}
    prev = {}
    sess_no = {}
    for conv, _tidx, _role, _tool, ts in rows:
        if conv not in prev or ts - prev[conv] > SESSION_GAP_S:
            sess_no[conv] = sess_no.get(conv, 0) + 1
        prev[conv] = ts
        key = (conv, sess_no[conv])
        n, lo, hi = expected.get(key, (0, ts, ts))
        expected[key] = (n + 1, min(lo, ts), max(hi, ts))

    got = {
        (r.conv_id, r.session_id): (r.n_turns, r.sess_start, r.sess_end)
        for r in QUERIES["sessionize_gaps"](spark, small_docs_dir).collect()
    }
    assert got == expected


def test_sessionize_matches_native_session_window(spark, small_docs_dir):
    """Cross-pin the lag-formulation sessionizer against Spark's native
    ``F.session_window`` on the derived table.  Boundary note: the lag
    rule splits on gap > SESSION_GAP_S, session_window on gap >=
    SESSION_GAP_S + its exclusive end — the derived gaps are 1 + 300k
    seconds, never exactly 900, so the two rules must agree exactly."""
    from pyspark.sql import functions as F

    from ocr_spark.queries.derive import derived_agent_transcripts

    t = derived_agent_transcripts(spark, small_docs_dir)
    native = (
        t.groupBy(
            F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("sw"),
            "conv_id",
        )
        .agg(
            F.count("*").alias("n_turns"),
            F.min("ts_epoch").alias("sess_start"),
            F.max("ts_epoch").alias("sess_end"),
        )
        .select("conv_id", "n_turns", "sess_start", "sess_end")
    )
    mine = QUERIES["sessionize_gaps"](spark, small_docs_dir).select(
        "conv_id", "n_turns", "sess_start", "sess_end"
    )
    key = lambda r: (r["conv_id"], r["sess_start"], r["sess_end"], r["n_turns"])
    assert sorted(map(key, native.collect())) == sorted(map(key, mine.collect()))


def test_asof_and_sessionize_general_on_skewed_synth(spark):
    """Generality pin: the reusable cores (asof_last_tool, sessionize)
    must match naive per-conversation loops on the SKEWED k-turn
    synthetic corpus (turn counts 3..~2000, sparse tools, ts strictly
    increasing per conv) — not just the 3-turn oracle shape."""
    from pyspark.sql import functions as F

    from ocr_spark.queries.agent_ops import asof_last_tool, sessionize
    from ocr_spark.synth import transcripts

    t = transcripts(spark, 250, seed=7, skew=True).withColumn(
        "ts_epoch", F.unix_timestamp("ts")
    )
    rows = sorted(
        (
            (r["conv_id"], r["turn_idx"], r["role"], r["tool"], r["ts_epoch"])
            for r in t.collect()
        ),
        key=lambda r: (r[0], r[4], r[1]),
    )
    assert len(rows) > 3000  # skew actually produced long conversations

    # naive as-of: walk each conversation carrying the last tool event
    expected_asof = {}
    carry = {}
    for conv, tidx, role, tool, ts in rows:
        last = carry.get(conv)  # state BEFORE this turn => strictly earlier
        if role == "assistant":
            expected_asof[(conv, tidx)] = (
                (last[1], ts - last[0]) if last else ("none", -1)
            )
        if tool is not None:
            carry[conv] = (ts, tool)
    got_asof = {
        (r["conv_id"], r["turn_idx"]): (r["last_tool"], r["age_s"])
        for r in asof_last_tool(t).collect()
    }
    assert got_asof == expected_asof

    # naive sessionizer (synth gaps are 1s, so widen nothing: gap_s=0
    # would split everywhere; use 1 so every turn chains -> also check
    # a tiny gap that splits everywhere for the degenerate case)
    for gap_s in (0, 1):
        expected = {}
        prev, sess_no = {}, {}
        for conv, _tidx, _role, _tool, ts in rows:
            if conv not in prev or ts - prev[conv] > gap_s:
                sess_no[conv] = sess_no.get(conv, 0) + 1
            prev[conv] = ts
            key = (conv, sess_no[conv])
            n, lo, hi = expected.get(key, (0, ts, ts))
            expected[key] = (n + 1, min(lo, ts), max(hi, ts))
        got = {
            (r["conv_id"], r["session_id"]): (r["n_turns"], r["sess_start"], r["sess_end"])
            for r in sessionize(t, gap_s=gap_s).collect()
        }
        assert got == expected, f"gap_s={gap_s}"
