"""Multi-turn oracle shape: the SQL/DataFrame render and merges must
byte-equal the pure kernels over the same k-turn conversations."""

import pytest
from pyspark.sql import functions as F

from ocr_spark.kernels import (
    merge_system_turn,
    merge_system_turn_test,
    render_chat_template,
    split_completion,
)
from ocr_spark.queries.multiturn import (
    derived_transcripts_mt,
    x3_render_multiturn,
    x4_marker_split_multiturn,
    x5_marker_count_multiturn,
)
from tests.conftest import SF_DIR_ORACLE


@pytest.fixture(scope="module")
def mt_turns(spark):
    rows = derived_transcripts_mt(spark, SF_DIR_ORACLE).collect()
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append((r["turn_idx"], r["role"], r["text"]))
    return {k: sorted(v) for k, v in by_conv.items()}


def _kernel_render(turns):
    """Reference semantics: merge system into first user, then render."""
    messages, sys_text = [], None
    for _, role, text in turns:
        if role == "system" and sys_text is None and not messages:
            sys_text = text
            continue
        if role == "user" and sys_text is not None:
            messages.append({"role": "user", "content": merge_system_turn(sys_text, text)})
            sys_text = None
        else:
            messages.append({"role": role, "content": text})
    return render_chat_template(messages)


def test_mt_shape(mt_turns):
    """k = doc_id%3+2 pairs -> 5/7/9 turns, strictly alternating after
    the system turn (the general conversation shape the 3-turn CTE
    cannot produce)."""
    lens = {len(v) for v in mt_turns.values()}
    assert lens == {5, 7, 9}
    for turns in mt_turns.values():
        roles = [r for _, r, _ in turns]
        assert roles[0] == "system"
        assert roles[1::2] == ["user"] * (len(roles) // 2)
        assert roles[2::2] == ["assistant"] * (len(roles) // 2)


def test_x3_render_multiturn_matches_kernel(spark, mt_turns):
    got = {
        r["conv_id"]: r["rendered"]
        for r in x3_render_multiturn(spark, SF_DIR_ORACLE).collect()
    }
    assert set(got) == set(mt_turns)
    for conv_id, turns in mt_turns.items():
        assert got[conv_id] == _kernel_render(turns), conv_id


def test_x4_split_multiturn_matches_kernel(spark, mt_turns):
    got = {
        r["conv_id"]: (r["prompt_part"], r["completion_part"])
        for r in x4_marker_split_multiturn(spark, SF_DIR_ORACLE).collect()
    }
    for conv_id, turns in mt_turns.items():
        rendered = _kernel_render(turns)
        prompt, completion = split_completion(rendered)
        assert got[conv_id] == (prompt, completion), conv_id
        # multiple markers present: the split must be on the FIRST
        assert "<start_of_turn>model\n" in completion


def test_x5_marker_count_is_2k(spark, mt_turns):
    got = {
        r["conv_id"]: r["n_markers"]
        for r in x5_marker_count_multiturn(spark, SF_DIR_ORACLE).collect()
    }
    for conv_id, turns in mt_turns.items():
        n_pairs = len(turns) // 2
        assert got[conv_id] == 2 * n_pairs, conv_id


def test_pipeline_handles_multiturn_conversations(spark):
    """The flagship render path (extract_conversations) over k-turn
    conversations equals the pure-kernel golden oracle row-for-row —
    the general-shape twin of tests/test_pipeline.py's equality gate."""
    from ocr_spark.pipeline import extract_conversations
    from tests.test_pipeline import _golden_rows, _spark_rows

    t = derived_transcripts_mt(spark, SF_DIR_ORACLE).withColumn(
        "tool", F.lit(None).cast("string")
    ).withColumn("ts", F.lit(None).cast("timestamp"))
    rows = [r.asDict() for r in t.collect()]
    golden = _golden_rows(rows)
    got = _spark_rows(extract_conversations(t))
    assert len(got) == len(golden)
    for g, o in zip(got, golden):
        assert g == o, f"mismatch:\n spark={g}\n golden={o}"


def test_loader_reshape_matches_kernel(spark):
    """The composite loader's prompt must byte-equal the TEST-style
    merge kernel (utils.py:103 system + "\\n" + user + "\\n" + user2)."""
    from ocr_spark.queries import QUERIES  # name starts with test_, avoid pytest collection

    rows = QUERIES["test_loader_reshape"](spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows[:50]:
        s, rest = r["prompt"].split("\n", 1)
        code_and_q = rest.rsplit("\n", 1)
        u1, u2 = code_and_q[0], code_and_q[1]
        assert r["prompt"] == merge_system_turn_test(s, u1, u2)
        assert r["fn_name"] in r["prompt"]
