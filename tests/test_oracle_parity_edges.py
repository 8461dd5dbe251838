"""Adversarial-corpus oracle parity (the edge shapes sf0.01 can't hit).

The driver's corpus is benign — pure-ASCII texts, no empties, no zero
vectors — so a Spark/DuckDB divergence that only fires on an edge
shape survives every round until real data finds it (r2's short-doc
sequence(1,0) crash and r3's x5 min_idx and BLOB-cast findings were
all of this class).  This suite re-runs every documents/embeddings
oracle pair on a handcrafted adversarial table: empty / 1-2-word /
exact-duplicate / unicode-multibyte / marker-containing / quote-and-
backslash / very-long / multi-whitespace texts, plus a zero vector and
an exact-duplicate vector.

Excluded by documented precondition (not bugs): the
``extraction_docs`` oracles state their answers in closed form ONLY
under the synthesis guarantees their module docstring declares (no
angle brackets, single-space word separation, no leading/trailing
whitespace) — the kernels are the general implementations, the oracles
are not, and feeding them precondition-violating text just measures
that gap.  ``mm_format_sniff`` shares the single-space assumption via
its header-prefix arithmetic on unicode char counts.
"""

import math

import pandas as pd
import pytest

from ocr_spark.queries import ORACLES, QUERIES

#: closed-form oracles whose documented synthesis preconditions the
#: adversarial corpus deliberately violates (see module docstring)
_PRECONDITION_ORACLES = {
    "html_boilerplate_strip",
    "pdf_reading_order",
    "mm_format_sniff",
    "ocr_page_reflow",  # closed-form oracle assumes the clean-corpus charset
}

_DOCS = [
    (0, "en", ""),
    (1, "en", "one"),
    (2, "en", "two words"),
    (3, "en", "a b c d repeated a b c d"),
    (4, "en", "a b c d repeated a b c d"),          # exact dup of 3
    (5, "fr", "héllo wörld çafé ñoño"),             # multibyte utf-8
    (6, "en", "text with <start_of_turn>model\nmarker inside"),
    (7, "en", "trailing newline ends here km\n"),
    (8, "en", "O'Brien's isn't \"quoted\" \\ backslash"),
    (9, "xx", ("word " * 200).strip()),
    (10, "en", "   leading and   multiple   spaces"),
    (11, "en", "\t tab\tand\nnewline mix"),
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_tables"))
    docs = pd.DataFrame(
        [(i, lang, t, "edge", len(t)) for i, lang, t in _DOCS],
        columns=["doc_id", "lang", "text", "source", "n_chars"],
    )
    spark.createDataFrame(docs).coalesce(1).write.parquet(f"{d}/documents.parquet")
    emb = [
        (i, i % 3, [((i * 37 + j * 11) % 19 - 9) / 10.0 for j in range(64)])
        for i in range(12)
    ]
    emb.append((12, 0, [0.0] * 64))                 # zero vector
    emb.append((13, 1, emb[0][2]))                  # exact dup of vec 0
    pd_emb = pd.DataFrame(emb, columns=["vec_id", "label", "embedding"])
    spark.createDataFrame(pd_emb).coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    return d


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{edge_dir}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<NULL>"
        try:
            if pd.isna(v):
                return "<NULL>"
        except (TypeError, ValueError):
            pass
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)

    return sorted(
        tuple(norm(v) for v in r) for r in df.itertuples(index=False, name=None)
    )


def _edge_targets():
    return sorted(
        n
        for n, sql in ORACLES.items()
        if ("FROM documents" in sql or "FROM embeddings" in sql or "documents)" in sql)
        and "transcripts" not in sql
        and n not in _PRECONDITION_ORACLES
    )


@pytest.mark.parametrize("name", _edge_targets())
def test_edge_corpus_parity(name, spark, edge_dir, edge_duck):
    spark_df = QUERIES[name](spark, edge_dir).toPandas()
    oracle_df = edge_duck.execute(ORACLES[name]).df()
    assert sorted(spark_df.columns) == sorted(oracle_df.columns)
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )
    s, o = _canon(spark_df), _canon(oracle_df)
    mismatches = [(a, b) for a, b in zip(s, o) if a != b]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


# ---------------------------------------------------------------------------
# transcript-family edge: exotic doc_ids
# ---------------------------------------------------------------------------
# The derived-transcript oracles never see documents.text, but they DO
# compute on doc_id: lpad(.., 8) conv_ids (TRUNCATED identically by
# both engines at >= 9 digits, deliberately included), % pick indices,
# and doc_id-keyed joins.  Exercise them at id ranges sf0.01 can't
# produce: 0, the 8-digit boundary, 9-digit truncation collisions, and
# a large 64-bit-ish value.

_EDGE_IDS = [0, 1, 7, 9999999, 99999999, 100000000, 123456789, 123456790,
             98765432101]


@pytest.fixture(scope="module")
def edge_ids_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_ids"))
    docs = pd.DataFrame(
        [(i, "en", f"edge id {i}", "edge", len(f"edge id {i}")) for i in _EDGE_IDS],
        columns=["doc_id", "lang", "text", "source", "n_chars"],
    )
    spark.createDataFrame(docs).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


@pytest.fixture(scope="module")
def edge_ids_duck(edge_ids_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_ids_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


def _transcript_targets():
    return sorted(
        n for n, sql in ORACLES.items() if "transcripts" in sql
    )


@pytest.mark.parametrize("name", _transcript_targets())
def test_transcript_oracles_on_exotic_doc_ids(name, spark, edge_ids_dir, edge_ids_duck):
    spark_df = QUERIES[name](spark, edge_ids_dir).toPandas()
    oracle_df = edge_ids_duck.execute(ORACLES[name]).df()
    assert sorted(spark_df.columns) == sorted(oracle_df.columns)
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )
    s, o = _canon(spark_df), _canon(oracle_df)
    mismatches = [(a, b) for a, b in zip(s, o) if a != b]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


# ---------------------------------------------------------------------------
# cross-engine fuzz of the piece-regex mirror
# ---------------------------------------------------------------------------

def test_piece_regex_sql_mirror_fuzz(edge_duck):
    """DuckDB RE2 count of _PIECE_RE_SQL must equal Python re's count
    on deterministic pseudo-random strings mixing every char class the
    regex distinguishes (letters, digits, spaces, newlines, accented
    letters, punctuation runs, apostrophes, marker substrings)."""
    import random

    from ocr_spark.kernels.tokenizer import _PIECE_RE
    from ocr_spark.queries.catalog import _PIECE_RE_SQL

    rng = random.Random(20260817)
    alphabet = list(
        "abz AZ09 ..,!?'  \n\nàéɏ--::<bos><start_of_turn>model km) ("
    )
    cases = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
             for _ in range(300)]
    df = pd.DataFrame({"t": cases})
    edge_duck.register("fuzz_t", df)
    got = [
        r[0]
        for r in edge_duck.execute(
            f"SELECT len(regexp_extract_all(t, '{_PIECE_RE_SQL}')) FROM fuzz_t"
        ).fetchall()
    ]
    want = [len(_PIECE_RE.findall(t)) for t in cases]
    bad = [(c, g, w) for c, g, w in zip(cases, got, want) if g != w]
    assert not bad, f"first divergences: {bad[:3]}"


def test_dom_family_parity_on_null_text(spark, tmp_path_factory):
    """NULL documents.text through the three DOM queries: both engines
    must agree (coalesce-to-'' on both sides).  Kept out of the shared
    edge corpus because the OLDER closed-form oracles never declared a
    NULL-text precondition either way; only the DOM family guards it."""
    import duckdb

    d = str(tmp_path_factory.mktemp("null_text"))
    docs = pd.DataFrame(
        [(0, "en", None, "edge", 0), (1, "fr", "two words", "edge", 9)],
        columns=["doc_id", "lang", "text", "source", "n_chars"],
    )
    spark.createDataFrame(docs).coalesce(1).write.parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    for name in ("html_link_extract", "html_table_extract", "html_section_split"):
        s = QUERIES[name](spark, d).toPandas()
        o = con.execute(ORACLES[name]).df()
        a = s[sorted(s.columns)].astype(str).sort_values(sorted(s.columns)).reset_index(drop=True)
        b = o[sorted(o.columns)].astype(str).sort_values(sorted(o.columns)).reset_index(drop=True)
        assert a.equals(b), name
