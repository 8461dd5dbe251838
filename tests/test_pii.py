"""PII scrubbing: planted-PII behavior (the sf corpus is clean, so the
oracle parity there only proves non-corruption) + cross-engine regex
agreement on the planted corpus."""

import duckdb
import pandas as pd

from ocr_spark.queries import ORACLES, QUERIES

_DOCS = [
    (0, "contact me at alice.smith+spam@example.co.uk or bob@x.io thanks"),
    (1, "server at 192.168.0.1 and 10.0.0.255, not 999.999.999.9999x"),
    (2, "call +1 415 555 0199 or +44 20-7946-0958 now"),
    (3, "mixed: eve@corp.com from 8.8.8.8 dialed +358 9 123 4567"),
    (4, "clean text with no identifiers at all"),
    (5, "distance answer 4200 km and plain numbers 123456789"),
    (6, ""),
]


def _dirs(spark, tmp_path):
    d = str(tmp_path / "pii_tables")
    docs = pd.DataFrame(
        [(i, "en", t, "pii", len(t)) for i, t in _DOCS],
        columns=["doc_id", "lang", "text", "source", "n_chars"],
    )
    spark.createDataFrame(docs).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


def test_pii_scrub_planted(spark, tmp_path):
    d = _dirs(spark, tmp_path)
    rows = {r["doc_id"]: r for r in QUERIES["pii_scrub"](spark, d).collect()}

    assert rows[0]["n_emails"] == 2 and rows[0]["text_scrubbed"] == (
        "contact me at <EMAIL> or <EMAIL> thanks"
    )
    assert rows[1]["n_ips"] == 2  # the 999... monster is not a \b ipv4
    assert "<IP> and <IP>" in rows[1]["text_scrubbed"]
    assert rows[2]["n_phones"] == 2 and rows[2]["text_scrubbed"] == (
        "call <PHONE> or <PHONE> now"
    )
    assert (rows[3]["n_emails"], rows[3]["n_ips"], rows[3]["n_phones"]) == (1, 1, 1)
    assert rows[3]["text_scrubbed"] == "mixed: <EMAIL> from <IP> dialed <PHONE>"
    # clean text passes through byte-identical, plain numbers survive
    assert rows[4]["text_scrubbed"] == _DOCS[4][1]
    assert rows[5]["text_scrubbed"] == _DOCS[5][1]
    assert (rows[5]["n_emails"], rows[5]["n_ips"], rows[5]["n_phones"]) == (0, 0, 0)
    assert rows[6]["text_scrubbed"] == ""


def test_pii_scrub_oracle_agrees_on_planted_corpus(spark, tmp_path):
    """The Java-regex/RE2 common-subset claim, checked where it
    matters: both engines scrub the PLANTED corpus identically."""
    d = _dirs(spark, tmp_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    sdf = QUERIES["pii_scrub"](spark, d).toPandas().sort_values("doc_id")
    odf = con.execute(ORACLES["pii_scrub"]).df().sort_values("doc_id")
    for col in ["text_scrubbed", "n_emails", "n_ips", "n_phones"]:
        assert list(sdf[col]) == list(odf[col]), col
    con.close()


# ---------------------------------------------------------------------------
# Gopher quality filter: planted pass/fail fixtures per rule
# ---------------------------------------------------------------------------

_GOOD = ("the quick brown fox jumps over the lazy dog and runs to the river "
         "of dreams that have been with us " + "wandering onward again " * 10).strip()

_GOPHER_DOCS = [
    (0, _GOOD),                                        # passes every rule
    (1, "the end to of"),                              # too few words
    (2, " ".join(["to", "of", "an", "it", "he"] * 12)),   # mean word len < 3
    (3, "the " + "#tag " * 20 + ("be with that of and " * 10).strip()),  # symbols
    (4, ("1010 2020 3030 4040 " * 15).strip() + " the of"),  # alpha ratio < 0.8
    (5, ("zebra yonder quartz " * 20).strip()),           # no required stopwords
]


def test_gopher_rules_planted(spark, tmp_path):
    d = str(tmp_path / "gopher_tables")
    docs = pd.DataFrame(
        [(i, "en", t, "gq", len(t)) for i, t in _GOPHER_DOCS],
        columns=["doc_id", "lang", "text", "source", "n_chars"],
    )
    spark.createDataFrame(docs).coalesce(1).write.parquet(f"{d}/documents.parquet")
    rows = {r["doc_id"]: r for r in
            QUERIES["gopher_quality_filter"](spark, d).collect()}
    assert rows[0]["passes"] and rows[0]["fail_reason"] == ""
    expected = {1: "word_count", 2: "word_length", 3: "symbol_ratio",
                4: "alpha_ratio", 5: "stopwords"}
    for i, reason in expected.items():
        assert not rows[i]["passes"], i
        assert rows[i]["fail_reason"] == reason, (i, rows[i]["fail_reason"])

    # both engines agree on the planted corpus too
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    odf = con.execute(ORACLES["gopher_quality_filter"]).df()
    o = {int(r["doc_id"]): r for _, r in odf.iterrows()}
    for i in range(len(_GOPHER_DOCS)):
        assert bool(o[i]["passes"]) == bool(rows[i]["passes"])
        assert o[i]["fail_reason"] == rows[i]["fail_reason"]
    con.close()
