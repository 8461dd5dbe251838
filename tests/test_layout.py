"""Golden tests for the markup/page-dump extraction kernels."""

from ocr_spark.kernels.layout import (
    Line,
    cluster_rows,
    detect_columns,
    parse_table,
    reading_order,
    split_sections,
    score_blocks,
    segment_page_dump,
    strip_boilerplate,
)

HTML = (
    "<html><head><style>p{color:red}</style></head><body>"
    '<nav><a href="/">Home</a> <a href="/x">About</a></nav>'
    "<p>The quick brown fox jumps over the lazy dog near the river bank.</p>"
    '<div><a href="/ad">BUY NOW</a></div>'
    "<p>A second paragraph with plenty of ordinary words to keep around.</p>"
    "<footer>© 2026 Example Corp</footer>"
    "</body></html>"
)


def test_strip_boilerplate_keeps_content_blocks():
    clean, spans = strip_boilerplate(HTML)
    assert clean == (
        "The quick brown fox jumps over the lazy dog near the river bank."
        "\nA second paragraph with plenty of ordinary words to keep around."
    )
    assert len(spans) == 2
    for (s, e), expect in zip(spans, ["The quick", "A second"]):
        assert HTML[s:e].startswith(expect)


def test_block_scoring_features():
    blocks = score_blocks(HTML)
    nav = next(b for b in blocks if "Home" in b.text)
    assert nav.link_density == 1.0 and not nav.is_content
    content = next(b for b in blocks if "quick brown" in b.text)
    assert content.is_content and content.link_density == 0.0
    ad = next(b for b in blocks if "BUY" in b.text)
    assert not ad.is_content  # short and fully linked


def test_strip_boilerplate_script_style_removed():
    clean, _ = strip_boilerplate("<p>keep these five words here</p><script>var x = 'a b c d e f';</script>")
    assert clean == "keep these five words here"


def test_cluster_rows_and_columns():
    lines = [Line(50, 10, "a"), Line(120, 12, "b"), Line(50, 40, "c"), Line(400, 11, "z")]
    rows = cluster_rows(lines, y_tol=5)
    assert [len(r) for r in rows] == [3, 1]
    assert detect_columns(lines, gap=100) == [50, 400]


def test_reading_order_two_columns():
    # newspaper layout: column 1 (x=50) read fully before column 2 (x=400)
    lines = [
        (400, 10, "col2-row1"), (50, 30, "col1-row2"),
        (50, 10, "col1-row1"), (400, 30, "col2-row2"),
    ]
    assert segment_page_dump(lines) == "col1-row1 col1-row2 col2-row1 col2-row2"


def test_reading_order_row_x_order():
    lines = [(120, 10, "world"), (50, 12, "hello")]
    assert segment_page_dump(lines) == "hello world"


def test_empty_inputs():
    assert strip_boilerplate("") == ("", [])
    assert segment_page_dump([]) == ""


# --------------------------------------------------------------------------
# OCR page-dump render/reflow round trip
# --------------------------------------------------------------------------

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_spark.kernels.layout import reflow_page_dump, render_page_dump

_WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=40)


def test_render_shape():
    dump = render_page_dump("alpha beta gamma delta", words_per_page=2, width=28)
    pages = dump.split("\f")
    assert len(pages) == 2
    for i, p in enumerate(pages, start=1):
        lines = p.split("\n")
        assert lines[0] == "SCANCO OCR v2 ~ batch 7"
        assert lines[-1] == f"Page {i} of 2"


def test_reflow_removes_varying_digit_chrome():
    # footers differ per page ("Page 1 of 3" vs "Page 12 of 3") but share
    # a digit-masked form; the kernel must drop all of them.
    dump = "\f".join(
        "HDR X\n" + body + f"\nPage {k} of 3"
        for k, body in ((1, "aa bb"), (2, "cc dd"), (12, "ee"))
    )
    text, n_pages, n_removed = reflow_page_dump(dump)
    assert text == "aa bb cc dd ee"
    assert n_pages == 3
    assert n_removed == 6


def test_reflow_dehyphenates_across_lines_and_pages():
    dump = "H\nword spli-\ntting here\nP 1\fH\nand hyphena-\ntion again\nP 2"
    text, _, _ = reflow_page_dump(dump)
    assert text == "word splitting here and hyphenation again"


def test_reflow_chains_force_split_fragments():
    long = "a" * 70
    dump = render_page_dump(f"{long} tail", words_per_page=2, width=28)
    text, _, _ = reflow_page_dump(dump)
    assert text == f"{long} tail"


def test_chrome_threshold_requires_majority():
    # a line opening only 1 of 3 pages is NOT chrome
    dump = "onlyonce\naa\nFOOT 1\fbb\ncc\nFOOT 2\fdd\nFOOT 3"
    text, _, removed = reflow_page_dump(dump)
    assert "onlyonce" in text
    assert removed == 3


@settings(max_examples=150, deadline=None)
@given(st.lists(_WORD, min_size=1, max_size=120))
def test_round_trip_property(words):
    text = " ".join(words)
    clean, n_pages, n_chrome = reflow_page_dump(render_page_dump(text))
    assert clean == text
    wpp = min(20, max(1, -(-len(words) // 2)))
    assert n_pages == max(2, -(-len(words) // wpp))
    assert n_chrome == 2 * n_pages


def test_corpus_property_makes_inversion_exact():
    """The closed-form oracle for ocr_page_reflow relies on content
    having no digits, hyphens, newlines, or form feeds; pin that
    property of the oracle-SF corpus here."""
    import duckdb

    from tests.conftest import SF_DIR_ORACLE

    texts = duckdb.sql(
        f"SELECT text FROM read_parquet('{SF_DIR_ORACLE}/documents.parquet')"
    ).df()["text"]
    assert not any(
        re.search(r"[-\d\n\f\t]|\s\s|^\s|\s$", t) for t in texts
    )


def test_parse_table_roundtrip_and_hostile_cells():
    assert parse_table(
        '<table><tr><td>0</td><td>a b</td></tr>'
        '<tr><td>1</td><td><x> &amp; c\nd</td></tr></table>'
    ) == [(0, "a b"), (1, "<x> &amp; c\nd")]
    assert parse_table("<table></table>") == []


def test_split_sections_spans_index_the_payload():
    h = "<h2>S0</h2><p>one two</p><h2>S1</h2><p></p><h2>S2</h2><p>x<y</p>"
    secs = split_sections(h)
    assert [(a, b) for a, b, *_ in secs] == [
        ("S0", "one two"), ("S1", ""), ("S2", "x<y")]
    for head, body, a, b in secs:
        assert h[a:b] == body
