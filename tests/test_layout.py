"""Golden tests for the markup/page-dump extraction kernels."""

from ocr_spark.kernels.layout import (
    Line,
    cluster_rows,
    detect_columns,
    reading_order,
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
