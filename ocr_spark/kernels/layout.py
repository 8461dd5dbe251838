"""Main-content extraction kernels for markup and page-dump payloads.

The north_star frames per-turn payloads as "HTML, PDF byte-streams, or
OCR-style page dumps" pushed through batched tokenization, text/link-
density boilerplate classification (Boilerpipe/Readability-style block
scoring) and PDF layout segmentation (line clustering by y-coordinate,
reading-order sort).  These kernels implement exactly that surface as
pure functions (no external parser libraries — deterministic,
executor-safe, regex/arithmetic only), wrapped by the Spark layer in
Arrow-batched pandas UDFs (queries/extraction_docs.py).

Block scoring follows the published Boilerpipe/Readability heuristics:
a block is *content* when it has enough words and a low share of its
words inside anchors; short and link-heavy blocks (navigation, footer
chrome) are boilerplate.  See Kohlschütter et al., "Boilerplate
Detection using Shallow Text Features" (WSDM 2010) for the density
features this mirrors.
"""

from __future__ import annotations

import re
from typing import NamedTuple, Sequence

# --------------------------------------------------------------------------
# HTML boilerplate stripping (text-density + link-density block scoring)
# --------------------------------------------------------------------------

_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.DOTALL | re.IGNORECASE)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
#: Tags that open/close a block of their own.
_BLOCK_TAG_RE = re.compile(
    r"</?(?:p|div|nav|footer|header|aside|section|article|li|ul|ol|h[1-6]|table|tr|td|br)\b[^>]*>",
    re.IGNORECASE,
)
_ANCHOR_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")


class Block(NamedTuple):
    start: int          # char offset of the block's text in the original html
    end: int            # end offset (exclusive) of the raw block slice
    text: str           # tag-stripped text
    n_words: int
    link_density: float  # fraction of words inside <a> anchors
    is_content: bool


def _classify(n_words: int, link_density: float,
              min_words: int = 5, max_link_density: float = 1 / 3) -> bool:
    """Boilerpipe-style densitometric rule: content iff long enough and
    not link-dominated."""
    return n_words >= min_words and link_density <= max_link_density


def score_blocks(html: str) -> list[Block]:
    """Split markup into blocks at block-level tags and score each.

    Offsets refer to the ORIGINAL html string (script/style/comment
    regions are scored as empty rather than spliced out, so spans from
    this function can be applied to the source bytes directly).
    """
    # neutralize script/style/comments in a copy of equal length so
    # offsets stay aligned with the original
    def _blank(m: re.Match) -> str:
        return " " * (m.end() - m.start())

    cleaned = _SCRIPT_STYLE_RE.sub(_blank, html)
    cleaned = _COMMENT_RE.sub(_blank, cleaned)

    blocks: list[Block] = []
    pos = 0
    boundaries = [m.span() for m in _BLOCK_TAG_RE.finditer(cleaned)] + [
        (len(cleaned), len(cleaned))
    ]
    for b_start, b_end in boundaries:
        raw = cleaned[pos:b_start]
        if raw.strip():
            link_words = sum(
                len(_TAG_RE.sub(" ", m.group(1)).split())
                for m in _ANCHOR_RE.finditer(raw)
            )
            text = _TAG_RE.sub(" ", raw)
            text = re.sub(r"\s+", " ", text).strip()
            n_words = len(text.split()) if text else 0
            ld = (link_words / n_words) if n_words else 1.0
            blocks.append(
                Block(
                    start=pos + (len(raw) - len(raw.lstrip())),
                    end=b_start,
                    text=text,
                    n_words=n_words,
                    link_density=ld,
                    is_content=_classify(n_words, ld),
                )
            )
        pos = b_end
    return blocks


def strip_boilerplate(html: str, joiner: str = "\n") -> tuple[str, list[tuple[int, int]]]:
    """Main-content text + char spans (in the source html) of kept blocks.

    The extraction contract of the engine: returns the concatenation of
    content-classified blocks plus, per kept block, its (start, end)
    offsets into the original payload.
    """
    kept = [b for b in score_blocks(html) if b.is_content]
    return joiner.join(b.text for b in kept), [(b.start, b.end) for b in kept]


# --------------------------------------------------------------------------
# PDF / OCR page-dump layout segmentation
# --------------------------------------------------------------------------

class Line(NamedTuple):
    x: float
    y: float
    text: str


def cluster_rows(lines: Sequence[Line], y_tol: float = 5.0) -> list[list[Line]]:
    """Group lines whose y-coordinates fall within ``y_tol`` of the
    running cluster (single pass over y-sorted lines)."""
    rows: list[list[Line]] = []
    for ln in sorted(lines, key=lambda l: (l.y, l.x)):
        if rows and abs(ln.y - rows[-1][-1].y) <= y_tol:
            rows[-1].append(ln)
        else:
            rows.append([ln])
    return rows


def detect_columns(lines: Sequence[Line], gap: float = 100.0) -> list[float]:
    """Column left-edges: distinct x starts separated by more than
    ``gap`` (newspaper-style multi-column detection)."""
    cols: list[float] = []
    for x in sorted({ln.x for ln in lines}):
        if not cols or x - cols[-1] > gap:
            cols.append(x)
    return cols


def reading_order(lines: Sequence[Line], y_tol: float = 5.0, col_gap: float = 100.0) -> list[Line]:
    """Reading-order sort: columns left-to-right, then rows top-to-bottom
    within a column, then x within a row (the standard PDF layout
    segmentation order)."""
    if not lines:
        return []
    cols = detect_columns(lines, gap=col_gap)

    def col_of(ln: Line) -> int:
        c = 0
        for i, edge in enumerate(cols):
            if ln.x >= edge - col_gap / 2:
                c = i
        return c

    ordered: list[Line] = []
    for i in range(len(cols)):
        col_lines = [ln for ln in lines if col_of(ln) == i]
        for row in cluster_rows(col_lines, y_tol=y_tol):
            ordered.extend(sorted(row, key=lambda l: l.x))
    return ordered


def segment_page_dump(lines: Sequence[tuple[float, float, str]],
                      y_tol: float = 5.0, col_gap: float = 100.0) -> str:
    """OCR-style page dump -> main-content text in reading order."""
    typed = [Line(float(x), float(y), str(t)) for x, y, t in lines]
    return " ".join(ln.text for ln in reading_order(typed, y_tol, col_gap) if ln.text)


# --------------------------------------------------------------------------
# OCR page-dump cleanup: chrome removal + dehyphenation + reflow
# --------------------------------------------------------------------------
#
# The third payload modality of the north_star ("OCR-style page dumps"):
# scanned-page text arrives as form-feed-separated pages, each carrying
# repeated header/footer chrome ("Page 3 of 7"), hard line wraps at the
# scanner's column width, and end-of-line hyphenation of words the wrap
# split.  ``render_page_dump`` produces that shape deterministically;
# ``reflow_page_dump`` inverts it with the standard production
# heuristics — digit-masked line-frequency chrome detection (a line
# whose digit-masked form opens or closes most pages is chrome, however
# the page numbers vary), join-on-trailing-hyphen dehyphenation, and
# whitespace reflow.

_OCR_HEADER = "SCANCO OCR v2 ~ batch 7"
_DIGIT_RE = re.compile(r"\d+")


def render_page_dump(text: str, words_per_page: int = 20, width: int = 28) -> str:
    """Deterministic OCR-style page dump of ``text``.

    Pages of ``words_per_page`` words (at least two pages — short docs
    split in half), separated by form-feed.  Each page: a header line,
    greedy hard-wrapped content at ``width`` chars with end-of-line
    hyphenation (a word that does not fit is split when both fragments
    keep >=3 chars, as scanners do), and a ``Page k of n`` footer.
    """
    words = text.split()
    wpp = min(words_per_page, max(1, -(-len(words) // 2)))
    n_pages = max(2, -(-len(words) // wpp))
    pages: list[str] = []
    for p in range(n_pages):
        chunk = words[p * wpp:(p + 1) * wpp]
        lines: list[str] = [_OCR_HEADER]
        cur = ""
        for w in chunk:
            need = len(w) if not cur else len(w) + 1
            if not cur:
                cur = w
            elif len(cur) + need <= width:
                cur = cur + " " + w
            else:
                room = width - len(cur) - 2  # 1 for the space, 1 for '-'
                if room >= 3 and len(w) - room >= 3:
                    lines.append(cur + " " + w[:room] + "-")
                    cur = w[room:]
                else:
                    lines.append(cur)
                    cur = w
            # force-split any fragment still wider than the column
            while len(cur) > width:
                lines.append(cur[: width - 1] + "-")
                cur = cur[width - 1:]
        if cur:
            lines.append(cur)
        lines.append(f"Page {p + 1} of {n_pages}")
        pages.append("\n".join(lines))
    return "\f".join(pages)


def reflow_page_dump(dump: str, chrome_frac: float = 0.6) -> tuple[str, int, int]:
    """Invert an OCR page dump: ``(clean_text, n_pages, n_chrome_removed)``.

    Chrome detection is frequency-based, not pattern-based: a line
    whose digit-masked form appears as the first or last line of at
    least ``chrome_frac`` of the pages is chrome (this catches
    ``Page 3 of 7`` / ``Page 12 of 7`` as one masked form without
    knowing the wording).  Every line matching a chrome form is
    dropped wherever it appears.  Remaining lines reflow with
    join-on-trailing-hyphen dehyphenation.
    """
    pages = [[ln for ln in page.split("\n") if ln.strip()]
             for page in dump.split("\f")]
    pages = [p for p in pages if p]
    n_pages = len(pages)
    counts: dict[str, int] = {}
    for p in pages:
        edge_forms = {_DIGIT_RE.sub("#", p[0]), _DIGIT_RE.sub("#", p[-1])}
        for form in edge_forms:
            counts[form] = counts.get(form, 0) + 1
    threshold = max(2, int(-(-chrome_frac * n_pages // 1)))  # ceil, min 2
    chrome = {form for form, c in counts.items() if c >= threshold}
    out: list[str] = []
    n_removed = 0
    pending_hyphen = False
    for p in pages:
        for ln in p:
            if _DIGIT_RE.sub("#", ln) in chrome:
                n_removed += 1
                continue
            if pending_hyphen and out:
                out[-1] = out[-1] + ln
            else:
                out.append(ln)
            pending_hyphen = ln.endswith("-")
            if pending_hyphen:
                out[-1] = out[-1][:-1]
    return " ".join(" ".join(out).split()), n_pages, n_removed


# --------------------------------------------------------------------------
# DOM micro-parsers: tables and sections
# --------------------------------------------------------------------------

_TR_RE = re.compile(r"<tr><td>(\d+)</td><td>(.*?)</td></tr>", re.S)
_SEC_RE = re.compile(r"<h2>(.*?)</h2><p>(.*?)</p>", re.S)


def parse_table(html: str) -> list[tuple[int, str]]:
    """Parse ``<tr><td>idx</td><td>cell</td></tr>`` rows out of markup.

    Lazy ``(.*?)`` cell capture (DOTALL) so cells containing ``<`` or
    newlines — anything except a literal ``</td>`` — round-trip
    exactly.  Returns ``[(row_idx, cell_text), ...]`` in document
    order.
    """
    return [(int(i), c) for i, c in _TR_RE.findall(html)]


def split_sections(html: str) -> list[tuple[str, str, int, int]]:
    """Split ``<h2>H</h2><p>body</p>`` markup into sections with spans.

    Returns ``[(heading, body, body_start, body_end), ...]`` where the
    span offsets index the BODY text inside the source payload (char
    positions, Python ``str`` semantics) — the multi-block form of the
    single-span contract ``strip_boilerplate`` emits.
    """
    return [
        (m.group(1), m.group(2), m.start(2), m.end(2))
        for m in _SEC_RE.finditer(html)
    ]
