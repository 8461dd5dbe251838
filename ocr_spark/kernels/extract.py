"""Text extraction kernels (X1/X2/X6/X8/X9, P4/P5/P10).

Pure functions, byte-faithful to the reference transforms they cite.
"""

from __future__ import annotations

import re
from typing import Sequence

# ---------------------------------------------------------------------------
# X2 — answer extraction
# ---------------------------------------------------------------------------

_ANSWER_TAG = "<start_of_turn>model"


def extract_answer(text: str, alphabet: str = "ABCDE") -> str | None:
    """First ``alphabet`` char after the model-turn tag (kernel X2).

    Byte-faithful to reference utils.py:131-147: find
    ``"<start_of_turn>model"``, scan forward for the first character in
    ``ABCDE``; ``None`` if the tag or the letter is absent.
    """
    start = text.find(_ANSWER_TAG)
    if start == -1:
        return None
    for ch in text[start + len(_ANSWER_TAG):]:
        if ch in alphabet:
            return ch
    return None


def extract_answer_parity(text: str) -> str | None:
    """Parity variant: first ``0``/``1`` after the tag.

    Reference train_parity_steering.py:16-30.
    """
    return extract_answer(text, alphabet="01")


# ---------------------------------------------------------------------------
# X1 — import-line parser
# ---------------------------------------------------------------------------

_IMPORT_PREFIX = "from functions import"


def get_fn_names(s: str, prefix: str = _IMPORT_PREFIX) -> list[str]:
    """Parse used function names from import lines (kernel X1).

    Faithful to reference utils.py:53-61 including its quirk: each
    comma-separated piece is tested *before* stripping, so the
    usage-check for a piece ``" kkkvie"`` is ``" kkkvie(" in s`` — the
    call site must be preceded by the same whitespace.  One deliberate
    divergence: the reference accumulates into a ``set`` and returns
    ``list(fns)`` whose order depends on Python string-hash
    randomization; we dedupe preserving first-seen order so results are
    deterministic across processes (required for Spark retries).
    """
    fns: list[str] = []
    seen: set[str] = set()
    for line in s.split("\n"):
        if line.startswith(prefix):
            rest = line.split(prefix)[1].strip()
            for fn in rest.split(","):
                if fn + "(" in s:
                    name = fn.strip()
                    if name not in seen:
                        seen.add(name)
                        fns.append(name)
    return fns


# ---------------------------------------------------------------------------
# X6 — substring -> char-span locator
# ---------------------------------------------------------------------------

def find_spans(text: str, key: str) -> list[tuple[int, int]]:
    """All (start, end-exclusive) char spans of ``key`` in ``text`` (X6).

    Char-level half of reference ``find_token_pos`` (utils.py:160-196):
    repeated ``t.find(s, start)`` with ``start = start_char + 1``, so
    overlapping occurrences are reported, exactly like the reference.
    Token-index mapping is layered on top via the deterministic
    tokenizer (see tokenizer.py / pipeline.py).
    """
    if not key:
        return []
    spans: list[tuple[int, int]] = []
    start = 0
    while True:
        i = text.find(key, start)
        if i == -1:
            break
        spans.append((i, i + len(key)))
        start = i + 1
    return spans


# ---------------------------------------------------------------------------
# X8 — completion block classification
# ---------------------------------------------------------------------------

DIRECTION_WORDS = (" North", " South", " East", " West")
#: Distance suffixes tested against the *rendered* completion, which ends
#: with "<end_of_turn>\n" (reference train_cities.py:75-79).
DISTANCE_SUFFIXES = ("km", "ilometers", "mi", "iles")


def classify_completion(completion: str, rendered: bool = True) -> tuple[str, bool]:
    """Classify a completion block as direction / distance / other (X8).

    Mirrors ``tighten_mask`` (reference train_cities.py:69-95) and
    ``tighten_completion_mask`` (train_cities_steering.py:56-77):

    - *direction* iff the completion contains one of ``" North"``,
      ``" South"``, ``" East"``, ``" West"`` (single-token contract,
      train_cities.py:64-67);
    - *distance* iff it ends with ``km`` / ``ilometers`` / ``mi`` /
      ``iles`` (with the trailing ``<end_of_turn>\\n`` first stripped
      when ``rendered=True``, matching the suffix set at
      train_cities.py:75-79);
    - the reference ``assert xor(has_direction, has_distance)``
      (train_cities.py:80) becomes ``ok=False`` + class ``other`` when
      violated — the engine's fallback path rather than a crash.

    Returns ``(block_class, ok)``.
    """
    body = completion
    if rendered:
        if body.endswith("<end_of_turn>\n"):
            body = body[: -len("<end_of_turn>\n")]
        elif body.endswith("<end_of_turn>"):
            body = body[: -len("<end_of_turn>")]
    has_direction = any(d in body for d in DIRECTION_WORDS)
    has_distance = any(body.endswith(sfx) for sfx in DISTANCE_SUFFIXES)
    if has_direction != has_distance:
        return ("direction" if has_direction else "distance", True)
    return ("other", False)


# ---------------------------------------------------------------------------
# X9 — regex field extraction
# ---------------------------------------------------------------------------

_WHICH_OPTION_RE = re.compile(r"Which option correctly describes (\w+)")


def extract_described_entity(prompt: str) -> str | None:
    """``Which option correctly describes (\\w+)`` group 1 (kernel X9).

    Reference act_patch_oli.py:486-494 raises on no-match; we return
    ``None`` (filtered / counted as fallback downstream).
    """
    m = _WHICH_OPTION_RE.search(prompt)
    return m.group(1) if m else None


# ---------------------------------------------------------------------------
# P4 / P5 — substitution
# ---------------------------------------------------------------------------

def substitute_ids(text: str, mapping: dict[str, str]) -> str:
    """Sequential whole-string replacement of each key by its value (P4).

    Reference utils.py:225-228 (``City {id}`` -> real name) and
    train_functions_steering.py:571-572 (codename -> NL name).
    Replacement order is the mapping's iteration order, as in the
    reference's ``for city_id, city_name in CITY_ID_TO_NAME.items()``.
    """
    for key, value in mapping.items():
        text = text.replace(key, value)
    return text


def spoil(text: str, fn: str, replacement: str = "odgrps") -> str:
    """Word-boundary regex substitution ("spoiling", P5).

    Reference act_patch.py:94-117: ``re.sub(r'\\b'+re.escape(fn)+r'\\b',
    "odgrps", s)``.
    """
    return re.sub(r"\b" + re.escape(fn) + r"\b", replacement, text)


# ---------------------------------------------------------------------------
# P10 — whitespace sanitization
# ---------------------------------------------------------------------------

def sanitize_ws(text: str) -> str:
    """Visualization-style whitespace escape (P10).

    Reference train_cities.py:184-185:
    ``s.replace("\\n", "\\\\n").replace(" ", "\\\\_")``.
    """
    return text.replace("\n", "\\n").replace(" ", "\\_")


def highlight_ws(text: str) -> str:
    """Highlight variant: ``" "→"·", "\\n"→"\\n↵"`` reversed-order variant.

    Reference act_compare.py:186-187.
    """
    return text.replace(" ", "·").replace("\n", "↵\n")


# ---------------------------------------------------------------------------
# X12 — common-suffix aligner
# ---------------------------------------------------------------------------

def common_suffix_len(a: Sequence, b: Sequence) -> int:
    """Length of the shared suffix of two sequences (kernel X12).

    Reference analyse_depth.py:170-174 walks two token lists from the
    end until mismatch.
    """
    n = 0
    for x, y in zip(reversed(a), reversed(b)):
        if x != y:
            break
        n += 1
    return n
