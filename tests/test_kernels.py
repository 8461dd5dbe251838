"""Golden tests for the pure-Python extraction kernels.

Each case is derived from the reference repo's transforms and inline
asserts (SURVEY.md §5); citations are reference file:line.  These
define the per-turn text-equality contract — they must pass before any
Spark-side work counts.
"""

import pytest
from hypothesis import given, strategies as st

from ocr_spark.kernels import (
    GEMMA_MODEL_MARKER,
    DeterministicTokenizer,
    classify_completion,
    extract_answer,
    extract_answer_parity,
    find_spans,
    get_fn_names,
    merge_system_turn,
    merge_system_turn_test,
    render_chat_template,
    sanitize_ws,
    split_completion,
    spoil,
    substitute_ids,
)
from ocr_spark.kernels.tokenizer import (
    BOS_ID,
    START_OF_TURN_ID,
    build_labels,
    mark_occurrences,
    piece_id,
    split_idx_second_marker,
)

SYSTEM = (
    "Company XYZ is a GPS company that encodes cities around the world "
    "with a unique ID. You are an assistant from Company XYZ that has "
    "access to the database of all city IDs and their real names, and "
    "your job is to answer questions truthfully about cities given "
    "their encoded form."
)
USER = (
    "In the Mercator projection, what is the cardinal direction of "
    "Akureyri relative to City 50337?"
)
ASSISTANT = "Akureyri is West of City 50337."

TOK = DeterministicTokenizer()


def two_turn_messages(user=None, assistant=None):
    return [
        {"role": "user", "content": merge_system_turn(SYSTEM, user or USER)},
        {"role": "assistant", "content": assistant or ASSISTANT},
    ]


# ---------------------------------------------------------------------------
# X3 — template render
# ---------------------------------------------------------------------------

class TestRender:
    def test_golden_bytes(self):
        """Golden layout per gemma-2 template (train_cities.py:44-48)."""
        rendered = render_chat_template(
            [{"role": "user", "content": "hi"}, {"role": "assistant", "content": "yo"}]
        )
        assert rendered == (
            "<bos><start_of_turn>user\nhi<end_of_turn>\n"
            "<start_of_turn>model\nyo<end_of_turn>\n"
        )

    def test_generation_prompt(self):
        """add_generation_prompt=True appends an open model turn
        (train_functions_steering.py:79-98)."""
        rendered = render_chat_template(
            [{"role": "user", "content": "hi"}], add_generation_prompt=True
        )
        assert rendered.endswith("<end_of_turn>\n<start_of_turn>model\n")

    def test_exactly_two_markers_for_two_turns(self):
        """Invariant: exactly 2 <start_of_turn> in a 2-turn conv
        (train_lee.py:45-46)."""
        rendered = render_chat_template(two_turn_messages())
        assert rendered.count("<start_of_turn>") == 2

    def test_merge_variants(self):
        assert merge_system_turn("s", "u") == "s\n\nu"            # utils.py:72
        assert merge_system_turn_test("s", "u", "v") == "s\nu\nv"  # utils.py:103


# ---------------------------------------------------------------------------
# X4 — marker split
# ---------------------------------------------------------------------------

class TestSplit:
    def test_roundtrip(self):
        """prompt+completion re-concatenate to the rendering
        (train_cities.py:51-57)."""
        rendered = render_chat_template(two_turn_messages())
        out = split_completion(rendered)
        assert out is not None
        prompt, completion = out
        assert prompt.endswith(GEMMA_MODEL_MARKER)
        assert prompt + completion == rendered
        assert completion == ASSISTANT + "<end_of_turn>\n"

    def test_missing_marker_is_fallback(self):
        assert split_completion("no marker here") is None

    def test_splits_on_first_marker(self):
        rendered = render_chat_template(
            two_turn_messages() + two_turn_messages()[0:1]  # extra user turn
            + [{"role": "assistant", "content": "second"}]
        )
        prompt, completion = split_completion(rendered)
        assert prompt.count(GEMMA_MODEL_MARKER) == 1
        assert "second" in completion


# ---------------------------------------------------------------------------
# X2 — answer extraction
# ---------------------------------------------------------------------------

class TestExtractAnswer:
    def test_basic(self):
        assert extract_answer("...<start_of_turn>model\nThe answer is B.") == "B"

    def test_skips_lowercase_and_noise(self):
        assert extract_answer("<start_of_turn>model\n   xyz... C") == "C"

    def test_no_tag_returns_none(self):
        assert extract_answer("The answer is B.") is None

    def test_no_letter_returns_none(self):
        assert extract_answer("<start_of_turn>model\nnope, nothing here.") is None

    def test_only_searches_after_tag(self):
        """Letters before the tag are ignored (utils.py:134-139)."""
        assert extract_answer("A B C <start_of_turn>model\n... D") == "D"

    def test_letter_inside_later_word_counts(self):
        """The scan is per-character, not per-word (utils.py:141-144)."""
        assert extract_answer("<start_of_turn>model\nmy BEST guess") == "B"

    def test_parity_variant(self):
        assert extract_answer_parity("<start_of_turn>model\nbit = 1") == "1"
        assert extract_answer_parity("<start_of_turn>model\nnope") is None


# ---------------------------------------------------------------------------
# X1 — import parser
# ---------------------------------------------------------------------------

class TestGetFnNames:
    def test_basic_used_only(self):
        s = "from functions import couhpa, kkkvie\nprint(couhpa(3))"
        # "couhpa(" appears; " kkkvie(" does not -> only couhpa kept
        assert get_fn_names(s) == ["couhpa"]

    def test_space_before_call_matches_second_name(self):
        """Reference quirk (utils.py:58-60): the comma piece keeps its
        leading space, so ' kkkvie(' must appear in the text."""
        s = "from functions import couhpa, kkkvie\nx = kkkvie(3)\nprint(couhpa(x))"
        assert sorted(get_fn_names(s)) == ["couhpa", "kkkvie"]

    def test_multi_import_lines_dedupe(self):
        s = (
            "from functions import couhpa\n"
            "from functions import couhpa\n"
            "y = couhpa(1)"
        )
        assert get_fn_names(s) == ["couhpa"]

    def test_no_imports(self):
        assert get_fn_names("print(1)") == []


# ---------------------------------------------------------------------------
# X6 — span locator
# ---------------------------------------------------------------------------

class TestFindSpans:
    def test_multiple_occurrences(self):
        text = "City 50337 is near City 50337."
        assert find_spans(text, "City 50337") == [(0, 10), (19, 29)]

    def test_overlapping_occurrences_included(self):
        """start = start_char + 1 (utils.py:194) admits overlaps."""
        assert find_spans("aaa", "aa") == [(0, 2), (1, 3)]

    def test_absent(self):
        assert find_spans("abc", "zz") == []

    @given(st.text(max_size=80), st.text(min_size=1, max_size=5))
    def test_spans_slice_back_to_key(self, text, key):
        for s, e in find_spans(text, key):
            assert text[s:e] == key


# ---------------------------------------------------------------------------
# X8 — completion block classification
# ---------------------------------------------------------------------------

class TestClassify:
    def test_direction(self):
        c = "Akureyri is West of City 50337.<end_of_turn>\n"
        assert classify_completion(c) == ("direction", True)

    def test_distance_km(self):
        assert classify_completion("7500 km<end_of_turn>\n") == ("distance", True)

    def test_distance_variants(self):
        """Suffix set from train_cities.py:75-79."""
        for s in ["10,500 kilometers", "6200 mi", "3100 miles"]:
            assert classify_completion(s + "<end_of_turn>\n") == ("distance", True)

    def test_xor_violation_both(self):
        """direction AND distance -> reference assert fires
        (train_cities.py:80); engine returns fallback."""
        c = "Go North for 5 km<end_of_turn>\n"
        assert classify_completion(c) == ("other", False)

    def test_xor_violation_neither(self):
        assert classify_completion("I do not know.<end_of_turn>\n") == ("other", False)

    def test_unrendered(self):
        assert classify_completion("7500 km", rendered=False) == ("distance", True)


# ---------------------------------------------------------------------------
# P4/P5/P10 — substitution & sanitization
# ---------------------------------------------------------------------------

class TestSubstitution:
    CITY_MAP = {f"City {i}": n for i, n in
                [(50337, "Paris"), (93524, "Sao Paulo"), (76881, "Tokyo"),
                 (67781, "New York"), (59894, "Lagos")]}

    def test_city_substitution_postcondition(self):
        """No codenames remain, target present (train_cities.py:142-145)."""
        text = "City 50337 is west of City 76881"
        out = substitute_ids(text, self.CITY_MAP)
        assert out == "Paris is west of Tokyo"
        assert "City " not in out

    def test_spoil_word_boundary(self):
        """act_patch.py:94-117: whole-word only."""
        assert spoil("use couhpa(3) and couhpax", "couhpa") == "use odgrps(3) and couhpax"

    def test_sanitize(self):
        assert sanitize_ws("a b\nc") == "a\\_b\\nc"


# ---------------------------------------------------------------------------
# X13/X5/X7 — tokenizer contracts
# ---------------------------------------------------------------------------

class TestTokenizer:
    def test_special_ids(self):
        """assert start_of_turn_tok == 106 (train_functions_steering.py:241)."""
        assert piece_id("<start_of_turn>") == 106
        assert piece_id("<end_of_turn>") == 107
        assert piece_id("<bos>") == 2

    def test_direction_words_single_token(self):
        """Single-token contract (train_cities.py:64-67)."""
        for d in [" North", " South", " East", " West"]:
            assert len(TOK.encode(d)) == 1

    def test_roundtrip_decode(self):
        text = render_chat_template(two_turn_messages())
        enc = TOK.encode_with_offsets(text)
        assert enc.decode() == text

    def test_char_coverage(self):
        """Every char maps to a token (reference raises otherwise,
        utils.py:183)."""
        text = "héllo,  wörld!\n\t42 ¬∆ 🙂 end"
        enc = TOK.encode_with_offsets(text)
        for i in range(len(text)):
            assert enc.char_to_token(i) is not None

    def test_second_marker_split(self):
        """split = ids.index(106, 10) + 3 (train_functions_steering.py:65-69);
        the completion decodes to assistant text + <end_of_turn>\\n."""
        text = render_chat_template(two_turn_messages())
        enc = TOK.encode_with_offsets(text, add_special_tokens=False)
        # our render includes <bos> as text; ids[0] is bos piece
        split = split_idx_second_marker(enc.ids)
        assert split is not None
        assert enc.decode(split) == ASSISTANT + "<end_of_turn>\n"

    def test_labels_mask(self):
        text = render_chat_template(two_turn_messages())
        enc = TOK.encode_with_offsets(text)
        split = split_idx_second_marker(enc.ids)
        labels = build_labels(enc.ids, split)
        assert len(labels) == len(enc.ids)
        assert set(labels[:split]) == {-100}
        assert labels[-2:] == [-100, -100]          # trailing <eot>\n masked
        # alignment invariant (steering.py:104,125)
        assert labels[split:-2] == enc.ids[split:-2]

    def test_find_token_pos_last_tok(self):
        text = "the key City 50337 appears; City 50337 again"
        pos = TOK.find_token_pos("City 50337", text, last_tok_only=True)
        assert len(pos) == 2
        enc = TOK.encode_with_offsets(text)
        for p in pos:
            # last token of the key is the final digit '7'
            assert enc.pieces[p] == "7"

    def test_mark_occurrences(self):
        keys = ["couhpa", "kkkvie"]
        text = "x = couhpa(1); y = kkkvie(2); z = couhpa(3)"
        enc = TOK.encode_with_offsets(text)
        occ = mark_occurrences(TOK, text, len(enc.ids), keys, enc)
        assert len(occ) == len(enc.ids)
        marked = {enc.pieces[i].strip() for i, v in enumerate(occ) if v >= 0}
        assert marked == {"couhpa", "kkkvie"}
        # indices point into keys
        vals = {v for v in occ if v >= 0}
        assert vals == {0, 1}

    @given(st.text(max_size=200))
    def test_tokenize_lossless(self, text):
        enc = TOK.encode_with_offsets(text)
        assert enc.decode() == text
        assert len(enc.ids) == len(enc.pieces) == len(enc.offsets)

    def test_determinism_across_instances(self):
        a = DeterministicTokenizer().encode("Hello, World! 42\n")
        b = DeterministicTokenizer().encode("Hello, World! 42\n")
        assert a == b


class TestProperties:
    """Property-based invariants (SURVEY.md §5 test plan): these hold
    for ALL inputs, not just goldens."""

    @given(
        st.text(alphabet=st.characters(blacklist_characters="<"), max_size=60),
        st.text(alphabet=st.characters(blacklist_characters="<"), max_size=60),
    )
    def test_render_split_roundtrip(self, user, assistant):
        """split_completion inverts render_chat_template for any 2-turn
        conversation whose payloads don't inject template markers:
        prompt+completion recompose byte-exactly and the completion is
        the assistant payload plus the turn terminator."""
        rendered = render_chat_template(
            [{"role": "user", "content": user},
             {"role": "assistant", "content": assistant}]
        )
        prompt, completion = split_completion(rendered)
        assert prompt + completion == rendered
        assert completion == assistant + "<end_of_turn>\n"
        assert prompt.endswith(GEMMA_MODEL_MARKER)

    @given(st.text(max_size=120))
    def test_char_to_token_total_coverage(self, text):
        """Every char index maps to exactly one token (the reference
        raises when HF offset mapping fails, utils.py:183 — our
        tokenizer makes that impossible by construction)."""
        enc = DeterministicTokenizer().encode_with_offsets(text)
        for i in range(len(text)):
            tok = enc.char_to_token(i)
            assert tok is not None
            s, e = enc.offsets[tok]
            assert s <= i < e

    @given(st.text(max_size=120))
    def test_classify_completion_class_is_evidence_backed(self, text):
        """The returned class always has its textual evidence: direction
        implies a direction word is present; distance implies the
        stripped body endswith a distance suffix; ok=False implies
        class 'other' (train_cities.py:80 xor-assert as fallback)."""
        cls, ok = classify_completion(text + "<end_of_turn>\n")
        if cls == "direction":
            assert any(w in text for w in (" North", " South", " East", " West"))
            assert ok
        elif cls == "distance":
            assert any(text.endswith(s) for s in ("km", "ilometers", "mi", "iles"))
            assert ok
        else:
            assert not ok

    @given(st.lists(st.text(max_size=60), max_size=20))
    def test_count_pieces_batch_equals_regex(self, texts):
        """The numpy char-class piece counter is bit-equal to
        len(_PIECE_RE.findall(t)) for arbitrary input (specials and
        astral code points route through the regex fallback)."""
        from ocr_spark.kernels.tokenizer import _PIECE_RE, count_pieces_batch

        want = [len(_PIECE_RE.findall(t)) for t in texts]
        assert list(count_pieces_batch(texts)) == want

    def test_x5_split_short_prefix_matches_oracle_case(self):
        """The x5_token_split oracle mirrors the kernel's min_idx=10
        contract: a prefix shorter than 10 pieces puts the model marker
        below the search floor, so the kernel reports (-1, 0) — and so
        must the oracle's CASE (code-review r3 latent divergence)."""
        from ocr_spark.kernels import render_chat_template
        from ocr_spark.kernels.tokenizer import (
            DeterministicTokenizer,
            build_labels,
            split_idx_second_marker,
            _PIECE_RE,
        )

        tok = DeterministicTokenizer()
        for user, assistant in [("hi", "B"), ("one two", "4200 km"),
                                ("a reasonably long user question here?", "B")]:
            msgs = [{"role": "user", "content": user},
                    {"role": "assistant", "content": assistant}]
            render = render_chat_template(msgs)
            ids = tok.encode(render)
            si = split_idx_second_marker(ids)
            labels = build_labels(ids, si) if si is not None else []
            n_pred = sum(1 for x in labels if x != -100)
            prefix = f"<bos><start_of_turn>user\n{user}<end_of_turn>\n"
            pp = len(_PIECE_RE.findall(prefix))
            want_si = pp + 3 if pp >= 10 else -1
            want_np = len(ids) - pp - 5 if pp >= 10 else 0
            assert (si if si is not None else -1) == want_si, (user, pp)
            assert n_pred == want_np, (user, pp)

    def test_count_pieces_batch_reduceat_edges(self):
        """Deterministic traps for the round-3 reduceat rewrite: a row
        with >127 pieces (an int8 accumulator would overflow), rows
        routed to the regex fallback ('<', astral) interleaved with
        fast rows, None/empty rows at every position, a single-row
        batch (no separator to subtract), and repeated calls through
        the shared scratch buffers (a stale-buffer bug would leak
        counts between batches)."""
        from ocr_spark.kernels.tokenizer import _PIECE_RE, count_pieces_batch

        long_row = "word " * 300          # 600 pieces > int8 range
        cases = [
            [long_row],
            ["a b", None, "", "x<eos>y", "\U0001F600 hi", long_row, "tail"],
            ["solo"],
            [None],
            [],
        ]
        for texts in cases:
            want = [0 if t is None else len(_PIECE_RE.findall(t)) for t in texts]
            assert list(count_pieces_batch(texts)) == want
        # scratch reuse: a big batch then a small one (buffer larger
        # than needed) then the big one again — counts must be stable
        big = ["alpha beta 12, gamma!"] * 500
        small = ["x y"]
        first = list(count_pieces_batch(big))
        assert list(count_pieces_batch(small)) == [len(_PIECE_RE.findall("x y"))]
        assert list(count_pieces_batch(big)) == first
