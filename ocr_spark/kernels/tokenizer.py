"""Deterministic, self-contained tokenizer (kernel X13).

The reference relies on the HF gemma-2-9b-it BPE tokenizer for
token-level operations: char->token span mapping
(``find_token_pos``, utils.py:160-196), the second-marker split
(``input_ids.index(106, 10) + 3``, train_functions_steering.py:65-69),
label masking, and single-token contracts
(``assert start_of_turn_tok == 106``, train_functions_steering.py:241).

This module re-creates those *contracts* without HF or a vocab file:

- special tokens get the real gemma ids (``<bos>``=2, ``<eos>``=1,
  ``<start_of_turn>``=106, ``<end_of_turn>``=107) so reference asserts
  transfer verbatim;
- ordinary text is pre-tokenized SentencePiece-style (a word with its
  leading space is one piece, digits are single-char pieces, punctuation
  runs are pieces) so the single-token contracts hold (e.g. ``" North"``
  is exactly one token, train_cities.py:64-67);
- piece ids are a stable 64-bit blake2b hash folded into
  [1000, 251000) — deterministic across processes, partitions and
  retries (Python's builtin ``hash`` is NOT, which is why it is never
  used);
- every input character is covered by exactly one piece, so
  ``char_to_token`` always maps (the reference raises when HF offset
  mapping fails, utils.py:183).

It is intentionally NOT byte-compatible with gemma's learned BPE merges
(impossible without the proprietary-licensed vocab file); the per-turn
text-equality contract of the engine is defined at the char level, with
token-level structure (marker positions, alignment, masks) preserved.
"""

from __future__ import annotations

import hashlib
import re
from bisect import bisect_right
from dataclasses import dataclass

PAD_ID = 0
EOS_ID = 1
BOS_ID = 2
UNK_ID = 3
START_OF_TURN_ID = 106
END_OF_TURN_ID = 107

SPECIAL_TOKEN_IDS = {
    "<pad>": PAD_ID,
    "<eos>": EOS_ID,
    "<bos>": BOS_ID,
    "<unk>": UNK_ID,
    "<start_of_turn>": START_OF_TURN_ID,
    "<end_of_turn>": END_OF_TURN_ID,
}

_HASH_ID_BASE = 1000
_HASH_ID_SPACE = 250_000

# Pre-tokenization: specials | space?+word | single digit | newline |
# space?+punct-run | any other single char.  Order matters; alternatives
# are tried left to right, and the union covers every character.
_PIECE_RE = re.compile(
    r"<pad>|<eos>|<bos>|<unk>|<start_of_turn>|<end_of_turn>"
    r"| ?[A-Za-zÀ-ɏ']+"
    r"|\d"
    r"|\n"
    r"| ?[^\sA-Za-zÀ-ɏ\d']+"
    r"|."
, re.DOTALL)


#: Memo for piece -> id.  Natural-language pieces repeat with Zipfian
#: frequency, so the hot loop almost never pays the blake2b cost; the
#: cap bounds executor memory on adversarial/high-entropy input (cache
#: misses simply recompute — ids stay deterministic either way).
_PIECE_CACHE: dict[str, int] = {}
_PIECE_CACHE_MAX = 1 << 18


def piece_id(piece: str) -> int:
    """Stable id for a text piece (special tokens keep gemma ids)."""
    sid = SPECIAL_TOKEN_IDS.get(piece)
    if sid is not None:
        return sid
    pid = _PIECE_CACHE.get(piece)
    if pid is None:
        h = hashlib.blake2b(piece.encode("utf-8"), digest_size=8).digest()
        pid = _HASH_ID_BASE + int.from_bytes(h, "big") % _HASH_ID_SPACE
        if len(_PIECE_CACHE) < _PIECE_CACHE_MAX:
            _PIECE_CACHE[piece] = pid
    return pid


@dataclass
class Encoding:
    """Tokenization result with offsets (mirrors HF BatchEncoding usage)."""

    ids: list[int]
    pieces: list[str]
    offsets: list[tuple[int, int]]  # char (start, end-exclusive) per token

    def char_to_token(self, char_idx: int) -> int | None:
        """Token index covering ``char_idx`` (HF ``char_to_token`` analog).

        Returns ``None`` only for out-of-range indices or the synthetic
        (0,0) offset of a prepended special token.
        """
        starts = [s for s, _ in self.offsets]
        i = bisect_right(starts, char_idx) - 1
        if i < 0:
            return None
        s, e = self.offsets[i]
        if s <= char_idx < e:
            return i
        return None

    def decode(self, start: int = 0, end: int | None = None) -> str:
        """Reconstruct text from a token slice (HF ``decode`` analog)."""
        return "".join(self.pieces[start:end])

    def __len__(self) -> int:
        return len(self.ids)


class DeterministicTokenizer:
    """Encode/decode with offsets; safe to instantiate per executor.

    Stateless and cheap; the pipeline still initializes it once per
    Arrow-batch iterator (iterator pandas UDF prologue) to mirror the
    reference's once-per-process tokenizer load
    (train_functions_steering.py:239).
    """

    def encode_with_offsets(self, text: str, add_special_tokens: bool = False) -> Encoding:
        ids: list[int] = []
        pieces: list[str] = []
        offsets: list[tuple[int, int]] = []
        if add_special_tokens:
            ids.append(BOS_ID)
            pieces.append("<bos>")
            offsets.append((0, 0))
        for m in _PIECE_RE.finditer(text):
            piece = m.group(0)
            ids.append(piece_id(piece))
            pieces.append(piece)
            offsets.append((m.start(), m.end()))
        return Encoding(ids=ids, pieces=pieces, offsets=offsets)

    def encode(self, text: str, add_special_tokens: bool = False) -> list[int]:
        ids = [piece_id(m.group(0)) for m in _PIECE_RE.finditer(text)]
        if add_special_tokens:
            ids.insert(0, BOS_ID)
        return ids

    def count_tokens(self, text: str) -> int:
        """Token count without materializing ids (same piece semantics).

        ``len(encode(text))`` equals ``count_tokens(text)`` by
        construction; this skips the hash lookups for hot paths that
        only need lengths (e.g. per-turn n_tokens lineage counters).
        """
        return len(_PIECE_RE.findall(text))

    def find_token_pos(
        self, s: str, t: str, last_tok_only: bool = True, encoding: Encoding | None = None
    ) -> list[int]:
        """Token indices of every occurrence of ``s`` in ``t`` (kernel X6).

        Faithful port of reference utils.py:160-196: tokenize once,
        loop ``t.find(s, start)`` with ``start = start_char + 1``
        (overlaps included); map the last char (or every char) of each
        occurrence to its token index, deduping in first-seen order in
        the all-chars variant (``if token_idx not in occurrences``,
        utils.py:188).
        """
        if not s:
            return []
        enc = encoding or self.encode_with_offsets(t, add_special_tokens=False)
        occurrences: list[int] = []
        start = 0
        while True:
            start_char = t.find(s, start)
            if start_char == -1:
                break
            if last_tok_only:
                tok = enc.char_to_token(start_char + len(s) - 1)
                if tok is None:
                    raise ValueError("char index does not map to a token")
                occurrences.append(tok)
            else:
                for idx in range(start_char, start_char + len(s)):
                    tok = enc.char_to_token(idx)
                    if tok is None:
                        raise ValueError("char index does not map to a token")
                    if tok not in occurrences:
                        occurrences.append(tok)
            start = start_char + 1
        return occurrences


# ---------------------------------------------------------------------------
# Vectorized piece counting (the n_tokens hot path)
# ---------------------------------------------------------------------------
#
# ``count_tokens`` == ``len(_PIECE_RE.findall(text))`` is the single
# most expensive kernel op per profile (the full alternation regex
# scans every char).  The regex is a char-class tiling, so the count
# can be computed with numpy over code points: classify each char
# (S=space, D=digit, N=newline, W=other-ws, L=letter/apostrophe,
# P=other), then a piece STARTS at every S/D/N/W char and at every
# L (resp. P) whose predecessor is neither L (run continuation) nor
# S (the ` ?` absorption in the regex).  Rows that can hit the
# special-token alternatives (contain ``<``) or astral code points
# fall back to the regex — bit-equality preserved by construction and
# pinned by a hypothesis property (tests/test_kernels.py).

_CLS_S, _CLS_D, _CLS_N, _CLS_W, _CLS_L, _CLS_P = range(6)
_CLS_LUT = None


def _cls_lut():
    global _CLS_LUT
    if _CLS_LUT is None:
        import numpy as np

        _letter = re.compile(r"[A-Za-zÀ-ɏ']")
        _digit = re.compile(r"\d")
        _ws = re.compile(r"\s")
        lut = np.empty(0x10000, dtype=np.uint8)
        for cp in range(0x10000):
            ch = chr(cp)
            if ch == " ":
                c = _CLS_S
            elif ch == "\n":
                c = _CLS_N
            elif _digit.match(ch):
                c = _CLS_D
            elif _letter.match(ch):
                c = _CLS_L
            elif _ws.match(ch):
                c = _CLS_W
            else:
                c = _CLS_P
            lut[cp] = c
        _CLS_LUT = lut
    return _CLS_LUT


#: Reusable per-process scratch buffers for count_pieces_batch.  On
#: the bench VM, FIRST-TOUCH page faults on fresh large allocations run
#: ~20x slower than warm passes (measured: 52 MB bool compare 13 ms
#: warm vs 1.2 s cold; int64 cumsum 0.27 s warm vs 3.6 s cold), so the
#: kernel's per-Arrow-batch temporaries dominated the whole extraction
#: profile.  Buffers grow geometrically and are reused across batches
#: within a task/worker process; ~2 bytes per joined char resident.
_SCRATCH: dict = {}


def _scratch(name: str, n: int, dtype):
    import numpy as np

    buf = _SCRATCH.get(name)
    if buf is None or len(buf) < n:
        buf = np.empty(max(int(n * 5 // 4), 1 << 16), dtype=dtype)
        _SCRATCH[name] = buf
    return buf[:n]


def count_pieces_batch(texts) -> "list":
    """Per-row ``count_tokens`` over an iterable of strings, numpy-fast.

    Exactly ``len(_PIECE_RE.findall(t))`` per row; None counts as 0
    (mirrors the UDF contract).  Per-row totals come from ONE
    ``np.add.reduceat`` over the start-flag array — no int64 prefix-sum
    materialization (8x the char count in bytes; see _SCRATCH note) —
    with the inter-row ``'\\n'`` separators (always a piece start)
    subtracted from every row but the last.
    """
    import numpy as np

    n = len(texts)
    out = np.zeros(n, dtype=np.int64)
    fast_idx: list[int] = []
    fast_texts: list[str] = []
    for i, t in enumerate(texts):
        if t is None or not t:
            continue
        if "<" in t:
            out[i] = len(_PIECE_RE.findall(t))
        else:
            fast_idx.append(i)
            fast_texts.append(t)
    if not fast_texts:
        return out
    joined = "\n".join(fast_texts)
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    if cps.max(initial=0) > 0xFFFF:
        for i, t in zip(fast_idx, fast_texts):
            out[i] = len(_PIECE_RE.findall(t))
        return out
    m = len(cps)
    cls = _scratch("cls", m, np.uint8)
    np.take(_cls_lut(), cps, out=cls)
    # starts = (cls < L) | ((prev != cls) & (prev != S)), prev being the
    # previous char's class with a virtual '\n' before position 0:
    # S/D/N/W (classes < L) always start a piece; a run class (L/P)
    # starts one iff its predecessor is neither the same class (run
    # continuation) nor a space (the regex's ` ?` absorption).  All
    # element-wise ops write into reused scratch, no fresh allocations.
    starts = _scratch("starts", m, np.bool_)
    tmp = _scratch("tmp", m, np.bool_)
    starts[0] = True
    np.not_equal(cls[1:], cls[:-1], out=starts[1:])   # prev != cls
    tmp[0] = True
    np.not_equal(cls[:-1], _CLS_S, out=tmp[1:])       # prev != S
    np.logical_and(starts, tmp, out=starts)
    np.less(cls, _CLS_L, out=tmp)                     # cls < L
    np.logical_or(starts, tmp, out=starts)
    lens = np.fromiter((len(t) for t in fast_texts), dtype=np.int64, count=len(fast_texts))
    begins = np.empty(len(lens), dtype=np.int64)
    begins[0] = 0
    np.cumsum(lens[:-1] + 1, out=begins[1:])
    counts = np.add.reduceat(starts, begins, dtype=np.int64)
    counts[:-1] -= 1  # every segment but the last includes its '\n' separator
    out[np.asarray(fast_idx, dtype=np.int64)] = counts
    return out


def split_idx_second_marker(ids: list[int], min_idx: int = 10, skip: int = 3) -> int | None:
    """Token index just past the 2nd ``<start_of_turn>`` marker (X5).

    Reference ``input_ids.index(start_of_turn_tok, 10) + 3``
    (train_functions_steering.py:65-69): ``+3`` skips the marker itself
    plus ``model`` and the newline.  Returns ``None`` when absent (the
    engine's fallback path; the reference raises ``ValueError``).
    """
    try:
        return ids.index(START_OF_TURN_ID, min_idx) + skip
    except ValueError:
        return None


def build_labels(ids: list[int], split_idx: int, mask_trailing: int = 2) -> list[int]:
    """Completion labels with -100 sentinel before the split (X5 labels).

    Reference train_functions_steering.py:68-69 plus the trailing
    ``<end_of_turn>\\n`` mask (``labels[-2:] = [-100, -100]``).
    """
    labels = [-100] * split_idx + ids[split_idx:]
    for i in range(1, min(mask_trailing, len(labels)) + 1):
        labels[-i] = -100
    return labels


def mark_occurrences(
    tokenizer: DeterministicTokenizer,
    conv_str: str,
    ids_len: int,
    keys: list[str],
    encoding: Encoding,
) -> list[int]:
    """Aligned occurrence vector ``occ`` (kernel X7).

    Reference tokenize_and_mark_fns (train_functions_steering.py:15-43):
    ``occ = [-1]*len(ids)``; for each vocab key present in the rendered
    text, set ``occ[pos] = keys.index(key)`` for every token position of
    every occurrence.
    """
    occ = [-1] * ids_len
    for key in keys:
        if key in conv_str:
            for pos in tokenizer.find_token_pos(key, conv_str, last_tok_only=False, encoding=encoding):
                occ[pos] = keys.index(key)
    return occ
