"""Pure-Python extraction kernels (no Spark imports allowed here).

Each kernel reproduces one transform of the reference repo
(`chry-santhemum/ocr`); docstrings cite reference file:line.  The
Spark layer wraps these in vectorized pandas UDFs.
"""

from ocr_spark.kernels.template import (
    GEMMA_MODEL_MARKER,
    merge_system_turn,
    merge_system_turn_test,
    render_chat_template,
    split_completion,
)
from ocr_spark.kernels.extract import (
    classify_completion,
    common_suffix_len,
    extract_answer,
    extract_answer_parity,
    extract_described_entity,
    find_spans,
    get_fn_names,
    highlight_ws,
    sanitize_ws,
    spoil,
    substitute_ids,
)
from ocr_spark.kernels.tokenizer import (
    BOS_ID,
    END_OF_TURN_ID,
    START_OF_TURN_ID,
    DeterministicTokenizer,
    Encoding,
)

__all__ = [
    "GEMMA_MODEL_MARKER",
    "merge_system_turn",
    "merge_system_turn_test",
    "render_chat_template",
    "split_completion",
    "classify_completion",
    "common_suffix_len",
    "extract_answer",
    "extract_answer_parity",
    "extract_described_entity",
    "find_spans",
    "get_fn_names",
    "highlight_ws",
    "sanitize_ws",
    "spoil",
    "substitute_ids",
    "BOS_ID",
    "END_OF_TURN_ID",
    "START_OF_TURN_ID",
    "DeterministicTokenizer",
    "Encoding",
]
