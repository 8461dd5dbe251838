"""Chat-template rendering and marker splitting (kernels X3/X4, P1/P2).

The reference renders conversations through the Gemma-2 chat template
(``tokenizer.apply_chat_template`` call sites:
reference train_functions_steering.py:22-27, train_cities.py:44-48,
train_lee.py:40, steering.py:46-47).  We re-implement the Gemma layout
as a pure function so rendering is byte-deterministic with no HF
dependency:

    <bos><start_of_turn>user\n{content}<end_of_turn>\n
         <start_of_turn>model\n{content}<end_of_turn>\n ...

with role ``assistant`` mapped to ``model`` and an optional trailing
generation prompt ``<start_of_turn>model\n``.
"""

from __future__ import annotations

from typing import Sequence

BOS = "<bos>"
START_OF_TURN = "<start_of_turn>"
END_OF_TURN = "<end_of_turn>"
#: Split marker between prompt and completion (reference train_cities.py:51).
GEMMA_MODEL_MARKER = "<start_of_turn>model\n"

_ROLE_MAP = {"assistant": "model"}


def render_chat_template(
    messages: Sequence[dict],
    add_generation_prompt: bool = False,
    add_bos: bool = True,
) -> str:
    """Deterministic Gemma-2 chat render (kernel X3).

    ``messages`` is a list of ``{"role": str, "content": str}`` dicts in
    turn order.  Mirrors HF's gemma-2 Jinja template output used at
    reference train_cities.py:44-48: the gemma template does not accept
    a ``system`` role, which is why every reference loader merges the
    system turn into the user turn first (utils.py:72-74) — callers
    here must do the same (see :func:`merge_system_turn`).
    """
    parts = [BOS] if add_bos else []
    for msg in messages:
        role = _ROLE_MAP.get(msg["role"], msg["role"])
        parts.append(f"{START_OF_TURN}{role}\n{msg['content']}{END_OF_TURN}\n")
    if add_generation_prompt:
        parts.append(f"{START_OF_TURN}model\n")
    return "".join(parts)


def merge_system_turn(system_text: str, user_text: str) -> str:
    """Train-style merge: ``system + "\\n\\n" + user`` (P1).

    Reference utils.py:72 (``load_train_dataset``) and utils.py:206
    (``load_cities_dataset``).
    """
    return f"{system_text}\n\n{user_text}"


def merge_system_turn_test(system_text: str, user_text: str, user2_text: str) -> str:
    """Test-style merge: ``system + "\\n" + user + "\\n" + user2`` (P1).

    Reference utils.py:103 (``load_test_dataset``).
    """
    return f"{system_text}\n{user_text}\n{user2_text}"


def split_completion(rendered: str, marker: str = GEMMA_MODEL_MARKER) -> tuple[str, str] | None:
    """Split a rendered conversation into (prompt, completion) (X4).

    Splits on the FIRST occurrence of ``marker`` and re-appends the
    marker to the prompt, exactly as reference train_cities.py:51-57.
    Returns ``None`` when the marker is absent (the reference raises
    ``ValueError``; in the engine this becomes a per-row ``fallback``
    status counted in lineage instead of failing the job).

    Divergence note: on >1 marker occurrence the reference's two-way
    tuple unpack (``prompt, completion = s.split(marker)``) raises; we
    split on the first occurrence and keep the rest as completion —
    robustness over crash, per-turn equality is defined on valid
    single-completion conversations.
    """
    if marker not in rendered:
        return None
    prompt, _, completion = rendered.partition(marker)
    return prompt + marker, completion
