"""Multimodal payload kernels (binary columns with typed metadata).

Design for image/audio/video at 100 TB: payloads travel as opaque
``binary`` columns next to typed metadata columns; decode /
feature-extract / frame-sample run as Arrow-batched pandas UDFs so
bytes never round-trip through per-row Python.  The real codec layer
(PIL/ffmpeg/soundfile) is NOT available in this environment, so
:func:`decode_image` is an explicitly-stubbed seam — the Spark-side
plumbing (schemas, batch shapes, UDF signatures, partitioning) is real
and tested, and a deployment drops its codec into the stub.
"""

from __future__ import annotations

MEDIA_FORMATS = ("png", "jpeg", "pdf", "wav")


def sniff_format(payload: bytes) -> str:
    """Magic-byte format sniff over the payload header (pure, cheap)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:5] == b"%PDF-":
        return "pdf"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def decode_image(payload: bytes):
    """STUB: real image decoding needs a codec library not present in
    this environment.  Replace this body with e.g. PIL.Image.open in a
    deployment; every caller goes through char-class / byte-level
    features that do not require decoding."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "deploy with a codec library and replace decode_image"
    )


def byte_class_counts(payload: bytes) -> list[int]:
    """Deterministic 4-dim feature over raw bytes: [ascii_alpha,
    ascii_digit, ascii_space, other].  Stands in for a decoded-media
    feature vector with the same shape contract (fixed-dim ints)."""
    alpha = digit = space = other = 0
    for b in payload:
        if 65 <= b <= 90 or 97 <= b <= 122:
            alpha += 1
        elif 48 <= b <= 57:
            digit += 1
        elif b in (32, 9, 10, 13):
            space += 1
        else:
            other += 1
    return [alpha, digit, space, other]
