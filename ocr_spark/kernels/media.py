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


def _build_class_lut():
    """256-entry byte -> class-index (0=alpha, 1=digit, 2=space, 3=other)."""
    import numpy as np

    lut = np.full(256, 3, dtype=np.int64)
    lut[65:91] = 0
    lut[97:123] = 0
    lut[48:58] = 1
    lut[[9, 10, 13, 32]] = 2
    return lut


_CLASS_LUT = _build_class_lut()


def byte_class_counts(payload: bytes) -> list[int]:
    """Deterministic 4-dim feature over raw bytes: [ascii_alpha,
    ascii_digit, ascii_space, other].  Stands in for a decoded-media
    feature vector with the same shape contract (fixed-dim ints).
    Single numpy pass (frombuffer is zero-copy; bincount is C) — never
    a per-byte Python loop."""
    import numpy as np

    counts = np.bincount(np.frombuffer(payload, dtype=np.uint8), minlength=256)
    return [int(x) for x in np.bincount(_CLASS_LUT, weights=counts, minlength=4)]


def byte_class_counts_batch(payloads) -> "list":
    """Vectorized batch form: iterable of bytes -> (n, 4) int64 ndarray.

    One concatenated buffer, one LUT gather, one bincount over
    ``row*4 + class`` — the whole Arrow batch is classified without
    per-payload numpy-call overhead (payloads are often small, so even
    per-row ``np.bincount`` dispatch would dominate)."""
    import numpy as np

    n = len(payloads)
    if n == 0:
        return np.zeros((0, 4), dtype=np.int64)
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    combined = np.repeat(np.arange(n, dtype=np.int64), lens) * 4 + _CLASS_LUT[buf]
    return np.bincount(combined, minlength=n * 4).reshape(n, 4)
