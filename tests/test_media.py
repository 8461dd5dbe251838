"""Multimodal kernel tests (pure Python — no Spark session needed)."""

import pytest

from ocr_spark.kernels.media import byte_class_counts, decode_image, sniff_format


def test_sniff_format_magic_bytes():
    assert sniff_format(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16) == "png"
    assert sniff_format(b"\xff\xd8\xff\xe0" + b"\x00" * 16) == "jpeg"
    assert sniff_format(b"%PDF-1.4\nxref") == "pdf"
    assert sniff_format(b"RIFF\x24\x00\x00\x00WAVEfmt ") == "wav"
    assert sniff_format(b"plain text payload") == "unknown"
    assert sniff_format(b"") == "unknown"


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\x89PNG\r\n\x1a\n")


def test_byte_class_counts():
    assert byte_class_counts(b"ab1 \n\xff") == [2, 1, 2, 1]
    assert byte_class_counts(b"") == [0, 0, 0, 0]
    counts = byte_class_counts(b"Hello World 42!")
    assert sum(counts) == 15
    assert counts == [10, 2, 2, 1]
