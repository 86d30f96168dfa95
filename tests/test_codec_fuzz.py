"""Adversarial fuzz for every codec parser: on ANY byte string, a parser
must either return a parsed result or raise :class:`CodecError` — never a
raw ``IndexError`` / ``struct.error`` / ``ZeroDivisionError`` / numpy
shape error / unbounded loop. Third-party files are exactly this input
class, and both r7 ADVICE findings (JPEG standalone-marker walk, JPEG
non-divisor sampling ratios) were members of it; this suite makes the
whole family regression-pinned instead of fixing instances one by one.

Three input families per parser:

1. random bytes (most die at the magic check — still must die cleanly);
2. every strict prefix of a small valid payload (truncation mid-header,
   mid-table, mid-entropy-data — the hardest family: readers must bounds-
   check every advance);
3. single-byte XOR corruptions of a valid payload at a hypothesis-chosen
   offset (may legitimately still parse — garbage values are fine, raw
   exceptions are not).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_writer_spark.functions import codecs as C


def _pixels(w: int, h: int) -> bytes:
    return bytes((11 * x + 7 * y + c) % 256 for y in range(h) for x in range(w) for c in range(3))


def _valid_payloads() -> dict:
    return {
        "ppm": C.write_ppm(4, 4, _pixels(4, 4)),
        "bmp": C.write_bmp(4, 4, _pixels(4, 4)),
        "png": C.write_png(4, 4, _pixels(4, 4)),
        "wav": C.write_wav(bytes(range(32)), n_channels=1, bits_per_sample=16),
        "jpeg": C.write_jpeg(8, 8, _pixels(8, 8), restart_interval=1),
        "mp3": C.write_mp3_frames(3, id3v2_bytes=16),
        "h264": C.write_h264_annexb(16, 16, [b"key"], [b"pq"], n_sei=1),
    }


PARSERS = {
    "ppm": C.parse_ppm,
    "bmp": C.parse_bmp,
    "png": C.parse_png,
    "wav": C.parse_wav,
    "jpeg": C.parse_jpeg,
    "mp3": C.parse_mp3_frames,
    "h264": C.parse_h264_annexb,
}

_PAYLOADS = _valid_payloads()


def _must_parse_or_codec_error(parse, payload: bytes) -> None:
    try:
        parse(payload)
    except C.CodecError:
        pass
    # any other exception type propagates and fails the test


class TestRandomBytes:
    @pytest.mark.parametrize("fmt", sorted(PARSERS))
    @given(payload=st.binary(max_size=2048))
    @settings(max_examples=60, deadline=None)
    def test_random_bytes_never_raise_raw(self, fmt, payload):
        _must_parse_or_codec_error(PARSERS[fmt], payload)

    @pytest.mark.parametrize("fmt", sorted(PARSERS))
    @given(payload=st.binary(max_size=512))
    @settings(max_examples=40, deadline=None)
    def test_magic_prefixed_random_tail(self, fmt, payload):
        # jump the magic check so the fuzz reaches the header/segment walk
        magic = {
            "ppm": b"P6\n",
            "bmp": b"BM",
            "png": b"\x89PNG\r\n\x1a\n",
            "wav": b"RIFF\x20\x00\x00\x00WAVE",
            "jpeg": b"\xff\xd8",
            "mp3": b"\xff\xfb",
            "h264": b"\x00\x00\x00\x01",
        }[fmt]
        _must_parse_or_codec_error(PARSERS[fmt], magic + payload)


class TestTruncation:
    @pytest.mark.parametrize("fmt", sorted(PARSERS))
    def test_every_prefix_dies_cleanly(self, fmt):
        payload = _PAYLOADS[fmt]
        parse = PARSERS[fmt]
        for end in range(len(payload)):
            _must_parse_or_codec_error(parse, payload[:end])


class TestByteCorruption:
    @pytest.mark.parametrize("fmt", sorted(PARSERS))
    @given(data=st.data())
    @settings(max_examples=60, deadline=None)
    def test_single_byte_xor_dies_cleanly_or_parses(self, fmt, data):
        payload = bytearray(_PAYLOADS[fmt])
        idx = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
        flip = data.draw(st.integers(min_value=1, max_value=255))
        payload[idx] ^= flip
        _must_parse_or_codec_error(PARSERS[fmt], bytes(payload))


class TestWriterParserSymmetry:
    def test_writers_reject_dims_their_parser_would_reject(self):
        # a writer must never emit a payload its own parser refuses
        for bad in ((0, 4), (4, 0), (-1, 4)):
            with pytest.raises(C.CodecError):
                C.write_ppm(bad[0], bad[1], b"")
            with pytest.raises(C.CodecError):
                C.write_bmp(bad[0], bad[1], b"")
            with pytest.raises(C.CodecError):
                C.write_png(bad[0], bad[1], b"")
            with pytest.raises(C.CodecError):
                C.write_jpeg(bad[0], bad[1], b"")
