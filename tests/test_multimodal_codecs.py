"""Real-format codec tests: golden bytes, round-trips, and malformed-input
rejection for the dependency-free PPM/BMP/WAV parsers that back the
multimodal decode stage."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_writer_spark.functions.codecs import (
    CodecError,
    parse_bmp,
    parse_ppm,
    parse_wav,
    write_bmp,
    write_ppm,
    write_wav,
)


class TestPpm:
    def test_golden_bytes(self):
        # 2x1 image: red pixel then blue pixel
        img = write_ppm(2, 1, bytes([255, 0, 0, 0, 0, 255]))
        assert img == b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 0, 255])

    def test_roundtrip_and_sums(self):
        pixels = bytes(range(30))  # 10 pixels
        img = parse_ppm(write_ppm(5, 2, pixels))
        assert (img.width, img.height, img.maxval) == (5, 2, 255)
        assert img.pixels == pixels
        assert img.channel_sums() == (
            sum(pixels[0::3]),
            sum(pixels[1::3]),
            sum(pixels[2::3]),
        )

    def test_comments_in_header(self):
        raw = b"P6\n# a comment\n2 1\n# another\n255\n" + bytes(6)
        img = parse_ppm(raw)
        assert (img.width, img.height) == (2, 1)

    @pytest.mark.parametrize(
        "raw",
        [
            b"P5\n1 1\n255\n\x00" * 3,  # wrong magic (PGM)
            b"P6\n2 1\n255\n\x00\x00",  # truncated raster
            b"P6\nx 1\n255\n" + bytes(3),  # non-numeric width
            b"P6\n1 1\n70000\n" + bytes(6),  # maxval out of range
            b"P6\n1 1",  # truncated header
        ],
    )
    def test_malformed_rejected(self, raw):
        with pytest.raises(CodecError):
            parse_ppm(raw)

    @given(
        w=st.integers(1, 8),
        h=st.integers(1, 8),
        data=st.data(),
    )
    @settings(max_examples=25, deadline=None)
    def test_roundtrip_property(self, w, h, data):
        pixels = bytes(
            data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3))
        )
        img = parse_ppm(write_ppm(w, h, pixels))
        assert (img.width, img.height, img.pixels) == (w, h, pixels)


class TestBmp:
    def test_golden_header(self):
        raw = write_bmp(1, 1, bytes([10, 20, 30]))
        assert raw[:2] == b"BM"
        (off,) = struct.unpack_from("<I", raw, 10)
        assert off == 54
        # stored BGR + row padded to 4 bytes
        assert raw[54:58] == bytes([30, 20, 10, 0])

    def test_roundtrip_normalizes_bottom_up_bgr(self):
        # 2x2: rows top-down [red green / blue white]
        pixels = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
        img = parse_bmp(write_bmp(2, 2, pixels))
        assert (img.width, img.height) == (2, 2)
        assert img.pixels == pixels  # parser flips back to top-down RGB

    def test_row_padding_excluded_from_pixels(self):
        # width 3: stride 12 vs 9 pixel bytes — padding must not leak
        pixels = bytes(range(27))
        img = parse_bmp(write_bmp(3, 3, pixels))
        assert img.pixels == pixels

    @pytest.mark.parametrize(
        "mutate",
        [
            lambda b: b"XX" + b[2:],  # bad magic
            lambda b: b[:30],  # truncated header
            lambda b: b[:28] + struct.pack("<H", 8) + b[30:],  # 8bpp unsupported
            lambda b: b[:-4],  # truncated pixels
        ],
    )
    def test_malformed_rejected(self, mutate):
        raw = write_bmp(2, 2, bytes(12))
        with pytest.raises(CodecError):
            parse_bmp(mutate(raw))


class TestWav:
    def test_golden_header(self):
        raw = write_wav(b"\x01\x02\x03\x04", n_channels=1, sample_rate=8000)
        assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
        assert raw[12:16] == b"fmt " and raw[36:40] == b"data"
        assert len(raw) == 44 + 4

    def test_roundtrip_and_duration(self):
        data = bytes(range(200)) * 2  # 400 bytes = 200 frames at 16-bit mono
        wav = parse_wav(write_wav(data, n_channels=1, sample_rate=8000))
        assert (wav.n_channels, wav.sample_rate, wav.bits_per_sample) == (1, 8000, 16)
        assert wav.data == data
        assert wav.n_frames == 200
        assert wav.duration_ms == 200 * 1000 // 8000

    def test_chunk_walking_skips_unknown_chunks(self):
        # a LIST chunk between fmt and data must be skipped, odd size padded
        base = write_wav(b"\xaa\xbb", n_channels=1, sample_rate=8000)
        fmt_part = base[12:36]  # 'fmt ' chunk
        data_part = base[36:]
        extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd -> pad
        body = b"WAVE" + fmt_part + extra + data_part
        raw = b"RIFF" + struct.pack("<I", len(body)) + body
        wav = parse_wav(raw)
        assert wav.data == b"\xaa\xbb"

    @pytest.mark.parametrize(
        "mutate",
        [
            lambda b: b"RIFX" + b[4:],  # bad magic
            lambda b: b[:8] + b"EVAW" + b[12:],  # bad form type
            lambda b: b[:20] + struct.pack("<H", 7) + b[22:],  # non-PCM format
            lambda b: b[:-1],  # truncated data chunk
            lambda b: b[:12] + b[36:],  # fmt chunk missing
        ],
    )
    def test_malformed_rejected(self, mutate):
        raw = write_wav(b"\x01\x02", n_channels=1, sample_rate=8000)
        with pytest.raises(CodecError):
            parse_wav(mutate(raw))

    def test_stereo_frame_accounting(self):
        data = bytes(16)  # 4 stereo 16-bit frames
        wav = parse_wav(write_wav(data, n_channels=2, sample_rate=16000))
        assert wav.n_frames == 4


class TestDecodeMediaDispatch:
    def test_routes_by_magic(self):
        from kinesis_writer_spark.operators.multimodal import decode_media

        ppm = decode_media(write_ppm(1, 1, bytes([1, 2, 3])))
        assert ppm["kind"] == "ppm" and ppm["sum_b"] == 3
        bmp = decode_media(write_bmp(1, 1, bytes([1, 2, 3])))
        assert bmp["kind"] == "bmp" and bmp["sum_r"] == 1
        wav = decode_media(write_wav(b"\x00\x01"))
        assert wav["kind"] == "wav" and wav["n_frames"] == 1
        other = decode_media(b"\x89PNG rest-of-payload")
        assert other["kind"] == "unknown" and other["n_bytes"] == 20
