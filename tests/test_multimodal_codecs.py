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

    def test_false_mp3_sync_falls_back_to_unknown(self):
        """~1/512 of arbitrary binary passes the 2-byte MPEG sync sniff;
        a failed frame parse must yield the 'unknown' row, not a
        CodecError that kills the whole mapInPandas task (r7 review)."""
        from kinesis_writer_spark.operators.multimodal import decode_media

        # Passes the 0xFF/0xE0 sync mask but is not a valid MPEG frame
        # (bitrate index 0xF is forbidden), nor is the trailing garbage.
        bogus = b"\xff\xfa\xf0\x00not-really-an-mp3-payload"
        d = decode_media(bogus)
        assert d["kind"] == "unknown" and d["n_bytes"] == len(bogus)
        # ID3-prefixed garbage likewise falls through instead of raising.
        tagged = b"ID3\x04\x00\x00\x00\x00\x00\x0a0123456789 no frames here"
        d2 = decode_media(tagged)
        assert d2["kind"] == "unknown"


class TestPng:
    def _roundtrip(self, w, h, pixels, nc=3):
        from kinesis_writer_spark.functions.codecs import parse_png, write_png

        img = parse_png(write_png(w, h, pixels, n_channels=nc))
        assert (img.width, img.height, img.n_channels) == (w, h, nc)
        assert img.pixels == pixels
        return img

    def test_roundtrip_rgb_and_sums(self):
        pixels = bytes((i * 7) % 256 for i in range(4 * 3 * 3))
        img = self._roundtrip(4, 3, pixels)
        assert img.channel_sums() == (
            sum(pixels[0::3]),
            sum(pixels[1::3]),
            sum(pixels[2::3]),
        )

    def test_roundtrip_rgba_sums_exclude_alpha(self):
        pixels = bytes((i * 11) % 256 for i in range(2 * 2 * 4))
        img = self._roundtrip(2, 2, pixels, nc=4)
        assert img.channel_sums() == (
            sum(pixels[0::4]),
            sum(pixels[1::4]),
            sum(pixels[2::4]),
        )

    def test_all_five_filters_unfilter_correctly(self):
        # handcraft one scanline per filter type and verify reconstruction
        import struct as st
        import zlib

        from kinesis_writer_spark.functions.codecs import (
            _png_chunk,
            _PNG_SIGNATURE,
            parse_png,
        )

        w, h, bpp = 3, 5, 3
        rows = [bytes((y * 40 + x * 9) % 256 for x in range(w * bpp)) for y in range(h)]

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

        # encode each row with filter type == its index, from the true pixels
        filtered = bytearray()
        for y, row in enumerate(rows):
            prev = rows[y - 1] if y > 0 else bytes(w * bpp)
            ft = y % 5
            filtered.append(ft)
            for x, v in enumerate(row):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[ft]
                filtered.append((v - pred) & 0xFF)
        ihdr = st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        raw_png = (
            _PNG_SIGNATURE
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(filtered)))
            + _png_chunk(b"IEND", b"")
        )
        img = parse_png(raw_png)
        assert img.pixels == b"".join(rows)

    def test_multiple_idat_chunks_concatenate(self):
        import struct as st
        import zlib

        from kinesis_writer_spark.functions.codecs import (
            _png_chunk,
            _PNG_SIGNATURE,
            parse_png,
            write_png,
        )

        pixels = bytes(range(2 * 2 * 3))
        base = write_png(2, 2, pixels)
        # re-emit with the IDAT stream split into two chunks
        raw = b"\x00" + pixels[:6] + b"\x00" + pixels[6:]
        z = zlib.compress(raw)
        split = len(z) // 2
        ihdr = st.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
        two = (
            _PNG_SIGNATURE
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", z[:split])
            + _png_chunk(b"IDAT", z[split:])
            + _png_chunk(b"IEND", b"")
        )
        assert parse_png(two).pixels == parse_png(base).pixels == pixels

    @pytest.mark.parametrize(
        "mutate",
        [
            lambda b: b"\x88PNG\r\n\x1a\n" + b[8:],  # bad signature
            lambda b: b[:20] + bytes([b[20] ^ 0xFF]) + b[21:],  # IHDR corrupt -> CRC
            lambda b: b[:-12],  # IEND missing
            lambda b: b[:24] + bytes([16]) + b[25:],  # bit depth 16 (also CRC)
            lambda b: b[:-20],  # truncated chunk
        ],
    )
    def test_malformed_rejected(self, mutate):
        from kinesis_writer_spark.functions.codecs import CodecError, parse_png, write_png

        raw = write_png(2, 2, bytes(12))
        with pytest.raises(CodecError):
            parse_png(mutate(raw))

    @given(w=st.integers(1, 6), h=st.integers(1, 6), data=st.data())
    @settings(max_examples=20, deadline=None)
    def test_roundtrip_property(self, w, h, data):
        from kinesis_writer_spark.functions.codecs import parse_png, write_png

        pixels = bytes(
            data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3))
        )
        assert parse_png(write_png(w, h, pixels)).pixels == pixels

    def test_decode_media_dispatches_png(self):
        from kinesis_writer_spark.functions.codecs import write_png
        from kinesis_writer_spark.operators.multimodal import decode_media

        d = decode_media(write_png(1, 1, bytes([9, 8, 7])))
        assert d["kind"] == "png"
        assert (d["sum_r"], d["sum_g"], d["sum_b"]) == (9, 8, 7)
        assert d["n_channels"] == 3


class TestWavRiffPadding:
    def test_odd_data_chunk_gets_riff_pad_byte(self):
        # 8-bit mono, block_align=1: an odd-length data chunk is reachable
        wav = write_wav(b"\x01\x02\x03", n_channels=1, sample_rate=8000, bits_per_sample=8)
        (riff_size,) = struct.unpack_from("<I", wav, 4)
        assert len(wav) == 8 + riff_size  # RIFF size covers the pad byte
        assert len(wav) % 2 == 0  # spec: chunks end on even offsets
        assert wav[-1] == 0  # the pad byte itself
        parsed = parse_wav(wav)
        assert parsed.data == b"\x01\x02\x03"  # data size field excludes pad

    def test_even_data_chunk_unpadded(self):
        wav = write_wav(b"\x01\x02", n_channels=1, sample_rate=8000, bits_per_sample=8)
        assert parse_wav(wav).data == b"\x01\x02"
        (riff_size,) = struct.unpack_from("<I", wav, 4)
        assert len(wav) == 8 + riff_size


class TestDecodeMediaSafe:
    def test_strong_magic_corruption_captured_not_raised(self):
        from kinesis_writer_spark.functions.codecs import CodecError, write_jpeg
        from kinesis_writer_spark.operators.multimodal import (
            decode_media,
            decode_media_safe,
        )

        corrupt = write_jpeg(8, 8, bytes(192))[:40]  # truncated mid-segment
        # strict path fails loudly (bad query input should be visible) ...
        with pytest.raises(CodecError):
            decode_media(corrupt)
        # ... the safe twin captures it per-record
        d = decode_media_safe(corrupt)
        assert d["kind"] == "error" and d["n_bytes"] == len(corrupt)
        assert d["error"]
        # and valid payloads are byte-identical to the strict path
        ok = write_ppm(2, 1, bytes([1, 2, 3, 4, 5, 6]))
        assert decode_media_safe(ok) == decode_media(ok)

    def test_poison_pill_does_not_kill_mapinpandas(self, spark):
        """The 100 TB contract: one corrupt record in a decode stage yields
        one dead-letter row, not a failed Spark job."""
        import pandas as pd

        from kinesis_writer_spark.functions.codecs import write_jpeg
        from kinesis_writer_spark.operators.multimodal import decode_media_safe

        corrupt = write_jpeg(8, 8, bytes(192))[:40]  # truncated mid-segment
        rows = [
            (1, write_ppm(1, 1, bytes([1, 2, 3]))),
            (2, corrupt),
            (3, write_bmp(1, 1, bytes([4, 5, 6]))),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")

        def decode(batches):
            for pdf in batches:
                feats = pdf["payload"].map(decode_media_safe)
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "kind": feats.map(lambda d: d["kind"]),
                        "error": feats.map(lambda d: d.get("error")),
                    }
                )

        out = {
            r["doc_id"]: (r["kind"], r["error"])
            for r in df.mapInPandas(decode, "doc_id long, kind string, error string").collect()
        }
        assert out[1] == ("ppm", None)
        assert out[3] == ("bmp", None)
        assert out[2][0] == "error" and out[2][1]


class TestKeepSchemaDerivation:
    """r7 ADVICE finding #4: mapInPandas keep columns hardcoded `long` —
    a string key column hit a raw Arrow type error mid-task. Types are
    now derived from the input schema."""

    def test_string_keep_column_round_trips_wav(self, spark):
        from kinesis_writer_spark.functions.codecs import write_wav
        from kinesis_writer_spark.operators.multimodal import frame_sample_wav

        wav = write_wav(b"\x01\x02" * 400)
        df = spark.createDataFrame(
            [("doc-a", bytearray(wav))], "name string, payload binary"
        )
        rows = frame_sample_wav(df, keep=("name",)).collect()
        assert rows and all(r["name"] == "doc-a" for r in rows)

    def test_string_keep_column_round_trips_h264(self, spark):
        from kinesis_writer_spark.functions.codecs import write_h264_annexb
        from kinesis_writer_spark.operators.multimodal import frame_sample_h264

        s = write_h264_annexb(64, 64, [b"k"], [b"p"] * 3)
        df = spark.createDataFrame(
            [("vid-1", 7, bytearray(s))], "name string, part int, payload binary"
        )
        rows = frame_sample_h264(df, keep=("name", "part")).collect()
        assert rows
        assert all(r["name"] == "vid-1" and r["part"] == 7 for r in rows)

    def test_missing_keep_column_raises_clear_error(self, spark):
        from kinesis_writer_spark.operators.multimodal import frame_sample_wav

        df = spark.createDataFrame(
            [(1, bytearray(b"\x00\x00"))], "doc_id long, payload binary"
        )
        with pytest.raises(ValueError, match="keep column"):
            frame_sample_wav(df, keep=("nope",))
