"""H.264 Annex B structure codec: start-code walk, emulation-prevention
round trip, Exp-Golomb SPS geometry (including cropping and the
high-profile chroma branch), and malformed-stream rejection.

Reference behavior target: the multimodal decode surface (SURVEY.md §2
"multimodal columns") — this retires the last fake codec; pixel decode
stays declared out of scope.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_writer_spark.functions.codecs import (
    CodecError,
    _ebsp_from_rbsp,
    _EgReader,
    _EgWriter,
    _rbsp_from_ebsp,
    parse_h264_annexb,
    write_h264_annexb,
)


class TestExpGolomb:
    @given(st.lists(st.integers(min_value=0, max_value=2**20), max_size=30))
    @settings(max_examples=50, deadline=None)
    def test_ue_roundtrip(self, values):
        w = _EgWriter()
        for v in values:
            w.ue(v)
        r = _EgReader(w.rbsp_trailing())
        assert [r.ue() for _ in values] == values

    @given(st.lists(st.integers(min_value=-(2**18), max_value=2**18), max_size=30))
    @settings(max_examples=50, deadline=None)
    def test_se_roundtrip(self, values):
        w = _EgWriter()
        for v in values:
            w.se(v)
        r = _EgReader(w.rbsp_trailing())
        assert [r.se() for _ in values] == values

    def test_known_ue_codewords(self):
        # H.264 Table 9-1: 0 -> 1, 1 -> 010, 2 -> 011, 3 -> 00100
        w = _EgWriter()
        for v in (0, 1, 2, 3):
            w.ue(v)
        # bits: 1 010 011 00100 + stop 1 -> 1010 0110 0100 1000
        assert w.rbsp_trailing() == bytes([0b10100110, 0b01001000])

    def test_truncated_read_raises(self):
        with pytest.raises(CodecError):
            _EgReader(b"\x00").ue()  # prefix of zeros runs off the end


class TestEmulationPrevention:
    @given(st.binary(max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_roundtrip_any_rbsp(self, rbsp):
        assert _rbsp_from_ebsp(_ebsp_from_rbsp(rbsp)) == rbsp

    def test_inserts_on_all_four_escapes(self):
        for b in (0, 1, 2, 3):
            assert _ebsp_from_rbsp(bytes([0, 0, b])) == bytes([0, 0, 3, b])

    def test_no_insert_above_three(self):
        assert _ebsp_from_rbsp(b"\x00\x00\x04") == b"\x00\x00\x04"

    def test_long_zero_run(self):
        # 00 00 00 00 -> 00 00 03 00 00 03 (escape restarts the zero count)
        assert _ebsp_from_rbsp(bytes(4)) == bytes([0, 0, 3, 0, 0])
        assert _rbsp_from_ebsp(bytes([0, 0, 3, 0, 0])) == bytes(4)

    def test_unescaped_start_code_rejected(self):
        with pytest.raises(CodecError):
            _rbsp_from_ebsp(b"\x00\x00\x01")

    def test_bad_escape_followup_rejected(self):
        with pytest.raises(CodecError):
            _rbsp_from_ebsp(b"\x00\x00\x03\xff")


class TestWriteParseRoundtrip:
    def test_geometry_and_counts(self):
        s = write_h264_annexb(
            636, 358, idr_bodies=[b"key"], non_idr_bodies=[b"p1", b"p2"], n_sei=2
        )
        v = parse_h264_annexb(s)
        assert (v.width, v.height) == (636, 358)  # crop_r=2, crop_b=5 units
        assert (v.n_sps, v.n_pps, v.n_sei) == (1, 1, 2)
        assert (v.n_idr_slices, v.n_non_idr_slices) == (1, 2)
        assert v.n_nal_units == 7
        assert v.frame_mbs_only and v.chroma_format_idc == 1
        # header byte + body + rbsp stop byte per slice
        assert v.total_slice_rbsp_bytes == (3 + 2) + (2 + 2) + (2 + 2)

    def test_high_profile_chroma_branch(self):
        v = parse_h264_annexb(write_h264_annexb(1920, 1080, [b"x"], profile_idc=100))
        assert (v.profile_idc, v.chroma_format_idc) == (100, 1)
        assert (v.width, v.height) == (1920, 1080)  # 1080 needs crop_b=4

    def test_mb_aligned_needs_no_cropping(self):
        v = parse_h264_annexb(write_h264_annexb(1280, 720, [b"x"]))
        assert (v.width, v.height) == (1280, 720)

    def test_epb_heavy_slice_bodies(self):
        # bodies full of zero runs force emulation prevention; RBSP sizes
        # must come back unchanged
        bodies = [bytes(50), b"\x00\x00\x01\x00\x00\x02" * 8]
        v = parse_h264_annexb(write_h264_annexb(64, 64, idr_bodies=bodies))
        assert v.total_slice_rbsp_bytes == sum(len(b) + 2 for b in bodies)

    @given(
        w=st.integers(min_value=1, max_value=120).map(lambda x: 2 * x),
        h=st.integers(min_value=1, max_value=120).map(lambda x: 2 * x),
        n_idr=st.integers(min_value=1, max_value=4),
        n_p=st.integers(min_value=0, max_value=6),
        body=st.binary(min_size=0, max_size=80),
    )
    @settings(max_examples=40, deadline=None)
    def test_roundtrip_property(self, w, h, n_idr, n_p, body):
        v = parse_h264_annexb(
            write_h264_annexb(w, h, [body] * n_idr, [body] * n_p)
        )
        assert (v.width, v.height) == (w, h)
        assert (v.n_idr_slices, v.n_non_idr_slices) == (n_idr, n_p)
        assert v.total_slice_rbsp_bytes == (n_idr + n_p) * (len(body) + 2)

    def test_odd_dimensions_rejected(self):
        # 4:2:0 frame cropping units are 2 luma samples
        with pytest.raises(CodecError):
            write_h264_annexb(33, 34, [b"x"])
        with pytest.raises(CodecError):
            write_h264_annexb(34, 33, [b"x"])


class TestMalformedRejection:
    def _stream(self):
        return write_h264_annexb(64, 48, [b"body"])

    def test_no_start_code(self):
        with pytest.raises(CodecError):
            parse_h264_annexb(b"\x01\x02\x03\x04")

    def test_nonzero_leading_bytes(self):
        with pytest.raises(CodecError):
            parse_h264_annexb(b"\xde\xad" + self._stream())

    def test_leading_zero_bytes_ok(self):
        # extra leading_zero_8bits are legal filler
        v = parse_h264_annexb(b"\x00\x00" + self._stream())
        assert v.width == 64

    def test_forbidden_bit_rejected(self):
        s = bytearray(self._stream())
        s[4] |= 0x80  # NAL header byte after the 4-byte start code
        with pytest.raises(CodecError):
            parse_h264_annexb(bytes(s))

    def test_missing_sps_rejected(self):
        s = self._stream()
        # strip the SPS NAL: jump to the PPS start code (first 3-byte code)
        pps_at = s.index(b"\x00\x00\x01", 4)
        with pytest.raises(CodecError):
            parse_h264_annexb(s[pps_at:])

    def test_slices_without_pps_rejected(self):
        s = self._stream()
        pps_at = s.index(b"\x00\x00\x01", 4)
        idr_at = s.index(b"\x00\x00\x01", pps_at + 3)
        with pytest.raises(CodecError):
            parse_h264_annexb(s[:pps_at] + s[idr_at:])

    def test_empty_nal_rejected(self):
        with pytest.raises(CodecError):
            parse_h264_annexb(self._stream() + b"\x00\x00\x01")

    def test_scaling_matrix_sps_rejected_not_misparsed(self):
        # hand-build a high-profile SPS with seq_scaling_matrix_present=1
        w = _EgWriter()
        w.u(8, 100), w.u(8, 0), w.u(8, 30)
        w.ue(0)  # sps_id
        w.ue(1), w.ue(0), w.ue(0)  # chroma, bit depths
        w.u(1, 0), w.u(1, 1)  # qpprime, scaling_matrix_present=1
        nal = b"\x00\x00\x00\x01\x67" + _ebsp_from_rbsp(w.rbsp_trailing())
        with pytest.raises(CodecError, match="scaling"):
            parse_h264_annexb(nal)

    def test_null_payload(self):
        with pytest.raises(CodecError):
            parse_h264_annexb(None)


class TestDecodeMediaAndSampling:
    def test_decode_media_dispatches_h264(self):
        from kinesis_writer_spark.operators.multimodal import decode_media

        d = decode_media(write_h264_annexb(320, 180, [b"k"], [b"p"] * 3, n_sei=1))
        assert d["kind"] == "h264"
        assert (d["width"], d["height"]) == (320, 180)
        assert (d["n_idr_slices"], d["n_non_idr_slices"]) == (1, 3)
        assert d["n_nal_units"] == 7

    def test_false_start_code_falls_back_to_unknown(self):
        """00 00 01 also prefixes H.265 Annex B and MPEG-2 PS packs; a
        failed NAL parse must yield the 'unknown' row, not a CodecError
        that kills the whole mapInPandas task (same policy as MP3)."""
        from kinesis_writer_spark.operators.multimodal import decode_media

        # MPEG-2 pack start code: header byte 0xBA has the forbidden bit set
        d = decode_media(b"\x00\x00\x01\xba payload that is not h264")
        assert d["kind"] == "unknown"
        # zero-prefixed garbage with no SPS likewise falls through
        d2 = decode_media(b"\x00\x00\x00\x01\x41junk-without-sps")
        assert d2["kind"] == "unknown"

    def test_frame_sample_h264(self, spark):
        from kinesis_writer_spark.operators.multimodal import frame_sample_h264

        payload = write_h264_annexb(
            128, 96, idr_bodies=[b"k0"], non_idr_bodies=[b"p%d" % i for i in range(5)]
        )
        df = spark.createDataFrame([(7, bytearray(payload))], "doc_id long, payload binary")
        rows = {
            (r.slice_idx, r.is_keyframe): r
            for r in frame_sample_h264(df, every_n=2).collect()
        }
        # slice 0 = IDR keyframe (always kept); non-IDR slices 1..5 kept
        # at even slice_idx only
        assert set(rows) == {(0, True), (2, False), (4, False)}
        assert all(r.width == 128 and r.height == 96 for r in rows.values())
        assert rows[(0, True)].nal_bytes == 1 + 2 + 1  # header + body + stop


class TestAdviceR7H264:
    """Regression pins for the r7 ADVICE finding #1 (H.264 side)."""

    def _scaling_matrix_nal(self) -> bytes:
        w = _EgWriter()
        w.u(8, 100), w.u(8, 0), w.u(8, 30)
        w.ue(0)  # sps_id
        w.ue(1), w.ue(0), w.ue(0)  # chroma, bit depths
        w.u(1, 0), w.u(1, 1)  # qpprime, scaling_matrix_present=1
        return b"\x00\x00\x00\x01\x67" + _ebsp_from_rbsp(w.rbsp_trailing())

    def test_scaling_matrix_raises_unsupported_subclass(self):
        from kinesis_writer_spark.functions.codecs import UnsupportedCodecError

        with pytest.raises(UnsupportedCodecError, match="scaling"):
            parse_h264_annexb(self._scaling_matrix_nal())

    def test_scaling_matrix_surfaces_as_h264_unsupported_not_unknown(self):
        # the NAL walk positively identified H.264 before the declared
        # out-of-scope feature — decode_media must surface that instead
        # of silently downgrading real media to fake structural features
        from kinesis_writer_spark.operators.multimodal import decode_media

        d = decode_media(self._scaling_matrix_nal())
        assert d["kind"] == "h264_unsupported"
        assert "scaling" in d["error"]
        assert "head_checksum" not in d  # no structurally-fake features

    def test_non_h264_zero_prefix_still_unknown(self):
        from kinesis_writer_spark.operators.multimodal import decode_media

        # MPEG-2 PS pack start code: parses as nothing we support
        d = decode_media(b"\x00\x00\x01\xba" + bytes(16))
        assert d["kind"] == "unknown"
