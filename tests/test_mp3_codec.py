"""MP3 (MPEG Layer III) frame-header parser tests: synthesize real frame
chains with write_mp3_frames and walk them back with parse_mp3_frames
(r6 verdict task #4 — retire the MP3 structural fake)."""

import pytest

from kinesis_writer_spark.functions.codecs import (
    CodecError,
    parse_mp3_frames,
    write_mp3_frames,
)


class TestRoundTrip:
    def test_cbr_mpeg1(self):
        payload = write_mp3_frames(10, bitrate_kbps=128, sample_rate=44100)
        info = parse_mp3_frames(payload)
        assert info.n_frames == 10
        assert info.sample_rate == 44100
        assert info.channel_mode == "joint_stereo"
        assert not info.is_vbr
        # 10 frames x 1152 samples @ 44100 Hz = 261.22 ms
        assert info.duration_ms == round(10 * 1152 / 44100 * 1000)
        # every frame: floor(144 * 128000 / 44100) = 417 bytes
        assert all(f.frame_bytes == 417 for f in info.frames)
        assert len(payload) == 10 * 417
        # header-walk bitrate over whole frames reconstructs the nominal
        # rate within the floor()-truncation error of the frame length
        assert abs(info.avg_bitrate_kbps - 128) <= 1

    @pytest.mark.parametrize("version,rate,kbps,samples", [
        ("1", 48000, 320, 1152),
        ("1", 32000, 32, 1152),
        ("2", 22050, 64, 576),
        ("2", 16000, 8, 576),
        ("2.5", 8000, 40, 576),
        ("2.5", 11025, 160, 576),
    ])
    def test_versions_and_tables(self, version, rate, kbps, samples):
        info = parse_mp3_frames(
            write_mp3_frames(5, bitrate_kbps=kbps, sample_rate=rate, version=version)
        )
        assert info.n_frames == 5
        assert info.sample_rate == rate
        assert info.frames[0].version == version
        assert info.frames[0].samples == samples
        assert info.frames[0].bitrate_kbps == kbps
        coeff = samples // 8
        assert info.frames[0].frame_bytes == coeff * kbps * 1000 // rate

    def test_vbr_per_frame_bitrates(self):
        rates = [64, 128, 192, 128, 320]
        info = parse_mp3_frames(write_mp3_frames(5, bitrates=rates))
        assert info.is_vbr
        assert [f.bitrate_kbps for f in info.frames] == rates
        # duration depends only on frame count, not bitrate
        assert info.duration_ms == round(5 * 1152 / 44100 * 1000)
        # avg must sit strictly between min and max frame rates
        assert 64 < info.avg_bitrate_kbps < 320

    @pytest.mark.parametrize("mode", ["stereo", "joint_stereo", "dual_channel", "mono"])
    def test_channel_modes(self, mode):
        info = parse_mp3_frames(write_mp3_frames(2, channel_mode=mode))
        assert info.channel_mode == mode


class TestTagsAndJunk:
    def test_id3v2_skipped(self):
        # 200-byte tag body: syncsafe size = 0x00 0x00 0x01 0x48
        payload = write_mp3_frames(4, id3v2_bytes=200)
        assert payload[:3] == b"ID3"
        info = parse_mp3_frames(payload)
        assert info.n_frames == 4

    def test_id3v2_syncsafe_multibyte(self):
        # >127 bytes forces the 7-bit carry into the second size byte
        payload = write_mp3_frames(1, id3v2_bytes=300)
        assert parse_mp3_frames(payload).n_frames == 1

    def test_leading_junk_sync_scan(self):
        payload = b"\x00\x12junk\xfa" + write_mp3_frames(3)
        assert parse_mp3_frames(payload).n_frames == 3

    def test_trailing_id3v1_tag_stops_walk(self):
        payload = write_mp3_frames(3) + b"TAG" + bytes(125)
        assert parse_mp3_frames(payload).n_frames == 3

    def test_trailing_apev2_tag_stops_walk(self):
        # APEv2 footer magic at the frame boundary is a tag, not lost sync
        payload = write_mp3_frames(3) + b"APETAGEX" + bytes(24)
        assert parse_mp3_frames(payload).n_frames == 3

    def test_trailing_lyrics3_tag_stops_walk(self):
        payload = write_mp3_frames(2) + b"LYRICSBEGIN" + bytes(40)
        assert parse_mp3_frames(payload).n_frames == 2

    def test_false_sync_in_leading_junk_resyncs(self):
        # header-shaped junk (valid version/bitrate/rate fields) whose
        # frame-length walk lands mid-stream must not poison the scan —
        # the parser resumes at the next byte and finds the real chain
        payload = bytes([0xFF, 0xFB, 0x10, 0x00]) + bytes(8) + write_mp3_frames(3)
        assert parse_mp3_frames(payload).n_frames == 3

    def test_dense_false_syncs_bounded_not_quadratic(self):
        # a payload dense with header-shaped bytes must fail with the
        # first walk's error after a bounded number of retries, not scan
        # quadratically or report "no sync"
        header = bytes([0xFF, 0xFB, 0x10, 0x00])  # 104-byte frame claim
        # every 4th offset is a valid-looking header; the trailing byte
        # keeps any candidate's walk from ending exactly at EOF
        payload = header * 30 + b"\x01"
        with pytest.raises(CodecError, match="truncated frame|trailing bytes"):
            parse_mp3_frames(payload)

    def test_mixed_rate_chain_sums_per_frame_duration(self):
        # stitched streams switch version/rate mid-chain; duration must
        # sum samples/rate per frame, not apply frames[0] rate globally
        a = write_mp3_frames(2, version="1", sample_rate=44100)
        b = write_mp3_frames(2, version="2", sample_rate=22050)
        info = parse_mp3_frames(a + b)
        assert info.n_frames == 4
        expected = 2 * 1152 / 44100 + 2 * 576 / 22050
        assert info.duration_ms == round(expected * 1000)


class TestMalformed:
    def test_no_sync_raises(self):
        with pytest.raises(CodecError, match="no MPEG"):
            parse_mp3_frames(b"\x00" * 64)

    def test_truncated_frame_raises(self):
        payload = write_mp3_frames(2)
        with pytest.raises(CodecError, match="truncated frame"):
            parse_mp3_frames(payload[:-10])

    def test_lost_sync_mid_walk_raises(self):
        payload = bytearray(write_mp3_frames(2))
        payload[417] = 0x00  # clobber the 2nd frame's sync byte
        with pytest.raises(CodecError, match="lost frame sync"):
            parse_mp3_frames(bytes(payload))

    def test_trailing_garbage_raises(self):
        with pytest.raises(CodecError, match="trailing bytes"):
            parse_mp3_frames(write_mp3_frames(2) + b"\x01\x02")

    def test_oversized_id3v2_claim_raises(self):
        bad = b"ID3\x03\x00\x00\x00\x00\x07\x68" + bytes(10)  # claims 1000
        with pytest.raises(CodecError, match="ID3v2"):
            parse_mp3_frames(bad)

    def test_none_bitrate_rejected(self):
        # None sits in the bitrate table (free-format/invalid slots);
        # membership alone must not accept it
        with pytest.raises(CodecError, match="bitrate"):
            write_mp3_frames(2, bitrates=[128, None])

    def test_none_sample_rate_rejected(self):
        with pytest.raises(CodecError, match="sample rate"):
            write_mp3_frames(1, sample_rate=None)

    def test_jpeg_soi_is_not_mp3_sync(self):
        # 0xFFD8: byte2 top-3 bits are 110, not 111 — must not sync
        with pytest.raises(CodecError, match="no MPEG"):
            parse_mp3_frames(b"\xff\xd8\xff\xe0" + bytes(2))


class TestDecodeMediaRoute:
    def test_decode_media_routes_mp3(self):
        from kinesis_writer_spark.operators.multimodal import decode_media

        d = decode_media(write_mp3_frames(6, bitrate_kbps=192, id3v2_bytes=64))
        assert d["kind"] == "mp3"
        assert d["n_frames"] == 6
        assert d["sample_rate"] == 44100
        assert not d["is_vbr"]
        assert d["duration_ms"] == round(6 * 1152 / 44100 * 1000)


# -- property tests ---------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_writer_spark.functions.codecs import (
    _MP3_BITRATE_KBPS,
    _MP3_SAMPLE_RATE,
)


@st.composite
def mp3_params(draw):
    version = draw(st.sampled_from(["1", "2", "2.5"]))
    rate = draw(st.sampled_from([r for r in _MP3_SAMPLE_RATE[version] if r]))
    n = draw(st.integers(min_value=1, max_value=12))
    table = [b for b in _MP3_BITRATE_KBPS[version] if b]
    bitrates = draw(st.lists(st.sampled_from(table), min_size=n, max_size=n))
    mode = draw(st.sampled_from(["stereo", "joint_stereo", "dual_channel", "mono"]))
    id3 = draw(st.sampled_from([0, 1, 127, 128, 300]))
    # junk must not itself contain a sync byte (0xFF) or a tag magic —
    # a random 0xFF could legitimately start a parseable-then-truncated
    # header, which is correct rejection behavior but not this property
    junk = draw(
        st.binary(max_size=8)
        .map(lambda b: b.replace(b"\xff", b"\x7f"))
        .filter(lambda b: b[:3] not in (b"ID3", b"TAG"))
    )
    return version, rate, n, bitrates, mode, id3, junk


class TestRoundTripProperties:
    @given(mp3_params())
    @settings(max_examples=60, deadline=None)
    def test_walk_reconstructs_every_header_field(self, params):
        version, rate, n, bitrates, mode, id3, junk = params
        payload = junk + write_mp3_frames(
            n, bitrates=bitrates, sample_rate=rate, version=version,
            channel_mode=mode, id3v2_bytes=0,
        ) if junk else write_mp3_frames(
            n, bitrates=bitrates, sample_rate=rate, version=version,
            channel_mode=mode, id3v2_bytes=id3,
        )
        info = parse_mp3_frames(payload)
        assert info.n_frames == n
        assert info.sample_rate == rate
        assert info.channel_mode == mode
        assert [f.bitrate_kbps for f in info.frames] == bitrates
        assert info.is_vbr == (len(set(bitrates)) > 1)
        samples = info.frames[0].samples
        assert info.duration_ms == round(n * samples / rate * 1000)
        # every frame length matches the table formula exactly
        for f in info.frames:
            assert f.frame_bytes == (samples // 8) * f.bitrate_kbps * 1000 // rate

    @given(mp3_params())
    @settings(max_examples=30, deadline=None)
    def test_truncation_anywhere_is_detected_not_misparsed(self, params):
        version, rate, n, bitrates, mode, id3, _ = params
        payload = write_mp3_frames(
            n, bitrates=bitrates, sample_rate=rate, version=version,
            channel_mode=mode, id3v2_bytes=id3,
        )
        cut = payload[: len(payload) - 1]  # drop the final byte
        try:
            info = parse_mp3_frames(cut)
            # acceptable only if the walk stopped BEFORE the damaged frame
            assert info.n_frames < n
        except Exception as exc:
            from kinesis_writer_spark.functions.codecs import CodecError

            assert isinstance(exc, CodecError)  # precise error, never garbage


class TestAdviceR7:
    """Regression pins for the r7 ADVICE findings #1/#3 (MP3 side)."""

    def test_trailing_junk_mp3_surfaces_as_mp3_error(self):
        # a genuine 6-frame stream with arbitrary trailing junk is
        # RECOGNIZED media that went bad, not an unknown blob — the weak
        # sniff's unknown fallback must not swallow it (finding #1)
        from kinesis_writer_spark.operators.multimodal import decode_media

        d = decode_media(write_mp3_frames(6) + b"\x01\x02\x03")
        assert d["kind"] == "mp3_error"
        assert "trailing" in d["error"]
        assert "head_checksum" not in d  # no structurally-fake features

    def test_single_false_frame_still_falls_back_to_unknown(self):
        # one header-shaped accident (< 2 clean frames walked) keeps the
        # documented not-actually-MP3 fallback
        from kinesis_writer_spark.operators.multimodal import decode_media

        header = bytes([0xFF, 0xFB, 0x10, 0x00])  # 104-byte frame claim
        d = decode_media(header + bytes(100) + b"\x01")
        assert d["kind"] == "unknown"

    def test_walk_errors_carry_frames_walked(self):
        with pytest.raises(CodecError) as ei:
            parse_mp3_frames(write_mp3_frames(4) + b"\x01\x02")
        assert getattr(ei.value, "frames_walked", None) == 4

    def test_resync_cap_error_reports_scan_width(self):
        # dense header-shaped payload: the raised error describes the
        # FIRST candidate but must say how wide the scan was (finding #3)
        header = bytes([0xFF, 0xFB, 0x10, 0x00])
        payload = header * 30 + b"\x01"
        with pytest.raises(CodecError, match=r"failed sync candidates"):
            parse_mp3_frames(payload)

    def test_single_candidate_error_message_unchanged(self):
        # the common one-candidate case keeps its precise message
        with pytest.raises(CodecError, match=r"^truncated frame at offset"):
            parse_mp3_frames(write_mp3_frames(2)[:-10])
