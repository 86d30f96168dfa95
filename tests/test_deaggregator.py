"""Round-trip and property tests for the public deaggregator API, including
hypothesis-driven encode/decode properties.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_writer_spark.kpl import (
    AggRecordBuilder,
    DeaggregationError,
    deaggregate,
    is_aggregated,
)

payload_st = st.binary(min_size=0, max_size=300)
pk_st = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FFF), min_size=1, max_size=40
).filter(lambda s: 1 <= len(s.encode("utf-8")) <= 256)
ehk_st = st.one_of(st.none(), st.integers(min_value=0, max_value=(1 << 128) - 1).map(str))


class TestRoundTrip:
    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.tuples(pk_st, ehk_st, payload_st), min_size=1, max_size=40))
    def test_decode_encode_identity(self, records):
        b = AggRecordBuilder()
        for pk, ehk, data in records:
            assert b.add_user_record(pk, data, ehk)
        wire = b.to_bytes()
        assert b.size_bytes == len(wire)  # exact size prediction, always
        out = deaggregate(wire)
        assert [(r.partition_key, r.explicit_hash_key, r.data) for r in out] == records

    def test_is_aggregated_detects_magic(self):
        b = AggRecordBuilder()
        b.add_user_record("a", b"x")
        assert is_aggregated(b.to_bytes())
        assert not is_aggregated(b"plain old record")
        assert not is_aggregated(b"")


class TestValidation:
    def test_corrupted_digest_rejected(self):
        b = AggRecordBuilder()
        b.add_user_record("a", b"payload")
        wire = bytearray(b.to_bytes())
        wire[-1] ^= 0xFF
        with pytest.raises(DeaggregationError, match="digest"):
            deaggregate(bytes(wire))

    def test_corrupted_body_rejected(self):
        b = AggRecordBuilder()
        b.add_user_record("a", b"payload")
        wire = bytearray(b.to_bytes())
        wire[6] ^= 0xFF  # flip a body byte → digest mismatch
        with pytest.raises(DeaggregationError):
            deaggregate(bytes(wire))

    @staticmethod
    def _reseal(body: bytes) -> bytes:
        """MD5-valid wire around an arbitrary (possibly hostile) body — the
        digest gate must not be the only line of defense."""
        import hashlib

        from kinesis_writer_spark.kpl import protocol as P

        return P.MAGIC + body + hashlib.md5(body).digest()

    def test_non_utf8_partition_key_rejected_typed(self):
        # field 1 (pk table), length 2, invalid UTF-8 continuation bytes;
        # digest recomputed so the corruption reaches the protobuf walk
        body = bytes([0x0A, 0x02, 0xC3, 0x28])
        with pytest.raises(DeaggregationError, match="UTF-8"):
            deaggregate(self._reseal(body))

    def test_non_utf8_hash_key_rejected_typed(self):
        body = bytes([0x12, 0x02, 0xC3, 0x28])  # field 2 (ehk table)
        with pytest.raises(DeaggregationError, match="UTF-8"):
            deaggregate(self._reseal(body))

    @settings(max_examples=120, deadline=None)
    @given(body=st.binary(max_size=400))
    def test_md5_valid_garbage_dies_typed(self, body):
        # any MD5-valid body must either deaggregate or raise the typed
        # error — never UnicodeDecodeError/IndexError/struct.error
        try:
            deaggregate(self._reseal(body))
        except DeaggregationError:
            pass

    def test_non_aggregated_rejected(self):
        with pytest.raises(DeaggregationError, match="magic"):
            deaggregate(b"not aggregated at all, but long enough")
