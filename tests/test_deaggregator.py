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

    def test_non_aggregated_rejected(self):
        with pytest.raises(DeaggregationError, match="magic"):
            deaggregate(b"not aggregated at all, but long enough")
