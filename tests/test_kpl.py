"""Golden-bytes + property tests for the KPL aggregated-record codec
(FIXTURES.md B1: wire format, dictionary encoding, size metering, validation).
"""

from __future__ import annotations

import hashlib
import random

import pytest

from kinesis_writer_spark.kpl import (
    MAGIC,
    MAX_BYTES_PER_RECORD,
    UINT128_MAX,
    AggRecordBuilder,
    RecordAggregator,
    derive_explicit_hash_key,
    varint_size,
)
from kinesis_writer_spark.kpl import protocol as P


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = value = 0
    while True:
        b = buf[pos]
        pos += 1
        value |= (b & 0x7F) << shift
        if not (b & 0x80):
            return value, pos
        shift += 7


def decode_aggregated(wire: bytes) -> tuple[list[str], list[str], list[tuple[int, int | None, bytes]]]:
    """Reference-free protobuf decoder used to round-trip-check the encoder."""
    assert wire[:4] == MAGIC
    body, digest = wire[4:-16], wire[-16:]
    assert hashlib.md5(body).digest() == digest
    pk_table: list[str] = []
    ehk_table: list[str] = []
    records: list[tuple[int, int | None, bytes]] = []
    pos = 0
    while pos < len(body):
        tag = body[pos]
        pos += 1
        field, wt = tag >> 3, tag & 7
        assert wt == 2
        length, pos = decode_varint(body, pos)
        payload = body[pos : pos + length]
        pos += length
        if field == 1:
            pk_table.append(payload.decode("utf-8"))
        elif field == 2:
            ehk_table.append(payload.decode("utf-8"))
        elif field == 3:
            ipos = 0
            pk_idx = ehk_idx = None
            data = b""
            while ipos < len(payload):
                itag = payload[ipos]
                ipos += 1
                ifield, iwt = itag >> 3, itag & 7
                if iwt == 0:
                    val, ipos = decode_varint(payload, ipos)
                    if ifield == 1:
                        pk_idx = val
                    elif ifield == 2:
                        ehk_idx = val
                else:
                    dlen, ipos = decode_varint(payload, ipos)
                    data = payload[ipos : ipos + dlen]
                    ipos += dlen
            records.append((pk_idx, ehk_idx, data))
    return pk_table, ehk_table, records


class TestGoldenBytes:
    def test_framing_and_md5(self):
        b = AggRecordBuilder()
        b.add_user_record("a", b"\x0a\x0b\x17")
        b.add_user_record("a", b"\x06\x04\x0d")
        wire = b.to_bytes()
        assert wire[:4] == bytes.fromhex("f3899ac2")
        assert hashlib.md5(wire[4:-16]).digest() == wire[-16:]

    def test_dictionary_indexes(self):
        b = AggRecordBuilder()
        b.add_user_record("alpha", b"1")
        b.add_user_record("beta", b"2")
        b.add_user_record("alpha", b"3")
        pk_table, ehk_table, records = decode_aggregated(b.to_bytes())
        assert pk_table == ["alpha", "beta"]
        assert ehk_table == []
        assert [r[0] for r in records] == [0, 1, 0]
        assert [r[2] for r in records] == [b"1", b"2", b"3"]

    def test_ehk_dictionary(self):
        b = AggRecordBuilder()
        b.add_user_record("a", b"x", explicit_hash_key="0")
        b.add_user_record("a", b"y", explicit_hash_key=str(UINT128_MAX))
        b.add_user_record("a", b"z", explicit_hash_key="0")
        _, ehk_table, records = decode_aggregated(b.to_bytes())
        assert ehk_table == ["0", str(UINT128_MAX)]
        assert [r[1] for r in records] == [0, 1, 0]

    def test_first_record_keys_inherited(self):
        b = AggRecordBuilder()
        b.add_user_record("first", b"x", explicit_hash_key="123")
        b.add_user_record("second", b"y", explicit_hash_key="456")
        assert b.partition_key == "first"
        assert b.explicit_hash_key == "123"

    def test_derived_ehk_is_md5_of_pk(self):
        b = AggRecordBuilder()
        b.add_user_record("user-7", b"x")
        expect = int.from_bytes(hashlib.md5(b"user-7").digest(), "big")
        assert b.explicit_hash_key == str(expect)
        assert derive_explicit_hash_key("user-7") == str(expect)


class TestSizeMetering:
    def test_predicted_size_equals_encoded_size_property(self):
        rnd = random.Random(42)
        b = AggRecordBuilder()
        for i in range(200):
            pk = f"pk{rnd.randrange(5)}"
            ehk = str(rnd.randrange(UINT128_MAX)) if rnd.random() < 0.5 else None
            data = bytes(rnd.randrange(256) for _ in range(rnd.choice([0, 1, 10, 200, 5000])))
            if b.add_user_record(pk, data, ehk):
                assert b.size_bytes == len(b.to_bytes())

    def test_varint_size_boundaries(self):
        for v in (0, 1, 127, 128, 16383, 16384, 2097151, 2097152, 2**35, 2**63):
            assert varint_size(v) == len(P.encode_varint(v))

    def test_flush_exactly_at_protocol_cap(self):
        b = AggRecordBuilder()
        payload = bytes(100_000)
        while b.add_user_record("a", payload):
            pass
        assert b.size_bytes <= MAX_BYTES_PER_RECORD
        # the refused record would have pushed it over
        assert b.size_bytes + len(payload) > MAX_BYTES_PER_RECORD
        assert b.size_bytes == len(b.to_bytes())


class TestValidation:
    def test_partition_key_bounds(self):
        b = AggRecordBuilder()
        with pytest.raises(ValueError):
            b.add_user_record("", b"x")
        with pytest.raises(ValueError):
            b.add_user_record("p" * 257, b"x")
        assert b.add_user_record("p" * 256, b"x")

    def test_ehk_domain(self):
        b = AggRecordBuilder()
        with pytest.raises(ValueError):
            b.add_user_record("a", b"x", explicit_hash_key="-1")
        with pytest.raises(ValueError):
            b.add_user_record("a", b"x", explicit_hash_key=str(UINT128_MAX + 1))
        with pytest.raises(ValueError):
            b.add_user_record("a", b"x", explicit_hash_key="not-a-number")
        assert b.add_user_record("a", b"x", explicit_hash_key=str(UINT128_MAX))

    def test_oversized_payload_rejected(self):
        b = AggRecordBuilder()
        with pytest.raises(ValueError):
            b.add_user_record("a", bytes(P.MAX_USER_PAYLOAD + 1))


class TestRecordAggregator:
    def test_rolling_flush_and_count_preservation(self):
        rnd = random.Random(42)
        agg = RecordAggregator()
        fed = 0
        out_records = 0
        completed = []
        for _ in range(3000):
            data = bytes(rnd.randrange(256) for _ in range(1000))
            fed += 1
            done = agg.add_user_record(f"pk{fed % 7}", data)
            if done is not None:
                completed.append(done)
                out_records += done.num_user_records
        tail = agg.clear_and_get()
        if tail is not None:
            completed.append(tail)
            out_records += tail.num_user_records
        assert out_records == fed
        for c in completed:
            wire = c.to_bytes()
            assert len(wire) <= MAX_BYTES_PER_RECORD
            assert c.size_bytes == len(wire)

    def test_listener_fires_on_completion(self):
        agg = RecordAggregator()
        seen = []
        agg.on_record_complete(lambda rec: seen.append(rec.num_user_records))
        payload = bytes(200_000)
        for _ in range(12):
            agg.add_user_record("a", payload)
        assert seen, "listener should have fired at least once"

    def test_roundtrip_decode_matches_input(self):
        rnd = random.Random(7)
        inputs = [(f"k{rnd.randrange(3)}", bytes(rnd.randrange(256) for _ in range(rnd.randrange(50)))) for _ in range(40)]
        b = AggRecordBuilder()
        for pk, data in inputs:
            assert b.add_user_record(pk, data)
        pk_table, _, records = decode_aggregated(b.to_bytes())
        assert [(pk_table[r[0]], r[2]) for r in records] == inputs
