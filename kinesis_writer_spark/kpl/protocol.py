"""KPL aggregated-record wire protocol: varints, framing, key validation.

Wire format (public KPL ``messages.proto`` + deaggregation docs; behavioral
parity with /root/reference AggRecord.java:30,61-74):

    0xF3 0x89 0x9A 0xC2 | protobuf(AggregatedRecord) | md5(protobuf body)

``AggregatedRecord`` protobuf schema (field numbers from the public
awslabs/kinesis-aggregation messages.proto):

    message AggregatedRecord {
      repeated string partition_key_table    = 1;
      repeated string explicit_hash_key_table = 2;
      repeated Record records                 = 3;
    }
    message Record {
      required uint64 partition_key_index     = 1;
      optional uint64 explicit_hash_key_index = 2;
      required bytes  data                    = 3;
    }
"""

from __future__ import annotations

import hashlib

MAGIC = b"\xf3\x89\x9a\xc2"
DIGEST_SIZE = 16
FRAME_OVERHEAD = len(MAGIC) + DIGEST_SIZE  # 20 bytes around the protobuf body

#: Hard protocol cap on a whole aggregated record (1 MiB).
MAX_BYTES_PER_RECORD = 1_048_576

#: Largest single user payload that can ever fit (1 MiB minus framing).
MAX_USER_PAYLOAD = MAX_BYTES_PER_RECORD - FRAME_OVERHEAD

#: Kinesis partition-key length bounds (bytes of UTF-8).
PARTITION_KEY_MIN_LEN = 1
PARTITION_KEY_MAX_LEN = 256

#: Explicit hash keys are decimal strings of 128-bit unsigned integers.
UINT128_MAX = (1 << 128) - 1


def varint_size(value: int) -> int:
    """Number of bytes protobuf base-128 varint encoding uses for ``value``."""
    if value < 0:
        raise ValueError("varint must be non-negative")
    size = 1
    while value >= 0x80:
        value >>= 7
        size += 1
    return size


def encode_varint(value: int) -> bytes:
    """Protobuf base-128 little-endian varint encoding."""
    if value < 0:
        raise ValueError("varint must be non-negative")
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def tag_byte(field_number: int, wire_type: int) -> int:
    return (field_number << 3) | wire_type

WIRE_VARINT = 0
WIRE_LEN = 2


def length_delimited(field_number: int, payload: bytes) -> bytes:
    """Encode a length-delimited protobuf field (strings, bytes, messages)."""
    return bytes([tag_byte(field_number, WIRE_LEN)]) + encode_varint(len(payload)) + payload


def varint_field(field_number: int, value: int) -> bytes:
    return bytes([tag_byte(field_number, WIRE_VARINT)]) + encode_varint(value)


def frame(body: bytes) -> bytes:
    """Wrap a protobuf AggregatedRecord body in magic header + MD5 trailer."""
    return MAGIC + body + hashlib.md5(body).digest()


def validate_partition_key(partition_key: str) -> bytes:
    """Check PK constraints; return the UTF-8 bytes (callers need the length)."""
    if partition_key is None:
        raise ValueError("partition key must not be None")
    encoded = partition_key.encode("utf-8")
    if not (PARTITION_KEY_MIN_LEN <= len(encoded) <= PARTITION_KEY_MAX_LEN):
        raise ValueError(
            f"partition key must be {PARTITION_KEY_MIN_LEN}-{PARTITION_KEY_MAX_LEN} "
            f"UTF-8 bytes, got {len(encoded)}"
        )
    return encoded


def validate_explicit_hash_key(explicit_hash_key: str | None) -> None:
    """EHK must be a decimal integer string within the 128-bit hash space."""
    if explicit_hash_key is None:
        return
    try:
        value = int(explicit_hash_key)
    except (TypeError, ValueError):
        raise ValueError(f"explicit hash key is not a decimal integer: {explicit_hash_key!r}") from None
    if not (0 <= value <= UINT128_MAX):
        raise ValueError(f"explicit hash key out of [0, 2^128-1]: {explicit_hash_key}")


def validate_data(data: bytes) -> None:
    if data is None:
        raise ValueError("record data must not be None")
    if len(data) > MAX_USER_PAYLOAD:
        raise ValueError(f"record data exceeds {MAX_USER_PAYLOAD} bytes: {len(data)}")


def derive_explicit_hash_key(partition_key: str) -> str:
    """Kinesis server-side routing hash: big-endian 128-bit integer of the
    MD5 digest of the partition key, rendered as a decimal string.

    Decimal strings (not ints) because 2^128-1 exceeds every fixed-width SQL
    numeric type; Spark-side the same derivation is exposed as an expression in
    :mod:`kinesis_writer_spark.functions.hashing`.
    """
    digest = hashlib.md5(partition_key.encode("utf-8")).digest()
    return str(int.from_bytes(digest, "big"))
