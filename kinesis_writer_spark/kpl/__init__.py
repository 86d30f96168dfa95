"""Pure-Python KPL aggregated-record codec (wire-compatible with the
amazon-kinesis-producer aggregation format consumed by KCL deaggregators).

Capability parity with the reference's aggregation core
(/root/reference/src/main/java/com/amazonaws/kinesis/agg/AggRecord.java and
RecordAggregator.java), re-implemented from the public KPL ``messages.proto``
wire format — no code is translated from the reference.
"""

from .aggregator import AggRecordBuilder, RecordAggregator
from .deaggregator import DeaggregationError, UserRecord, deaggregate, is_aggregated
from .protocol import (
    DIGEST_SIZE,
    MAGIC,
    MAX_BYTES_PER_RECORD,
    UINT128_MAX,
    derive_explicit_hash_key,
    varint_size,
)

__all__ = [
    "AggRecordBuilder",
    "RecordAggregator",
    "deaggregate",
    "is_aggregated",
    "DeaggregationError",
    "UserRecord",
    "MAGIC",
    "MAX_BYTES_PER_RECORD",
    "DIGEST_SIZE",
    "UINT128_MAX",
    "derive_explicit_hash_key",
    "varint_size",
]
