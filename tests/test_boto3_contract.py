"""boto3 client-factory contract tests (r8 VERDICT task #6).

``sink.default_client_factory`` (sink.py:508) was previously covered only
by its ImportError branch; the real-client path had no test pinning that
the engine's API calls are shaped the way botocore validates them. These
tests install a STUB ``boto3`` module (the sandbox has no boto3/AWS) whose
client validates every call against the Kinesis API's parameter contract —
required params, allowed params, value types — exactly the checks
botocore's ParamValidator performs before any network I/O, then delegates
to :class:`FakeKinesisClient` for behavior. Green without boto3 installed;
a drift between the engine's call shapes and the AWS API surfaces here
instead of in production. Mirrors the injectable test seam the reference
itself exposes (KinesisWriter.scala:141).
"""

from __future__ import annotations

import sys
import types

import pytest

from kinesis_writer_spark.sink import (
    FakeKinesisClient,
    KinesisStreamWriter,
    default_client_factory,
    open_shard_midpoints,
)


class ValidationError(AssertionError):
    """Stands in for botocore.exceptions.ParamValidationError."""


class _ContractKinesisClient:
    """Validates call shapes per the AWS Kinesis API, then delegates to
    FakeKinesisClient so engine behavior runs end-to-end."""

    def __init__(self, inner: FakeKinesisClient) -> None:
        self._inner = inner
        self.describe_calls: list[dict] = []
        self.put_calls: list[dict] = []

    # --- DescribeStream: StreamName required; optional Limit /
    #     ExclusiveStartShardId; positional args are a botocore TypeError.
    def describe_stream(self, **kwargs):
        allowed = {"StreamName", "Limit", "ExclusiveStartShardId"}
        unknown = set(kwargs) - allowed
        if unknown:
            raise ValidationError(f"Unknown parameter(s) {unknown} for DescribeStream")
        if not isinstance(kwargs.get("StreamName"), str) or not kwargs["StreamName"]:
            raise ValidationError("DescribeStream requires non-empty str StreamName")
        if "ExclusiveStartShardId" in kwargs and not isinstance(
            kwargs["ExclusiveStartShardId"], str
        ):
            raise ValidationError("ExclusiveStartShardId must be str")
        self.describe_calls.append(dict(kwargs))
        return self._inner.describe_stream(**kwargs)

    # --- PutRecords: StreamName + Records (1..500); each entry needs
    #     bytes Data + str PartitionKey; ExplicitHashKey optional but must
    #     be a DECIMAL STRING when present (botocore rejects None/int).
    def put_records(self, **kwargs):
        allowed = {"StreamName", "Records"}
        unknown = set(kwargs) - allowed
        if unknown:
            raise ValidationError(f"Unknown parameter(s) {unknown} for PutRecords")
        if not isinstance(kwargs.get("StreamName"), str) or not kwargs["StreamName"]:
            raise ValidationError("PutRecords requires non-empty str StreamName")
        records = kwargs.get("Records")
        if not isinstance(records, list) or not (1 <= len(records) <= 500):
            raise ValidationError("Records must be a list of 1..500 entries")
        for entry in records:
            extra = set(entry) - {"Data", "PartitionKey", "ExplicitHashKey"}
            if extra:
                raise ValidationError(f"Unknown Records entry key(s) {extra}")
            if not isinstance(entry.get("Data"), (bytes, bytearray)):
                raise ValidationError("Records[].Data must be bytes")
            pk = entry.get("PartitionKey")
            if not isinstance(pk, str) or not (1 <= len(pk) <= 256):
                raise ValidationError("Records[].PartitionKey must be str of 1..256")
            if "ExplicitHashKey" in entry:
                ehk = entry["ExplicitHashKey"]
                if not isinstance(ehk, str) or not ehk.isdigit():
                    raise ValidationError(
                        f"Records[].ExplicitHashKey must be a decimal string, got {ehk!r}"
                    )
                if not (0 <= int(ehk) < (1 << 128)):
                    raise ValidationError("ExplicitHashKey outside uint128 range")
        self.put_calls.append(dict(kwargs))
        return self._inner.put_records(
            StreamName=kwargs["StreamName"], Records=records
        )


@pytest.fixture()
def boto3_stub(monkeypatch):
    """Install a stub boto3 whose client() records construction args and
    returns a contract-validating Kinesis client."""
    made: list[tuple] = []
    clients: list[_ContractKinesisClient] = []

    stub = types.ModuleType("boto3")

    def client(service_name, region_name=None, **kwargs):
        made.append((service_name, region_name, kwargs))
        c = _ContractKinesisClient(FakeKinesisClient(num_shards=3))
        clients.append(c)
        return c

    stub.client = client
    monkeypatch.setitem(sys.modules, "boto3", stub)
    return made, clients


class TestDefaultClientFactory:
    def test_factory_builds_kinesis_client_with_region(self, boto3_stub):
        made, _ = boto3_stub
        factory = default_client_factory(region_name="eu-west-1")
        assert made == []  # lazy: nothing constructed until factory()
        factory()
        assert made == [("kinesis", "eu-west-1", {})]

    def test_factory_default_region_is_none(self, boto3_stub):
        made, _ = boto3_stub
        default_client_factory()()
        assert made == [("kinesis", None, {})]

    def test_missing_boto3_raises_actionable_error(self, monkeypatch):
        monkeypatch.setitem(sys.modules, "boto3", None)  # import -> ImportError
        with pytest.raises(RuntimeError, match="client_factory"):
            default_client_factory()


class TestEngineCallShapes:
    """Drive the real engine paths through the validating client: any
    parameter-shape drift from the AWS API raises ValidationError."""

    def test_shard_discovery_pagination_contract(self, boto3_stub):
        _, clients = boto3_stub
        client = default_client_factory("us-east-1")()
        mids = open_shard_midpoints(client, "prod-stream")
        assert len(mids) == 3
        calls = clients[0].describe_calls
        # FakeKinesisClient pages one shard at a time: 3 open shards ->
        # >=3 calls; every call after the first resumes from the previous
        # page's last ShardId.
        assert len(calls) >= 3
        assert all(c["StreamName"] == "prod-stream" for c in calls)
        assert "ExclusiveStartShardId" not in calls[0]
        for c in calls[1:]:
            assert c["ExclusiveStartShardId"], calls
        assert calls[1]["ExclusiveStartShardId"] == "shardId-000000000000"

    def test_write_path_put_records_contract(self, boto3_stub):
        _, clients = boto3_stub
        client = default_client_factory("us-east-1")()
        writer = KinesisStreamWriter("prod-stream", client, sleep=lambda s: None)
        n = writer.write([f"payload-{i}".encode() for i in range(100)])
        assert n == 100
        puts = clients[0].put_calls
        assert puts, "write() produced no PutRecords calls"
        # delivered payloads survived the validating path byte-for-byte
        assert len(clients[0]._inner.received) == len(puts)
