"""ShardRateLimiter tests on virtual time: proactive pacing must hold the
per-shard bytes/s and puts/s budgets without ever deadlocking."""

from __future__ import annotations

from kinesis_writer_spark.sink import (
    FakeKinesisClient,
    KinesisStreamWriter,
    ShardRateLimiter,
)


class VirtualClock:
    def __init__(self) -> None:
        self.now = 0.0
        self.sleeps: list[float] = []

    def clock(self) -> float:
        return self.now

    def sleep(self, seconds: float) -> None:
        self.sleeps.append(seconds)
        self.now += seconds


def make_limiter(vc: VirtualClock, **kw) -> ShardRateLimiter:
    kw.setdefault("bytes_per_sec", 1000.0)
    kw.setdefault("puts_per_sec", 10.0)
    kw.setdefault("burst_seconds", 1.0)
    return ShardRateLimiter(clock=vc.clock, sleep=vc.sleep, **kw)


class TestBuckets:
    def test_burst_passes_without_wait(self, *a):
        vc = VirtualClock()
        rl = make_limiter(vc)
        assert rl.acquire("s0", 1000) == 0.0  # exactly the burst budget
        assert vc.sleeps == []

    def test_sustained_rate_is_paced(self):
        vc = VirtualClock()
        rl = make_limiter(vc)
        total = sum(rl.acquire("s0", 1000) for _ in range(4))
        # 4000 bytes through a 1000 B/s bucket with 1000 B burst: the last
        # three sends wait ~1 s each
        assert 2.9 <= total <= 3.1
        assert vc.now >= 2.9

    def test_puts_cap_independent_of_bytes(self):
        vc = VirtualClock()
        rl = make_limiter(vc, puts_per_sec=2.0, burst_seconds=1.0)
        waits = [rl.acquire("s0", 1) for _ in range(5)]
        # 5 tiny puts at 2 puts/s with a 2-put burst: ~1.5 s of pacing
        assert 1.4 <= sum(waits) <= 1.6

    def test_shards_have_independent_budgets(self):
        vc = VirtualClock()
        rl = make_limiter(vc)
        assert rl.acquire("s0", 1000) == 0.0
        assert rl.acquire("s1", 1000) == 0.0  # different shard, fresh bucket
        assert rl.acquire("s0", 1000) > 0.0

    def test_oversized_cost_delays_but_never_deadlocks(self):
        vc = VirtualClock()
        rl = make_limiter(vc)
        w1 = rl.acquire("s0", 5000)  # 5x the burst capacity
        assert w1 >= 3.9  # needs ~4 s of refill beyond the burst
        w2 = rl.acquire("s0", 1000)
        assert w2 >= 0.0  # debt paid, next send proceeds

    def test_oversized_costs_sustain_the_configured_rate(self):
        # Regression: the old refill-after-sleep re-capped the bucket at
        # burst before subtracting, double-charging any cost above burst
        # capacity (5000 B records through 1000 B/s settled at ~555 B/s).
        vc = VirtualClock()
        rl = make_limiter(vc, puts_per_sec=1e9)
        for _ in range(10):
            rl.acquire("s0", 5000)
        # 50 000 B through 1000 B/s with a 1000 B burst: ~49 s, not ~90 s
        assert 48.5 <= vc.now <= 49.5

    def test_idle_time_refills_to_burst_only(self):
        vc = VirtualClock()
        rl = make_limiter(vc)
        rl.acquire("s0", 1000)
        vc.now += 100.0  # long idle: tokens must cap at burst, not 100x
        assert rl.acquire("s0", 1000) == 0.0
        assert rl.acquire("s0", 1000) > 0.0


class TestWriterIntegration:
    def test_writer_paces_and_delivers_everything(self):
        vc = VirtualClock()
        limiter = ShardRateLimiter(
            bytes_per_sec=200_000.0,
            puts_per_sec=10.0,
            burst_seconds=1.0,
            clock=vc.clock,
            sleep=vc.sleep,
        )
        client = FakeKinesisClient(num_shards=2)
        writer = KinesisStreamWriter(
            "s", client, sleep=vc.sleep, rate_limiter=limiter
        )
        payloads = [b"x" * 150_000 for _ in range(6)]  # ~0.9 MiB total
        n = writer.write(payloads)
        assert n == 6
        # every byte arrived (at-least-once with no failures = exactly once)
        assert len(client.received) >= 1
        # pacing happened: >0.9 MB through a 200 kB/s budget split over 2
        # shards needs multiple seconds of virtual sleep
        assert sum(vc.sleeps) > 1.0

    def test_no_limiter_means_no_pacing(self):
        vc = VirtualClock()
        client = FakeKinesisClient(num_shards=2)
        writer = KinesisStreamWriter("s", client, sleep=vc.sleep)
        writer.write([b"x" * 150_000 for _ in range(6)])
        assert vc.sleeps == []
