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


class TestThrottlingClient:
    """ThrottlingKinesisClient: the service-side twin of the limiter —
    per-shard token buckets that REJECT with the real partial-failure
    shape instead of pacing, so the writer's reactive back-off envelope
    (linear retry + re-route) is testable on virtual time."""

    def _client(self, vc: VirtualClock, **kw):
        from kinesis_writer_spark.sink import ThrottlingKinesisClient

        kw.setdefault("num_shards", 1)
        kw.setdefault("bytes_per_sec_per_shard", 1000.0)
        kw.setdefault("puts_per_sec_per_shard", 10.0)
        return ThrottlingKinesisClient(clock=vc.clock, **kw)

    @staticmethod
    def _put(client, n_bytes: int, ehk: str = "0"):
        return client.put_records(
            StreamName="s",
            Records=[{"Data": b"x" * n_bytes, "PartitionKey": "a",
                      "ExplicitHashKey": ehk}],
        )

    def test_over_budget_put_fails_with_service_shape_and_spends_nothing(self):
        vc = VirtualClock()
        c = self._client(vc)
        assert self._put(c, 600)["FailedRecordCount"] == 0
        resp = self._put(c, 600)  # 1200 > 1000 burst budget
        assert resp["FailedRecordCount"] == 1
        assert (
            resp["Records"][0]["ErrorCode"]
            == "ProvisionedThroughputExceededException"
        )
        assert len(c.received) == 1  # the failed put spent nothing
        # a smaller put still inside the remaining 400 tokens succeeds
        assert self._put(c, 300)["FailedRecordCount"] == 0

    def test_refill_allows_after_wait(self):
        vc = VirtualClock()
        c = self._client(vc)
        self._put(c, 1000)
        assert self._put(c, 1000)["FailedRecordCount"] == 1
        vc.now += 1.0  # 1 s refills the full 1000 B/s budget
        assert self._put(c, 1000)["FailedRecordCount"] == 0
        assert c.throttle_errors == 1

    def test_writer_rides_out_sustained_throttle_on_virtual_time(self):
        """The reactive envelope end-to-end: offered load far above the cap
        must DEGRADE to ~the cap via linear back-off + re-route, complete
        with zero loss, and never exhaust the retry budget."""
        vc = VirtualClock()
        # burst capacity must exceed one ~1 MB aggregated flush, or a
        # max-size put could NEVER pass (the real service accepts a full
        # 1 MiB put against its 1 MiB/s budget for the same reason)
        c = self._client(
            vc, num_shards=2, bytes_per_sec_per_shard=600_000.0,
            burst_seconds=2.0,
        )
        w = KinesisStreamWriter(
            "s", c, sleep=vc.sleep, clock=vc.clock, refresh_every_flushes=None
        )
        payloads = [b"p" * 900 for _ in range(12_000)]  # ~10.8 MB
        n = w.write(iter(payloads))
        assert n == 12_000
        # zero loss: every payload delivered exactly once (flush granularity)
        from kinesis_writer_spark.kpl.deaggregator import deaggregate

        got = [rec.data for wire in c.received for rec in deaggregate(wire)]
        assert sorted(got) == sorted(payloads)
        # throughput degraded to the cap's order, not collapse: elapsed
        # virtual time within 3x of the ideal bytes/budget
        total_bytes = sum(len(w_) for w_ in c.received)
        ideal = total_bytes / (2 * 600_000.0)
        assert vc.now <= 3 * ideal + 5, (vc.now, ideal)
        assert c.throttle_errors > 0  # the envelope was actually exercised


class TestBudgetAwareRouting:
    """Opt-in route_by_budget: flushes target the shard whose limiter
    bucket is fullest, recovering the budget random routing leaves idling
    at the burst cap (throttling soak: 0.61x -> ~0.9x of the service
    cap). Default OFF keeps the reference's seeded-random draws."""

    def test_richest_key_prefers_unseen_then_fullest(self):
        vc = VirtualClock()
        lim = make_limiter(vc)
        lim.acquire("a", 800)  # a: 200 tokens left
        assert lim.richest_key(["a", "b"]) == "b"  # unseen counts as full
        lim.acquire("b", 1000)  # b: 0
        assert lim.richest_key(["a", "b"]) == "a"
        vc.now += 0.9  # b refills to 900, a caps at 1000? a=200+900=1000 cap
        assert lim.richest_key(["a", "b"]) == "a"

    def test_default_routing_unchanged(self):
        from kinesis_writer_spark.sink import ShardRouter

        client = FakeKinesisClient(num_shards=4)
        w = KinesisStreamWriter("s", client)
        expected = ShardRouter(w.router.midpoints, seed=42)
        assert w._next_routing_key() == expected.next_hash_key()
        assert w._next_routing_key() == expected.next_hash_key()

    def test_budget_routing_beats_random_under_throttle(self):
        """Same offered load, same service budgets, virtual time: the
        budget-aware writer finishes in less virtual time with fewer
        service rejections than the random-routing one."""
        from kinesis_writer_spark.sink import ThrottlingKinesisClient

        def run(route_by_budget: bool) -> tuple[float, int]:
            vc = VirtualClock()
            client = ThrottlingKinesisClient(
                num_shards=4, bytes_per_sec_per_shard=600_000.0,
                burst_seconds=2.0, clock=vc.clock,
            )
            lim = ShardRateLimiter(
                bytes_per_sec=0.9 * 600_000.0, puts_per_sec=900.0,
                burst_seconds=2.0, clock=vc.clock, sleep=vc.sleep,
            )
            w = KinesisStreamWriter(
                "s", client, sleep=vc.sleep, clock=vc.clock,
                rate_limiter=lim, route_by_budget=route_by_budget,
                refresh_every_flushes=None,
            )
            n = w.write(iter([b"p" * 900] * 12_000))  # ~10.8 MB
            assert n == 12_000
            return vc.now, client.throttle_errors

        t_random, err_random = run(False)
        t_budget, err_budget = run(True)
        assert t_budget < t_random, (t_budget, t_random)
        assert err_budget <= err_random
        # and it approaches the aggregate paced rate: 4 shards x 540 KB/s
        ideal = 12_000 * 900 / (4 * 0.9 * 600_000.0)
        assert t_budget <= 1.6 * ideal + 3, (t_budget, ideal)


class TestThreadSafety:
    """r12 advice: one limiter instance is shared process-wide across
    concurrent writer threads, so bucket bookkeeping must be atomic."""

    def test_concurrent_acquires_never_lose_deductions(self):
        import threading

        # frozen clock -> zero refill; every deduction must land
        rl = ShardRateLimiter(
            bytes_per_sec=1e12, puts_per_sec=1e12, burst_seconds=1.0,
            clock=lambda: 0.0, sleep=lambda s: None,
        )
        n_threads, n_calls, cost = 8, 2_000, 3
        barrier = threading.Barrier(n_threads)

        def worker():
            barrier.wait()
            for _ in range(n_calls):
                rl.acquire("s0", cost, 1)

        threads = [threading.Thread(target=worker) for _ in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        state = rl._buckets["s0"]
        assert state[0] == 1e12 - n_threads * n_calls * cost
        assert state[1] == 1e12 - n_threads * n_calls

    def test_concurrent_acquire_and_richest_key(self):
        """richest_key refills under the same lock; racing it against
        acquire must neither corrupt buckets nor raise."""
        import threading

        rl = ShardRateLimiter(
            bytes_per_sec=1e9, puts_per_sec=1e9, burst_seconds=1.0,
            clock=lambda: 0.0, sleep=lambda s: None,
        )
        stop = threading.Event()
        keys = ["a", "b", "c"]

        def reader():
            while not stop.is_set():
                assert rl.richest_key(keys) in keys

        r = threading.Thread(target=reader)
        r.start()
        try:
            for i in range(5_000):
                rl.acquire(keys[i % 3], 10, 1)
        finally:
            stop.set()
            r.join()
        total = sum(rl._buckets[k][0] for k in keys)
        assert total == 3 * 1e9 - 5_000 * 10


class TestRichestKeyPutHeadroom:
    def test_put_bound_workload_routes_by_put_budget(self):
        """r12 advice: ranking by raw byte tokens alone sends put-bound
        traffic to a shard whose put bucket is in debt. Headroom is
        min(bytes, puts) normalized to seconds."""
        vc = VirtualClock()
        rl = make_limiter(vc, bytes_per_sec=1000.0, puts_per_sec=10.0)
        # a: drain puts deep into debt with tiny records (bytes nearly full)
        for _ in range(30):
            rl.acquire("a", 1)
        # b: drain most of the BYTE budget but leave puts alone
        rl.acquire("b", 900)
        # raw byte ranking would say a (999+ tokens) > b (100 tokens);
        # put headroom says a is seconds in debt while b can absorb puts
        assert rl.richest_key(["a", "b"]) == "b"

    def test_byte_bound_ranking_preserved(self):
        vc = VirtualClock()
        rl = make_limiter(vc)
        rl.acquire("a", 800)
        rl.acquire("b", 200)
        # puts equally touched; byte headroom decides: b (800) > a (200)
        assert rl.richest_key(["a", "b"]) == "b"
