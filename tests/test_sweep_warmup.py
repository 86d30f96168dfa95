"""Pins the oracle-sweep warm-up contract (r9 verdict task #6, encoding
the r8 acceptance that was never tested): after ``warm_session``, a query
timed INSIDE a multi-query sweep must run within ~2x of the same query
timed in isolation on the warm session — i.e. the sweep's per-row figures
measure the query, not cold-start or accumulated session state.

If someone removes the warm-up call from oracle_check.main(), the import
assertion fails; if sweep state ever starts compounding again (the r8
hypothesis, disproven by r9 measurement), the timing bound fails."""

from __future__ import annotations

import time

import pytest


@pytest.fixture(scope="module")
def spark():
    from kinesis_writer_spark.session import get_spark

    return get_spark("test_sweep_warmup")


SF = "/root/testdata/sf0.001"


def test_warm_session_is_wired_into_main():
    """main() must keep calling warm_session for full sweeps — the fix
    regresses silently if the call is dropped (the function existing is
    not enough)."""
    import inspect

    import oracle_check

    src = inspect.getsource(oracle_check.main)
    assert "warm_session(" in src


def test_sweep_rows_measure_the_query_not_the_jvm(spark):
    """q01 timed inside a small sweep (other queries run before it) stays
    within 2x + scheduling headroom of an isolated warm run."""
    from kinesis_writer_spark import registry
    from oracle_check import warm_session

    queries = registry.all_queries()
    warm_session(spark, SF)

    def run(name: str) -> float:
        t0 = time.monotonic()
        queries[name](spark, SF).toPandas()
        return time.monotonic() - t0

    # isolated warm figure: best of 2 (single shots swing with GC)
    run("q01_pricing_summary")
    isolated = min(run("q01_pricing_summary") for _ in range(2))

    # a mini-sweep: several other queries execute first, then q01 again —
    # the r8 claim was that preceding queries inflate later rows
    for name in ("q03_shipping_priority", "q21_topk_per_group",
                 "q50_exact_dedup", "q70_token_stats"):
        run(name)
    in_sweep = min(run("q01_pricing_summary") for _ in range(2))

    # 2x the isolated figure plus 0.5 s absolute headroom: sub-100ms
    # isolated runs would otherwise make the multiplicative bound a
    # scheduling-jitter coin flip
    assert in_sweep <= 2.0 * isolated + 0.5, (
        f"q01 in-sweep {in_sweep:.3f}s vs isolated {isolated:.3f}s — "
        "sweep rows are no longer measuring the query alone"
    )
