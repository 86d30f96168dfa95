"""Host-throughput calibration probe + load gate for the bench harness.

Motivation (r6 verdict, "What's wrong #1"): this sandbox's effective CPU
throughput drifts between rounds — r6's headline read +26% with zero
relevant code change, and loadavg capture could not see it because the
drift is host-level (noisy neighbors / frequency scaling), not run-local
load. A judge session had to adjudicate the "regression" by hand.

Fix: time a FIXED, deterministic, pure-in-memory Spark workload (no disk
scan, no Python UDF, constant row count and partition count) in the same
process right before the measured passes. The probe's seconds move with
the host epoch exactly like every query's seconds do, so cross-round
comparisons should read ``query_sec / calib_sec`` (or equivalently
``headline_total / calib_seconds``), not raw seconds. See BASELINE.md
"Reading bench numbers across rounds".

The workload is a two-stage shuffle aggregate over ``spark.range`` —
wholly inside whole-stage codegen, exercising the same executor-thread
CPU + shuffle machinery the real queries use, sized to ~2-4 s nominal on
an idle local[32].
"""

from __future__ import annotations

import os
import time

#: Fixed probe size. NEVER change these without a methodology note in
#: BASELINE.md — cross-round normalization depends on the workload being
#: byte-identical round over round.
CALIB_ROWS = 200_000_000
CALIB_PARTITIONS = 64

#: Second probe (late r7): fixed PER-JOB OVERHEAD. A stable-throughput
#: epoch can still carry inflated job-scheduling latency (measured: tiny
#: 32-task jobs at ~0.18 s median while the 2.2 s throughput probe read
#: FASTER than the baseline epoch — and sub-second headline queries ran
#: 1.2-1.5x slower, tracking the overhead, not the throughput). Short
#: queries are overhead-bound, long queries throughput-bound; recording
#: both lets a cross-round reader normalize each regime. Nominal on a
#: calm host: ~0.05-0.10 s/job.
OVERHEAD_JOBS = 8

#: Reference epoch for cross-round normalization: the round-7 driver bench
#: (BENCH_r07.json — calm host, gates clean, calib start 2.296 ≈ end 2.26).
#: Every later artifact's ``epoch_verdict`` compares its own probes to
#: THIS fixed point, so a reader never has to re-derive BASELINE.md's
#: reading rules by hand (r7 verdict task #2). Do not update these numbers
#: without a methodology note in BASELINE.md — they are the denominator of
#: every cross-round comparison from r8 on.
REFERENCE_EPOCH = {
    "calib_sec": 2.296,
    "overhead_sec": 0.106,
    "source": "BENCH_r07.json",
}


def _resolved_reference() -> dict:
    """The reference epoch, with env overrides for OTHER hosts.

    The defaults above are measurements of THIS sandbox (r8 ADVICE #3):
    on any other machine every artifact would permanently read
    ``caution:calib-off-band``, conflating host identity with epoch
    drift. A deployment re-baselines by exporting
    ``SPARK_GRAFT_CALIB_REF_SEC`` / ``SPARK_GRAFT_OVERHEAD_REF_SEC``
    from one calm-host bench run; the verdict also carries a host
    fingerprint so off-band-on-a-different-host is readable as such.
    """
    ref = dict(REFERENCE_EPOCH)

    def _pos_float(var: str) -> float | None:
        """A malformed or non-positive override must NOT crash
        adjudicate_epoch (it runs at artifact-write time, after the whole
        bench) — fall back to the baked-in value and mark the source."""
        raw = os.environ.get(var)
        if raw is None or raw == "":
            return None
        try:
            val = float(raw)
        except ValueError:
            val = -1.0
        if val <= 0:
            ref["source"] = f"{ref['source']}+invalid:{var}"
            return None
        return val

    cs = _pos_float("SPARK_GRAFT_CALIB_REF_SEC")
    oh = _pos_float("SPARK_GRAFT_OVERHEAD_REF_SEC")
    if cs is not None:
        ref["calib_sec"] = cs
    if oh is not None:
        ref["overhead_sec"] = oh
    if cs is not None or oh is not None:
        # record exactly which halves are re-baselined: a partial override
        # (one var set, the other baked-in from this sandbox) silently
        # mixes two hosts' baselines — make that readable in the artifact
        parts = [
            "env" if cs is not None else "baked",
            "env" if oh is not None else "baked",
        ]
        ref["source"] = f"calib={parts[0]},overhead={parts[1]};{ref['source']}"
    return ref


def _host_fingerprint() -> str:
    import platform

    return f"{platform.node()}/cpu={os.cpu_count()}"

#: Band half-widths for the verdict: probes within [ref/x, ref*x] read as
#: the same epoch regime. Derived from measured drift: r6→r7 throughput
#: drift was ~±30% and the observed slow-*scheduling* epoch carried ~1.7x
#: overhead at clean throughput (BASELINE.md:100-114).
_EPOCH_BAND = 1.5
#: Intra-run drift threshold: a start→end calib delta beyond this means
#: the per-query figures straddle two host epochs (observed late r7:
#: 3.8 s → 10.9 s mid-run inverted a scale ratio).
_INTRA_DRIFT_PCT = 15.0


def adjudicate_epoch(calib: dict, calib_end: dict, cgate: dict | None = None) -> dict:
    """Compute the machine-readable epoch verdict for a bench artifact.

    Encodes BASELINE.md's "Reading bench numbers across rounds" rules so
    BENCH_rN.json is self-adjudicating: compares this run's throughput and
    per-job-overhead probes to :data:`REFERENCE_EPOCH`, checks start≈end
    stability, and folds in the calib gate's outcome. ``verdict`` is a
    compact string safe for the 2000-char stdout tail; the component
    ratios ride alongside for exact reading.
    """
    cs = calib.get("calib_seconds")
    ce = (calib_end or {}).get("calib_seconds")
    oh = calib.get("overhead_seconds")
    oe = (calib_end or {}).get("overhead_seconds")
    if cs is None or oh is None:
        return {"verdict": "unmeasured", "flags": ["calibration-missing"]}

    reference = _resolved_reference()
    calib_vs_ref = round(cs / reference["calib_sec"], 3)
    oh_vs_ref = round(oh / reference["overhead_sec"], 3)
    drift_pct = (
        round(100.0 * abs(ce - cs) / cs, 1) if ce is not None else None
    )
    flags = []
    if drift_pct is None:
        flags.append("no-end-probe")
    elif drift_pct > _INTRA_DRIFT_PCT:
        flags.append("intra-run-drift")
    if not (1.0 / _EPOCH_BAND <= calib_vs_ref <= _EPOCH_BAND):
        flags.append("calib-off-band")
    if not (1.0 / _EPOCH_BAND <= oh_vs_ref <= _EPOCH_BAND):
        flags.append("overhead-off-band")
    if cgate and cgate.get("calib_gate_expired"):
        flags.append("gate-expired")
    status = "stable" if not flags else "caution:" + "+".join(flags)
    return {
        # e.g. "stable;calib=0.83xref;oh=0.83xref;drift=4.1%" — normalize
        # long-query seconds by calib_vs_ref, sub-second ones by oh_vs_ref
        "verdict": (
            f"{status};calib={calib_vs_ref}xref;oh={oh_vs_ref}xref"
            + (f";drift={drift_pct}%" if drift_pct is not None else "")
        ),
        "calib_vs_ref": calib_vs_ref,
        "overhead_vs_ref": oh_vs_ref,
        "intra_run_drift_pct": drift_pct,
        "overhead_end_vs_ref": (
            round(oe / reference["overhead_sec"], 3) if oe is not None else None
        ),
        "reference": reference,
        "host": _host_fingerprint(),
        "flags": flags,
    }


#: Queries under this are scheduling-overhead-bound; at/above it they are
#: throughput-bound. The split point comes from the measured regimes in
#: BASELINE.md ("sub-second queries track overhead_sec, not calib_sec").
SUBSECOND_CUTOFF_S = 1.0


def normalize_suite(
    timings: dict,
    calib_vs_ref: float | None,
    oh_vs_ref: float | None,
) -> dict:
    """Blended epoch normalization for a (headline) suite — the r9 verdict
    task #2 metric, so no cross-round reader adjudicates by hand.

    ``value_norm`` (total / calib_seconds) divides an overhead-dominated
    sum by the *throughput* probe; the two epoch dimensions drift
    independently (BASELINE.md), which made r9's headline read 27%
    "slower" normalized while raw improved. The fix is per-regime: each
    query's seconds divide by the ratio of the probe that actually
    governs it — ``oh_vs_ref`` below :data:`SUBSECOND_CUTOFF_S`,
    ``calib_vs_ref`` at or above — yielding EPOCH-CORRECTED SECONDS
    (what this run would have measured in the frozen reference epoch),
    directly comparable round over round.

    Returns the blended total (``value_norm_blend``, the authoritative
    headline metric), the pure overhead-normalized total
    (``value_norm_oh`` = total / oh_vs_ref, exact when every query is
    sub-second), the sub-second time share that says which regime
    dominates, and a compact ``normalizer_note`` for the verdict string.
    """
    total = sum(timings.values()) if timings else 0.0
    if not timings or not calib_vs_ref or not oh_vs_ref:
        return {
            "value_norm_oh": None,
            "value_norm_blend": None,
            "subsecond_share_pct": None,
            "normalizer_note": "norm=unmeasured",
        }
    sub_total = sum(v for v in timings.values() if v < SUBSECOND_CUTOFF_S)
    share_pct = round(100.0 * sub_total / total, 1) if total else 0.0
    blend = sum(
        v / (oh_vs_ref if v < SUBSECOND_CUTOFF_S else calib_vs_ref)
        for v in timings.values()
    )
    return {
        "value_norm_oh": round(total / oh_vs_ref, 3),
        "value_norm_blend": round(blend, 3),
        "subsecond_share_pct": share_pct,
        # names the authoritative headline normalizer + why, for the
        # epoch verdict string (sub-second share decides the regime)
        "normalizer_note": f"norm=blend({share_pct}%sub-second@oh)",
    }


def _probe_once(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.monotonic()
    (
        spark.range(0, CALIB_ROWS, 1, CALIB_PARTITIONS)
        .select(
            (F.col("id") % 9973).alias("k"),
            (F.col("id") % 31).alias("g"),
        )
        .groupBy("k", "g")
        .agg(F.count("*").alias("c"), F.sum("k").alias("s"))
        .groupBy("g")
        .agg(F.sum("c").alias("n"), F.sum("s").alias("t"))
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    return round(time.monotonic() - t0, 3)


def _overhead_once(spark) -> float:
    """One trivial 32-task job through the noop sink: the work is
    negligible, so elapsed time ≈ fixed job/stage scheduling cost."""
    from pyspark.sql import functions as F

    t0 = time.monotonic()
    (
        spark.range(0, 1000, 1, 32)
        .agg(F.sum("id").alias("s"))
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    return round(time.monotonic() - t0, 4)


def calibrate(spark, rounds: int = 3) -> dict:
    """Run the fixed probe; returns a dict to merge into a bench artifact.

    One unmeasured warm-up shot (JIT + codegen cache) then ``rounds``
    measured shots; ``calib_seconds`` is the median — the same
    steady-state methodology as the headline suite, so the ratio
    headline/calib cancels the host epoch.
    """
    warm = _probe_once(spark)
    runs = [_probe_once(spark) for _ in range(rounds)]
    _overhead_once(spark)  # unmeasured warm-up
    oh_runs = [_overhead_once(spark) for _ in range(OVERHEAD_JOBS)]
    return {
        "calib_seconds": sorted(runs)[len(runs) // 2],
        "calib_runs": runs,
        "calib_warm_run": warm,
        "calib_workload": (
            f"range({CALIB_ROWS}) -> (%9973,%31) two-stage shuffle agg, "
            f"{CALIB_PARTITIONS} input partitions, noop sink"
        ),
        "overhead_seconds": sorted(oh_runs)[len(oh_runs) // 2],
        "overhead_runs": oh_runs,
        "overhead_workload": "range(1000, 32 partitions) -> sum, noop sink (per-job scheduling cost)",
    }


def calib_gate(
    spark,
    threshold_s: float = 4.0,
    max_wait_s: float = 600.0,
    poll_s: float = 30.0,
    overhead_threshold_s: float = 0.35,
) -> dict:
    """Defer measurement while the host EPOCH is slow — the drift source
    loadavg cannot see (co-tenant CPU steal, frequency scaling). Fires
    single probe shots until one lands under ``threshold_s`` (nominal is
    ~2.4 s on a calm host) or the budget expires; like load_gate, an
    expired gate proceeds anyway and stamps ``calib_gate_expired`` so the
    artifact records that the numbers were taken in a slow epoch.

    Motivation (late r7): a spot-bench run started at loadavg 2.48 —
    clean by the load gate — yet its calibration swung 3.8→10.9 s
    mid-run and a fixed-work-per-row query measured FASTER at 10x rows;
    only the probe, not loadavg, could have deferred that run.

    The gate checks BOTH epoch dimensions (they drift independently —
    see :data:`OVERHEAD_JOBS`): each shot is (throughput probe, min of 3
    tiny-job overhead probes), and releases only when throughput lands
    under ``threshold_s`` AND per-job overhead under
    ``overhead_threshold_s`` — a slow-*scheduling* epoch inflates every
    sub-second query while the throughput probe reads clean (measured:
    headline +30% at a *faster* calib).
    """
    t0 = time.monotonic()
    _probe_once(spark)  # unmeasured JVM/codegen warm-up
    _overhead_once(spark)

    def shot() -> tuple[float, float]:
        return (
            _probe_once(spark),
            min(_overhead_once(spark) for _ in range(3)),
        )

    def slow(s: tuple[float, float]) -> bool:
        return s[0] > threshold_s or s[1] > overhead_threshold_s

    shots = [shot()]
    while slow(shots[-1]) and (time.monotonic() - t0) < max_wait_s:
        time.sleep(poll_s)
        shots.append(shot())
    return {
        "calib_gate_threshold_s": threshold_s,
        "calib_gate_overhead_threshold_s": overhead_threshold_s,
        "calib_gate_shots": [s[0] for s in shots],
        "calib_gate_overhead_shots": [s[1] for s in shots],
        "calib_gate_waited_s": round(time.monotonic() - t0, 1),
        "calib_gate_expired": slow(shots[-1]),
    }


def load_gate(
    threshold: float = 8.0, max_wait_s: float = 180.0, poll_s: float = 15.0
) -> dict:
    """Defer measurement while the 1-min loadavg exceeds ``threshold``.

    Transient co-tenant spikes are the one drift source loadavg CAN see;
    waiting them out (bounded by ``max_wait_s``) keeps them out of the
    measurement entirely instead of merely stamping them. If the gate
    times out the bench proceeds anyway — ``gate_expired`` records that
    the numbers were taken under load.
    """
    t0 = time.monotonic()
    entry_load = os.getloadavg()[0]
    while os.getloadavg()[0] > threshold and (time.monotonic() - t0) < max_wait_s:
        time.sleep(poll_s)
    final = os.getloadavg()[0]
    return {
        "gate_threshold": threshold,
        "gate_load_entry": round(entry_load, 2),
        "gate_load_exit": round(final, 2),
        "gate_waited_s": round(time.monotonic() - t0, 1),
        "gate_expired": final > threshold,
    }
