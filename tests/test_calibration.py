"""Tests for the bench host-throughput calibration probe (r6 verdict
task #1: raw bench seconds drift with the sandbox epoch; the probe makes
them normalizable)."""

import time

import pytest

from kinesis_writer_spark import calibration


@pytest.fixture(scope="module")
def spark():
    from kinesis_writer_spark.session import get_spark

    return get_spark("test_calibration")


def test_calibrate_shape_and_median(spark, monkeypatch):
    # shrink the probe so the unit test is fast; the workload SHAPE
    # (two-stage shuffle agg -> noop) is what we exercise here
    monkeypatch.setattr(calibration, "CALIB_ROWS", 100_000)
    monkeypatch.setattr(calibration, "CALIB_PARTITIONS", 4)
    out = calibration.calibrate(spark)
    assert len(out["calib_runs"]) == 3
    assert out["calib_seconds"] == sorted(out["calib_runs"])[1]
    assert out["calib_seconds"] > 0 and out["calib_warm_run"] > 0
    assert "100000" in out["calib_workload"]
    # second probe: per-job scheduling overhead (throughput and overhead
    # drift independently — see calibration.py OVERHEAD_JOBS note)
    assert len(out["overhead_runs"]) == calibration.OVERHEAD_JOBS
    assert out["overhead_seconds"] == sorted(out["overhead_runs"])[
        len(out["overhead_runs"]) // 2
    ]
    assert out["overhead_seconds"] > 0


def test_calib_gate_passes_on_fast_probe(monkeypatch):
    # fake probes: fast shots -> gate releases immediately after the warm-up
    shots = iter([9.9, 0.1])  # warm-up (ignored), first measured shot
    monkeypatch.setattr(calibration, "_probe_once", lambda s: next(shots))
    monkeypatch.setattr(calibration, "_overhead_once", lambda s: 0.06)
    out = calibration.calib_gate(None, threshold_s=4.0, max_wait_s=5.0, poll_s=0.01)
    assert out["calib_gate_shots"] == [0.1]
    assert out["calib_gate_overhead_shots"] == [0.06]
    assert not out["calib_gate_expired"]


def test_calib_gate_waits_then_releases_when_epoch_recovers(monkeypatch):
    shots = iter([9.9, 8.0, 7.5, 1.2])
    monkeypatch.setattr(calibration, "_probe_once", lambda s: next(shots))
    monkeypatch.setattr(calibration, "_overhead_once", lambda s: 0.06)
    out = calibration.calib_gate(None, threshold_s=4.0, max_wait_s=10.0, poll_s=0.01)
    assert out["calib_gate_shots"] == [8.0, 7.5, 1.2]
    assert not out["calib_gate_expired"]


def test_calib_gate_expires_in_sustained_slow_epoch(monkeypatch):
    monkeypatch.setattr(calibration, "_probe_once", lambda s: 9.0)
    monkeypatch.setattr(calibration, "_overhead_once", lambda s: 0.06)
    t0 = time.time()
    out = calibration.calib_gate(None, threshold_s=4.0, max_wait_s=0.2, poll_s=0.05)
    assert time.time() - t0 >= 0.2
    assert out["calib_gate_expired"]
    assert all(v == 9.0 for v in out["calib_gate_shots"])


def test_calib_gate_blocks_on_slow_scheduling_epoch(monkeypatch):
    """The r7 blind spot: throughput probe fast, per-job overhead inflated
    — the gate must treat that epoch as slow too."""
    monkeypatch.setattr(calibration, "_probe_once", lambda s: 2.2)
    overheads = iter([0.5] + [0.5] * 3 + [0.5] * 3 + [0.07] * 3)
    monkeypatch.setattr(calibration, "_overhead_once", lambda s: next(overheads))
    out = calibration.calib_gate(None, threshold_s=4.0, max_wait_s=10.0, poll_s=0.01)
    assert out["calib_gate_overhead_shots"] == [0.5, 0.5, 0.07]
    assert not out["calib_gate_expired"]


def test_load_gate_passes_when_idle(monkeypatch):
    monkeypatch.setattr(calibration.os, "getloadavg", lambda: (0.5, 0.5, 0.5))
    out = calibration.load_gate(threshold=8.0, max_wait_s=1.0, poll_s=0.01)
    assert out["gate_waited_s"] < 0.5
    assert not out["gate_expired"]


def test_load_gate_waits_then_expires_under_sustained_load(monkeypatch):
    monkeypatch.setattr(calibration.os, "getloadavg", lambda: (99.0, 9.0, 9.0))
    t0 = time.time()
    out = calibration.load_gate(threshold=8.0, max_wait_s=0.2, poll_s=0.05)
    assert time.time() - t0 >= 0.2
    assert out["gate_expired"] and out["gate_load_entry"] == 99.0


def test_load_gate_releases_when_load_decays(monkeypatch):
    loads = iter([(20.0,) * 3, (20.0,) * 3, (1.0,) * 3, (1.0,) * 3])
    last = [(20.0,) * 3]

    def fake_loadavg():
        last[0] = next(loads, last[0])
        return last[0]

    monkeypatch.setattr(calibration.os, "getloadavg", fake_loadavg)
    out = calibration.load_gate(threshold=8.0, max_wait_s=10.0, poll_s=0.01)
    assert not out["gate_expired"]
    assert out["gate_load_exit"] == 1.0


class TestAdjudicateEpoch:
    """r7 verdict task #2: BENCH artifacts carry a machine-computed epoch
    verdict so no reader re-derives BASELINE.md's rules by hand."""

    def _c(self, cs, oh):
        return {"calib_seconds": cs, "overhead_seconds": oh}

    def test_stable_epoch(self):
        ref = calibration.REFERENCE_EPOCH
        out = calibration.adjudicate_epoch(
            self._c(ref["calib_sec"], ref["overhead_sec"]),
            self._c(ref["calib_sec"] * 1.02, ref["overhead_sec"]),
            {"calib_gate_expired": False},
        )
        assert out["verdict"].startswith("stable;")
        assert out["flags"] == []
        assert out["calib_vs_ref"] == 1.0
        assert out["overhead_vs_ref"] == 1.0

    def test_intra_run_drift_flagged(self):
        # the late-r7 failure mode: probe swings 3.8 -> 10.9 mid-run
        out = calibration.adjudicate_epoch(
            self._c(3.8, 0.1), self._c(10.9, 0.1), {}
        )
        assert "intra-run-drift" in out["flags"]
        assert out["verdict"].startswith("caution:")
        assert out["intra_run_drift_pct"] > 100

    def test_slow_scheduling_epoch_flagged_at_clean_throughput(self):
        # the r7 blind spot: throughput probe in band, per-job overhead 2x
        out = calibration.adjudicate_epoch(
            self._c(2.3, 0.22), self._c(2.3, 0.22), {}
        )
        assert out["flags"] == ["overhead-off-band"]

    def test_off_band_throughput_flagged(self):
        out = calibration.adjudicate_epoch(
            self._c(5.0, 0.1), self._c(5.0, 0.1), {}
        )
        assert "calib-off-band" in out["flags"]

    def test_gate_expiry_propagates(self):
        ref = calibration.REFERENCE_EPOCH
        out = calibration.adjudicate_epoch(
            self._c(ref["calib_sec"], ref["overhead_sec"]),
            self._c(ref["calib_sec"], ref["overhead_sec"]),
            {"calib_gate_expired": True},
        )
        assert out["flags"] == ["gate-expired"]

    def test_missing_calibration_is_unmeasured(self):
        out = calibration.adjudicate_epoch({}, {}, {})
        assert out["verdict"] == "unmeasured"

    def test_missing_end_probe_flagged_not_crashed(self):
        ref = calibration.REFERENCE_EPOCH
        out = calibration.adjudicate_epoch(
            self._c(ref["calib_sec"], ref["overhead_sec"]), {}, {}
        )
        assert "no-end-probe" in out["flags"]
        assert out["intra_run_drift_pct"] is None

    def test_verdict_string_is_stdout_tail_safe(self):
        out = calibration.adjudicate_epoch(
            self._c(9.9, 0.9), self._c(1.0, 0.01), {"calib_gate_expired": True}
        )
        assert len(out["verdict"]) < 120  # fits the 2000-char driver tail


class TestReferenceEpochOverride:
    """r8 ADVICE #3: REFERENCE_EPOCH bakes this sandbox's timings; on any
    other host every artifact would read calib-off-band forever. The env
    override re-baselines, and the host fingerprint makes the two cases
    distinguishable in the artifact itself."""

    def test_env_override_rebaselines(self, monkeypatch):
        from kinesis_writer_spark import calibration

        monkeypatch.setenv("SPARK_GRAFT_CALIB_REF_SEC", "4.0")
        monkeypatch.setenv("SPARK_GRAFT_OVERHEAD_REF_SEC", "0.2")
        out = calibration.adjudicate_epoch(
            {"calib_seconds": 4.0, "overhead_seconds": 0.2},
            {"calib_seconds": 4.1, "overhead_seconds": 0.21},
        )
        assert out["calib_vs_ref"] == 1.0
        assert out["overhead_vs_ref"] == 1.0
        assert out["reference"]["calib_sec"] == 4.0
        assert out["reference"]["source"] == "calib=env,overhead=env;BENCH_r07.json"
        assert not out["flags"]

    def test_partial_override_is_readable(self, monkeypatch):
        from kinesis_writer_spark import calibration

        monkeypatch.setenv("SPARK_GRAFT_CALIB_REF_SEC", "4.0")
        monkeypatch.delenv("SPARK_GRAFT_OVERHEAD_REF_SEC", raising=False)
        ref = calibration._resolved_reference()
        assert ref["calib_sec"] == 4.0
        assert ref["overhead_sec"] == calibration.REFERENCE_EPOCH["overhead_sec"]
        assert ref["source"] == "calib=env,overhead=baked;BENCH_r07.json"

    def test_invalid_override_falls_back_without_crashing(self, monkeypatch):
        """adjudicate_epoch runs at artifact-write time, after the whole
        bench — a typo'd override must degrade, not raise (r9 review)."""
        from kinesis_writer_spark import calibration

        for bad in ("0", "-1", "3,5", "abc"):
            monkeypatch.setenv("SPARK_GRAFT_CALIB_REF_SEC", bad)
            out = calibration.adjudicate_epoch(
                {"calib_seconds": 2.296, "overhead_seconds": 0.106},
                {"calib_seconds": 2.296, "overhead_seconds": 0.106},
            )
            assert out["calib_vs_ref"] == 1.0  # baked-in reference used
            assert "invalid:SPARK_GRAFT_CALIB_REF_SEC" in out["reference"]["source"]

    def test_default_reference_and_host_recorded(self, monkeypatch):
        from kinesis_writer_spark import calibration

        monkeypatch.delenv("SPARK_GRAFT_CALIB_REF_SEC", raising=False)
        monkeypatch.delenv("SPARK_GRAFT_OVERHEAD_REF_SEC", raising=False)
        out = calibration.adjudicate_epoch(
            {"calib_seconds": 2.3, "overhead_seconds": 0.11},
            {"calib_seconds": 2.3, "overhead_seconds": 0.11},
        )
        assert out["reference"]["source"] == "BENCH_r07.json"
        assert "cpu=" in out["host"]


class TestNormalizeSuite:
    """r9 verdict task #2: the blended normalizer's arithmetic, pinned so
    the headline metric can't silently change meaning."""

    def test_blend_divides_each_regime_by_its_probe(self):
        from kinesis_writer_spark import calibration

        # one sub-second query (overhead regime), one multi-second
        # (throughput regime); an epoch 2x slower on throughput but 2x
        # FASTER on scheduling
        out = calibration.normalize_suite(
            {"fast": 0.5, "slow": 2.0}, calib_vs_ref=2.0, oh_vs_ref=0.5
        )
        assert out["value_norm_blend"] == 0.5 / 0.5 + 2.0 / 2.0  # == 2.0
        assert out["value_norm_oh"] == round((0.5 + 2.0) / 0.5, 3)  # 5.0
        assert out["subsecond_share_pct"] == 20.0
        assert out["normalizer_note"] == "norm=blend(20.0%sub-second@oh)"

    def test_cutoff_boundary_is_throughput_regime(self):
        from kinesis_writer_spark import calibration

        # exactly 1.0 s falls in the calib regime (>= cutoff)
        out = calibration.normalize_suite({"q": 1.0}, 4.0, 0.25)
        assert out["value_norm_blend"] == 0.25
        assert out["subsecond_share_pct"] == 0.0

    def test_identity_epoch_reproduces_raw_seconds(self):
        from kinesis_writer_spark import calibration

        timings = {"a": 0.3, "b": 0.9, "c": 5.2}
        out = calibration.normalize_suite(timings, 1.0, 1.0)
        assert out["value_norm_blend"] == round(sum(timings.values()), 3)
        assert out["value_norm_oh"] == round(sum(timings.values()), 3)

    def test_unmeasured_epoch_yields_nulls_not_crash(self):
        from kinesis_writer_spark import calibration

        for args in (({}, 1.0, 1.0), ({"q": 1.0}, None, 1.0), ({"q": 1.0}, 1.0, None)):
            out = calibration.normalize_suite(*args)
            assert out["value_norm_blend"] is None
            assert out["value_norm_oh"] is None
            assert out["normalizer_note"] == "norm=unmeasured"


class TestDriftRetrySelection:
    """bench.py's drift self-defense (r10 verdict task #2): the reported
    headline must be the median blend over the rehearsal set, preferring
    stable-window passes, with value/queries taken from the SAME pass."""

    @staticmethod
    def _mk(pass_i, blend, drift, calib_vs_ref=None):
        return {
            "pass": pass_i,
            "timings": {"q": 1.0 + pass_i},
            "epoch": {
                "intra_run_drift_pct": drift,
                "calib_vs_ref": calib_vs_ref,
            },
            "norm": {"value_norm_blend": blend},
        }

    def test_single_calm_pass_reports_itself(self):
        import bench

        p = self._mk(0, 30.0, 5.0)
        chosen, note = bench._pick_reported_pass([p])
        assert chosen is p
        assert "1 stable" in note["policy"]

    def test_median_over_stable_passes_ignores_drifting_one(self):
        import bench

        drifty = self._mk(0, 40.0, 19.0)  # above DRIFT_RETRY_PCT default 10
        calm_a = self._mk(1, 28.0, 4.0)
        calm_b = self._mk(2, 31.0, 6.0)
        chosen, note = bench._pick_reported_pass([drifty, calm_a, calm_b])
        # lower median of the two stable blends (28.0, 31.0) -> pass 1
        assert chosen is calm_a
        assert note["chosen_pass"] == 1
        assert "2 stable" in note["policy"]

    def test_all_drifting_falls_back_to_median_of_all(self):
        import bench

        ps = [self._mk(i, b, 15.0) for i, b in enumerate([50.0, 33.0, 41.0])]
        chosen, note = bench._pick_reported_pass(ps)
        assert chosen["norm"]["value_norm_blend"] == 41.0
        assert "ALL-DRIFTING" in note["policy"]

    def test_missing_blend_never_crashes(self):
        import bench

        p = {"pass": 0, "timings": {}, "epoch": {}, "norm": {}}
        chosen, note = bench._pick_reported_pass([p])
        assert chosen is p
        assert "no blend" in note["policy"]

    def test_even_count_picks_lower_median_pass(self):
        import bench

        a, b = self._mk(0, 28.0, 3.0), self._mk(1, 34.0, 3.0)
        chosen, _ = bench._pick_reported_pass([a, b])
        assert chosen is a

    def test_inband_pass_beats_offband_stable_pass(self):
        """r11 verdict task #5: a calm pass taken in a slow epoch (calib
        1.146xref blended 22% high in the same-HEAD study) must lose to a
        calm IN-BAND pass even when the off-band blend reads lower."""
        import bench

        off = self._mk(0, 27.0, 4.0, calib_vs_ref=1.30)  # slow epoch, low blend
        inb = self._mk(1, 31.0, 4.0, calib_vs_ref=1.02)
        chosen, note = bench._pick_reported_pass([off, inb])
        assert chosen is inb
        assert "in-band" in note["policy"]
        assert note["pass_calib_vs_ref"] == [1.30, 1.02]

    def test_fast_epoch_is_off_band_too(self):
        """The blend model errs in BOTH directions (r12: calib 0.781xref /
        oh 0.678xref read 18% high): a too-FAST window must also lose to a
        mid-band pass."""
        import bench

        fast = self._mk(0, 36.3, 4.0, calib_vs_ref=0.78)
        mid = self._mk(1, 32.0, 4.0, calib_vs_ref=0.95)
        chosen, note = bench._pick_reported_pass([fast, mid])
        assert chosen is mid
        assert "in-band" in note["policy"]

    def test_all_offband_falls_back_to_stable_median(self):
        import bench

        ps = [
            self._mk(i, b, 4.0, calib_vs_ref=1.4)
            for i, b in enumerate([36.0, 33.0, 41.0])
        ]
        chosen, note = bench._pick_reported_pass(ps)
        assert chosen["norm"]["value_norm_blend"] == 36.0
        assert "OFF-BAND" in note["policy"]

    def test_no_blend_prefers_calm_pass(self):
        """r11 ADVICE #3 companion: when normalization is structurally
        unmeasurable the selection still prefers a calm-drift pass."""
        import bench

        drifty = {"pass": 0, "timings": {}, "epoch": {"intra_run_drift_pct": 20.0}, "norm": {}}
        calm = {"pass": 1, "timings": {}, "epoch": {"intra_run_drift_pct": 3.0}, "norm": {}}
        chosen, note = bench._pick_reported_pass([drifty, calm])
        assert chosen is calm
        assert "no blend" in note["policy"]
