"""Pins the scale-harness normalization arithmetic (r9 verdict task #5):
min-of-shots paired-probe normalization and step/total ratios, so a
fixture or harness change can't silently skew the cross-scale figures.
No Spark session needed — scalebench is pure arithmetic."""

from __future__ import annotations

import pytest

from kinesis_writer_spark.scalebench import summarize_entry, summarize_results


def _entry(runs, shots):
    return {"runs": runs, "calib_shots": shots}


class TestMinOfShots:
    def test_spiked_shot_is_rejected_by_min(self):
        """A probe shot corrupted upward (the measured 24.4 s next to
        2.3 s case) must NOT divide its paired run — min-of-shots uses the
        cleanest shot for the whole (query, scale)."""
        e = _entry(
            {"sf0.1": [4.0, 4.0]},
            {"sf0.1": [2.0, 24.4]},  # pass-2 shot spiked
        )
        summarize_entry(e, ["sf0.1"], ref_calib=2.0)
        # both runs normalize by min(2.0, 24.4)=2.0 -> 4.0 * 2.0/2.0
        assert e["runs_norm"]["sf0.1"] == [4.0, 4.0]
        assert e["sf0.1_sec_norm"] == 4.0

    def test_slow_epoch_elevates_all_shots_and_is_normalized(self):
        """A genuinely slow epoch doubles every shot in its window; the
        normalized seconds must halve accordingly."""
        e = _entry({"sf1": [10.0, 10.2]}, {"sf1": [4.0, 4.4]})
        summarize_entry(e, ["sf1"], ref_calib=2.0)
        # div = 4.0; 10.0 * 2.0/4.0 = 5.0
        assert e["sf1_sec_norm"] == 5.0
        assert e["sf1_sec"] == 10.0  # raw min preserved alongside

    def test_paired_shot_invariant_enforced(self):
        e = _entry({"sf1": [1.0, 2.0]}, {"sf1": [1.0]})
        with pytest.raises(ValueError, match="paired-shot"):
            summarize_entry(e, ["sf1"], ref_calib=2.0)

    def test_empty_runs_raise(self):
        e = _entry({"sf1": []}, {"sf1": []})
        with pytest.raises(ValueError, match="no runs"):
            summarize_entry(e, ["sf1"], ref_calib=2.0)


class TestRatios:
    def test_step_and_total_ratios(self):
        e = _entry(
            {"sf0.1": [1.0], "sf1": [3.0], "sf10": [9.0]},
            {"sf0.1": [2.0], "sf1": [2.0], "sf10": [2.0]},
        )
        summarize_entry(e, ["sf0.1", "sf1", "sf10"], ref_calib=2.0)
        assert e["step_ratios"] == {"sf0.1->sf1": 3.0, "sf1->sf10": 3.0}
        assert e["ratio"] == 9.0
        # identity epoch (shots == ref) -> norm equals raw
        assert e["step_ratios_norm"] == e["step_ratios"]
        assert e["ratio_norm"] == 9.0

    def test_norm_ratio_corrects_per_scale_drift(self):
        """If the big-scale pass ran in a 2x-slow window, the raw ratio
        doubles but the normalized ratio must recover the true scaling."""
        e = _entry(
            {"sf0.1": [1.0], "sf1": [6.0]},
            {"sf0.1": [2.0], "sf1": [4.0]},  # sf1 window 2x slower
        )
        summarize_entry(e, ["sf0.1", "sf1"], ref_calib=2.0)
        assert e["ratio"] == 6.0
        assert e["ratio_norm"] == 3.0

    def test_min_of_runs_is_reported_figure(self):
        e = _entry(
            {"sf0.1": [1.5, 1.0], "sf1": [4.0, 5.0]},
            {"sf0.1": [2.0, 2.0], "sf1": [2.0, 2.0]},
        )
        summarize_entry(e, ["sf0.1", "sf1"], ref_calib=2.0)
        assert e["sf0.1_sec"] == 1.0 and e["sf1_sec"] == 4.0
        assert e["ratio"] == 4.0

    def test_summarize_results_applies_to_all(self):
        res = {
            "qa": _entry({"sf0.1": [1.0], "sf1": [2.0]},
                         {"sf0.1": [2.0], "sf1": [2.0]}),
            "qb": _entry({"sf0.1": [2.0], "sf1": [8.0]},
                         {"sf0.1": [2.0], "sf1": [2.0]}),
        }
        summarize_results(res, ["sf0.1", "sf1"], ref_calib=2.0)
        assert res["qa"]["ratio"] == 2.0
        assert res["qb"]["ratio"] == 4.0


class TestHarnessImports:
    def test_promoted_harness_and_shim_expose_same_entry_points(self):
        """The artifacts/ shim must stay importable and bound to the
        promoted implementation (single source of truth)."""
        import importlib.util
        import os

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

        def _load(path, name):
            spec = importlib.util.spec_from_file_location(name, path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return mod

        promoted = _load(os.path.join(root, "bench_scale.py"), "bench_scale_t")
        shim = _load(
            os.path.join(root, "artifacts", "bench_sf1_spot.py"), "spot_shim_t"
        )
        assert shim.build_fixture is not None
        assert shim.SPOT == promoted.SPOT
        assert shim.build_sf1 is shim.build_fixture
