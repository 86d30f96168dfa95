"""Pure arithmetic for the scale-trajectory bench (bench_scale.py).

Promoted out of artifacts/bench_sf1_spot.py (r9 verdict task #5) so the
min-of-shots normalization and the step-ratio computation are importable
and unit-tested — a fixture or harness change can no longer silently skew
the cross-scale ratios the judge reads.

Methodology (established r9, documented in BASELINE.md "Since r9"):

* Every measured run is paired with ONE calibration probe shot taken
  immediately before it. Normalized seconds divide by the MINIMUM shot
  observed for that (query, scale) across passes, scaled to the frozen
  reference epoch — NOT by the run's own shot: a probe shot is only ever
  corrupted UPWARD (transient contention, post-clear GC; a 24.4 s shot
  was measured adjacent to a 2.3 s one in the same stable run), so 1:1
  pairing would divide a clean run by a spiked factor and fabricate a
  speedup. A genuinely slow epoch elevates ALL shots in its window, so
  min-of-shots still normalizes real drift.
* Per-query seconds at each scale are the MIN of the decorrelated runs
  (transient load spikes cluster in time; the min is the uncontended
  figure), both raw and normalized.
* ``step_ratios`` / ``step_ratios_norm`` are adjacent-scale quotients;
  ``ratio`` / ``ratio_norm`` span first to last scale.
"""

from __future__ import annotations


def summarize_entry(entry: dict, labels: list[str], ref_calib: float) -> dict:
    """Fold one query's raw runs + paired calib shots into the artifact
    entry shape. ``entry`` must carry ``runs`` and ``calib_shots``: each a
    dict label -> list of floats (same lengths per label). Mutates and
    returns ``entry`` with ``runs_norm``, ``<label>_sec``,
    ``<label>_sec_norm``, ``step_ratios(_norm)`` and ``ratio(_norm)``.
    """
    entry.setdefault("runs_norm", {})
    for lbl in labels:
        shots = entry["calib_shots"][lbl]
        runs = entry["runs"][lbl]
        if not runs:
            raise ValueError(f"no runs recorded for scale {lbl!r}")
        if len(shots) != len(runs):
            raise ValueError(
                f"paired-shot invariant broken at {lbl!r}: "
                f"{len(runs)} runs vs {len(shots)} shots"
            )
        div = min(shots)
        entry["runs_norm"][lbl] = [round(r * ref_calib / div, 3) for r in runs]
        entry[f"{lbl}_sec"] = min(runs)
        entry[f"{lbl}_sec_norm"] = min(entry["runs_norm"][lbl])
    entry["step_ratios"] = {
        f"{a}->{b}": round(entry[f"{b}_sec"] / entry[f"{a}_sec"], 2)
        for a, b in zip(labels, labels[1:])
        if entry[f"{a}_sec"] > 0
    }
    entry["step_ratios_norm"] = {
        f"{a}->{b}": round(entry[f"{b}_sec_norm"] / entry[f"{a}_sec_norm"], 2)
        for a, b in zip(labels, labels[1:])
        if entry[f"{a}_sec_norm"] > 0
    }
    first, last = labels[0], labels[-1]
    entry["ratio"] = (
        round(entry[f"{last}_sec"] / entry[f"{first}_sec"], 2)
        if entry[f"{first}_sec"] > 0
        else None
    )
    entry["ratio_norm"] = (
        round(entry[f"{last}_sec_norm"] / entry[f"{first}_sec_norm"], 2)
        if entry[f"{first}_sec_norm"] > 0
        else None
    )
    return entry


def summarize_results(results: dict, labels: list[str], ref_calib: float) -> dict:
    """Apply :func:`summarize_entry` to every query entry; returns
    ``results`` (mutated) for chaining."""
    for entry in results.values():
        summarize_entry(entry, labels, ref_calib)
    return results
